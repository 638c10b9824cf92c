package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single most recent
  * right row with the same key whose timestamp is at or before the left
  * row's timestamp. The staple of time-series enrichment (trades ⋈ latest
  * quote, events ⋈ last config change, features ⋈ most recent label) that
  * Spark has no native operator for.
  *
  * Shape: instead of a range join (which Spark plans as a per-key
  * broadcast-nested-loop or a cartesian-within-key — quadratic in the hot
  * key), the two sides are TAGGED and UNIONED, then a single window sorted
  * by (key, ts, side) carries the right side's values forward with
  * `last(..., ignoreNulls = true)` over an unbounded-preceding frame.
  * Right rows sort BEFORE left rows at equal timestamps (side 0 < 1), so a
  * right row at exactly the left timestamp is visible — the `rts <= ts`
  * convention, matching DuckDB/pandas ASOF semantics.
  *
  * Cost at scale: ONE shuffle on the key columns plus an in-partition
  * sort — identical to any windowed aggregation, linear in rows, no
  * per-key quadratic term. Every row is touched once; the forward-carry
  * runs inside the sorted pass. A pathologically hot key serializes into
  * one partition's sort (the usual window caveat) — [[asofJoinBucketed]]
  * is that caveat's mitigation: it pre-splits every key by coarse time
  * bucket so no single partition ever sorts more than one bucket of the
  * hottest key.
  *
  * Contract: `right` must be unique per (keys, rightTs) — pre-aggregate
  * if it is not (enforced nowhere cheap at scale; duplicates would make
  * which-value-wins depend on partition order). Left rows with no prior
  * right row get nulls in every carried column.
  *
  * Output: all of `left`'s columns, plus each `rightVals` column carried
  * as `asof_<name>`, plus `asof_ts` (the matched right row's timestamp,
  * null when unmatched).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(rightVals.nonEmpty, "asofJoin needs at least one right value column")
    val outNames = rightVals.map(v => s"asof_$v") :+ "asof_ts"
    val reserved = Seq("__ts", "__side", "__row", "__mts", "__match") ++ outNames
    val clash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(",")} collide with asofJoin's working/output names; rename first")

    // the matched right row travels as ONE struct so the carry is atomic:
    // carrying each value column separately through its own
    // last(ignoreNulls) would let a genuinely-NULL right value resurrect
    // an older row's value next to the newer row's timestamp — a (ts,
    // value) pair that never existed. A struct is non-null for every
    // right row (even when its fields are null), so the whole row wins or
    // loses together, matching DuckDB/pandas ASOF semantics exactly.
    val r = right.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+
        struct(col(rightTs).as("__mts") +: rightVals.map(col): _*).as("__row"): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    // unionByName fills each side's missing columns with nulls — exactly
    // the sentinel the forward-carry skips over
    val u = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__row"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightVals.toIndexedSeq.map(v => col(s"__match.$v").as(s"asof_$v")) :+
        col("__match.__mts").as("asof_ts"): _*)
  }

  /** [[asofJoin]] with hot-key pre-splitting: identical semantics and
    * output, but every window partitions on (keys, coarse time bucket)
    * instead of keys alone, so a pathologically hot key — one whose rows
    * would serialize into a single partition's sort in [[asofJoin]] —
    * splits across `bucketWidth`-sized slices that sort in parallel.
    *
    * Mechanics (three stages, each bounded):
    *   1. per-(key, bucket) LATEST right row — one grouped `max_by` with
    *      map-side partials, emitting one row per touched bucket;
    *   2. carry-in chain — a forward-carry window over the (key, bucket)
    *      GRID (buckets either side touches), giving each bucket the
    *      latest right row from strictly earlier buckets. This is the
    *      only per-key-serial pass, and it runs over bucket-level rows
    *      (corpus span ÷ bucketWidth per key), not raw rows;
    *   3. the [[asofJoin]] union+window, but partitioned by (keys,
    *      bucket), with each bucket's carry-in injected as a virtual
    *      right row (its real timestamp < bucket start, so it sorts
    *      first and loses to any in-bucket right row — exactly the
    *      at-or-before semantics).
    *
    * Price: two extra small shuffles (stages 1-2) on top of asofJoin's
    * one — worth it only when a key is hot enough to bind a partition;
    * that is why it is a separate opt-in entry point. `leftTs`/`rightTs`
    * must be TIMESTAMP columns (buckets come from tumbling `window`);
    * `bucketWidth` is a duration literal like "1 hour" or "7 days",
    * chosen so one bucket of the hottest key fits an executor's sort. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      bucketWidth: String): DataFrame = {
    require(keys.nonEmpty, "asofJoinBucketed needs at least one key column")
    require(rightVals.nonEmpty, "asofJoinBucketed needs at least one right value column")
    val outNames = rightVals.map(v => s"asof_$v") :+ "asof_ts"
    val reserved = Seq("__ts", "__side", "__row", "__mts", "__match", "__bkt", "__last") ++ outNames
    val clash = (left.columns ++ right.columns).filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(",")} collide with asofJoinBucketed's working/output names; rename first")

    def bkt(ts: Column): Column = window(ts, bucketWidth).getField("start")
    val kc = keys.map(col)

    val r = right.select(
      kc :+ col(rightTs).as("__ts") :+
        struct(col(rightTs).as("__mts") +: rightVals.map(col): _*).as("__row"): _*)

    // 1. latest right row per (key, bucket) — right unique per (keys, ts)
    // by the asofJoin contract, so max_by has no ties
    val rb = r.groupBy(kc :+ bkt(col("__ts")).as("__bkt"): _*)
      .agg(max_by(col("__row"), col("__ts")).as("__last"))

    // 2. carry-ins over the bucket grid: every (key, bucket) either side
    // touches; buckets with no right rows carry the chain through as null
    val grid = left.select(kc :+ bkt(col(leftTs)).as("__bkt"): _*).distinct()
      .unionByName(rb.select(kc :+ col("__bkt"): _*)).distinct()
    val wCarry = Window.partitionBy(kc: _*).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = grid.join(rb, keys :+ "__bkt", "left_outer")
      .withColumn("__row", last(col("__last"), ignoreNulls = true).over(wCarry))
      .filter(col("__row").isNotNull)
      // the carry-in keeps its REAL timestamp (< bucket start by
      // construction), so the in-bucket sort places it before every
      // native row and any in-bucket right row supersedes it
      .select(kc ++ Seq(col("__bkt"), col("__row"),
        col("__row.__mts").as("__ts"), lit(0).as("__side")): _*)

    val rIn = r.withColumn("__bkt", bkt(col("__ts"))).withColumn("__side", lit(0))
    val lIn = left.withColumn("__ts", col(leftTs))
      .withColumn("__bkt", bkt(col(leftTs))).withColumn("__side", lit(1))
    val u = lIn.unionByName(rIn, allowMissingColumns = true)
      .unionByName(carries, allowMissingColumns = true)

    val w = Window.partitionBy(kc :+ col("__bkt"): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__match", last(col("__row"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        rightVals.toIndexedSeq.map(v => col(s"__match.$v").as(s"asof_$v")) :+
        col("__match.__mts").as("asof_ts"): _*)
  }
}
