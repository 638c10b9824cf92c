package graft.operators

import org.apache.spark.sql.DataFrame
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
  * one partition's sort (the usual window caveat) — pre-split such keys
  * by coarse time bucket if that ever binds.
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
      .select(left.columns.map(col) ++
        rightVals.map(v => col(s"__match.$v").as(s"asof_$v")) :+
        col("__match.__mts").as("asof_ts"): _*)
  }
}
