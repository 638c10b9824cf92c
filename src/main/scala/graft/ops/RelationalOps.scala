package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Helpers shared by the relational query surface.
  *
  * Exact-arithmetic convention: money/measure doubles are converted to
  * integer cents *before* aggregation, so every aggregate in the oracle
  * compare is exact integer math — float summation order (which differs
  * between Spark partial aggregation and DuckDB, and between runs) can
  * never flip a result hash. The inputs carry 2-decimal values, so
  * `round(x*100)` is integer-valued up to 1e-9 noise and both engines land
  * on the same long.
  */
object RelationalOps {

  /** Double dollars → exact long cents. DuckDB equivalent:
    * `CAST(ROUND(x*100) AS BIGINT)` (round-then-cast is exact on both
    * engines; a bare double→long cast would truncate in Spark but
    * round-to-nearest in DuckDB). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Integer-valued double (e.g. l_quantity) → exact long. */
  def asLong(c: Column): Column = round(c).cast("long")

  /** floor(sum/count) integer average, matching the reference's
    * integer-division avg (SURVEY.md §2.7). */
  def intAvg(sum: Column, count: Column): Column =
    floor(sum / count).cast("long")

  /** Integer floor-division (toward −∞) of a long column. `a − pmod(a,w)`
    * is exactly divisible by `w`, so the double division is exact as long
    * as the quotient magnitude stays under 2^53 — ample for cents,
    * micros-epoch timestamps, and any realistic band index. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Banded (bucketed) range join: `left` rows whose `valueCol` falls in
    * `right`'s `[loCol, hiCol]` interval (inclusive), as an EQUI-join —
    * the scale-shaped replacement for the nested-loop plan Spark picks
    * for a pure range predicate.
    *
    * Each right interval explodes to the coarse bands it overlaps
    * (`sequence(floorDiv(lo,w), floorDiv(hi,w))`); each left row carries
    * its single band. The join is then an exact equi-join on the band
    * plus a residual range filter. Every matching pair meets in EXACTLY
    * one band (the left value's), so no dedup pass is needed and output
    * multiplicity matches the naive join bit-for-bit.
    *
    * Cost model: right side inflates by ~(interval length / bandWidth);
    * left side shuffles once on its band. Pick `bandWidth` near the
    * typical interval length — a width far below it multiplies the right
    * side, far above it funnels everything into few bands (the
    * nested-loop problem reappearing per-band). Intervals with
    * `hi < lo` match nothing (filtered, like the naive predicate).
    * `maxBandsPerInterval` fails the job LOUDLY if any single interval
    * would explode past it — a mis-sized bandWidth at 100 TB should be a
    * clear error, not an executor OOM three hours in.
    * Long-typed columns required: band arithmetic is exact integer math
    * (floor division toward −∞, correct for negative values). */
  def bandedRangeJoin(left: DataFrame, valueCol: String,
      right: DataFrame, loCol: String, hiCol: String, bandWidth: Long,
      maxBandsPerInterval: Long = 100000L): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    require(maxBandsPerInterval > 0, "maxBandsPerInterval must be positive")
    val clash = Seq("__band").filter(c => left.columns.contains(c) || right.columns.contains(c))
    require(clash.isEmpty, "bandedRangeJoin reserves column name __band")
    val lo = floorDiv(col(loCol), bandWidth)
    val hi = floorDiv(col(hiCol), bandWidth)
    val r = right.filter(col(hiCol) >= col(loCol))
      .withColumn("__band", explode(sequence(lo,
        when(hi - lo < maxBandsPerInterval, hi).otherwise(
          raise_error(concat(lit(s"bandedRangeJoin: interval spans more than " +
            s"$maxBandsPerInterval bands of width $bandWidth at ${loCol}="), col(loCol)
            .cast("string"), lit(s", ${hiCol}="), col(hiCol).cast("string"),
            lit("; raise bandWidth or maxBandsPerInterval")))))))
    left.withColumn("__band", floorDiv(col(valueCol), bandWidth))
      .join(r, Seq("__band"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__band")
  }

  /** Snapshot reconciliation ("data diff"): classify every key across two
    * table versions as `added` (B only), `removed` (A only), `changed`
    * (both, any value column differs) or `same` — the audit a pipeline
    * runs before promoting a rebuilt table, and the summary a CDC
    * consumer reconciles against. Comparison is per-column null-safe
    * (`<=>`), so null→value and value→null count as changes and
    * null <=> null does not.
    *
    * Scale shape: ONE full-outer equi-join on the keys — both sides
    * shuffle once; with pre-bucketed snapshots ([[graft.ops.Layout
    * .writeBucketed]]) even that exchange disappears. No row hashing:
    * hashing collapses columns but costs a serialization pass and makes
    * null/order pitfalls invisible; the column comparison is codegen'd
    * anyway.
    *
    * @return keys ++ (status: string) — one row per key present in
    *         either version
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"snapshot schemas differ: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val vals = a.columns.filterNot(keys.contains).toSeq
    val reserved = (Seq("__a", "__b", "status") ++ vals.map("__b_" + _))
      .filter(a.columns.contains)
    require(reserved.isEmpty, s"snapshotDiff reserves: ${reserved.mkString(",")}")
    val av = a.withColumn("__a", lit(1))
    val bv = vals.foldLeft(b)((df, v) => df.withColumnRenamed(v, s"__b_$v"))
      .withColumn("__b", lit(1))
    val sameCond =
      if (vals.isEmpty) lit(true)
      else vals.map(v => col(v) <=> col(s"__b_$v")).reduce(_ && _)
    av.join(bv, keys, "full_outer")
      .withColumn("status",
        when(col("__b").isNull, lit("removed"))
          .when(col("__a").isNull, lit("added"))
          .when(sameCond, lit("same"))
          .otherwise(lit("changed")))
      .select(keys.map(col) :+ col("status"): _*)
  }
}
