package graft.ops

import org.apache.spark.sql.Column
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
}
