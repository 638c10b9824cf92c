package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bounded detach-to-LocalRelation contract, in ONE place (it was
  * re-implemented inline by curate, curateDelta and Graphs.detachSmall,
  * and the three copies had already started to drift):
  *
  *  - fetch `cap + 1` rows in one pass — one extra row is how the guard
  *    distinguishes "exactly cap" from "more than cap" without a count
  *    job, and the caller pre-sizes `spark.sql.limit.initialNumPartitions`
  *    when the incremental limit-collect would pay retry passes;
  *  - fail LOUDLY on overflow — detaching is for results known bounded
  *    (reports, nation-level graphs, test harnesses); silently collecting
  *    an unbounded corpus to the driver is the bug this guard exists for;
  *  - run the caller's `release` hook only AFTER the rows are safely on
  *    the driver (releasing first would recompute the lineage on collect);
  *  - rebuild as a plan-free LocalRelation on the CALLER's session, so
  *    anything composed downstream plans under the caller's conf, not a
  *    scope clone's, and no internal cache or lineage outlives the call.
  */
object Detach {
  def toLocal(df: DataFrame, cap: Int, caller: SparkSession,
      overflowMsg: String)(release: => Unit): DataFrame = {
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap, overflowMsg)
    release
    caller.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }
}
