package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-conf scoping for operators whose plan shape is known ahead of
  * time. Spark's AQE charges one driver job per materialized exchange
  * (each shuffle stage is submitted, measured, and re-planned before the
  * next), which is the right trade for ad-hoc corpus queries — and pure
  * overhead for a SERVING-shaped operator that re-executes the same
  * known plan per batch: a per-batch dedup admits the same band joins
  * every call, a fixpoint loop re-runs the same two exchanges every
  * round. There AQE re-planning buys no information while charging a
  * driver walk plus a job dispatch per exchange per call — on a
  * dispatch-floor-bound host (or a busy cluster scheduler) that floor IS
  * the latency. Measured on the board: d12_delta_dedup 45 → ~4 driver
  * jobs with identical results.
  *
  * Static planning deliberately gives up two AQE behaviors, both
  * irrelevant to the shapes this is used for: runtime join-strategy
  * switches (the operators' joins are on DERIVED frames whose static
  * size estimates would never broadcast anyway, or on frames the
  * operator already pre-partitioned) and skew-split (LSH band / minhash
  * bucket keys are uniform by construction). Partition counts stay at
  * the session's `spark.sql.shuffle.partitions` — the caller sized that
  * for the corpus.
  *
  * Confs are session-scoped: a concurrent query on the same session
  * plans under these values while `f` runs — callers running dense
  * multi-tenant sessions should serialize such operators (the same
  * contract as Graphs' loop scope). */
object PlanScope {

  /** Run `f` with the given SQL confs set, restoring prior values after
    * (unset keys are restored by setting the resolved default read
    * before the override — SQLConf always resolves a value). */
  def withConf[T](spark: SparkSession, confs: (String, String)*)(f: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** Static-plan scope: AQE off for the duration of `f` — one driver job
    * per action instead of one per exchange. For serving-shaped batch
    * operators; iterative loops additionally pin partitions and
    * broadcasts (see Graphs.withLoopScope). */
  def staticBatch[T](spark: SparkSession)(f: => T): T =
    withConf(spark, "spark.sql.adaptive.enabled" -> "false")(f)
}
