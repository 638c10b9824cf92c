package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic concat-and-chunk sequence packing — the pretraining data
  * layout: within each group, documents are concatenated in a stable
  * order (by `doc_id`) into one token stream, and the stream is cut every
  * `budget` tokens. Each document gets its absolute `token_offset` in the
  * group's stream and the `chunk_id` (= offset DIV budget) its first
  * token falls in. A document may straddle a cut — that is the semantics
  * of chunked concatenation (the trainer consumes the stream, not the
  * document boundaries).
  *
  * Everything is a pure function of (group, doc order, token counts): no
  * RNG, no first-fit state, so the layout is reproducible across runs and
  * engines, and an incremental re-pack of one group never moves another
  * group's chunks.
  *
  * Scale: one shuffle on the group column, then an in-partition running
  * sum. Groups are the packing shards (source, date, …) — bounded by
  * construction, so the per-group window never funnels a corpus through
  * one task. The running sum is the textbook prefix-sum window; Spark
  * executes it streaming within the sorted partition, O(1) state.
  */
object Packing {

  /** Adds `n_tokens`, `token_offset`, `chunk_id` to `docs`.
    *
    * `docs` must carry a `doc_id` column — it is the stable within-shard
    * concatenation order (reproducibility depends on it being unique per
    * row; ties would make offsets order-dependent). The three output
    * column names must not already exist on the input: silently
    * overwriting a caller's `n_tokens` would corrupt the layout, so that
    * is rejected up front. `tokenCount` must be deterministic — the
    * layout-reproducibility guarantee is only as deterministic as the
    * count expression feeding it.
    *
    * @param groupCol   packing shard column (stream boundary)
    * @param budget     tokens per chunk, > 0
    * @param tokenCount column computing each doc's token count
    */
  def packChunks(docs: DataFrame, groupCol: String, budget: Long,
      tokenCount: Column): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(docs.columns.contains("doc_id"),
      "packChunks needs a doc_id column (the within-shard concatenation order)")
    Seq("n_tokens", "token_offset", "chunk_id").foreach { c =>
      require(!docs.columns.contains(c),
        s"packChunks writes column '$c' — drop or rename the input's '$c' first")
    }
    val w = Window.partitionBy(col(groupCol)).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"token_offset DIV $budget"))
  }
}
