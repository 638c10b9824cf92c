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
    // a null count would contribute 0 to every successor's offset while
    // its own row carries null n_tokens, and a negative count shifts
    // offsets backwards — both silently corrupt the exact token-stream
    // layout this operator exists to produce; raise with the doc_id
    val guarded = when(tokenCount.cast("long") >= 0L, tokenCount.cast("long"))
      .otherwise(raise_error(concat(
        lit("packChunks: null or negative token count for doc_id="),
        coalesce(col("doc_id").cast("string"), lit("null")),
        lit(" — the count expression must be non-null and >= 0 for every row"))))
    docs.withColumn("n_tokens", guarded)
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"token_offset DIV $budget"))
  }

  /** Sliding-window chunking of each document's own token stream — the
    * context-window layout for long-document training and retrieval
    * indexing, where [[packChunks]] concatenates ACROSS documents this
    * cuts WITHIN one: chunk `i` covers tokens `[i·stride, i·stride +
    * maxTokens)` with `stride = maxTokens - overlap`, so consecutive
    * chunks share `overlap` tokens and no token of a non-empty document
    * is ever dropped (the last chunk is short rather than omitted;
    * zero-token documents yield zero chunks). A window whose tokens are
    * ALL covered by its predecessor (tail length ≤ overlap) is suppressed
    * — emitting it would duplicate the document tail verbatim in the
    * training layout, upweighting tails for roughly overlap/stride of
    * long documents.
    *
    * Chunk text is the token slice re-joined with single spaces — the
    * token-stream view (whitespace runs are not preserved; a trainer
    * tokenizes the chunk, it does not diff it against the original).
    *
    * Scale: a pure per-row tokenize + generator explode (`sequence` over
    * chunk starts) — no shuffle, no state, output rows ≈ input tokens /
    * stride regardless of how skewed document lengths are (one 10 GB
    * document becomes many rows, not one giant row... the explode is the
    * skew fix). Composes with [[packChunks]] downstream: chunk first,
    * then pack the fixed-size pieces.
    *
    * Output: input columns + `chunk_idx` (0-based), `chunk_start`
    * (token offset), `n_chunk_tokens`, `chunk_text`.
    */
  def chunkByTokens(docs: DataFrame, textCol: String, maxTokens: Int,
      overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap for maxTokens=$maxTokens")
    val out = Seq("chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_text", "__toks", "__n")
    out.filter(docs.columns.contains).foreach { c =>
      require(false, s"chunkByTokens writes column '$c' — drop or rename the input's '$c' first")
    }
    val stride = maxTokens - overlap
    docs
      .withColumn("__toks", graft.functions.TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0L)
      // last chunk start: the largest i whose window adds a token not
      // already covered by window i-1, i.e. i*stride + overlap < n ⇔
      // i ≤ (n - overlap - 1) DIV stride; clamped at 0 so chunk 0 always
      // exists (integral DIV — Column./ is double division; DIV truncates
      // toward zero but the clamp makes trunc-vs-floor moot on negatives)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          greatest(lit(0L), expr(s"(__n - 1L - $overlap) DIV $stride")))))
      // cast separately: a generator can't be nested inside other exprs
      .withColumn("chunk_idx", col("chunk_idx").cast("int"))
      .withColumn("chunk_start", col("chunk_idx").cast("long") * stride)
      .withColumn("n_chunk_tokens",
        least(lit(maxTokens.toLong), col("__n") - col("chunk_start")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), (col("chunk_start") + 1L).cast("int"),
          lit(maxTokens)), " "))
      .drop("__toks", "__n")
  }
}
