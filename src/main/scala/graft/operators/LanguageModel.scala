package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-fit n-gram language-model scoring — the perplexity-style quality
  * signal of the CCNet / Gopher / RefinedWeb curation recipes (Wenzek et
  * al. 2020): documents whose token sequences are improbable under a model
  * fit on the corpus itself are boilerplate, garbled extraction, or
  * non-linguistic noise, and get filtered or down-weighted before training.
  *
  * Model: bigram LM, conditional MLE with additive smoothing,
  * `p(w2 | w1) = (c(w1 w2) + 0.5) / (c_ctx(w1) + 0.5 * V)`
  * where `c(w1 w2)` is the corpus bigram count, `c_ctx(w1) = Σ_w c(w1 w)`
  * the left-context total (the textbook conditional normalizer — NOT the
  * unigram count, which also counts tokens that never serve as context),
  * and `V` the unigram vocabulary size. The 0.5 constant is exactly
  * representable, so both factors of the ratio are integer-plus-exact-half
  * — the division is the same IEEE double on any engine.
  *
  * Fit and scoring are separate entry points (the [[Similarity.IvfIndex]]
  * build-once pattern): a curation pipeline fits the model on the corpus
  * once, persists the vocabulary-bounded count tables, and scores every
  * batch — including held-out or incremental ones — against the same fit.
  */
object LanguageModel {

  /** A fit bigram model: vocabulary-bounded count frames (one row per
    * distinct bigram / context token, plus a 1-row vocab size). Long-lived
    * models should `persist()` so scoring passes stop re-reading the
    * training corpus entirely. */
  final case class BigramModel(
      bigramCounts: DataFrame, // (pair, c_big)
      ctxCounts: DataFrame,    // (w1, c_ctx)
      vocab: DataFrame) {      // (v_size) — single row
    def persist(): BigramModel = {
      bigramCounts.persist(); ctxCounts.persist(); vocab.persist(); this
    }
    def unpersist(): BigramModel = {
      bigramCounts.unpersist(); ctxCounts.unpersist(); vocab.unpersist(); this
    }
  }

  /** Fit the smoothed bigram model on a corpus.
    *
    * Scale shape: bigram counts are one generator pass + a map-side-partial
    * count whose shuffle carries one row per DISTINCT bigram, not per
    * occurrence; context totals re-aggregate the bigram counts (the pair
    * exchange is computed once and reused — asserted in PlanShapeSpec);
    * vocabulary size is one count-distinct token pass. Two corpus scans
    * total, both straight scan→explode→partial-agg pipelines. */
  def fitBigramModel(docs: DataFrame, textCol: String): BigramModel = {
    val bigramCounts = docs.select(
      explode(TextFunctions.ngramList(col(textCol), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c_big"))
    // tokens cannot contain the joiner space (they come from a whitespace
    // split), so the pair's first token is recoverable exactly
    val ctxCounts = bigramCounts
      .groupBy(substring_index(col("pair"), " ", 1).as("w1"))
      .agg(sum(col("c_big")).as("c_ctx"))
    val vocab = docs.select(
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v_size"))
    BigramModel(bigramCounts, ctxCounts, vocab)
  }

  /** Score documents under a fit model.
    *
    * Scale shape: ONE corpus scan — bigram occurrences flow from the
    * generator straight into the model joins with no per-doc pre-shuffle.
    * The count tables are left unhinted: AQE broadcasts them when they fit
    * (even web-scale BPE vocab² is millions of rows, not billions), so
    * occurrences never cross the wire; if a model outgrows broadcast the
    * joins degrade to shuffle equi-joins and a per-(doc, pair) pre-
    * aggregation becomes worth re-adding. Per-bigram log-probs are
    * micro-rounded to exact longs BEFORE the per-document sum, so float
    * summation order can never flip a score. The only exchange of document
    * rows is the final groupBy(doc_id) with map-side partials.
    *
    * Output keeps the exact integer pair (`n_bigrams`, `sum_logp_e6`)
    * rather than a pre-divided average: callers pick their normalization
    * (per-token perplexity, length-binned fences) without re-running the
    * model.
    *
    * @return (doc_id, n_bigrams, sum_logp_e6): bigram count and the sum of
    *         micro-rounded `ln p(w2|w1)` over the document (0 for docs with
    *         fewer than two tokens — no evidence, not penalized). Bigrams
    *         unseen at fit time are dropped (inner join): score OOV mass
    *         with a refit, not a silently different smoothing rule.
    */
  def scoreBigram(model: BigramModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val ids = docs.select(col(idCol).as("doc_id"))
    val scored = docs.select(
      col(idCol).as("doc_id"),
      explode(TextFunctions.ngramList(col(textCol), 2)).as("pair"))
      .join(model.bigramCounts, "pair")
      .join(model.ctxCounts, substring_index(col("pair"), " ", 1) === col("w1"))
      .crossJoin(broadcast(model.vocab))
      .withColumn("logp_e6",
        round(lit(1e6) * log((col("c_big") + lit(0.5)) / (col("c_ctx") + lit(0.5) * col("v_size"))))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp_e6")).as("sum_logp_e6"))
    ids.join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_logp_e6"), lit(0L)).as("sum_logp_e6"))
  }

  /** One-shot fit-and-score on the same corpus. Runs on a conf-isolated
    * static scope (the fit's count joins and the score join are one
    * known shape — its exchanges were pure AQE dispatch on the board,
    * 11 -> ~5 driver jobs); the fit/score SPLIT path stays unscoped, so
    * a serving caller's persisted model frames plan under their owner's
    * conf. Session-width partitions (the d16 lesson: per-byte-heavy
    * token aggregates serialize under the size estimate). */
  def bigramLogProb(docs0: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.PlanScope.isolatedStatic(docs0.sparkSession) { scoped =>
      val docs = graft.ops.PlanScope.rebind(docs0, scoped)
      scoreBigram(fitBigramModel(docs, textCol), docs, idCol, textCol)
    }
}
