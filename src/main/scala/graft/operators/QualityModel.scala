package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of a pretraining
  * curation pipeline (the fastText-filter pattern: a cheap linear model
  * over hashed n-gram features gates every document; DCLM and CCNet both
  * ship this stage between heuristic scoring and packing).
  *
  * The whole model application is ONE codegen'd kernel call per row
  * ([[graft.expressions.TextKernels.hashedLinearScore]]): tokenize,
  * hash unigrams+bigrams into `nBuckets` weight slots, sum slot weights —
  * no explode, no shuffle, no UDF. Weights are exact milli-units, so the
  * decision rule is pure integer math and hash-reproducible anywhere.
  *
  * 100 TB shape: a per-row map with fixed O(nBuckets) model state — the
  * hashing trick caps model size regardless of vocabulary, which is what
  * makes the stage broadcastable at any corpus scale. Here the slot weight
  * is derived from the slot id so the DuckDB oracle can rebuild the model;
  * a trained deployment swaps that derivation for a broadcast `long[]`
  * without touching the plan shape.
  */
object QualityModel {

  /** `idCol`, `n_features`, `score_sum`, and integer `keep` (1 iff the
    * mean feature weight ≥ `thresholdMilli/1000`, i.e.
    * `score_sum >= thresholdMilli * n_features` — featureless docs pass at
    * any threshold ≤ 0, carrying no evidence either way). */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 1 << 16, thresholdMilli: Long = 0L): DataFrame = {
    val sc = graft.expressions.TextExpressions.hashedLinearScore(col(textCol), nBuckets)
    df.select(col(idCol), sc.as("sc"))
      .select(col(idCol),
        col("sc").getItem(0).as("n_features"),
        col("sc").getItem(1).as("score_sum"))
      .withColumn("keep",
        (col("score_sum") >= lit(thresholdMilli) * col("n_features")).cast("long"))
  }

  /** The rows of `df` the model keeps — the composable filter stage.
    * Stays a pure per-row filter (score inline, predicate, drop): no
    * join, no shuffle, fully pushdown-friendly. */
  def filterDocs(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 1 << 16, thresholdMilli: Long = 0L): DataFrame = {
    val sc = graft.expressions.TextExpressions.hashedLinearScore(col(textCol), nBuckets)
    df.withColumn("__qm_sc", sc)
      .filter(col("__qm_sc").getItem(1) >= lit(thresholdMilli) * col("__qm_sc").getItem(0))
      .drop("__qm_sc")
  }
}
