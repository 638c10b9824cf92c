package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Data-selection importance weighting (the DSIR pattern: Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how target-like its hashed n-gram distribution
  * is — `log p_target(doc) − log p_raw(doc)` under two bag-of-features
  * models over the SAME hashed feature space — then keep/resample the
  * high-importance tail.
  *
  * Differs from [[QualityModel]] (a supervised linear gate with per-slot
  * weights) in that both "models" here are FIT FROM DATA distributions:
  * the weight of feature bucket `b` is the smoothed log count ratio
  * `ln[(t_b+½)/(T+½B)] − ln[(r_b+½)/(R+½B)]`, micro-rounded once at fit
  * time so document scores are exact integer sums.
  *
  * Scale shape: the fit is TWO bounded aggregates — the hashing trick caps
  * each exchange at `nBuckets` rows per map partition (partial counts),
  * and the driver holds `O(nBuckets)` longs, the same index-build state
  * class as the k-means/quantile fits. Scoring is a pure per-row kernel:
  * the weight table rides into the plan as a FOLDABLE array literal (the
  * q32 bloom pattern), so the pass is shuffle-free and explode-free at any
  * corpus size.
  */
object Importance {

  /** Smoothed per-bucket log importance weights, micro units. Index `b`
    * holds the weight of hash bucket `b`; buckets unseen in both frames
    * get the shared smoothing floor (they cancel to the constant
    * `ln[(2R+B)/(2T+B)]` — harmless, since no token maps there at score
    * time within the fitted corpus). */
  def fitWeights(target: DataFrame, raw: DataFrame, textCol: String,
      nBuckets: Int = 1 << 12): Array[Long] = {
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a positive power of two, got $nBuckets")
    def counts(df: DataFrame): Map[Int, Long] = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .groupBy(pmod(TextFunctions.hash60(col("__t")), lit(nBuckets.toLong)).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val tc = counts(target)
    val rc = counts(raw)
    val tTot = tc.values.sum
    val rTot = rc.values.sum
    // ln[(2t+1)(2R+B) / ((2r+1)(2T+B))] — the ½-smoothed ratio with the
    // halves cleared to integers, evaluated in EXACTLY this association so
    // the SQL oracle replays the same IEEE doubles before the micro-round
    Array.tabulate(nBuckets) { b =>
      val t = tc.getOrElse(b, 0L)
      val r = rc.getOrElse(b, 0L)
      val x = ((2.0 * t + 1.0) * (2.0 * rTot + nBuckets)) /
        ((2.0 * r + 1.0) * (2.0 * tTot + nBuckets))
      BigDecimal(math.log(x) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** Per-document importance score: `idCol`, `n_tokens`, and `score_e6` =
    * the exact integer sum of each token's bucket weight. Normalize by
    * `n_tokens` (or not) downstream — callers choose, as with the bigram
    * LM scores. One HOF fold per row over the token stream; the weight
    * array is a foldable literal, so the plan is a narrow map. */
  /** The per-row importance score as a composable Column — a stateless
    * fold over the token stream against the foldable weight table, so it
    * drops unchanged into batch projections and readStream pipelines. */
  def scoreColumn(text: Column, weights: Array[Long]): Column = {
    require(weights.nonEmpty && (weights.length & (weights.length - 1)) == 0,
      s"weights length must be a power of two, got ${weights.length}")
    val w: Column = typedLit(weights)
    aggregate(TextFunctions.tokens(text), lit(0L), (acc, t) =>
      acc + element_at(w,
        (pmod(TextFunctions.hash60(t), lit(weights.length.toLong)) + 1L).cast("int")))
  }

  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Long]): DataFrame =
    df.select(col(idCol),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"),
      scoreColumn(col(textCol), weights).as("score_e6"))
}
