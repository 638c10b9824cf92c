package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Per-document keyword extraction by tf-idf-style distinctiveness — the
  * profiling stage a topic-mixture or domain-tagging pass reads first.
  *
  * The score is the exact rational `floor(1e6 * tf / df)` (term frequency
  * over document frequency, parts-per-million): monotone in tf and inverse
  * in df like classic tf·idf, but computed entirely in integer math so
  * results are bit-reproducible across engines and oracle-checkable — no
  * `ln` whose libm rounding could differ between JVM and the checker.
  *
  * Scale shape (100 TB):
  *   - tf: one exchange keyed (doc, token), map-side partials collapse
  *     repeats before the shuffle;
  *   - df: one exchange keyed token over the already-distinct tf rows —
  *     cardinality = vocabulary, not corpus;
  *   - score join: equi-join on token (AQE broadcasts when the vocabulary
  *     side is small);
  *   - per-doc top-k: ONE aggregate keyed doc whose buffer is the doc's
  *     own distinct-token list — bounded by document length, the same
  *     bound as the text itself — then a per-row sort+slice. No window
  *     function runs over the corpus and no reducer ever sees more than
  *     one document's token set per group.
  */
object Keywords {

  /** Top-`k` tokens per doc by `(score_ppm desc, token asc)`. Output:
    * `(idCol, rank 1-based, token, tf, df, score_ppm)`. Docs with no
    * tokens emit nothing. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"tfidfTopK needs k > 0, got $k")
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("token"))
      .withColumn("score_ppm", expr("CAST((1000000 * tf) DIV df AS BIGINT)"))
    // struct sort ascending on (neg score, token) = score desc, token asc;
    // (doc, token) is unique so the trailing fields never participate
    val top = scored.groupBy(col(idCol)).agg(
      slice(
        array_sort(collect_list(struct(
          (-col("score_ppm")).as("neg"), col("token"), col("tf"), col("df")))),
        1, k).as("top"))
    top.select(col(idCol), posexplode(col("top")))
      .select(col(idCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.token").as("token"),
        col("col.tf").as("tf"),
        col("col.df").as("df"),
        (-col("col.neg")).as("score_ppm"))
  }
}
