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
    // entry spread (PlanScope.spreadIfSmall): tokenize + explode + the
    // (doc, token) partial count all run in the scan stage — ONE task on
    // a one-split input (single-row-group parquet). No-op at scale.
    val tf = graft.ops.PlanScope.spreadIfSmall(docs, idCol)
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

  /** Corpus-level collocation mining — the PMI-style phrase detector a
    * tokenizer/phrase-vocabulary pass runs over the raw token stream
    * (word2vec's phrase pass, Gensim `Phrases`): adjacent pairs ranked by
    * LIFT, observed pair count over the count expected under unigram
    * independence.
    *
    * `lift_ppm = ⌊1e6 · n_pair · U / (n_w1 · n_w2)⌋` with `U` the total
    * token count — monotone in the PMI numerator `p(xy)/(p(x)p(y))` (the
    * corpus constants shift every pair equally), but computed entirely in
    * integer math: exact, engine-portable, no `ln` (same stance as the
    * tf-idf score above). A `minCount` fence drops one-off pairs whose
    * lift is pure noise — standard in every phrase-mining setup.
    *
    * Scale shape: unigram and bigram counts are two exchanges bounded by
    * vocabulary (map-side partials collapse repeats); the unigram joins
    * are vocabulary-sized equi-joins (AQE broadcasts the small side); the
    * top-k is TakeOrderedAndProject — per-partition heaps, k rows to the
    * driver, no global sort. Long arithmetic overflows are a hard error
    * under ANSI mode, not silence — at corpora where `1e6·n_pair·U`
    * outgrows a long (~10^18), pre-scale U to thousands.
    */
  def collocationsTopK(docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 30): DataFrame = {
    require(k > 0, s"collocationsTopK needs k > 0, got $k")
    require(minCount >= 1, s"collocationsTopK needs minCount >= 1, got $minCount")
    // NO entry spread here, deliberately: a round-robin spread of the
    // text projection A/B'd 0.41 -> 0.70 s on the t34 board shape — the
    // vocabulary joins after the counts dominate, and the extra exchange
    // plus its local sort cost more than the parallelized tokenize saved.
    val uni = docs.select(explode(tokens(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val big = docs
      .select(explode(graft.functions.TextFunctions.ngramList(col(textCol), 2)).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n_pair"))
    val u = uni.agg(sum(col("c")).cast("long").as("u"))
    big.filter(col("n_pair") >= minCount)
      // tokens are whitespace-split, so the single interior space is the
      // unambiguous pair separator
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .withColumn("w2", substring_index(col("pair"), " ", -1))
      .join(uni.select(col("t").as("w1"), col("c").as("n_w1")), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("c").as("n_w2")), Seq("w2"))
      .crossJoin(broadcast(u))
      .withColumn("lift_ppm", expr("(1000000 * n_pair * u) DIV (n_w1 * n_w2)"))
      .orderBy(col("lift_ppm").desc, col("pair"))
      .limit(k)
      .select(col("pair"), col("n_pair"), col("n_w1"), col("n_w2"), col("lift_ppm"))
  }

  /** Vocabulary-growth (Heaps-law) curve at bucket granularity: for each
    * ingestion bucket of `bucketSize` docs (by `idCol` order — the
    * training order), how many NEVER-SEEN-BEFORE token types it
    * introduces, and the cumulative vocabulary after it — the curve that
    * says when a corpus stops teaching a tokenizer new types.
    *
    * Scale shape: token first-occurrence is ONE exchange keyed token
    * (min doc id per type — map-side partials, cardinality = vocabulary),
    * rolled up to |corpus|/bucketSize bucket rows; the cumulative sum
    * runs over THAT bucket frame, never over docs or tokens (the
    * per-doc curve would drag a window across the corpus; the bucket
    * granularity is the honest scale shape AND the chart anyone reads).
    * Buckets introducing nothing new still appear (count 0).
    *
    * @return (bucket, new_types, cum_types) ordered-agnostic rows;
    *         bucket = floor(id / bucketSize)
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      bucketSize: Long): DataFrame = {
    require(bucketSize >= 1, s"vocabGrowth needs bucketSize >= 1, got $bucketSize")
    val firstSeen = docs
      .select(col(idCol).as("__id"), explode(array_distinct(tokens(col(textCol)))).as("t"))
      .groupBy(col("t")).agg(min(col("__id")).as("first_id"))
      .groupBy(expr(s"first_id DIV $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val buckets = docs
      .select(expr(s"$idCol DIV $bucketSize").as("bucket")).distinct()
    buckets.join(firstSeen, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types", sum(col("new_types")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
  }
}
