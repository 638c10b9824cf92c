package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.TopKByScore
import graft.functions.TextFunctions

/** BM25 full-text retrieval over a document corpus — the lexical half of a
  * retrieval / RAG data pipeline (Robertson & Zaragoza 2009, the BM25 in
  * every Lucene-lineage engine).
  *
  * Given a small ad-hoc query set, ranks documents by
  * `sum over query terms t of idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`
  * with `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)` (the Lucene variant —
  * always positive, no clamp needed).
  *
  * Scale shape (the part that matters at 100 TB):
  *   - ONE corpus scan, NO token explode: per-document term frequencies for
  *     the (tiny, literal) query vocabulary come from the codegen'd
  *     `termFreqs` kernel — one pass over the token array producing the
  *     aligned count vector — followed by a posexplode of that ≤|terms|
  *     array. The alternative — explode every token and filter — shuffles
  *     the whole token stream's generator output through the filter; the
  *     HOF spelling (one `filter` lambda per term) re-walks the array per
  *     term, interpreted. This never materializes non-query tokens at all.
  *   - document frequencies are a vocabulary-bounded `groupBy(term)` with
  *     map-side partials (≤ |terms| distinct keys), broadcast back.
  *   - corpus stats (N, Σdl) are a single 1-row aggregate, broadcast.
  *   - per-term contributions are micro-rounded to exact longs BEFORE the
  *     per-(query, doc) sum, so float summation order can never flip a
  *     score — the same convention as every *_e6 column in this library.
  *   - final top-k is a bounded [[TopKByScore]] heap: map-side partial
  *     heaps, ONE exchange of O(queries × k) rows. No window rank.
  *
  * For a persistent high-QPS query workload the right structure is a
  * materialized inverted index (posting lists bucketed by term — see
  * `Similarity.saveIvf` for the analogous served-index pattern); this
  * entry point is the ad-hoc/batch shape where the query set arrives with
  * the job.
  *
  * Numeric convention: `k1` and `b` should be exactly representable doubles
  * (defaults 1.5, 0.75) so `k1 + 1` and `1 - b` fold to the same IEEE
  * double on any engine that parses the decimal literal.
  */
object TextSearch {

  /** Top-`k` BM25 matches per query.
    *
    * @param docs    corpus with `idCol` (long) and `textCol` (string)
    * @param queries literal (query_id, query text) pairs; query text is
    *                tokenized with the library tokenizer (whitespace split)
    * @return (query_id, rank, doc_id, score_e6) — rank 1 = best, ties
    *         broken by lower doc id; score in micro-units (exact long)
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Int, String)],
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val qTerms: Seq[(Int, String)] = queries.flatMap { case (qid, text) =>
      text.split(' ').filter(_.nonEmpty).distinct.map(qid -> _)
    }
    val terms: Seq[String] = qTerms.map(_._2).distinct
    require(terms.nonEmpty, "bm25TopK: query set has no terms")
    val qt = qTerms.toDF("query_id", "term")

    val toks = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))

    // (doc_id, term, tf, dl) for query terms only — one codegen'd kernel
    // pass per doc, a generator over the ≤|terms| count vector (never the
    // token stream), and a codegen'd literal-array lookup for the term text
    val termArr = array(terms.map(lit): _*)
    val tf = toks.select(
      col("doc_id"), col("dl"),
      posexplode(graft.expressions.TextExpressions.termFreqs(col("w"), terms))
        .as(Seq("ti", "tf")))
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("dl"),
        element_at(termArr, col("ti") + 1).as("term"), col("tf"))

    val dfByTerm = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

    val contrib = tf
      .join(broadcast(dfByTerm), "term")
      .join(broadcast(qt), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib_e6",
        round(lit(1e6) * col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
          .cast("long"))

    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_e6")).as("score_e6"))

    // scores are micro-longs ≪ 2^53, so the double-typed heap is exact
    scored.groupBy(col("query_id"))
      .agg(TopKByScore.topK(col("score_e6").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "m")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("m.id").as("doc_id"),
        col("m.score").cast("long").as("score_e6"))
  }
}
