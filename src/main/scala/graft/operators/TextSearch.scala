package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.{TextExpressions, TopKByScore}
import graft.functions.TextFunctions

/** BM25 full-text retrieval over a document corpus — the lexical half of a
  * retrieval / RAG data pipeline (Robertson & Zaragoza 2009, the BM25 in
  * every Lucene-lineage engine).
  *
  * Given a query set, ranks documents by
  * `sum over query terms t of idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`
  * with `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)` (the Lucene variant —
  * always positive, no clamp needed).
  *
  * Two entry points, one scoring tail:
  *   - [[bm25TopK]] — the AD-HOC shape: the query set arrives with the
  *     job, so the corpus is scanned once with the codegen'd `termFreqs`
  *     kernel and nothing is materialized.
  *   - [[buildTextIndex]] / [[saveTextIndex]] / [[loadTextIndex]] +
  *     [[bm25TopKWith]] — the SERVING shape: posting lists are built once
  *     (the classic inverted index, one token-stream aggregation),
  *     persisted bucketed by term, and every query batch probes them with
  *     bucket pruning — zero corpus scans per query.
  *
  * Scale shape of the shared tail:
  *   - document frequencies are a vocabulary-bounded `groupBy(term)` with
  *     map-side partials (≤ |query terms| distinct keys), broadcast back;
  *     corpus stats (N, Σdl) are a 1-row aggregate, broadcast.
  *   - per-term contributions are micro-rounded to exact longs BEFORE the
  *     per-(query, doc) sum, so float summation order can never flip a
  *     score — the same convention as every *_e6 column in this library.
  *   - final top-k is a bounded [[TopKByScore]] heap: map-side partial
  *     heaps, ONE exchange of O(queries × k) rows. No window rank.
  *
  * Numeric convention: `k1` and `b` should be exactly representable doubles
  * (defaults 1.5, 0.75) so `k1 + 1` and `1 - b` fold to the same IEEE
  * double on any engine that parses the decimal literal.
  */
object TextSearch {

  /** A built inverted index: posting rows `(term, doc_id, tf, dl)` and the
    * 1-row corpus stats `(n_docs, sum_dl)`. Long-lived indexes should
    * `persist()` (or be saved bucketed via [[saveTextIndex]]) so probes
    * stop re-reading the corpus entirely. */
  final case class TextIndex(postings: DataFrame, stats: DataFrame) {
    def persist(): TextIndex = { postings.persist(); stats.persist(); this }
    def unpersist(): TextIndex = { postings.unpersist(); stats.unpersist(); this }
  }

  /** Build the inverted index: ONE token-stream aggregation whose shuffle
    * rows are map-side pre-combined to one `(term, doc)` row per distinct
    * term per doc — the index-build cost every search engine pays once per
    * corpus, amortized over every query batch after. */
  def buildTextIndex(docs: DataFrame, idCol: String, textCol: String): TextIndex = {
    val toks = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    // explode_OUTER + post-explode null filter, not plain explode (r16,
    // guide §4): explode over the projected `w` attribute lets Catalyst
    // infer `size(tokens(text))>0 AND isnotnull(tokens(text))` and push
    // it into the SCAN filter — the tokenizer kernel ran 2-3x per doc in
    // the s18 plan (scan Filter + Project). Outer explode infers
    // nothing; a token-less doc yields term=null, dropped here exactly
    // as plain explode dropped it, so postings are bit-identical.
    val postings = toks
      .select(col("doc_id"), col("dl"), explode_outer(col("w")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    TextIndex(postings, stats)
  }

  /** Incremental index maintenance — the serving-path answer to "new
    * docs arrived, don't re-tokenize the corpus" (the text twin of
    * `Similarity.extendIvf`): tokenize and aggregate ONLY the delta,
    * append its postings, and fold its (n_docs, sum_dl) into the stats
    * row. Postings are per-doc facts, so the extended index is
    * bit-identical to a full [[buildTextIndex]] over base ∪ delta — and
    * because BM25's corpus-global terms (idf via df and n_docs, avgdl)
    * are recomputed per probe from postings + stats, probe scores through
    * the extended index equal rebuild scores exactly (what the s18
    * oracle checks). Doc ids must be disjoint from the base
    * (re-ingesting a doc would double its postings). */
  def extendTextIndex(index: TextIndex, newDocs: DataFrame,
      idCol: String, textCol: String): TextIndex = {
    val delta = buildTextIndex(newDocs, idCol, textCol)
    TextIndex(
      index.postings.unionByName(delta.postings),
      index.stats.unionByName(delta.stats)
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl")))
  }

  /** Persist an index as a term-bucketed table (+ `_stats` side table):
    * probes prune to the buckets holding the query terms instead of
    * scanning all postings. */
  def saveTextIndex(index: TextIndex, table: String, numBuckets: Int,
      mode: org.apache.spark.sql.SaveMode = org.apache.spark.sql.SaveMode.ErrorIfExists): Unit = {
    graft.ops.Layout.writeBucketed(index.postings, table, Seq("term"), numBuckets, mode = mode)
    index.stats.write.mode(mode).saveAsTable(s"${table}_stats")
  }

  /** Load a persisted index ([[saveTextIndex]]'s inverse). */
  def loadTextIndex(spark: SparkSession, table: String): TextIndex =
    TextIndex(spark.table(table), spark.table(s"${table}_stats"))

  /** Top-`k` BM25 matches per query, ad-hoc shape: one corpus scan, NO
    * token explode — per-doc term frequencies for the (tiny, literal)
    * query vocabulary come from the codegen'd `termFreqs` kernel (one pass
    * over the token array producing the aligned count vector), followed by
    * a posexplode of that ≤|terms| array. Non-query tokens are never
    * materialized, and nothing is indexed.
    *
    * The tokenized corpus IS persisted for the duration of the call's
    * consuming action (see [[bm25TopKWithRelease]] for the release
    * handle): the stats leg and the tf leg both consume it, and without
    * the pin the plan executes the scan + tokenize kernel twice — the
    * A/B at sf0.1, 10 reps each, read 0.408 s (two-subtree), 0.44–0.50 s
    * (stats fetched driver-side: the head() serializes a blocking job
    * the broadcast build used to overlap), 0.331 s (this pin). Like
    * [[graft.operators.Dedup.components]]' final-round cache, losing the
    * pin recomputes correctly, just slower; one-shot callers who don't
    * release leave one cache entry per call, which is why repeat probes
    * over a big corpus belong on the served index ([[bm25TopKWith]]).
    *
    * @param docs    corpus with `idCol` (long) and `textCol` (string)
    * @param queries literal (query_id, query text) pairs; query text is
    *                tokenized with the library tokenizer (whitespace split)
    * @return (query_id, rank, doc_id, score_e6) — rank 1 = best, ties
    *         broken by lower doc id; score in micro-units (exact long)
    */
  def bm25TopK(
      docs0: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75): DataFrame =
    bm25TopKWithRelease(docs0, idCol, textCol, queries, k, k1, b)._1

  /** [[bm25TopK]] plus the release handle for its tokenized-corpus pin —
    * long-lived sessions issuing many ad-hoc probe batches should call
    * it after consuming each result, or switch to the served index. */
  def bm25TopKWithRelease(
      docs0: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, String)],
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75): (DataFrame, () => Unit) =
    // Ad-hoc scan + score is a known plan shape re-executed per call: run
    // it on a conf-isolated static scope (one driver job per action, no
    // AQE per-exchange dispatch; concurrent caller queries keep AQE).
    // The served path (buildTextIndex + bm25TopKWith) stays unscoped — a
    // long-lived index plans under its owner's conf, and its postings
    // pushdown must stay on the index frame's own plan.
    graft.ops.PlanScope.isolatedStaticFor(docs0) { scoped =>
    val docs = graft.ops.PlanScope.rebind(docs0, scoped)
    val (qt, terms) = queryTerms(docs.sparkSession, queries)
    // pinned: both the stats leg and the tf leg read this frame within
    // ONE action (the broadcast-stats build fills the cache, the main
    // leg hits it) — the pin halves corpus scans per probe batch. At
    // corpus scale MEMORY_AND_DISK trades the second scan + tokenize
    // for a one-pass spill of (id, tokens, dl); executor storage
    // pressure is the cost, which is exactly when the served index is
    // the right tool instead.
    val toks = docs.select(
      col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termArr = array(terms.map(lit): _*)
    val tf = toks.select(
      col("doc_id"), col("dl"),
      posexplode(TextExpressions.termFreqs(col("w"), terms)).as(Seq("ti", "tf")))
      .filter(col("tf") > 0)
      .select(col("doc_id"), col("dl"),
        element_at(termArr, col("ti") + 1).as("term"), col("tf"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (scoreAndRank(tf, stats, qt, k, k1, b),
      () => toks.unpersist(blocking = false))
    }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of any number of ranked
    * retrieval legs — the standard way to combine lexical (BM25) and
    * dense (ANN) results without score calibration: each leg contributes
    * `1e6 div (rrfK + rank)` per (query, doc), fused score = the sum,
    * top-`k` per query by (fused desc, doc_id). Rank-only fusion makes
    * incommensurable scores (BM25 micro-logs vs cosine micro-units)
    * composable, and the integer point table is engine-exact.
    *
    * Scale shape: input legs are already top-k'd (|Q|·k rows each), so
    * the whole fusion is one union + one grouped sum + one bounded heap —
    * nothing corpus-sized. Each leg frame needs (query_id, doc_id, rank).
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "need at least one ranked leg")
    require(k > 0 && rrfK >= 0, s"need k > 0 and rrfK >= 0, got ($k, $rrfK)")
    val pts = legs.map(_.select(
        col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .withColumn("pt", expr(s"CAST(1000000 AS BIGINT) div ($rrfK + rank)"))
    pts.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("pt")).as("rrf_e6"))
      .groupBy(col("query_id"))
      .agg(graft.expressions.TopKByScore.topK(
        col("rrf_e6").cast("double"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "m")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("m.id").as("doc_id"),
        col("m.score").cast("long").as("rrf_e6"))
  }

  /** Top-`k` BM25 matches per query against a pre-built [[TextIndex]] —
    * the serving shape: the postings filter (`term IN (...)`) reaches the
    * bucketed scan, so a probe touches only the query terms' buckets and
    * the corpus itself is never re-read. Identical results to [[bm25TopK]]
    * over the same corpus by construction (same counts, same formula). */
  def bm25TopKWith(
      index: TextIndex,
      queries: Seq[(Long, String)],
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75): DataFrame = {
    val (qt, terms) = queryTerms(index.postings.sparkSession, queries)
    val tf = index.postings.filter(col("term").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    scoreAndRank(tf, index.stats, qt, k, k1, b)
  }

  /** (query_id, term) frame + distinct term list from literal queries. */
  private def queryTerms(
      spark: SparkSession,
      queries: Seq[(Long, String)]): (DataFrame, Seq[String]) = {
    import spark.implicits._
    // distinct over the WHOLE pair set, not just per entry: a repeated
    // query id across entries (e.g. an at-least-once stream re-delivery
    // reaching hybridSearchSink) would otherwise duplicate (qid, term)
    // rows and double-count that term's contribution in scoreAndRank
    val qTerms: Seq[(Long, String)] = queries.flatMap { case (qid, text) =>
      text.split(' ').filter(_.nonEmpty).map(qid -> _)
    }.distinct
    require(qTerms.nonEmpty, "BM25: query set has no terms")
    (qTerms.toDF("query_id", "term"), qTerms.map(_._2).distinct)
  }

  /** Shared scoring tail over a `(doc_id, dl, term, tf)` frame (query
    * terms only): df/idf, micro-rounded contributions, bounded heap.
    *
    * df rides a window over `term`, NOT a grouped-aggregate broadcast:
    * the former `broadcast(tf.groupBy(term).count)` planned df's frame
    * as a SECOND copy of the whole tf subtree — on the ad-hoc path that
    * re-scanned and re-tokenized the corpus to build the broadcast (the
    * "one corpus scan" claim was false), and on the served path it paid
    * a broadcast-build driver job per probe batch. The window computes
    * df in place on the one tf frame; its hash requirement on `term`
    * aligns with the term-bucketed postings layout (served probes read
    * straight from buckets, still no corpus-side exchange), and on the
    * ad-hoc path it replaces a full re-scan with one tiny exchange of
    * the query-term rows only. */
  private def scoreAndRank(tf: DataFrame, stats: DataFrame, qt: DataFrame,
      k: Int, k1: Double, b: Double): DataFrame = {
    val contrib = tf
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
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
