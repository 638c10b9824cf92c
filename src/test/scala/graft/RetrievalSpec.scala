package graft

import org.apache.spark.sql.functions._
import graft.operators.{LanguageModel, Similarity, TextSearch}

/** BM25 retrieval, bigram-LM scoring, and label-centroid outlier mining —
  * fixtures small enough to verify by hand, plus an independent in-memory
  * BM25 reference so the distributed plan is checked against the formula,
  * not against itself. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("extendTextIndex ≡ rebuild over base ∪ delta, postings and stats") {
    val base = docs((1L, "the quick fox"), (2L, "quick quick data"))
    val delta = docs((3L, "fox data the the"))
    val ext = graft.operators.TextSearch.extendTextIndex(
      graft.operators.TextSearch.buildTextIndex(base, "doc_id", "text"),
      delta, "doc_id", "text")
    val full = graft.operators.TextSearch.buildTextIndex(
      base.unionByName(delta), "doc_id", "text")
    assert(ext.postings.collect().map(_.toSeq).toSet ===
      full.postings.collect().map(_.toSeq).toSet)
    assert(ext.stats.collect().map(_.toSeq).toSeq ===
      full.stats.collect().map(_.toSeq).toSeq)
    // and the probe path scores identically through either index
    val q = Seq(0L -> "quick fox")
    assert(graft.operators.TextSearch.bm25TopKWith(ext, q, k = 3)
      .collect().map(_.toSeq).toSet ===
      graft.operators.TextSearch.bm25TopKWith(full, q, k = 3)
        .collect().map(_.toSeq).toSet)
  }

  test("rrfFuse: integer point table, cross-leg sum, tie-break by doc_id") {
    // leg A ranks docs (1,2,3); leg B ranks (3,9). Points at rrfK=60:
    // rank1→16393, rank2→16129, rank3→15873. Doc 3 fuses 15873+16393 =
    // 32266 and must beat every single-leg doc; docs 2 and 9 both score
    // 16129 — the tie breaks to the lower doc_id.
    val legA = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3)).toDF("query_id", "doc_id", "rank")
    val legB = Seq((7L, 3L, 1), (7L, 9L, 2)).toDF("query_id", "doc_id", "rank")
    val got = graft.operators.TextSearch.rrfFuse(Seq(legA, legB), k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1, 3L, 15873L + 16393L),
      (2, 1L, 16393L),
      (3, 2L, 16129L),
      (4, 9L, 16129L)))
  }

  // ---- BM25 ----

  /** Straight-line in-memory BM25 (same formula, same micro-rounding):
    * the reference the distributed operator must reproduce exactly. */
  private def bm25Reference(
      corpus: Seq[(Long, String)],
      queries: Seq[(Long, String)],
      k: Int,
      k1: Double = 1.5,
      b: Double = 0.75): Seq[(Long, Int, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(' ').filter(_.nonEmpty).toSeq }
    val n = toks.size.toLong
    val sumDl = toks.map(_._2.size.toLong).sum
    val avgdl = sumDl.toDouble / n
    queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split(' ').filter(_.nonEmpty).distinct
      val scored = toks.flatMap { case (id, w) =>
        val dl = w.size.toLong
        val s = terms.map { t =>
          val tf = w.count(_ == t).toLong
          if (tf == 0) 0L
          else {
            val df = toks.count(_._2.contains(t)).toLong
            val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            math.round(1e6 * idf * (tf * (k1 + 1)) /
              (tf + k1 * ((1 - b) + b * dl / avgdl)))
          }
        }.sum
        if (s == 0L) None else Some(id -> s)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, i + 1, id, s)
      }
    }
  }

  private val corpus = Seq(
    1L -> "a a b",
    2L -> "a c",
    3L -> "c c c c",
    4L -> "z z z")
  private val queries = Seq(0L -> "a", 1L -> "b c")

  test("bm25TopK reproduces the in-memory reference exactly") {
    val got = TextSearch.bm25TopK(docs(corpus: _*), "doc_id", "text", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === bm25Reference(corpus, queries, k = 10))
  }

  test("bm25TopK: docs without any query term never appear; k caps each query") {
    val got = TextSearch.bm25TopK(docs(corpus: _*), "doc_id", "text", queries, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // doc 4 matches neither query; k=1 keeps only the best per query
    assert(!got.exists(_._2 == 4L))
    assert(got.size === 2)
  }

  test("bm25TopKWith over a built index ≡ the ad-hoc scan, exactly") {
    val adhoc = TextSearch.bm25TopK(docs(corpus: _*), "doc_id", "text", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    val index = TextSearch.buildTextIndex(docs(corpus: _*), "doc_id", "text")
    val served = TextSearch.bm25TopKWith(index, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(served.toSeq === adhoc.toSeq)
  }

  test("bm25TopKWithRelease: result matches, and the handle frees the corpus pin") {
    // earlier bm25TopK calls in this suite pinned the SAME tiny-corpus
    // plan (CacheManager dedupes canonicalized matches), which would mask
    // both the pin and the release — start from a clean cache
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val (df, release) = TextSearch.bm25TopKWithRelease(
      docs(corpus: _*), "doc_id", "text", queries, k = 10)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === bm25Reference(corpus, queries, k = 10))
    // the tokenized-corpus pin is live after the consuming action...
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "tokenized corpus was never pinned — the one-pass shape went stale")
    release()
    // ...and gone once the caller releases it
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "release handle left the tokenized corpus pinned")
  }

  test("bm25TopK breaks score ties by lower doc_id") {
    // identical docs tie exactly on every term contribution
    val tied = Seq(7L -> "t u v", 5L -> "t u v", 9L -> "other words here")
    val got = TextSearch.bm25TopK(docs(tied: _*), "doc_id", "text", Seq(0L -> "t"), k = 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(got.toSeq === Seq(5L, 7L))
  }

  // ---- bigram LM ----

  test("bigramLogProb: hand-computed left-context-normalized bigram model") {
    // big: "a b"=2, "b a"=2; ctx: a=Σc(a,·)=2, b=2; vocab {a,b,x} V=3
    // logp("a b") = logp("b a") = ln((2+0.5)/(2+0.5*3)) = ln(2.5/3.5)
    val lp = math.round(1e6 * math.log(2.5 / 3.5))
    val got = LanguageModel.bigramLogProb(
      docs(1L -> "a b a b", 2L -> "b a", 3L -> "x"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, 3L, 3 * lp), (2L, 1L, lp), (3L, 0L, 0L)))
  }

  test("bigramLogProb: repeated bigrams weight by multiplicity, not distinct") {
    // "a a a b": big "a a"=2, "a b"=1; ctx(a)=3; V=2
    val lpAA = math.round(1e6 * math.log(2.5 / (3 + 0.5 * 2)))
    val lpAB = math.round(1e6 * math.log(1.5 / (3 + 0.5 * 2)))
    val got = LanguageModel.bigramLogProb(docs(1L -> "a a a b"), "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((3L, 2 * lpAA + lpAB)))
  }

  test("scoreBigram on held-out docs: OOV bigrams drop, seen ones score") {
    // fit on "a b" only: c("a b")=1, ctx(a)=1, V={a,b}=2
    // score "a b c b a": seen "a b" -> ln(1.5/(1+0.5*2)); "b c","c b","b a" OOV
    val model = LanguageModel.fitBigramModel(docs(10L -> "a b"), "text")
    val lp = math.round(1e6 * math.log(1.5 / 2.0))
    val got = LanguageModel.scoreBigram(model, docs(20L -> "a b c b a", 21L -> "z z"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc 21 is all-OOV: present with zero evidence, not penalized
    assert(got.toSeq === Seq((20L, 1L, lp), (21L, 0L, 0L)))
  }

  // ---- label-centroid outliers ----

  private def vecs(rows: (Long, Int, Seq[Float])*) =
    rows.map { case (id, l, v) => (id, l, v.toArray) }
      .toDF("vec_id", "label", "embedding")

  test("labelOutliers: exact integer distances to the floor-div centroid") {
    // label 0: micro components (1e6,1e6),(1e6,1e6),(4e6,1e6)
    //   centroid = (floor(6e6/3), floor(3e6/3)) = (2e6, 1e6)
    //   d2: v1=1e12, v2=1e12, v3=4e12 → rank1 = v3, rank2 = v1 (tie → low id)
    val got = Similarity.labelOutliers(vecs(
      (1L, 0, Seq(1f, 1f)), (2L, 0, Seq(1f, 1f)), (3L, 0, Seq(4f, 1f))), k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      (0, 1, 3L, 4000000000000L),
      (0, 2, 1L, 1000000000000L)))
  }

  test("labelOutliers: negative sums floor toward -infinity (both engines' FLOOR)") {
    // label 1: micro xs -1e6 and 0 → sum=-1e6, n=2 → floor(-5e5) = -500000
    // d2 each = 5e5² = 2.5e11; tie broken by vec_id
    val got = Similarity.labelOutliers(vecs(
      (1L, 1, Seq(-1f)), (2L, 1, Seq(0f))), k = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, 1L, 250000000000L), (2, 2L, 250000000000L)))
  }

  test("labelOutliers: a single-member label is its own centroid at distance 0") {
    val got = Similarity.labelOutliers(vecs((8L, 3, Seq(2.5f, -7f))), k = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((3, 1, 8L, 0L)))
  }
}
