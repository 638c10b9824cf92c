package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private val S = "\u0001" // the trainer's intra-token joint

  test("learns merges greedily by frequency with lexicographic tie-break") {
    // pair counts: (a,b)=4 (twice in doc 1), (b,c)=2, (c,a)=1 -> round 1
    // merges "a b". round 2 state: [a+b, c, a+b], [a+b, c], [a+b] ->
    // (a+b, c)=2 wins.
    val docs = Seq("a b c a b", "a b c", "a b").toDF("text")
    val rules = Bpe.trainMerges(spark, docs, k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rules === Array(
      (1, "a  b", 4L),
      (2, s"a${S}b  c", 2L)))
  }

  test("greedy left-to-right on a same-token run: 'a a a' merges once") {
    val docs = Seq("a a a", "a a").toDF("text")
    val rules = Bpe.trainMerges(spark, docs, k = 1)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(rules === Array(("a  a", 3L)))
    // applying it leaves [aa, a] for the 3-run, [aa] for the 2-run
    val enc = Bpe.encode(docs, Seq("a  a"))
      .select(col("bpe_tokens")).collect().map(_.getSeq[String](0))
    assert(enc(0) === Seq(s"a${S}a", "a"))
    assert(enc(1) === Seq(s"a${S}a"))
  }

  test("stops early when no pair repeats, instead of learning noise") {
    val docs = Seq("x y", "p q").toDF("text") // every pair occurs once
    assert(Bpe.trainMerges(spark, docs, k = 5).count() === 0L)
  }

  test("merged tokens are distinguishable from naturally-concatenated ones") {
    // 'ab' exists as a real token; merging a+b must NOT collide with it
    val docs = Seq("a b ab", "a b ab").toDF("text")
    val rules = Bpe.trainMerges(spark, docs, k = 1)
      .collect().map(_.getString(1))
    val enc = Bpe.encode(docs, rules.toSeq)
      .select(col("bpe_tokens")).head().getSeq[String](0)
    assert(enc === Seq(s"a${S}b", "ab"))
  }

  test("encode on empty text yields an empty token array") {
    val enc = Bpe.encode(Seq("").toDF("text"), Seq("a  b"))
      .select(col("bpe_tokens")).head().getSeq[String](0)
    assert(enc === Seq.empty)
  }

  test("k rounds on a rich corpus: counts shrink as merges eat occurrences") {
    val docs = Seq.fill(4)("the quick fox and the lazy dog and the bird").toDF("text")
    val rules = Bpe.trainMerges(spark, docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rules.length === 3)
    // counts are non-increasing across rounds on this stationary corpus
    assert(rules.sliding(2).forall { case Array(a, b) => a._2 >= b._2 })
  }
}
