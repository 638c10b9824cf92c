package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.TextFunctions._

/** The codegen'd text kernels must be bit-identical to the builtin
  * (HOF-expression) forms they replaced — checked on the real sf0.001
  * corpus plus adversarial edge strings.
  */
class TextExprSpec extends SparkTestBase {
  import spark.implicits._

  private val edge = Seq(
    "", " ", "   ", "a", "a b", "a b c", "a  b   c", " leading", "trailing ",
    "x y z w v u", "dup dup dup dup", "mixed CASE 123 #punct!", "ünïcödé tökens herë")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def corpus = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    docs.union(edge.toDF("doc_id", "text").select($"doc_id" + 1000000, $"text"))
  }

  private def assertSame(fast: org.apache.spark.sql.Column, slow: org.apache.spark.sql.Column): Unit = {
    val diffs = corpus.select(fast.as("f"), slow.as("s"))
      .filter(not($"f" <=> $"s")).count()
    assert(diffs === 0L)
  }

  test("tokens kernel ≡ filter(split) HOF")(
    assertSame(tokens($"text"), TextFunctions.tokensHof($"text")))

  test("wordShingles kernel ≡ transform/sequence HOF, n=2,3,5") {
    for (n <- Seq(2, 3, 5))
      assertSame(wordShingles($"text", n), TextFunctions.wordShinglesHof($"text", n))
  }

  test("ngramRepetition kernel ≡ count-by-gram HOF, n=1,3") {
    for (n <- Seq(1, 3))
      assertSame(TextFunctions.ngramRepetition($"text", n),
        TextFunctions.ngramRepetitionHof($"text", n))
  }

  test("ngramRepetition counts: total/distinct/max on a known string") {
    // 5 words, 4 distinct, "dup" ×2; trigrams: 3 total, all distinct
    val r = Seq((1L, "dup a dup b c")).toDF("doc_id", "text")
      .select(TextFunctions.ngramRepetition($"text", 1).as("r1"),
        TextFunctions.ngramRepetition($"text", 3).as("r3"))
      .collect()(0)
    assert(r.getSeq[Long](0) === Seq(5L, 4L, 2L))
    assert(r.getSeq[Long](1) === Seq(3L, 3L, 1L))
    // shorter than n: all-zero sentinel
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(TextFunctions.ngramRepetition($"text", 3).as("r")).collect()(0)
    assert(short.getSeq[Long](0) === Seq(0L, 0L, 0L))
  }

  test("hash60 kernel ≡ conv(substring(md5)) builtins") {
    assertSame(hash60($"text"), TextFunctions.hash60Hof($"text"))
    // and on tokens, where minhash applies it
    assertSame(
      transform(tokens($"text"), t => hash60(t)),
      transform(tokens($"text"), t => TextFunctions.hash60Hof(t)))
  }

  test("fingerprint kernel ≡ pmod-fold HOF")(
    assertSame(fingerprint($"text"), TextFunctions.fingerprintHof($"text")))

  test("simhash32 kernel ≡ vote-aggregate HOF")(
    assertSame(simhash32($"text"), TextFunctions.simhash32Hof($"text")))

  test("alpha/avg-len permille kernels ≡ HOF forms") {
    assertSame(alphaPermille($"text"), TextFunctions.alphaPermilleHof($"text"))
    assertSame(avgTokenLenPermille($"text"), TextFunctions.avgTokenLenPermilleHof($"text"))
  }
}
