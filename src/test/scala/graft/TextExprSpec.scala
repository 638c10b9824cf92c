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
