package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Sliding-window chunking invariants (packChunks' own invariants are
  * pinned end-to-end by NorthStarSpec/CurationPipelineSpec). */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"w$i").mkString(" "))

  test("packChunks fails loudly on a null or negative token count") {
    // a null count used to contribute 0 to every successor's offset while
    // its own row carried null n_tokens — silent layout corruption
    import org.apache.spark.sql.functions.{col, when, lit}
    val docs = Seq((1L, "s", 5L), (2L, "s", -1L)).toDF("doc_id", "shard", "cnt")
    val ex = intercept[Exception] {
      Packing.packChunks(docs, "shard", budget = 10L, tokenCount = col("cnt")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("null or negative token count"))
    val nulls = Seq((1L, "s", Some(5L)), (2L, "s", Option.empty[Long]))
      .toDF("doc_id", "shard", "cnt")
    val ex2 = intercept[Exception] {
      Packing.packChunks(nulls, "shard", budget = 10L,
        tokenCount = col("cnt")).collect()
    }
    assert(msgs(ex2).contains("null or negative token count"))
  }

  test("chunkByTokens: stride windows, shared overlap, short last chunk") {
    // 10 tokens, maxTokens=4, overlap=1 → stride 3, starts 0,3,6 — the
    // window at 9 would be just "w10", already the tail of chunk 2, and
    // a fully-contained window is suppressed, not emitted
    val out = Packing.chunkByTokens(Seq(doc(1L, 10)).toDF("doc_id", "text"),
        "text", maxTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select($"chunk_idx", $"chunk_start", $"n_chunk_tokens", $"chunk_text")
      .as[(Int, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0, 0L, 4L, "w1 w2 w3 w4"),
      (1, 3L, 4L, "w4 w5 w6 w7"),
      (2, 6L, 4L, "w7 w8 w9 w10")))
    // a genuinely-new-token tail IS emitted, short
    val tail = Packing.chunkByTokens(Seq(doc(1L, 11)).toDF("doc_id", "text"),
        "text", maxTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .select($"chunk_start", $"chunk_text").as[(Long, String)].collect().toSeq
    assert(tail.last === (9L, "w10 w11"))
  }

  test("chunkByTokens: every token covered, no chunk contained in its predecessor") {
    // sweep tail lengths around the overlap boundary at t15's params
    val df = (60 to 70).map(n => doc(n.toLong, n)).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(df, "text", maxTokens = 64, overlap = 16)
      .select($"doc_id", $"chunk_start", $"n_chunk_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (n, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // coverage: last chunk reaches the last token
      assert(sorted.last._2 + sorted.last._3 === n, s"doc of $n tokens uncovered")
      // no containment: each non-first chunk ends past its predecessor
      sorted.sliding(2).foreach {
        case Seq((_, s1, l1), (_, s2, l2)) =>
          assert(s2 + l2 > s1 + l1, s"doc $n: chunk at $s2 contained in predecessor")
        case _ =>
      }
    }
  }

  test("chunkByTokens: no token dropped, every token covered at overlap 0") {
    val df = Seq(doc(1L, 7), doc(2L, 3), doc(3L, 64)).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(df, "text", maxTokens = 5, overlap = 0)
    val perDoc = out.groupBy($"doc_id")
      .agg(sum($"n_chunk_tokens").as("covered")).as[(Long, Long)]
      .collect().toMap
    assert(perDoc === Map(1L -> 7L, 2L -> 3L, 3L -> 64L))
    // concatenating disjoint chunks reproduces the token stream
    val rejoined = out.filter($"doc_id" === 1L)
      .select($"chunk_idx", $"chunk_text").as[(Int, String)]
      .collect().sortBy(_._1).map(_._2).mkString(" ")
    assert(rejoined === (1 to 7).map(i => s"w$i").mkString(" "))
  }

  test("chunkByTokens: zero-token docs emit nothing; whitespace runs collapse") {
    val df = Seq((1L, "   "), (2L, "a  b")).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(df, "text", maxTokens = 8, overlap = 2)
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect().toSeq
    assert(out === Seq((2L, "a b")))
  }

  test("chunkByTokens: guards reject bad params and column clashes") {
    val df = Seq(doc(1L, 3)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(df, "text", maxTokens = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(df, "text", maxTokens = 0, overlap = 0)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkByTokens(df.withColumn("chunk_idx", lit(1)), "text", 4, 0)
    }
  }
}
