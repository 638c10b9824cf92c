package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Degenerate-input hardening: every operator must return an EMPTY result
  * on empty inputs, never throw — at 100 TB a partition-pruned scan, a
  * fully-filtered source, or a quiet time window routinely hands operators
  * zero rows, and a crash there kills the whole job. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val noDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noEmb: DataFrame =
    Seq.empty[(Long, Array[Float], String)].toDF("vec_id", "embedding", "label")

  test("dedup operators return empty on an empty corpus") {
    assert(Dedup.exactDedup(noDocs).count() === 0L)
    assert(Dedup.minhashLshPairs(noDocs).count() === 0L)
    assert(Dedup.simhashPairs(noDocs).count() === 0L)
    assert(Dedup.ngramJaccardPairs(noDocs).count() === 0L)
    assert(Dedup.dedupCorpus(noDocs, Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .count() === 0L)
  }

  test("components with no pairs labels every doc a singleton") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val got = Dedup.components(docs, Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }

  test("similarity operators return empty on an empty embedding table") {
    assert(Similarity.bruteForceKnn(noEmb, noEmb, k = 3).count() === 0L)
    assert(Similarity.ivfKnn(noEmb, noEmb, k = 3, nCells = 4, nprobe = 2).count() === 0L)
    assert(Similarity.embeddingNearDupPairs(noEmb, 400000L).count() === 0L)
  }

  test("queries with empty query set return no neighbors from a real corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val noQueries = emb.filter(col("vec_id") < 0)
    assert(Similarity.bruteForceKnn(emb, noQueries, k = 3).count() === 0L)
    assert(Similarity.ivfKnn(emb, noQueries, k = 3, nCells = 4, nprobe = 2).count() === 0L)
  }
}
