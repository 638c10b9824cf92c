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
    // the one quantized-family member that used to throw here (its scale
    // fit required a non-empty corpus; the in-call path now maps the
    // empty fit to an empty result like its pq/ivfpq siblings)
    assert(Similarity.quantizedKnn(noEmb, noEmb, k = 3).count() === 0L)
  }

  test("zero-norm embeddings never crash and are never anyone's neighbor") {
    // one all-zero vector in a real corpus: cosine against it is 0/0 =
    // NaN, and under ANSI round(NaN).cast(long) would kill the whole job
    // — cosE6From nulls instead, filters drop it, the heap skips it
    import org.apache.spark.sql.functions.col
    val emb = Seq(
      (0L, Seq(1f, 0f), "a"), (1L, Seq(0.9f, 0.1f), "a"),
      (2L, Seq(0f, 0f), "a") // the degenerate row
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") === 0L), k = 3)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(got === Set(1L), s"zero-norm vector leaked into the top-k: $got")
    assert(Similarity.embeddingNearDupPairs(emb, 400000L)
      .filter(col("id_a") === 2L || col("id_b") === 2L).count() === 0L)
  }

  test("round-8 retrieval/mining operators survive empty inputs") {
    // margin mining: empty queries and empty target side both collapse
    // to no pairs (nothing fails inside the two IVF builds)
    val someEmb = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.bitextMarginMine(
      someEmb, someEmb, noEmb, k = 2, nCells = 2, nprobe = 2).count() === 0L)
    assert(graft.operators.Similarity.bitextMarginMine(
      someEmb, noEmb, someEmb, k = 2, nCells = 2, nprobe = 2).count() === 0L)
    // recall sweep on an empty query set: one row per level, zero counts
    val sweep = graft.operators.Similarity.recallSweep(
      someEmb, noEmb, k = 2, nCells = 2, nprobes = Seq(1, 2)).collect()
    assert(sweep.length === 2 && sweep.forall(r => r.getLong(2) === 0L))
    // RRF over an empty leg set union: empty in, empty out, schema intact
    val noLeg = Seq.empty[(Long, Long, Int)].toDF("query_id", "doc_id", "rank")
    val fused = graft.operators.TextSearch.rrfFuse(Seq(noLeg, noLeg), k = 3)
    assert(fused.columns.toSeq === Seq("query_id", "rank", "doc_id", "rrf_e6"))
    assert(fused.count() === 0L)
    // extending an index with an empty delta changes nothing
    val someDocs2 = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val base = graft.operators.TextSearch.buildTextIndex(someDocs2, "doc_id", "text")
    val ext = graft.operators.TextSearch.extendTextIndex(base, noDocs, "doc_id", "text")
    assert(ext.postings.collect().map(_.toSeq).toSet ===
      base.postings.collect().map(_.toSeq).toSet)
    assert(ext.stats.collect().head.toSeq === base.stats.collect().head.toSeq)
  }

  test("r4 operators return empty (or all-assigned) on empty inputs") {
    // contamination: empty on either side
    val someDocs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(Dedup.contaminationPairs(noDocs, someDocs).count() === 0L)
    assert(Dedup.contaminationPairs(someDocs, noDocs).count() === 0L)
    assert(Dedup.contaminationPairs(noDocs, noDocs, maxTrainDf = Some(5L)).count() === 0L)
    // packing / splits: empty in, empty out; schema intact
    val packed = graft.operators.Packing.packChunks(
      noDocs.withColumn("source", lit("s")), "source", 8L, lit(1L))
    assert(packed.count() === 0L)
    assert(packed.columns.contains("chunk_id"))
    assert(graft.operators.Splits.hashSplit(noDocs, "doc_id",
      Seq("train" -> 900, "val" -> 50, "test" -> 50)).count() === 0L)
    assert(graft.operators.Splits.leakageSafeSplit(
      noDocs.select($"doc_id"), Seq.empty[(Long, Long)].toDF("doc_id", "component"),
      Seq("train" -> 900, "val" -> 50, "test" -> 50)).count() === 0L)
    // sketches: empty aggregates eval to null rather than throwing
    val q = Seq.empty[Long].toDF("v")
      .agg(graft.expressions.QuantileHistogram.quantiles($"v", Seq(500)).as("q"))
    assert(q.head().isNullAt(0))
    assert(graft.operators.Sketches.exactQuantilesBucketed(
      noDocs.select($"doc_id".as("g"), $"doc_id".as("v")),
      Seq("g"), "v", Seq("p50" -> 500), 10L).count() === 0L)
  }

  test("r6 operators: empty and degenerate inputs") {
    // trainingOrder: empty in, empty out, contract columns intact
    val ord = graft.operators.Splits.trainingOrder(
      noDocs.select($"doc_id"), "doc_id", nShards = 4)
    assert(ord.count() === 0L)
    assert(ord.columns.toSet === Set("doc_id", "shard", "pos"))
    // saltedJoin: empty on either side; left_outer keeps the left
    val l = Seq((1L, "x")).toDF("k", "v")
    val r = Seq((1L, "y")).toDF("k", "w")
    assert(graft.ops.ScaleOps.saltedJoin(l.limit(0), r, "k").count() === 0L)
    assert(graft.ops.ScaleOps.saltedJoin(l, r.limit(0), "k").count() === 0L)
    assert(graft.ops.ScaleOps.saltedJoin(l, r.limit(0), "k", 4, "left").count() === 1L)
    // new kernels: null text → null out; empty text → identity/empty
    val rows = Seq((1L, null: String), (2L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.TextFunctions.dedupLinesInDoc($"text").as("d"),
        graft.functions.TextFunctions.ngramList($"text", 2).as("g"))
      .orderBy($"doc_id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getString(1) === "" && rows(1).getSeq[String](2).isEmpty)
    // component-size rollup of an empty corpus is empty, not a crash
    assert(Dedup.components(noDocs, Dedup.minhashLshPairs(noDocs))
      .groupBy($"component").count().count() === 0L)
  }

  test("queries with empty query set return no neighbors from a real corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val noQueries = emb.filter(col("vec_id") < 0)
    assert(Similarity.bruteForceKnn(emb, noQueries, k = 3).count() === 0L)
    assert(Similarity.ivfKnn(emb, noQueries, k = 3, nCells = 4, nprobe = 2).count() === 0L)
  }

  test("r7-continuation operators survive empty inputs") {
    // scd2 of an empty change log: empty history, schema intact
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("k", "ts", "seq", "v")
    val hist = graft.ops.Temporal.scd2(noEvents, Seq("k"), "ts", Seq("seq"), Seq("v"))
    assert(hist.count() === 0L && hist.columns.contains("is_current"))
    // budget selection of nothing is nothing (fit sees zero classes)
    val noScored = Seq.empty[(Long, Long, Long)].toDF("id", "score", "cost")
    assert(graft.operators.Mixture.budgetSelect(noScored, "id", "score", "cost", 10L)
      .count() === 0L)
    // DSIR fit on an empty pair of frames: all-smoothing weights, scoring
    // an empty frame yields nothing
    val w = graft.operators.Importance.fitWeights(noDocs, noDocs, "text", nBuckets = 128)
    assert(w.length === 128 && w.forall(_ === w(0)))
    assert(graft.operators.Importance.scoreDocs(noDocs, "doc_id", "text", w)
      .count() === 0L)
    // collocations / projection / diversity / perceptual buckets: empty
    assert(graft.operators.Keywords.collocationsTopK(noDocs, "text").count() === 0L)
    assert(Similarity.signedProject(noEmb, "vec_id", "embedding", 64, 4).count() === 0L)
    assert(graft.multimodal.Multimodal.perceptualDupClusters(
      Seq.empty[(Long, Seq[Float])].toDF("doc_id", "feature")).count() === 0L)
  }

  test("fourth-session operators survive empty inputs") {
    val noTsRows = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("k", "ts", "seq", "v")
    // cohorts / paths of an empty stream: empty
    assert(graft.ops.Temporal.cohortRetention(noTsRows, "k", "ts").count() === 0L)
    assert(graft.ops.Temporal.eventPaths(noTsRows, "k", "ts", "seq", "v").count() === 0L)
    // CDC apply with an empty change log: base passes through untouched
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val applied = graft.ops.Temporal.applyChanges(
      base, noTsRows.withColumnRenamed("v", "op").withColumn("v", lit("x")),
      Seq("k"), "ts", Seq("seq"), "op")
    assert(applied.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b")))
    // winsorize of all-null and empty frames keeps schema, tags null
    val noVals = Seq.empty[(String, Option[Long])].toDF("g", "x")
    val w = graft.operators.Sketches.winsorize(noVals, Seq("g"), "x", 100, 900)
    assert(w.count() === 0L && w.columns.contains("winsorized"))
    // vocab growth / scene cuts / merge / PQ family: empty in, empty out
    assert(graft.operators.Keywords.vocabGrowth(noDocs, "doc_id", "text", 10L)
      .count() === 0L)
    assert(graft.multimodal.Multimodal.sceneCuts(
      Seq.empty[(Long, String, Int, Int, Int, Seq[Float])]
        .toDF("doc_id", "kind", "width", "height", "n_frames", "feature"))
      .count() === 0L)
    val noAgg = Seq.empty[(Long, Long)].toDF("k", "n")
    assert(graft.ops.ScaleOps.mergeAggregates(noAgg, noAgg, Seq("k")).count() === 0L)
    assert(Similarity.pqKnn(noEmb, noEmb, k = 2).count() === 0L)
    assert(Similarity.ivfPqKnn(noEmb, noEmb, k = 2, nCells = 2, nprobe = 1)
      .count() === 0L)
    assert(Similarity.semanticContamination(noEmb, noEmb, 500000L).count() === 0L)
    assert(graft.operators.Dedup.lshEvalReport(noDocs).count() === 1L) // one null-rate row
  }

  test("fifth-session operators survive empty inputs") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val noWEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    val noSeeds = Seq.empty[Tuple1[Long]].toDF("node")
    val noLabels = Seq.empty[(Long, Long)].toDF("node", "label")
    // graphs: empty edge sets yield empty results; empty seed sets leave
    // everything unreached / unlabeled instead of throwing
    assert(graft.operators.Graphs.bfsHops(noEdges, noSeeds, maxRounds = 3).count() === 0L)
    assert(graft.operators.Graphs.labelPropagate(noWEdges, noLabels, rounds = 2)
      .count() === 0L)
    val someEdges = Seq((1L, 2L)).toDF("src", "dst")
    val unreached = graft.operators.Graphs.bfsHops(someEdges, noSeeds, maxRounds = 3)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(unreached === Map(1L -> None, 2L -> None))
    val unlabeled = graft.operators.Graphs
      .labelPropagate(someEdges.withColumn("w", lit(1L)), noLabels, rounds = 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(unlabeled === Map(1L -> None, 2L -> None))
    // k-core: empty edge set -> empty core; self-loop-only graph too
    assert(graft.operators.Graphs.kCore(noEdges, k = 1, maxRounds = 4).count() === 0L)
    assert(graft.operators.Graphs.kCore(
      Seq((7L, 7L)).toDF("src", "dst"), k = 1, maxRounds = 4).count() === 0L)
    // BPE: a fully empty corpus learns nothing and encodes nothing
    assert(graft.operators.Bpe.trainMerges(spark, noDocs.select(col("text")), k = 3)
      .count() === 0L)
    assert(graft.operators.Bpe.encode(noDocs, Seq("a  b")).count() === 0L)
    // incremental join: empty deltas contribute nothing; empty bases fine
    val a0 = Seq((1L, 5L)).toDF("a_id", "a_k")
    val c0 = Seq((5L, "y")).toDF("c_k", "w2")
    assert(graft.ops.ScaleOps.incrementalJoin(
      a0, a0.limit(0), c0, c0.limit(0), "a_k", "c_k").count() === 0L)
    assert(graft.ops.ScaleOps.incrementalJoin(
      a0.limit(0), a0, c0.limit(0), c0, "a_k", "c_k").count() === 1L) // dA⋈dC only
  }
}
