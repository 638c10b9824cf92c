package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: pay one-time JVM/JIT, codegen-compiler, and
    // shuffle-service startup before the first measured query, so timings
    // reflect steady-state latency (the first query otherwise absorbs ~4s
    // of infrastructure cost regardless of which query it is).
    try {
      SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
      // columnar-cache machinery (InMemoryRelation codegen + batch
      // serializer classes) is its own one-time cost — pay it here, not
      // inside the first query that persists (components)
      val w = spark.range(1000).toDF("x").persist()
      w.count()
      w.unpersist(blocking = true)
      // janino-compile the operator kernels (shingle/minhash/simhash/
      // jaccard-verify, dot-product, top-k) on tiny slices: generated-class
      // compilation is a per-plan-shape one-time cost that would otherwise
      // land in whichever query of a family happens to run first
      import graft.operators.{Dedup, Similarity}
      val tinyDocs = Tables.documents(spark, sfDir).limit(40).cache()
      val tinyEmb = Tables.embeddings(spark, sfDir).limit(40).cache()
      tinyDocs.count(); tinyEmb.count()
      Dedup.components(tinyDocs, Dedup.minhashLshPairs(tinyDocs)).count()
      Dedup.simhashPairs(tinyDocs).count()
      Dedup.ngramJaccardPairs(tinyDocs).count()
      Similarity.embeddingNearDupPairs(tinyEmb, 400000L).count()
      Similarity.bruteForceKnn(tinyEmb, tinyEmb.limit(3), k = 2).count()
      Similarity.ivfKnn(tinyEmb, tinyEmb.limit(3), k = 2, nCells = 2, nprobe = 1).count()
      tinyDocs.unpersist(blocking = true); tinyEmb.unpersist(blocking = true)
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // drop anything the warmup left cached (components pins its edges +
    // label rounds) so timed queries run against a clean memory manager
    spark.catalog.clearCache()
    // Median of 3 runs per query: single-pass timings swing ±3x under a
    // noisy neighbor, which poisons round-over-round comparison. The median
    // discards one bad run in either direction; reported total = sum of
    // medians. Reps run back-to-back per query so all three see the same
    // machine conditions.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink materializes every output column (a bare count() would
        // let Catalyst prune the projections and under-report)
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
