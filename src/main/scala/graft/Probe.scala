package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)

    // warm up like Bench does (kernel codegen, cache machinery)
    time("warmup") {
      SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
      val w = spark.range(1000).toDF("x").persist(); w.count(); w.unpersist(blocking = true)
      val tiny = docs.limit(40).cache(); tiny.count()
      graft.operators.Dedup.components(tiny, graft.operators.Dedup.minhashLshPairs(tiny)).count()
      tiny.unpersist(blocking = true)
      spark.catalog.clearCache()
    }

    // --- d06 decomposed, instrumented copy of Dedup.components ---
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val pairs = graft.operators.Dedup.minhashLshPairs(docs)
      time("pairs alone (noop)") {
        pairs.write.mode("overwrite").format("noop").save()
      }
      def cut(df: DataFrame): DataFrame =
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val edges = pairs
        .select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("dst"))
      val edgesChk = cut(edges)
      val nEdges = time("edges persist+count")(edgesChk.count())
      println(s"    edges=$nEdges")
      val labels0 = cut(edgesChk
        .groupBy(col("src").as("doc_id"))
        .agg(least(min(col("dst")), col("src")).as("component")))
      var labels = labels0
      var prevRound: Option[DataFrame] = Some(labels0)
      var round = 0
      var converged = false
      while (!converged && round < 20) {
        val propagated = edgesChk
          .join(labels, col("dst") === col("doc_id"))
          .groupBy(col("src").as("doc_id"))
          .agg(min(col("component")).as("nbr_min"))
        val next = cut(labels.as("l")
          .join(propagated.as("p"), Seq("doc_id"), "left_outer")
          .select(col("doc_id"),
            least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"),
            coalesce(col("nbr_min") < col("component"), lit(false)).as("__changed")))
        val changed = time(s"round $round (count changed)")(next.filter(col("__changed")).count())
        println(s"    changed=$changed")
        converged = changed == 0L
        prevRound.foreach(df => df.unpersist(blocking = false))
        prevRound = Some(next)
        labels = next.drop("__changed")
        round += 1
      }
      edgesChk.unpersist(blocking = false)
      val singletons = docs.select(col("doc_id"))
        .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("component"))
      time("union+singletons (noop)") {
        labels.union(singletons).write.mode("overwrite").format("noop").save()
      }
      prevRound.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      // whole operator as the bench sees it
      time("d06 end-to-end (noop)") {
        graft.operators.Dedup.components(docs, graft.operators.Dedup.minhashLshPairs(docs))
          .write.mode("overwrite").format("noop").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
