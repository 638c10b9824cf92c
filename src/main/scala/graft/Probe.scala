package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d18_trade_pagerank", "d19_weighted_pagerank",
        "d20_label_propagation", "q60_bfs_hops")
    val spark = GraftSession.create("graft-probe",
      master = Some("local[32]"), shufflePartitions = Some(32))
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    })

    def time(name: String)(f: => Long): Unit = {
      val j0 = jobs
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs=${jobs - j0}%3d  rows=$n  " +
        s"blocks=${spark.sparkContext.getPersistentRDDs.size}")
    }

    val qs = SparkEntry.queries
    // warmup
    time("warmup " + names.head)(qs(names.head)(spark, sfDir).count())
    spark.catalog.clearCache()
    (1 to 3).foreach { p =>
      names.foreach { n =>
        time(s"pass$p $n") {
          val c = qs(n)(spark, sfDir).count()
          spark.catalog.clearCache()
          c
        }
      }
    }

    // loop-only: pre-persisted edge frame, pageRank直接
    import org.apache.spark.sql.functions._
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val edges = Tables.lineitem(spark, sfDir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long").as("src"),
        col("c_nationkey").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist()
    edges.count()
    println("--- loop-only (edges persisted) ---")
    (1 to 3).foreach { p =>
      time(s"pass$p pageRank loop-only") {
        val r = graft.operators.Graphs.pageRank(edges, iters = 3)
        val n = r.count(); r.unpersist(blocking = true); n
      }
    }
    spark.stop()
  }
}
