package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-job dispatch census (not part of the driver contract):
  * runs named queries once and prints every driver job's callsite +
  * stage count, so a job-cut pass targets the real dispatch sources.
  * Usage: JobCensus <sfDir> <query>[,query...]
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).flatMap(_.split(',')).toSeq
    val spark = GraftSession.create("graft-jobcensus",
      master = Some("local[32]"), shufflePartitions = Some(32))
    spark.sparkContext.setLogLevel("ERROR")

    val log = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (record) {
          // the result stage (last) carries the action's callsite in its name;
          // details has the long form — first graft frame is the source
          val result = j.stageInfos.maxBy(_.stageId)
          val graftFrame = result.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobCensus"))
            .getOrElse("").trim
          log.add(f"  job ${j.jobId}%4d stages=${j.stageInfos.size}%2d  ${result.name}%-40s $graftFrame")
        }
    })

    val qs = SparkEntry.queries
    names.foreach { n =>
      // warm pass (JIT + scope-clone warmup), then the recorded pass
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      log.clear(); record = true
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(300) // let listener drain
      println(f"=== $n  t=$dt%.2f s  jobs=${log.size} ===")
      log.forEach(println(_))
      spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
        println(s"  LEAKED rdd=$id name=${r.name} ${r.toString.take(120)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
