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

    val log = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val started = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val ended = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    // per-stage wall + aggregate task time, keyed by stageId — printed
    // under each query when SPARK_GRAFT_CENSUS_STAGES=1, so a heavy job
    // can be attributed to its dominant stage without the (disabled) UI
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // stage ids belonging to censused jobs (from SparkListenerJobStart's
    // stageInfos) — onStageCompleted scopes on membership here, like
    // onJobEnd scopes via `started`, so stages from non-census jobs racing
    // the record flag can never be printed (r15 advice item)
    val censusStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val wantStages = sys.env.get("SPARK_GRAFT_CENSUS_STAGES").contains("1")
    @volatile var record = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (record) {
          started.put(j.jobId, System.nanoTime())
          if (wantStages) j.stageInfos.foreach(si => censusStages.add(si.stageId))
          // the result stage (last) carries the action's callsite in its name;
          // details has the long form — first graft frame is the source
          val result = j.stageInfos.maxBy(_.stageId)
          val graftFrame = result.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobCensus"))
            .getOrElse("").trim
          // broadcast-build jobs carry no graft frame in their result
          // stage (they run on the exchange thread pool) — fish every
          // stage's details for graft frames so the census can attribute
          // WHICH operator's broadcast this was
          val anyFrames =
            if (graftFrame.nonEmpty) ""
            else j.stageInfos.flatMap(_.details.linesIterator
                .filter(l => l.contains("graft.") && !l.contains("JobCensus"))
                .take(1)).distinct.take(2).mkString(" | ")
          log.put(j.jobId,
            f"stages=${j.stageInfos.size}%2d  ${result.name}%-40s $graftFrame$anyFrames")
        }
      // NOT gated on `record`: the bus drains asynchronously, so the last
      // jobs' end events often arrive after the main thread flips record
      // off — membership in `started` already scopes what we keep
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (started.containsKey(j.jobId)) ended.put(j.jobId, System.nanoTime())
      // scoped by censusStages membership (not the record flag — the bus
      // drains asynchronously, and a non-census job racing the flag must
      // not leak its stages into the census)
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (wantStages && censusStages.contains(sc.stageInfo.stageId)) {
          val si = sc.stageInfo
          val wallMs = (for {s <- si.submissionTime; e <- si.completionTime}
            yield e - s).getOrElse(-1L)
          // taskMetrics can be null for skipped/unsubmitted stages — a
          // listener NPE is swallowed by the bus and silently drops the line
          val runMs = Option(si.taskMetrics).map(_.executorRunTime).getOrElse(-1L)
          val graftFrame = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("JobCensus"))
            .getOrElse("").trim
          stageInfo.put(si.stageId,
            f"  stage ${si.stageId}%4d wall=${wallMs}%5d ms taskSum=${runMs}%6d ms " +
              f"tasks=${si.numTasks}%3d  ${si.name.take(70)}%-70s $graftFrame")
        }
    })

    val qs = SparkEntry.queries
    names.foreach { n =>
      // warm pass (JIT + scope-clone warmup), then the recorded pass
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      log.clear(); started.clear(); ended.clear(); stageInfo.clear()
      censusStages.clear(); record = true
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(300) // let listener drain
      println(f"=== $n  t=$dt%.2f s  jobs=${log.size} ===")
      import scala.jdk.CollectionConverters._
      log.asScala.toSeq.sortBy(_._1).foreach { case (id, line) =>
        val dur = (Option(ended.get(id)), Option(started.get(id))) match {
          case (Some(e), Some(s)) => f"${(e - s) / 1e9}%6.2f s"
          case _ => "   ?   "
        }
        println(f"  job $id%4d $dur $line")
      }
      if (wantStages)
        stageInfo.asScala.toSeq.sortBy(_._1).foreach { case (_, l) => println(l) }
      spark.sparkContext.getPersistentRDDs.foreach { case (id, r) =>
        println(s"  LEAKED rdd=$id name=${r.name} ${r.toString.take(120)}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
