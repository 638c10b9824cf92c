package graft

/** Ad-hoc plan capture (driver tooling, not part of the contract):
  * writes `.explain("formatted")` output for named queries to files —
  * the per-round `plans/` evidence (query_before.txt / query_after.txt)
  * an optimization round commits next to its bench numbers.
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query>[,query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).flatMap(_.split(',')).toSeq
    val spark = GraftSession.create("graft-plandump",
      master = Some("local[4]"), shufflePartitions = Some(32))
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // Detaching queries end in a LocalTableScan whose formatted plan hides
    // the chain; for those, a pseudo-name `<query>__chain` renders the
    // pre-detach pipeline plan instead (same args as the board query,
    // detachBound = None) so the committed plan evidence shows the real
    // operators. Pure driver tooling — the board queries are untouched.
    import org.apache.spark.sql.functions._
    val chainFaces: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "c01_curation_e2e__chain" -> ((s, d) => {
        val planted = Tables.documents(s, d).withColumn("text", concat(
          col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(lit(" user"), col("doc_id").cast("string"), lit("@example.com")))
            .otherwise(lit(""))))
        val evalDocs = planted.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        graft.pipelines.CurationPipeline.curate(planted, evalDocs,
          contaminationPermille = 500, qualityBreakpoints = Seq(250),
          minQualityBucket = 1, packBudget = 2048, redactPii = true,
          detachBound = None)
      }),
      "c02_curation_full__chain" -> ((s, d) => {
        val planted = Tables.documents(s, d).withColumn("text",
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(col("text"), lit(" licensed sample"))).otherwise(col("text")))
        val evalDocs = planted.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        val emb = Tables.embeddings(s, d)
        graft.pipelines.CurationPipeline.curate(planted, evalDocs,
          contaminationPermille = 500, qualityBreakpoints = Seq(250),
          minQualityBucket = 1, packBudget = 2048, redactPii = false,
          intraDocDedup = false, spanScrubWindow = Some(8),
          docEmb = Some(emb.select(col("vec_id").as("doc_id"), col("embedding"))),
          evalEmb = Some(emb.filter(pmod(col("vec_id"), lit(10)) === 0)),
          semanticMinCosE6 = 400000L, detachBound = None)
      }))
    names.foreach { n =>
      val df = chainFaces.getOrElse(n, SparkEntry.queries(n))(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
