package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The schema cache's staleness contract: inference is cached per
  * (path, modification fingerprint), so a parquet table REGENERATED in
  * the same JVM (the bench / scale-curve tooling does this) gets a fresh
  * inference instead of a stale schema — a stale hit would make Spark
  * null-fill columns missing from the new footer rather than fail.
  */
class TablesSpec extends SparkTestBase {

  test("schema cache invalidates when the parquet table is regenerated with a new schema") {
    val dir = Files.createTempDirectory("tables-cache").toString
    spark.range(3).select(col("id").as("a"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(Tables.load(spark, dir, "t").schema.fieldNames.toSeq === Seq("a"))
    // ms-granularity mtimes: make sure the rewrite lands on a new tick
    Thread.sleep(1100)
    spark.range(3).select(col("id").as("a"), lit("x").as("b"))
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val second = Tables.load(spark, dir, "t")
    assert(second.schema.fieldNames.toSeq === Seq("a", "b"),
      "stale cached schema applied after regeneration")
    assert(second.filter(col("b") === "x").count() === 3)
  }

  test("schema cache HITS on an unchanged table: repeated loads dispatch zero inference jobs") {
    val dir = Files.createTempDirectory("tables-cache-hit").toString
    spark.range(5).select(col("id").as("a"))
      .write.mode("overwrite").parquet(s"$dir/u.parquet")
    val a = Tables.load(spark, dir, "u") // first load pays the inference job
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val b = Tables.load(spark, dir, "u") // unchanged fingerprint → cache hit
      assert(b.schema === a.schema)
      Thread.sleep(500) // job-start events post asynchronously
      assert(jobs.get() === 0L, s"cache miss dispatched ${jobs.get()} inference job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
