package graft

import org.apache.spark.sql.SparkSession
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

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    time("warmup")(docs.count())

    import graft.expressions.TextExpressions
    import graft.functions.TextFunctions.hash60
    def oldBands = {
      val mhCols = (0 until 12).map(i =>
        min(hash60(concat(lit(i.toString), lit(":"), col("sh")))).as(s"mh$i"))
      docs.select(col("doc_id"), explode(TextExpressions.wordShingles(col("text"), 3)).as("sh"))
        .groupBy(col("doc_id"))
        .agg(mhCols.head, mhCols.tail: _*)
    }
    def newBands = docs.select(col("doc_id"), posexplode(
      TextExpressions.minhashBands(col("text"), 3, 12, 3)).as(Seq("band", "bh")))
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      time("old agg bands (noop)")(oldBands.write.mode("overwrite").format("noop").save())
      time("new kernel bands (noop)")(newBands.write.mode("overwrite").format("noop").save())
      time("shingleHashes only (noop)")(
        docs.select(col("doc_id"), TextExpressions.shingleHashes(col("text"), 3))
          .write.mode("overwrite").format("noop").save())
    }
    println("input partitions: " + docs.rdd.getNumPartitions)
    spark.stop()
  }
}
