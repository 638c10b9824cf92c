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

    val emb = Tables.embeddings(spark, sfDir)
    time("warmup") {
      SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
      emb.count()
    }

    import graft.operators.Similarity
    (1 to 3).foreach { pass =>
      println(s"--- pass $pass ---")
      val model = time("fitPq")(Similarity.fitPq(emb))
      val codes = Similarity.encodePq(emb, model)
      time("encodePq (noop)")(codes.write.mode("overwrite").format("noop").save())
      val out = time("pqKnn full")(
        Similarity.pqKnn(emb, emb.filter(col("vec_id") < 20), k = 5, coarseK = 20))
      time("pqKnn write")(out.write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
