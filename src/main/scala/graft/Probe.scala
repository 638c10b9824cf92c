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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    import graft.functions.TextFunctions._
    val docs = Tables.documents(spark, sfDir)

    time("scan+count")(docs.count())
    val ex = docs.select(col("doc_id"), explode(wordShingles(col("text"), 3)).as("sh"))
    time("exploded shingles")(ex.count())
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    import org.apache.spark.sql.expressions.Window
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val prefix = ex.join(dfreq, "sh")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
      .filter(col("pos") <=
        col("n_sh") - floor((col("n_sh") * 500 + 999) / 1000).cast("long") + 1)
      .select(col("doc_id"), col("sh"))
    time("prefix")(prefix.count())
    val cand = prefix.as("x")
      .join(prefix.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(cand.count())
    val sets = docs.select(col("doc_id"), wordShingles(col("text"), 3).as("s"))
    val verified = cand
      .join(sets.as("xa"), col("doc_a") === col("xa.doc_id"))
      .join(sets.as("xb"), col("doc_b") === col("xb.doc_id"))
      .withColumn("inter_cnt", size(array_intersect(col("xa.s"), col("xb.s"))).cast("long"))
      .withColumn("union_cnt",
        size(col("xa.s")).cast("long") + size(col("xb.s")).cast("long") - col("inter_cnt"))
      .filter(lit(1000) * col("inter_cnt") >= lit(500) * col("union_cnt"))
    time("verify")(verified.count())
    locally {
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairs(docs)
      val n = pairs.count()
      println(f"d06:pairs        ${(System.nanoTime()-t0)/1e9}%8.2f s rows=$n")
      val t1 = System.nanoTime()
      val comp = graft.operators.Dedup.components(docs, pairs)
      val m = comp.count()
      println(f"d06:components   ${(System.nanoTime()-t1)/1e9}%8.2f s rows=$m")
    }
    time("full d04")(graft.operators.Dedup.ngramJaccardPairs(docs, minPermille = 500).count())
    time("d04 noop no-sort") {
      graft.operators.Dedup.ngramJaccardPairs(docs, minPermille = 500)
        .write.mode("overwrite").format("noop").save(); 0L
    }
    time("d04 noop + orderBy") {
      graft.operators.Dedup.ngramJaccardPairs(docs, minPermille = 500)
        .orderBy(col("doc_a"), col("doc_b"))
        .write.mode("overwrite").format("noop").save(); 0L
    }
    spark.stop()
  }
}
