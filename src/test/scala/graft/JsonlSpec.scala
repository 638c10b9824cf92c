package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Jsonl

class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("txt", StringType),
    StructField("n", LongType)))

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft-jsonl").toString

  test("jsonl write/read roundtrip is lossless, including json-hostile strings") {
    val rows = Seq(
      (1L, "plain prose", 11L),
      (2L, "quotes \" and \\ backslash and\ttab", 0L),
      (3L, "unicode – ümlaut — dash", -5L),
      (4L, null.asInstanceOf[String], 7L))
    val dir = tempDir()
    Jsonl.write(rows.toDF("id", "txt", "n"), dir)
    val back = Jsonl.readLogAndContinue(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getAs[String]("txt"), r.getLong(2))).toSet
    assert(back === rows.toSet)
  }

  test("corrupt lines surface in _corrupt_record and are dropped by LogAndContinue") {
    val dir = tempDir()
    Jsonl.write(Seq((1L, "ok", 1L), (2L, "also ok", 2L)).toDF("id", "txt", "n"), dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.json"),
      "{\"id\": 99, \"txt\": not json at all}\nutter garbage\n".getBytes("UTF-8"))
    val permissive = Jsonl.read(spark, dir, schema)
    val rows = permissive.collect()
    assert(rows.length === 4)
    assert(rows.count(_.getAs[String]("_corrupt_record") != null) === 2)
    val kept = Jsonl.readLogAndContinue(spark, dir, schema)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L))
    assert(!Jsonl.readLogAndContinue(spark, dir, schema).columns.contains("_corrupt_record"))
  }

  test("csv roundtrip survives commas/quotes (RFC quoting); corrupt rows dropped") {
    import graft.sources.Csv
    val rows = Seq(
      (1L, "plain prose", 11L),
      (2L, "comma, inside, text", 0L),
      (3L, "a \"quoted\" phrase, with comma", -5L),
      (4L, "", 7L))
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Csv.write(rows.toDF("id", "txt", "n"), dir)
    val back = Csv.readLogAndContinue(spark, dir, schema)
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("txt")).getOrElse(""), r.getLong(2)))
      .toSet
    assert(back === rows.toSet)
    // planted corrupt row (non-numeric id) is counted, then dropped
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.csv"),
      "xyz,oops,1\n".getBytes("UTF-8"))
    // corrupt detection is projection-dependent in CSV (an unreferenced
    // bad column never parses): reference every data column
    val permissive = Csv.read(spark, dir, schema)
      .select(col("id"), col("txt"), col("n"), col("_corrupt_record"))
    assert(permissive.filter(col("_corrupt_record").isNotNull).collect().length === 1)
    val kept = Csv.readLogAndContinue(spark, dir, schema)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 3L, 4L))
  }
}
