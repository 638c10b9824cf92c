package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  * Reads are plain `spark.read.parquet` so Catalyst predicate pushdown /
  * column pruning reach the scan untouched.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    // rejects by default (PARQUET_TYPE_ILLEGAL). Read nanos as long and
    // convert below — set here (runtime-settable SQL conf) so it also holds
    // when the driver calls entry() with its own session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `ts` arrives as nanos-since-epoch long (see load); convert to
    * TimestampType via integer division — `DIV 1000` stays exact on longs
    * where a double division would lose precision above 2^53. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
    else raw
  }
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
