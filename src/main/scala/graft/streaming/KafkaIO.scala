package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Kafka source/sink adapters — the engine's analogue of the reference's
  * topic plumbing (`builder.stream(topic, Consumed.with(...))`,
  * CallsAggregationApp.java:51; `.to(topic, Produced.with(...))`,
  * CallsAggregationApp.java:85).
  *
  * Format/options are the stock `spark-sql-kafka` data source strings, so
  * this compiles against core Spark and runs wherever the Kafka connector
  * jar is on the cluster classpath (it is not in this test container —
  * covered by option-shape unit tests + MemoryStream for the semantics).
  *
  * Serde: the reference uses Avro + Schema Registry (SURVEY.md §2.1 S6).
  * `avroPayloadToColumns` is the real Avro decode path (AvroSerde, built
  * on the avro runtime in Spark's own classpath), with
  * `stripConfluentHeader` handling the registry's 5-byte magic/schema-id
  * prefix; registry *lookup* is runtime plumbing (§7.6) — the writer
  * schema is pinned at plan time, the reference's static-schema usage.
  * JSON (`payloadToColumns`/`columnsToPayload`) remains as the
  * lightweight codec for tests and debugging.
  */
object KafkaIO {

  /** Append-only stream from a topic (reference S1/S2). */
  def source(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** Batch (bounded replay) read of a topic — earliest-to-latest, the
    * reference's AUTO_OFFSET_RESET=earliest full-history replay. */
  def batchSource(spark: SparkSession, bootstrapServers: String, topic: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** Kafka sink (reference S4): expects `key`/`value` columns; everything
    * else is dropped by the connector. */
  def sink(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** Confluent wire format: 1 magic byte + 4-byte schema id before the Avro
    * body (SURVEY.md §7.5). Returns the bare payload for a decoder. */
  def stripConfluentHeader(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(value, 6, Int.MaxValue)

  /** Decode an Avro `value` payload into typed columns next to the key —
    * the reference's real serde (S6: GenericAvroSerde,
    * CallsAggregationApp.java:40-41). Built on AvroSerde (the avro runtime
    * shipped with Spark); `confluentFramed` strips the registry's 5-byte
    * header first. */
  def avroPayloadToColumns(
      df: DataFrame,
      writerSchemaJson: String,
      confluentFramed: Boolean = false): DataFrame = {
    val body = if (confluentFramed) stripConfluentHeader(col("value")) else col("value")
    df.select(
      col("key").cast("string").as("key"),
      AvroSerde.fromAvro(body, writerSchemaJson).as("v"))
      .select(col("key"), col("v.*"))
  }

  /** Decode a JSON `value` payload into typed columns next to the key —
    * the lightweight serde path (same value → struct → star-expand shape
    * as avroPayloadToColumns). */
  def payloadToColumns(df: DataFrame, schema: StructType): DataFrame =
    df.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), schema).as("v"))
      .select(col("key"), col("v.*"))

  /** Encode columns into a JSON `value` + string `key` for the sink. */
  def columnsToPayload(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Encode columns into a binary Avro `value` + string `key` for the
    * sink — the Avro-producing S4 path (the reference's output topics are
    * Avro). Non-key columns must line up with `writerSchemaJson`'s fields
    * by position, NAME, and (promotion-aware) type — toAvro validates all
    * three on the first record and rejects the batch otherwise. */
  def columnsToAvroPayload(df: DataFrame, keyCol: String, writerSchemaJson: String,
      confluentHeader: Boolean = false, schemaId: Int = 1): DataFrame =
    df.select(
      col(keyCol).cast("string").as("key"),
      AvroSerde.toAvro(
        struct(df.columns.toIndexedSeq.filter(_ != keyCol).map(col): _*),
        writerSchemaJson, confluentHeader, schemaId).as("value"))
}
