package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CoreOps.{readableDate, readableDatePlusOneHour}

/** The reference's end-to-end topology in streaming form: watermarked
  * 1-hour tumbling call aggregation (CallsAggregationApp.createTopology)
  * enriched against a customer snapshot (CallsEnrichedApp.buildTopology),
  * output-mode `update` for per-record changelog emission.
  *
  * Input contract: a streaming DataFrame with (ts: timestamp,
  * caller: any, duration: numeric); customer snapshot: any static
  * DataFrame with a key column. Sources/sinks attach via KafkaIO or any
  * readStream source — the topology itself is source-agnostic, exactly as
  * graft.pipelines.CallsPipeline is for batch.
  */
object CallsStreamPipeline {

  def aggregate(
      calls: DataFrame,
      tsCol: String = "ts",
      caller: String = "user_id",
      duration: String = "value",
      watermark: String = "24 hours"): DataFrame =
    StreamingOps.tumblingAggStream(
      calls, tsCol, col(caller), col(duration), "1 hour", watermark)

  def enriched(
      aggregated: DataFrame,
      customers: DataFrame,
      custKey: String,
      doc: String,
      operator: String,
      flag: String,
      days: String): DataFrame =
    StreamingOps.enrichStreamStatic(
      aggregated,
      customers,
      aggregated("id_telef_origen") === customers(custKey).cast("string"),
      defaults = Seq(
        ("doc_cliente", customers(doc), lit("Unknown")),
        ("operador_actual", customers(operator), lit("Unknown")),
        ("cliente_orange", customers(flag), lit(0)),
        ("days_excliente", floor(customers(days)).cast("long"), lit(0L))))
      .select(
        readableDate(col("window.start")).as("window_start_ts"),
        readableDatePlusOneHour(col("window.start")).as("window_end_ts"),
        col("id_telef_origen"),
        col("calls_count"),
        col("max_duracion_origen"),
        col("total_duracion_origen"),
        col("avg_duracion_origen"),
        col("doc_cliente"),
        col("operador_actual"),
        col("cliente_orange"),
        col("days_excliente"))
}
