package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of graft.ops.CoreOps — the engine's
  * re-expression of the reference's *streaming* runtime semantics
  * (Kafka Streams continuous topologies), on Spark's micro-batch model.
  *
  * Semantics mapping (SURVEY.md §2.3, §2.4):
  *   - Kafka Streams emits one KTable update per input record (no
  *     suppress()): `outputMode("update")` is the faithful analogue — each
  *     micro-batch emits the current value of every (key, window) it
  *     touched.
  *   - Kafka Streams' default 24h grace ≈ `withWatermark`; the reference
  *     never tunes it, we make it an explicit parameter.
  *   - KTable (latest value per key) = `flatMapGroupsWithState` keeping one
  *     state row per key, emitting on change — a true changelog, unlike the
  *     stream-static join which only sees periodic snapshots.
  *
  * Scale: streaming state lives in the executor state stores partitioned by
  * the grouping key (`StateStoreSaveExec` / `FlatMapGroupsWithStateExec`),
  * so a 1000-executor cluster shards state horizontally; nothing here
  * touches the driver.
  */
object StreamingOps {

  /** Watermarked per-key tumbling-window aggregate — streaming form of
    * CoreOps.tumblingAgg (reference: CallsAggregationApp.java:56-78).
    *
    * Update mode ⇒ per-record KTable-changelog emission like the reference;
    * append mode + this watermark ⇒ finalized windows only.
    */
  def tumblingAggStream(
      events: DataFrame,
      tsCol: String,
      key: Column,
      value: Column,
      width: String = "1 hour",
      watermark: String = "24 hours"): DataFrame = {
    val v = floor(value).cast("long")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width).as("window"), key.cast("string").as("id_telef_origen"))
      .agg(
        count(lit(1)).as("calls_count"),
        max(v).as("max_duracion_origen"),
        sum(v).as("total_duracion_origen"))
      .withColumn(
        "avg_duracion_origen",
        floor(col("total_duracion_origen") / col("calls_count")).cast("long"))
  }

  /** KTable semantics on a changelog stream: keep the latest value per key,
    * emit the new latest on every change (reference: `builder.table(topic)`,
    * CallsEnrichedApp.java:58).
    *
    * `ord` breaks ties between the buffered state and incoming records —
    * larger wins; within a batch the last record at the max `ord` wins,
    * matching Kafka's offset order for same-timestamp upserts.
    *
    * State is one row per key in the executor state store; use with
    * `outputMode("update")`.
    */
  def latestPerKey[T: Encoder, K: Encoder](
      ds: Dataset[T],
      keyFn: T => K,
      ord: T => Long): Dataset[T] =
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[T, T](OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          var latest: Option[T] = state.getOption
          var changed = false
          rows.foreach { r =>
            if (latest.forall(l => ord(r) >= ord(l))) { latest = Some(r); changed = true }
          }
          if (changed) {
            state.update(latest.get)
            Iterator.single(latest.get)
          } else Iterator.empty
      }

  /** Windowed stream-stream equi-join — the Kafka Streams
    * `KStream.join(KStream, JoinWindows.of(bound))` shape (not used by the
    * reference's two topologies, but part of the DSL surface; SURVEY.md
    * §2.6). Records join when keys match and their event times are within
    * `bound` of each other; both sides carry watermarks so join state is
    * evicted once the window can no longer match.
    *
    * Scale: state is partitioned by the join key across executors; the
    * watermark bounds state size to (rate × bound) per side.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      bound: String,
      watermark: String,
      joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(
        right.withWatermark(rightTs, watermark),
        expr(s"""$leftKey = $rightKey AND
                |$rightTs BETWEEN $leftTs - INTERVAL $bound AND $leftTs + INTERVAL $bound
                |""".stripMargin),
        joinType)

  /** Streaming exact dedup: first record per key wins, later duplicates
    * dropped for as long as they can still arrive (the watermark delay) —
    * Spark's dropDuplicatesWithinWatermark, the streaming analogue of the
    * batch exact-dedup groupBy. State per key is evicted at the watermark,
    * so memory is bounded by (key rate × delay). */
  def streamingDedup(events: DataFrame, tsCol: String, keys: Seq[String], watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Update-mode changelog → idempotent upsert sink via foreachBatch
    * (SURVEY.md §7.5: Kafka sinks give no append-only guarantee under
    * update-mode aggregation; per-batch upserts with a batch id make
    * replays idempotent).
    *
    * `upsert(batchDf, batchId)` receives each micro-batch's changelog rows;
    * on restart a batch can be re-delivered with the same id, so sinks
    * keyed on (your key, batchId) — or overwriting by key — are
    * exactly-once from the reader's perspective.
    */
  def changelogUpsertSink(
      changelog: DataFrame,
      checkpointDir: String)(
      upsert: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changelog.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        upsert(batch.toDF(), batchId)
      }

  /** Stream⋈static left enrichment join — streaming form of
    * CoreOps.enrichLeftJoin (reference: CallsEnrichedApp.java:63 +
    * CallCustomerJoiner null-defaults). The static side is re-resolved per
    * micro-batch, so a periodically rewritten snapshot table approximates
    * the reference's read-latest KTable lookup; Catalyst broadcasts it when
    * small.
    */
  def enrichStreamStatic(
      stream: DataFrame,
      dim: DataFrame,
      joinCond: Column,
      defaults: Seq[(String, Column, Column)]): DataFrame = {
    val joined = stream.join(dim, joinCond, "left_outer")
    defaults.foldLeft(joined) { case (d, (name, c, default)) =>
      d.withColumn(name, coalesce(c, default))
    }
  }
}
