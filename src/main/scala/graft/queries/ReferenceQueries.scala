package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.CoreOps._
import graft.pipelines.CallsPipeline

/** One oracle-checked query per operator of the reference surface
  * (SURVEY.md §2.1–2.5), over the driver tables (FIXTURES.md §4).
  */
object ReferenceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_rekey" -> ((s, d) => {
      // P1/P2: selectKey / map re-key (CallsAggregationApp.java:54)
      rekey(Tables.events(s, d), col("user_id"))
        .select(col("event_id"), col("key"), col("event_type"))
    }),
    "r02_filter_nonnull" -> ((s, d) => {
      // P3: tombstone filter (CallsAggregationApp.java:82)
      filterNotNull(Tables.events(s, d), col("event_type"))
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),
    "r03_tumbling_agg" -> ((s, d) => {
      // A1-A8: 1-hour tumbling count/max/sum/int-avg (CallsAggregationApp.java:56-78)
      CallsPipeline.callsAggregation(s, d)
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("id_telef_origen"), col("calls_count"), col("max_duracion_origen"),
          col("total_duracion_origen"), col("avg_duracion_origen"))
    }),
    "r04_latest_by_key" -> ((s, d) => {
      // S3: KTable latest-value-per-key (CallsEnrichedApp.java:58), exercised
      // on a genuinely duplicated key (orders per customer).
      latestByKey(
        Tables.orders(s, d),
        keys = Seq(col("o_custkey")),
        orderDesc = Seq(col("o_orderdate"), col("o_orderkey")))
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_orderdate"))
    }),
    "r05_left_join_enrich" -> ((s, d) => {
      // J1/J2: stream⋈table left join + null-defaulted projection
      // (CallsEnrichedApp.java:63, CallCustomerJoiner.java:15-30)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      enrichLeftJoin(o, c, o("o_custkey") === c("c_custkey"),
        defaults = Seq(
          ("cust_name", c("c_name"), lit("Unknown")),
          ("segment", c("c_mktsegment"), lit("Unknown"))))
        .select(col("o_orderkey"), col("o_custkey"), col("cust_name"), col("segment"))
    }),
    "r06_date_format" -> ((s, d) => {
      // F1/F2: epoch → "dd/MM/yyyy HH:mm" + plus-one-hour (CallCustomerJoiner.java:32-40)
      Tables.events(s, d)
        .select(
          col("event_id"),
          readableDate(col("ts")).as("readable_ts"),
          readableDatePlusOneHour(col("ts")).as("readable_ts_plus_1h"))
    }),
    "r07_coalesce_defaults" -> ((s, d) => {
      // F7: ternary null-defaulting ×5 (CallCustomerJoiner.java:24-28)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      c.join(su, c("c_custkey") === su("s_suppkey"), "left_outer")
        .select(
          col("c_custkey"),
          coalesce(col("s_name"), lit("Unknown")).as("supp_name"),
          coalesce(floor(col("s_acctbal")).cast("long"), lit(0L)).as("supp_acctbal"))
    }),
    "q_calls_enriched" -> ((s, d) => CallsPipeline.callsEnriched(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "r01_rekey" ->
      """SELECT event_id, CAST(user_id AS VARCHAR) AS key, event_type
        |FROM events ORDER BY event_id""".stripMargin,
    "r02_filter_nonnull" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type IS NOT NULL ORDER BY event_id""".stripMargin,
    "r03_tumbling_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       CAST(user_id AS VARCHAR) AS id_telef_origen,
        |       COUNT(*) AS calls_count,
        |       MAX(CAST(FLOOR(value) AS BIGINT)) AS max_duracion_origen,
        |       CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS total_duracion_origen,
        |       CAST(FLOOR(SUM(CAST(FLOOR(value) AS BIGINT)) / COUNT(*)) AS BIGINT) AS avg_duracion_origen
        |FROM events
        |GROUP BY date_trunc('hour', ts), user_id
        |ORDER BY CAST(id_telef_origen AS BIGINT), window_start""".stripMargin,
    "r04_latest_by_key" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |       strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "r05_left_join_enrich" ->
      """SELECT o_orderkey, o_custkey,
        |       COALESCE(c_name, 'Unknown') AS cust_name,
        |       COALESCE(c_mktsegment, 'Unknown') AS segment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "r06_date_format" ->
      """SELECT event_id,
        |       strftime(ts, '%d/%m/%Y %H:%M') AS readable_ts,
        |       strftime(ts + INTERVAL 1 HOUR, '%d/%m/%Y %H:%M') AS readable_ts_plus_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "r07_coalesce_defaults" ->
      """SELECT c_custkey,
        |       COALESCE(s_name, 'Unknown') AS supp_name,
        |       COALESCE(CAST(FLOOR(s_acctbal) AS BIGINT), 0) AS supp_acctbal
        |FROM customer LEFT JOIN supplier ON c_custkey = s_suppkey
        |ORDER BY c_custkey""".stripMargin,
    "q_calls_enriched" ->
      """WITH agg AS (
        |  SELECT date_trunc('hour', ts) AS ws,
        |         CAST(user_id AS VARCHAR) AS id_telef_origen,
        |         COUNT(*) AS calls_count,
        |         MAX(CAST(FLOOR(value) AS BIGINT)) AS max_duracion_origen,
        |         CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS total_duracion_origen,
        |         CAST(FLOOR(SUM(CAST(FLOOR(value) AS BIGINT)) / COUNT(*)) AS BIGINT) AS avg_duracion_origen
        |  FROM events GROUP BY 1, 2)
        |SELECT strftime(ws, '%d/%m/%Y %H:%M') AS window_start_ts,
        |       strftime(ws + INTERVAL 1 HOUR, '%d/%m/%Y %H:%M') AS window_end_ts,
        |       id_telef_origen, calls_count, max_duracion_origen,
        |       total_duracion_origen, avg_duracion_origen,
        |       COALESCE(c_name, 'Unknown') AS doc_cliente,
        |       COALESCE(c_mktsegment, 'Unknown') AS operador_actual,
        |       COALESCE(c_nationkey, 0) AS cliente_orange,
        |       COALESCE(CAST(FLOOR(c_acctbal) AS BIGINT), 0) AS days_excliente
        |FROM agg LEFT JOIN customer ON id_telef_origen = CAST(c_custkey AS VARCHAR)
        |ORDER BY CAST(id_telef_origen AS BIGINT), window_start_ts""".stripMargin,
  )
}
