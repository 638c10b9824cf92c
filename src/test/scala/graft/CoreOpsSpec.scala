package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.CoreOps._

/** Golden tests ported from the reference's only verified execution path
  * (CallsEnrichedAppTest.java:104-156 / CallCustomerJoinerTest.java:18-47,
  * fixtures in FIXTURES.md §1), plus the join-miss case the reference never
  * tested, plus the intended aggregate semantics of SURVEY.md §2.7.
  */
class CoreOpsSpec extends SparkTestBase {
  import spark.implicits._

  // Reference fixture: CallAggregate (callaggcust.avsc:2-13 field values from
  // CallsEnrichedAppTest.java:115-122)
  private def callAggFixture = Seq(
    (1232123412L, "600000000", 5L, 3L, 12L, 2L)
  ).toDF("WINDOW_START_TS", "ID_TELEF_ORIGEN", "CALLS_COUNT",
    "MAX_DURACION_ORIGEN", "TOTAL_DURACION_ORIGEN", "AVG_DURACION_ORIGEN")

  // Reference fixture: CustomerAggregate (CallsEnrichedAppTest.java:104-112)
  private def customerFixture = Seq(
    ("600000000", "0000000R", 0, 0, "", "")
  ).toDF("TELEFONO", "DOC_CLIENTE", "CLIENTE_ORANGE", "DAYS_EXCLIENTE",
    "OPERADOR_ACTUAL", "RIESGO")

  private def enrich(calls: org.apache.spark.sql.DataFrame,
      cust: org.apache.spark.sql.DataFrame) =
    enrichLeftJoin(calls, cust,
      calls("ID_TELEF_ORIGEN") === cust("TELEFONO"),
      defaults = Seq(
        ("doc_cliente", cust("DOC_CLIENTE"), lit("Unknown")),
        ("cliente_orange", cust("CLIENTE_ORANGE"), lit(0)),
        ("days_excliente", cust("DAYS_EXCLIENTE"), lit(0)),
        ("operador_actual", cust("OPERADOR_ACTUAL"), lit("Unknown")),
        ("riesgo", cust("RIESGO"), lit("Unknown"))))
      .select(
        readableDate(timestamp_millis(col("WINDOW_START_TS"))).as("window_start_ts"),
        readableDatePlusOneHour(timestamp_millis(col("WINDOW_START_TS"))).as("window_end_ts"),
        col("ID_TELEF_ORIGEN"), col("CALLS_COUNT"), col("MAX_DURACION_ORIGEN"),
        col("TOTAL_DURACION_ORIGEN"), col("AVG_DURACION_ORIGEN"),
        col("doc_cliente"), col("cliente_orange"), col("days_excliente"),
        col("operador_actual"), col("riesgo"))

  test("golden: enriched join matches CallsEnrichedAppTest fixture") {
    val rows = enrich(callAggFixture, customerFixture).collect()
    assert(rows.length === 1)
    val r = rows(0)
    // epoch 1232123412 ms = 1970-01-15T06:15:23.412Z (session TZ pinned UTC;
    // the reference used JVM-default TZ — documented divergence, SURVEY §7.5)
    assert(r.getString(0) === "15/01/1970 06:15")
    assert(r.getString(1) === "15/01/1970 07:15")
    assert(r.getString(2) === "600000000")
    assert(r.getLong(3) === 5L)
    assert(r.getLong(4) === 3L)
    assert(r.getLong(5) === 12L)
    assert(r.getLong(6) === 2L)
    assert(r.getString(7) === "0000000R")
    assert(r.getInt(8) === 0)
    assert(r.getInt(9) === 0)
    assert(r.getString(10) === "")
    assert(r.getString(11) === "")
  }

  test("join miss null-defaults to Unknown/0 (CallCustomerJoiner.java:24-28, untested in reference)") {
    val noMatch = customerFixture.filter(col("TELEFONO") === "nope")
    val r = enrich(callAggFixture, noMatch).collect()(0)
    assert(r.getString(7) === "Unknown")
    assert(r.getInt(8) === 0)
    assert(r.getInt(9) === 0)
    assert(r.getString(10) === "Unknown")
    assert(r.getString(11) === "Unknown")
  }

  test("tumbling agg implements intended semantics: count=5 max=3 total=12 avg=2") {
    // 5 calls in one hour window; durations 1,2,3,3,3 → the §2.7 fixture
    // metrics (integer avg = floor(12/5) = 2).
    val calls = Seq(
      ("600000000", 1.0, "2024-01-01 10:05:00"),
      ("600000000", 2.0, "2024-01-01 10:15:00"),
      ("600000000", 3.0, "2024-01-01 10:25:00"),
      ("600000000", 3.0, "2024-01-01 10:35:00"),
      ("600000000", 3.0, "2024-01-01 10:45:00")
    ).toDF("caller", "dur", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val r = tumblingAgg(calls, col("ts"), col("caller"), col("dur")).collect()(0)
    assert(r.getAs[Row]("window").getTimestamp(0).toInstant.toString === "2024-01-01T10:00:00Z")
    assert(r.getAs[Long]("calls_count") === 5L)
    assert(r.getAs[Long]("max_duracion_origen") === 3L)
    assert(r.getAs[Long]("total_duracion_origen") === 12L)
    assert(r.getAs[Long]("avg_duracion_origen") === 2L)
  }

  test("tumbling agg windows are epoch-hour-aligned and disjoint per key") {
    val calls = Seq(
      ("a", 10.0, "2024-01-01 10:59:59"),
      ("a", 20.0, "2024-01-01 11:00:00"),
      ("b", 30.0, "2024-01-01 10:30:00")
    ).toDF("caller", "dur", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val got = tumblingAgg(calls, col("ts"), col("caller"), col("dur"))
      .select(col("id_telef_origen"), col("window.start").cast("string").as("ws"), col("calls_count"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("a", "2024-01-01 10:00:00", 1L),
      ("a", "2024-01-01 11:00:00", 1L),
      ("b", "2024-01-01 10:00:00", 1L)))
  }

  test("latestByKey keeps exactly the newest row per key (KTable semantics)") {
    val updates = Seq(
      ("k1", 1L, "v1"), ("k1", 3L, "v3"), ("k1", 2L, "v2"),
      ("k2", 7L, "w7")
    ).toDF("k", "seq", "v")
    val got = latestByKey(updates, Seq(col("k")), Seq(col("seq")))
      .select("k", "v").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("k1", "v3"), ("k2", "w7")))
  }

  test("rekey casts any expression to a string key; filterNotNull drops tombstones") {
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    assert(rekey(df, col("id") * 10).select("key").as[String].collect().toSet === Set("10", "20"))
    assert(filterNotNull(df, col("v")).count() === 1L)
  }
}
