package graft

import org.apache.spark.sql.types._
import graft.streaming.{AvroSerde, KafkaIO}

/** Real Avro wire-format decode (S6) against the reference's own schemas:
  * CallAggregate (calls_agg/src/main/resources/callagg.avsc) and the
  * null-union CustomerAggregate (callaggcust.avsc). */
class AvroSerdeSpec extends SparkTestBase {
  import spark.implicits._

  // schema text mirrors callagg.avsc (reference, calls_agg resources)
  private val callAggSchema =
    """{"type":"record","name":"CallAggregate","fields":[
      |{"name":"id_telef_origen","type":"string"},
      |{"name":"window_start_ts","type":"string"},
      |{"name":"calls_count","type":"int"},
      |{"name":"max_duracion_origen","type":"long"},
      |{"name":"total_duracion_origen","type":"long"},
      |{"name":"avg_duracion_origen","type":"int"}]}""".stripMargin

  // null-union surface mirrors CustomerAggregate in callaggcust.avsc
  private val customerSchema =
    """{"type":"record","name":"CustomerAggregate","fields":[
      |{"name":"TELEFONO","type":["null","string"],"default":null},
      |{"name":"DOC_CLIENTE","type":["null","string"],"default":null},
      |{"name":"CLIENTE_ORANGE","type":["null","int"],"default":null}]}""".stripMargin

  test("avro schema maps to the expected catalyst struct") {
    val st = AvroSerde.sqlType(new org.apache.avro.Schema.Parser().parse(callAggSchema))
    assert(st === StructType(Seq(
      StructField("id_telef_origen", StringType, nullable = false),
      StructField("window_start_ts", StringType, nullable = false),
      StructField("calls_count", IntegerType, nullable = false),
      StructField("max_duracion_origen", LongType, nullable = false),
      StructField("total_duracion_origen", LongType, nullable = false),
      StructField("avg_duracion_origen", IntegerType, nullable = false))))
    val cu = AvroSerde.sqlType(new org.apache.avro.Schema.Parser().parse(customerSchema))
    assert(cu.asInstanceOf[StructType].fields.forall(_.nullable))
  }

  test("confluent-framed avro payloads decode to typed columns") {
    val bytes = AvroSerde.encodeRecord(
      Seq("600000000", "2024-01-01 10:00:00", 5, 3L, 12L, 2),
      callAggSchema, confluentHeader = true, schemaId = 7)
    val wire = Seq(("600000000", bytes)).toDF("key", "value")
    val row = KafkaIO.avroPayloadToColumns(wire, callAggSchema, confluentFramed = true)
      .collect()(0)
    assert(row.getString(0) === "600000000")
    assert(row.getString(1) === "600000000") // key, then id_telef_origen
    assert(row.getString(2) === "2024-01-01 10:00:00")
    assert(row.getInt(3) === 5)
    assert(row.getLong(4) === 3L)
    assert(row.getLong(5) === 12L)
    assert(row.getInt(6) === 2)
  }

  test("toAvro column encode round-trips through fromAvro (S4 sink wire parity)") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("600000000", "2024-01-01 10:00:00", 5, 3L, 12L, 2),
      ("700000000", "2024-01-01 11:00:00", 1, 9L, 9L, 9))
      .toDF("id_telef_origen", "window_start_ts", "calls_count",
        "max_duracion_origen", "total_duracion_origen", "avg_duracion_origen")
    // executor-side encode must agree byte-for-byte with the driver-side
    // encodeRecord twin on the same record
    val encoded = df.select(
      $"id_telef_origen",
      AvroSerde.toAvro(struct(df.columns.map(col): _*), callAggSchema).as("value"))
    val bytes = encoded.orderBy($"id_telef_origen").collect()
      .map(_.getAs[Array[Byte]]("value"))
    val expected = AvroSerde.encodeRecord(
      Seq("600000000", "2024-01-01 10:00:00", 5, 3L, 12L, 2), callAggSchema)
    assert(bytes(0).toSeq === expected.toSeq)
    // and decode back to the original columns
    val back = encoded.select(
        AvroSerde.fromAvro($"value", callAggSchema).as("v")).select($"v.*")
      .orderBy($"id_telef_origen").collect().map(_.toSeq).toSeq
    assert(back === df.orderBy($"id_telef_origen").collect().map(_.toSeq).toSeq)
  }

  test("toAvro confluent framing + null unions + tombstones round-trip") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Some("600"), Option.empty[String], Some(17)),
        (2L, Option.empty[String], Some("D2"), Option.empty[Int]))
      .toDF("k", "TELEFONO", "DOC_CLIENTE", "CLIENTE_ORANGE")
    val wire = KafkaIO.columnsToAvroPayload(df, "k", customerSchema,
      confluentHeader = true, schemaId = 9)
    val back = KafkaIO.avroPayloadToColumns(wire, customerSchema, confluentFramed = true)
      .orderBy($"key").collect().map(_.toSeq).toSeq
    assert(back === Seq(
      Seq("1", "600", null, 17),
      Seq("2", null, "D2", null)))
    // a null row (tombstone) encodes to a null payload, not a crash
    val tomb = df.select(AvroSerde.toAvro(
        when($"k" === 999L, struct($"TELEFONO", $"DOC_CLIENTE", $"CLIENTE_ORANGE")),
        customerSchema).as("value"))
      .collect().map(_.isNullAt(0))
    assert(tomb.forall(identity))
  }

  test("array-typed fields decode element-wise") {
    val schema =
      """{"type":"record","name":"R","fields":[
        |{"name":"xs","type":{"type":"array","items":"long"}},
        |{"name":"tag","type":"string"}]}""".stripMargin
    val bytes = AvroSerde.encodeRecord(
      Seq(java.util.Arrays.asList(3L, 1L, 2L), "t"), schema)
    val row = Seq(("k", bytes)).toDF("key", "value")
      .select(AvroSerde.fromAvro($"value", schema).as("v")).collect()(0).getStruct(0)
    assert(row.getSeq[Long](0) === Seq(3L, 1L, 2L))
    assert(row.getString(1) === "t")
  }

  test("decode state is reused per thread without cross-schema bleed") {
    // two schemas decoded interleaved on the same thread must not corrupt
    // each other's cached readers
    val s1 = """{"type":"record","name":"A","fields":[{"name":"x","type":"long"}]}"""
    val s2 = """{"type":"record","name":"B","fields":[{"name":"y","type":"string"}]}"""
    val b1 = AvroSerde.encodeRecord(Seq(7L), s1)
    val b2 = AvroSerde.encodeRecord(Seq("z"), s2)
    val df = Seq((b1, b2)).toDF("v1", "v2")
      .select(AvroSerde.fromAvro($"v1", s1).as("a"), AvroSerde.fromAvro($"v2", s2).as("b"))
    val r = df.collect()(0)
    assert(r.getStruct(0).getLong(0) === 7L)
    assert(r.getStruct(1).getString(0) === "z")
  }

  test("toAvro validates the struct against the writer schema and widens int->long") {
    import org.apache.spark.sql.functions._
    val schema =
      """{"type":"record","name":"W","fields":[
        |{"name":"a","type":"string"},
        |{"name":"n","type":"long"},
        |{"name":"x","type":"double"}]}""".stripMargin
    // int column feeding a long field (and float a double) encodes via
    // Avro's standard promotions instead of a per-record ClassCastException
    val df = Seq(("k", 5, 1.5f)).toDF("a", "n", "x")
    val bytes = df.select(AvroSerde.toAvro(struct($"a", $"n", $"x"), schema).as("v"))
      .collect()(0).getAs[Array[Byte]]("v")
    assert(bytes.toSeq === AvroSerde.encodeRecord(Seq("k", 5L, 1.5d), schema).toSeq)

    // Spark wraps UDF failures: search the cause chain for our message
    def chainMessages(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

    // misordered same-typed struct fails at the first record with a
    // field-level message — positional mapping would otherwise silently
    // write values into the wrong Avro fields
    val mis = intercept[Exception] {
      df.select(AvroSerde.toAvro(struct($"n", $"a", $"x"), schema).as("v")).collect()
    }
    assert(chainMessages(mis).contains("does not match writer schema"))

    // mistyped field (string column vs long field) also fails fast
    val bad = intercept[Exception] {
      df.select(AvroSerde.toAvro(struct($"a", $"a".as("n"), $"x"), schema).as("v")).collect()
    }
    assert(chainMessages(bad).contains("does not match writer schema"))

    // name matching is case-INSENSITIVE like Spark's default resolver: a
    // positionally- and type-correct struct whose field case drifted from
    // the writer schema still encodes (and to the same bytes)
    val cased = df.select(AvroSerde.toAvro(
        struct($"a".as("A"), $"n".as("N"), $"x".as("X")), schema).as("v"))
      .collect()(0).getAs[Array[Byte]]("v")
    assert(cased.toSeq === bytes.toSeq)
  }

  test("null-union fields decode to null; corrupt payloads decode to null row (S8)") {
    val good = AvroSerde.encodeRecord(Seq("t1", null, 1), customerSchema)
    val junk = Array[Byte](1, 2) // truncated body → decode error → null (LogAndContinue)
    val df = Seq(("a", good), ("b", junk)).toDF("key", "value")
    val out = df.select($"key", AvroSerde.fromAvro($"value", customerSchema).as("v"))
      .orderBy("key").collect()
    assert(out(0).getStruct(1).getString(0) === "t1")
    assert(out(0).getStruct(1).isNullAt(1))
    assert(out(0).getStruct(1).getInt(2) === 1)
    assert(out(1).isNullAt(1)) // corrupt record survives as null, stream continues
  }
}
