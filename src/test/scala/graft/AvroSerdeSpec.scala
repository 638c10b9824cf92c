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
