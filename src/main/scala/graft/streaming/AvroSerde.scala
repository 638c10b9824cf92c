package graft.streaming

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Real Avro wire-format serde (reference S6: GenericAvroSerde /
  * SpecificAvroSerde, CallsAggregationApp.java:40-41,116-118 and
  * CallsEnrichedApp.java:70-79), built directly on the `org.apache.avro`
  * runtime that ships with Spark — no spark-avro module needed.
  *
  * `fromAvro(value, writerSchemaJson)` decodes a binary Avro payload into a
  * typed struct column; compose with `KafkaIO.stripConfluentHeader` for
  * registry-framed topics (magic byte + 4-byte schema id). `toAvro` is the
  * inverse for sinks and tests. The supported schema surface is what the
  * reference's schemas use (records of string/int/long/float/double/
  * boolean/bytes, arrays, and `["null", T]` unions — see callagg.avsc /
  * callaggcust.avsc); anything else fails fast at schema-mapping time.
  *
  * Scale notes: decode is a per-row JVM UDF (no codegen), but the parsed
  * `Schema` is cached per executor and the DatumReader/BinaryDecoder are
  * reused per task thread, so the cost is the Avro binary walk itself —
  * equivalent to what spark-avro's AvroDataToCatalyst does. In a
  * registry-backed deployment the schema id in the header selects the
  * writer schema; here the writer schema is pinned at plan time, which is
  * the reference's static-schema usage.
  */
object AvroSerde {

  /** Map an Avro schema to the Catalyst type it decodes to. */
  def sqlType(schema: Schema): DataType = schema.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(sqlType(schema.getElementType))
    case Schema.Type.RECORD =>
      StructType(schema.getFields.asScala.toSeq.map { f =>
        StructField(f.name, sqlType(nonNullBranch(f.schema)), nullable = isNullable(f.schema))
      })
    case Schema.Type.UNION => sqlType(nonNullBranch(schema))
    case other =>
      throw new IllegalArgumentException(
        s"avro type $other not in the supported serde surface (see AvroSerde scaladoc)")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1, s"only [null, T] unions supported, got $s")
      branches.head
    }

  // Corrupt varint length fields must fail as decode errors, not as a
  // near-2GB allocation attempt: cap Avro's string/bytes read sizes (64 MB
  // default, overridable by setting the standard properties first). This
  // turns the malformed-length case into an AvroRuntimeException handled
  // by the S8 corrupt→null policy below.
  for (p <- Seq("org.apache.avro.limits.string.maxLength",
      "org.apache.avro.limits.bytes.maxLength"))
    if (System.getProperty(p) == null) System.setProperty(p, (64 << 20).toString)

  // Parsed-schema cache: Schema parsing is expensive and the JSON string is
  // the stable task-serializable form, so executors parse each distinct
  // schema once.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private def parsed(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  // Per-thread decode state: DatumReader construction recomputes the
  // schema's resolving structure and BinaryDecoder allocation is per-call
  // garbage — both are reused across rows on each task thread (readers are
  // not thread-SHARED, so no synchronization is needed).
  private final class DecodeState {
    val readers = new java.util.HashMap[String, GenericDatumReader[GenericRecord]]()
    var decoder: org.apache.avro.io.BinaryDecoder = _
  }
  private val threadState = ThreadLocal.withInitial[DecodeState](() => new DecodeState)

  private def fromAvroValue(v: Any, schema: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case r: GenericRecord => genericToRow(r, nonNullBranch(schema))
    case bb: java.nio.ByteBuffer =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case c: java.util.Collection[_] =>
      val et = nonNullBranch(schema).getElementType
      c.asScala.map(fromAvroValue(_, et)).toSeq
    case x => x
  }

  private def genericToRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map { f =>
      fromAvroValue(rec.get(f.pos), nonNullBranch(f.schema))
    })

  /** Decode a binary Avro column written with `writerSchemaJson` into a
    * struct column (spark-avro's `from_avro` shape). Malformed payloads
    * decode to null — the LogAndContinue policy (S8), same as the JSON
    * path's PERMISSIVE mode. */
  def fromAvro(data: Column, writerSchemaJson: String): Column = {
    val schema = parsed(writerSchemaJson)
    require(schema.getType == Schema.Type.RECORD, "fromAvro expects a record schema")
    val st = sqlType(schema).asInstanceOf[StructType]
    val decode = new UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row = {
        if (bytes == null) return null
        try {
          val s = parsed(writerSchemaJson)
          val st = threadState.get()
          var reader = st.readers.get(writerSchemaJson)
          if (reader == null) {
            reader = new GenericDatumReader[GenericRecord](s)
            st.readers.put(writerSchemaJson, reader)
          }
          st.decoder = DecoderFactory.get().binaryDecoder(bytes, st.decoder)
          genericToRow(reader.read(null, st.decoder), s)
        } catch {
          // includes corrupt-length AvroRuntimeExceptions (see the size
          // limits above); genuine heap exhaustion still fails the task
          case scala.util.control.NonFatal(_) => null
        }
      }
    }
    udf(decode, st).apply(data)
  }

  // Per-thread encode state, mirroring DecodeState: DatumWriter and
  // BinaryEncoder reused across rows, output buffer reset per record.
  private final class EncodeState {
    val writers = new java.util.HashMap[String, GenericDatumWriter[GenericRecord]]()
    // struct instance validated per writer schema on this thread — keyed
    // like `writers` so a projection encoding TWO schemas doesn't thrash
    // (a single slot would alternate every row and re-walk the fields per
    // record); reference equality on the value is enough because a
    // projection reuses one StructType instance per column
    val validated = new java.util.HashMap[String, StructType]()
    val out = new ByteArrayOutputStream()
    var encoder: org.apache.avro.io.BinaryEncoder = _
  }
  private val encodeThreadState =
    ThreadLocal.withInitial[EncodeState](() => new EncodeState)

  private def toAvroValue(v: Any, schema: Schema): Any = {
    val s = nonNullBranch(schema)
    v match {
      case null => null // non-nullable field: the writer fails the task (our own data being malformed is a bug, not an S8 skip)
      case r: Row => rowToGeneric(r, s)
      case seq: scala.collection.Seq[_] =>
        seq.map(toAvroValue(_, s.getElementType)).asJava
      case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
      // Avro's standard promotions, applied eagerly so an int column can
      // feed a long field (and float a double) instead of failing in the
      // DatumWriter with a per-record ClassCastException
      case i: java.lang.Integer if s.getType == Schema.Type.LONG =>
        java.lang.Long.valueOf(i.longValue())
      case f: java.lang.Float if s.getType == Schema.Type.DOUBLE =>
        java.lang.Double.valueOf(f.doubleValue())
      case x => x // string/int/long/float/double/boolean map 1:1
    }
  }

  /** Mismatches between a Spark struct type and the Avro record schema it
    * is being encoded with — empty means every field lines up by position,
    * name, and (promotion-aware) type. Encoding maps fields by position, so
    * without this check misordered same-typed columns would silently write
    * values into the wrong Avro fields. */
  private def structErrors(st: StructType, schema: Schema, path: String = ""): Seq[String] = {
    val af = schema.getFields.asScala.toSeq
    if (st.length != af.length)
      Seq(s"struct has ${st.length} fields but avro record '${schema.getFullName}' has ${af.length} (at '$path')")
    else st.fields.toSeq.zip(af).flatMap { case (sf, f) =>
      val fieldPath = if (path.isEmpty) f.name else s"$path.${f.name}"
      // case-INSENSITIVE, matching Spark's default resolver: a struct
      // field that resolved fine in the plan should not fail the encode
      // because its case drifted from the writer schema's
      if (!sf.name.equalsIgnoreCase(f.name))
        Seq(s"struct field '${sf.name}' is at avro field '${f.name}''s position (at '$fieldPath')")
      else typeErrors(sf.dataType, f.schema, fieldPath)
    }
  }

  private def typeErrors(dt: DataType, schema: Schema, fieldPath: String): Seq[String] = {
    val a = nonNullBranch(schema)
    (dt, a.getType) match {
      case (StringType, Schema.Type.STRING) => Nil
      case (IntegerType, Schema.Type.INT) => Nil
      case (IntegerType, Schema.Type.LONG) => Nil // widened in toAvroValue
      case (LongType, Schema.Type.LONG) => Nil
      case (FloatType, Schema.Type.FLOAT) => Nil
      case (FloatType, Schema.Type.DOUBLE) => Nil // widened in toAvroValue
      case (DoubleType, Schema.Type.DOUBLE) => Nil
      case (BooleanType, Schema.Type.BOOLEAN) => Nil
      case (BinaryType, Schema.Type.BYTES) => Nil
      case (ArrayType(et, _), Schema.Type.ARRAY) =>
        typeErrors(et, a.getElementType, s"$fieldPath[]")
      case (nested: StructType, Schema.Type.RECORD) => structErrors(nested, a, fieldPath)
      case (sdt, at) =>
        Seq(s"struct field is $sdt but avro field is $at (at '$fieldPath')")
    }
  }

  private def rowToGeneric(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      rec.put(f.pos, toAvroValue(row.get(f.pos), f.schema))
    }
    rec
  }

  /** Encode a struct column to binary Avro with `writerSchemaJson`
    * (spark-avro's `to_avro` shape) — the executor-side sink twin of
    * [[fromAvro]], completing wire parity for S4 (`.to(topic)` producing
    * Avro, CallsAggregationApp.java:111-118). `confluentHeader` prepends
    * the registry frame (magic 0 + big-endian schema id) that
    * `KafkaIO.stripConfluentHeader` removes. Null rows encode to null —
    * tombstones pass through to the sink. */
  def toAvro(data: Column, writerSchemaJson: String,
      confluentHeader: Boolean = false, schemaId: Int = 1): Column = {
    val schema = parsed(writerSchemaJson)
    require(schema.getType == Schema.Type.RECORD, "toAvro expects a record schema")
    val encode = new UDF1[Row, Array[Byte]] {
      override def call(row: Row): Array[Byte] = {
        if (row == null) return null
        val s = parsed(writerSchemaJson)
        val st = encodeThreadState.get()
        // Positional mapping is only safe if the struct actually lines up
        // with the writer schema — check names/types on the first record
        // of each (struct, schema) pair so a misordered or mistyped struct
        // fails with a field-level message, not a deep ClassCastException
        // (or worse, silently swapped same-typed fields)
        val rs = row.schema
        if (rs != null && (st.validated.get(writerSchemaJson) ne rs)) {
          val errs = structErrors(rs, s)
          if (errs.nonEmpty) throw new IllegalArgumentException(
            s"toAvro: struct column does not match writer schema '${s.getFullName}': ${errs.mkString("; ")}")
          st.validated.put(writerSchemaJson, rs)
        }
        var writer = st.writers.get(writerSchemaJson)
        if (writer == null) {
          writer = new GenericDatumWriter[GenericRecord](s)
          st.writers.put(writerSchemaJson, writer)
        }
        st.out.reset()
        if (confluentHeader) {
          st.out.write(0)
          st.out.write(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array())
        }
        st.encoder = EncoderFactory.get().binaryEncoder(st.out, st.encoder)
        writer.write(rowToGeneric(row, s), st.encoder)
        st.encoder.flush()
        st.out.toByteArray
      }
    }
    udf(encode, BinaryType).apply(data)
  }

  /** Encode rows to Avro binary with `writerSchemaJson` (spark-avro's
    * `to_avro` shape, driver/test-side twin of fromAvro). `confluentHeader`
    * prepends the registry frame (magic 0 + big-endian schema id) that
    * `KafkaIO.stripConfluentHeader` removes. */
  def encodeRecord(
      values: Seq[Any],
      writerSchemaJson: String,
      confluentHeader: Boolean = false,
      schemaId: Int = 1): Array[Byte] = {
    val schema = parsed(writerSchemaJson)
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.zip(values).foreach { case (f, v) => rec.put(f.pos, v) }
    val out = new ByteArrayOutputStream()
    if (confluentHeader) {
      out.write(0)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(schemaId).array())
    }
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
