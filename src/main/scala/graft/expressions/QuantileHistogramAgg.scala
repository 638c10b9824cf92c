package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact discrete quantiles as ONE bounded aggregate over the value
  * histogram — the single-operator form of
  * [[graft.operators.Sketches.exactQuantiles]], with identical semantics:
  * for permille `p` over `n` non-null rows, the element at 0-based index
  * `(p*(n-1)) div 1000` of the value-sorted multiset. All integer math, no
  * interpolation — the result is always an input element and hashes
  * identically on any engine.
  *
  * Why a second form: the multi-stage histogram+window plan can't run
  * inside a streaming query (one stateful operator per query), while this
  * aggregate composes with `window()`/watermarks like any sum — giving
  * batch/stream parity for exact quantiles. State is an unboxed
  * value→count hash map (sorted only at eval/serialize — O(1) updates on
  * the hot per-row path), bounded by the DISTINCT VALUE DOMAIN (price
  * cents, token counts …), not the row count — the same boundedness
  * argument as q28, and each map partition reduces to one histogram
  * before the exchange (ObjectHashAggregate with map-side partials).
  *
  * Returns `struct<qs: array<bigint>, n_rows: bigint>` (one `qs` element
  * per requested permille, in request order), or null for empty input.
  */
case class QuantileHistogram(
    value: Expression,
    permilles: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(permilles.nonEmpty, "need at least one quantile")
  permilles.foreach(p =>
    require(p >= 0 && p <= 1000, s"permille must be in [0,1000], got $p"))

  // integral inputs ONLY, checked — the former ImplicitCastInputTypes
  // (LongType) let the analyzer insert a silent double→long cast, so
  // `quantile_histogram(score_double, 500)` truncated every fractional
  // value toward zero and returned healthy-looking garbage, while the
  // documented-identical Sketches.exactQuantiles rejects the same input
  // loudly. Narrower integers widen in update(), fractional types fail
  // analysis with the remedy.
  override def checkInputDataTypes(): TypeCheckResult =
    value.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"quantile_histogram computes on integral values; got ${t.simpleString} — " +
          "pre-scale fractional scores to integers (micro-units) and CAST explicitly")
    }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = value.eval(input)
    if (v != null) {
      val x = v match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
        case sh: java.lang.Short => sh.longValue
        case b: java.lang.Byte => b.longValue
        case other => other.asInstanceOf[Long]
      }
      buf.update(x, buf.getOrElse(x, 0L) + 1L)
    }
    buf
  }

  override def merge(
      buf: mutable.LongMap[Long],
      other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (v, c) => buf.update(v, buf.getOrElse(v, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    if (buf.isEmpty) return null
    val values = buf.keysIterator.toArray
    java.util.Arrays.sort(values)
    val n = buf.valuesIterator.sum
    // 0-based target index per permille; integer math keeps it exact at any
    // n (a double floor would lose bits past 2^53)
    val targets = permilles.map(p => p.toLong * (n - 1) / 1000L)
    val picks = new Array[Long](permilles.length)
    var cum = 0L
    var remaining = targets.indices.toSet
    for (v <- values if remaining.nonEmpty) {
      cum += buf(v)
      remaining = remaining.filter { i =>
        if (cum > targets(i)) { picks(i) = v; false } else true
      }
    }
    InternalRow(new GenericArrayData(picks), n)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    // sorted for deterministic bytes (not required for merge correctness)
    val values = buf.keysIterator.toArray
    java.util.Arrays.sort(values)
    val bb = ByteBuffer.allocate(4 + values.length * 16)
    bb.putInt(values.length)
    values.foreach { v => bb.putLong(v); bb.putLong(buf(v)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("qs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(value)
  override def prettyName: String = "quantile_histogram"

  override def withNewMutableAggBufferOffset(n: Int): QuantileHistogram =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QuantileHistogram =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))
}

object QuantileHistogram {
  /** `quantile_histogram(value, permilles)` as a Column aggregate:
    * `struct<qs: array<bigint>, n_rows: bigint>`. */
  def quantiles(value: Column, permilles: Seq[Int]): Column =
    GraftColumnShim.column(
      QuantileHistogram(GraftColumnShim.expression(value), permilles)
        .toAggregateExpression())
}
