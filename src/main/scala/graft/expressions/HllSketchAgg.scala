package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register vector (Flajolet, Fusy, Gandouet, Meunier 2007)
  * over a pre-hashed 60-bit column: `m = 2^p` byte registers, register
  * `j = h mod m` keeps the MAX of `rho(h >>> p)` — one plus the count of
  * leading zero bits in the remaining `60-p`-bit field. Fixed `m` bytes of
  * state per group, merged by elementwise max (idempotent, associative,
  * commutative — safe under partial aggregation, retries, and streaming
  * state merge).
  *
  * Distinct-counting trade-off vs [[KmvSketch]]: KMV is exact until k and
  * integer-only after; HLL's error is ~1.04/√m at ANY cardinality with
  * 4× smaller state per precision — the shape hot per-group cardinality
  * dashboards run at 100 TB. Like every graft sketch (and unlike Spark's
  * `approx_count_distinct`, whose HLL++ layout is implementation-defined),
  * the register vector is a pure deterministic function of the input SET
  * and the md5-derived hash — engines agreeing on hash60 agree on every
  * register, so a SQL oracle rebuilds the vector with GROUP BY + MAX and
  * matches bit-for-bit. Estimation: [[graft.operators.Sketches.hllEstimate]]
  * (exact-rational raw estimator + linear-counting small-range path).
  *
  * Returns `array<bigint>` of length `m` (rho maxes, 0 = register unhit).
  * CALLER CONTRACT: input values must lie in [0, 2^60) — feed
  * [[TextExpressions.hash60]] output. p in [7, 16]: ≥ 128 registers keeps
  * the single-constant alpha regime; rho ≤ 60-p+1 ≤ 54 keeps every
  * `2^rho` term exact in the estimator's replay.
  */
case class HllSketch(
    hash: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 7 && p <= 16, s"hll sketch needs p in [7,16], got $p")
  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = hash.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0L || h >= (1L << 60))
        throw new IllegalArgumentException(
          s"hll_sketch input out of [0, 2^60): $h — feed hash60 output")
      val idx = (h & (m - 1)).toInt
      val w = h >>> p // (60-p)-bit field
      // rho = leading zeros within the 60-p bit field, plus one
      val rho = (if (w == 0L) 60 - p else 60 - p - (64 - java.lang.Long.numberOfLeadingZeros(w))) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash)
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(n: Int): HllSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}

object HllSketch {
  /** `hll_sketch(hash60, p)` as a Column aggregate: `array<bigint>` of
    * `2^p` rho-max registers. */
  def hll(hash: Column, p: Int): Column =
    GraftColumnShim.column(
      HllSketch(GraftColumnShim.expression(hash), p).toAggregateExpression())
}
