package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002): keeps
  * the k smallest DISTINCT hash values seen, in a bounded sorted set.
  *
  * This is the scale-shaped form of distinct estimation: a
  * `COUNT(DISTINCT x)` shuffles every distinct value to the reducers, while
  * this aggregate reduces each map partition to at most k longs before the
  * exchange — O(groups × k) shuffled bytes no matter how many distinct
  * values exist. Runs under ObjectHashAggregate with map-side partials,
  * the same execution shape as collect_list but bounded.
  *
  * Unlike HLL (`approx_count_distinct`), the result is a pure function of
  * the input value SET — no implementation-defined register layout — so
  * any engine that agrees on the hash agrees on the estimate bit-for-bit;
  * the DuckDB oracle reproduces it with DISTINCT + ORDER BY + LIMIT k.
  *
  * Returns `struct<kk: bigint, hk: bigint>` — the kept count and the k-th
  * smallest hash — or null for empty input. The estimator
  * `(k-1) * |hash space| / hk` (or exactly `kk` while `kk < k`) is applied
  * by [[graft.operators.Sketches.kmvEstimate]]; keeping the raw state here
  * lets callers merge or re-estimate without re-scanning.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ImplicitCastInputTypes {

  require(k > 0, s"kmv sketch needs k > 0, got $k")

  // declared input type ⇒ the analyzer widens int hashes instead of
  // update() dying on a ClassCastException when called from SQL
  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], x: Long): Unit =
    if (buf.size < k) buf.add(x)
    else if (x < buf.last && buf.add(x)) buf.remove(buf.last)

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = hash.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.isEmpty) null else InternalRow(buf.size.toLong, buf.last)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("kk", LongType, nullable = false),
    StructField("hk", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(hash)
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(n: Int): KmvSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}

object KmvSketch {
  /** `kmv_sketch(hash, k)` as a Column aggregate: `struct<kk, hk>`. */
  def kmv(hash: Column, k: Int): Column =
    GraftColumnShim.column(
      KmvSketch(GraftColumnShim.expression(hash), k).toAggregateExpression())
}

/** [[KmvSketch]] with the FULL sorted k-min array as output instead of the
  * collapsed `(kk, hk)` — the form that supports SET ALGEBRA after the
  * aggregate: two sketches union by merging their arrays and re-taking the
  * k smallest (closed under the estimator), intersection estimates follow
  * by inclusion–exclusion. Same bounded buffer, same merge, k longs per
  * group on the wire instead of two. */
case class KmvMins(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with ImplicitCastInputTypes {

  require(k > 0, s"kmv mins needs k > 0, got $k")

  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], x: Long): Unit =
    if (buf.size < k) buf.add(x)
    else if (x < buf.last && buf.add(x)) buf.remove(buf.last)

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = hash.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  // TreeSet iterates ascending, so the output array arrives sorted
  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(hash)
  override def prettyName: String = "kmv_mins"

  override def withNewMutableAggBufferOffset(n: Int): KmvMins =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMins =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}

object KmvMins {
  /** `kmv_mins(hash, k)` as a Column aggregate: sorted `array<bigint>`. */
  def kmvMins(hash: Column, k: Int): Column =
    GraftColumnShim.column(
      KmvMins(GraftColumnShim.expression(hash), k).toAggregateExpression())
}
