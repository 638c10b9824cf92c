package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005): a `depth × width`
  * counter grid; each item increments one counter per row (bucket =
  * `hash60(rowIdx:item) mod width`), and a point query reads the MINIMUM
  * of its `depth` counters — an overestimate by at most the collision mass,
  * never an underestimate.
  *
  * This is the scale-shaped form of frequency estimation: an exact
  * `groupBy(token).count()` shuffles one row per distinct token (billions
  * for a web corpus vocabulary), while this aggregate reduces every map
  * partition to the same fixed `depth*width` longs before the exchange —
  * O(groups × depth × width) shuffled bytes no matter how many distinct
  * items exist, merging by elementwise sum (counts are linear).
  *
  * Like [[KmvSketch]] and unlike Spark's `count_min_sketch` builtin, the
  * layout is a pure deterministic function of the input multiset and the
  * md5-derived `hash60` — any engine that agrees on the hash reproduces
  * every counter bit-for-bit, so the DuckDB oracle rebuilds the grid with
  * plain GROUP BY and matches exactly.
  *
  * Returns `array<bigint>` of length `depth*width`, row-major
  * (`counter(i, b) = result[i*width + b]`); point lookups via
  * [[graft.operators.Sketches.cmsCount]].
  */
case class CmsSketch(
    item: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0, s"cms sketch needs depth > 0, got $depth")
  require(width > 0, s"cms sketch needs width > 0, got $width")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var i = 0
      while (i < depth) {
        val h = TextKernels.hash60(UTF8String.fromString(i.toString + ":" + s))
        buf(i * width + (h % width).toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(n: Int): CmsSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object CmsSketch {
  /** `cms_sketch(item, depth, width)` as a Column aggregate:
    * `array<bigint>` of `depth*width` row-major counters. */
  def cms(item: Column, depth: Int, width: Int): Column =
    GraftColumnShim.column(
      CmsSketch(GraftColumnShim.expression(item), depth, width).toAggregateExpression())
}
