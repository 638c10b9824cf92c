package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs in
  * a size-capped heap, with partial buffers merged map-side.
  *
  * This is the two-phase top-k that replaces
  * `row_number().over(Window.partitionBy(query))`: the window form shuffles
  * EVERY candidate row of a query to a single reducer task (fine at test
  * scale, a single-task funnel at 100×), while this aggregate reduces each
  * map partition to at most k entries per group before the shuffle, so the
  * exchange carries O(groups × k) rows no matter how many candidates were
  * scored. Runs under ObjectHashAggregate with partial aggregation — the
  * same execution shape as collect_list, but with a bounded buffer.
  *
  * Ordering matches the window form exactly: higher score first, ties by
  * lower id; NaN scores sort greatest (Spark's descending-sort semantics).
  * Null score or id contributes nothing.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with ImplicitCastInputTypes {

  require(k > 0, s"top-k needs k > 0, got $k")

  // declared input types ⇒ the analyzer inserts casts (int ids widen, any
  // numeric score coerces to double) instead of update() dying on a
  // ClassCastException mid-stage when called from SQL with other types.
  // (return type inferred: AbstractDataType is private[sql] and unnamable)
  override def inputTypes = Seq(DoubleType, LongType)

  // Heap head = the worst kept candidate (lowest score; ties: highest id),
  // so exceeding size k always evicts the element that cannot be in the
  // final top k. java.lang.Double.compare ranks NaN above +Inf, matching
  // Spark's descending sort placing NaN first.
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { p =>
      buf.enqueue(p)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // worstFirst sorts best-first ascending (compare < 0 when a is better)
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map(p => InternalRow(p._2, p._1): Any))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { p => bb.putDouble(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((bb.getDouble, bb.getLong))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "top_k_by_score"

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** `top_k_by_score(score, id, k)` as a Column aggregate: array of
    * `struct<id: long, score: double>`, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumnShim.column(
      TopKByScore(
        GraftColumnShim.expression(score),
        GraftColumnShim.expression(id), k).toAggregateExpression())
}
