package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bit math for the Bloom filter aggregate and its membership probe.
  *
  * Hashing is double hashing over two splitmix64 finalizer mixes (Steele et
  * al., "Fast splittable pseudorandom number generators", OOPSLA 2014):
  * `bit_i = (h1 + i*h2) mod numBits` with `h2` forced odd. Pure integer
  * arithmetic on the key — deterministic across engines, runs, and
  * partitionings, so a persisted filter built once stays valid forever
  * (the property a frozen blocklist artifact needs).
  *
  * Blob layout: `[int numBits][int numHashes][long words...]`, the filter's
  * whole contract in one self-describing binary value.
  */
object BloomKernels {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], numBits: Int, numHashes: Int, v: Long): Unit = {
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def toBytes(words: Array[Long], numBits: Int, numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits); bb.putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Array[Long], Int, Int) = {
    val bb = ByteBuffer.wrap(bytes)
    val numBits = bb.getInt; val numHashes = bb.getInt
    val words = new Array[Long](numBits >>> 6)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (words, numBits, numHashes)
  }

  /** Membership probe straight off the serialized blob — no deserialization
    * allocation per row (hot path: called once per scanned row). */
  def mightContain(bytes: Array[Byte], v: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes)
    val numBits = bb.getInt; val numHashes = bb.getInt
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      val word = bb.getLong(8 + (bit >>> 6) * 8)
      if ((word & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Bloom-filter build aggregate: ORs every input key's `numHashes` bits
  * into a `numBits`-wide filter, map-side partials merged by word-wise OR.
  *
  * The scale story: a frozen membership set (blocklisted fingerprints,
  * known-benchmark hashes, banned ids) becomes ONE binary value of fixed
  * size — broadcastable to every task of a 100 TB scan — instead of a join
  * side. False positives are bounded by sizing (`numBits ≈ -n·ln(p)/ln2²`);
  * false negatives are impossible, which is what makes the filter safe as
  * a PRE-filter in front of an exact join ([[graft.operators.Splits
  * .bloomAntiJoin]]): the "definitely absent" bulk never reaches the
  * shuffle, the "maybe present" sliver is verified exactly.
  *
  * Null keys contribute nothing. Empty input still yields a valid (empty)
  * filter. Output blob layout documented on [[BloomKernels]].
  */
case class BloomFilterBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ImplicitCastInputTypes {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0 && numHashes <= 16,
    s"numHashes must be in [1,16], got $numHashes")

  override def inputTypes = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomKernels.toBytes(buf, numBits, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomKernels.toBytes(buf, numBits, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomKernels.fromBytes(bytes)._1

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(n: Int): BloomFilterBuild =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterBuild =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `bloom_might_contain(filter, key)`: true iff the key MAY be in the set
  * the filter was built over (never false for a present key). Codegen'd
  * probe straight off the binary blob. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType

  override def nullSafeEval(blob: Any, v: Any): Any =
    BloomKernels.mightContain(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, v) =>
      s"${ev.value} = graft.expressions.BloomKernels.mightContain($b, $v);")

  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BloomFilterBuild {
  /** `bloom_build(key, numBits, numHashes)` as a Column aggregate. */
  def bloom(key: Column, numBits: Int, numHashes: Int): Column =
    GraftColumnShim.column(
      BloomFilterBuild(GraftColumnShim.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe column over a built filter. */
  def mightContain(filter: Column, key: Column): Column =
    GraftColumnShim.column(BloomMightContain(
      GraftColumnShim.expression(filter), GraftColumnShim.expression(key)))
}
