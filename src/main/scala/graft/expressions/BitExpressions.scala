package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Bit-manipulation kernels for data-layout keys. */
object BitKernels {

  /** Morton/z-order interleave of the low `bits` bits of `x` and `y`:
    * bit i of `x` lands at position 2i+1, bit i of `y` at 2i — `x` is the
    * major dimension (its top bit outranks everything of `y`). Inputs are
    * masked to `bits` first, so the kernel is total on all longs and the
    * result is non-negative for bits ≤ 31. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val xm = x & mask
    val ym = y & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((xm >> i) & 1L) << (2 * i + 1)
      z |= ((ym >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }
}

/** Z-order (Morton) key of two long columns — the multi-dimensional
  * clustering key behind Delta/Iceberg's OPTIMIZE ZORDER (public
  * technique: Morton 1966; Orenstein & Merrett 1984 for range queries).
  * Sorting/range-partitioning by this key keeps rows close in BOTH
  * dimensions physically close, so parquet row-group min/max stats prune
  * 2-D predicates that a single-column sort can only prune on one axis.
  */
case class ZOrder2Expr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"zorder expects (bigint, bigint), got ($a, $b)")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    BitKernels.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.BitKernels.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitExpressions {
  private def col(e: Expression): Column = GraftColumnShim.column(e)
  private def ex(c: Column): Expression = GraftColumnShim.expression(c)

  /** z-order key of two columns (cast to long, low `bits` bits each). */
  def zorder(x: Column, y: Column, bits: Int = 16): Column =
    col(ZOrder2Expr(ex(x.cast("long")), ex(y.cast("long")), bits))
}
