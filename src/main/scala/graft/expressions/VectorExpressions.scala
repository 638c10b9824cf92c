package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * higher-order function: Catalyst evaluates the lambda per element through
  * the interpreter, outside WholeStageCodegen, which made the similarity
  * operators the hot spot of the whole bench (µs per pair instead of ns).
  * This expression emits a tight primitive loop into generated code instead.
  *
  * Semantics are identical to the HOF form: elements are widened to double
  * before multiplying and accumulated left-to-right, so results are
  * bit-for-bit the same and remain DuckDB-oracle-checkable.
  */
case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_ff expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd dot product where each side is independently `array<float>`
  * or `array<double>` — the mixed case the IVF k-means path needs (raw
  * vectors stay float, centroids are exact micro-unit means widened to
  * double). Elements are widened to double before multiplying and
  * accumulated left-to-right, identical to [[DotProductFF]], so
  * float-float inputs produce bit-identical results through either
  * expression and all variants stay DuckDB-oracle-checkable.
  */
case class DotProductWiden(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_widen expects array<float|double> on both sides, got (${left.dataType}, ${right.dataType})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def acc(arr: String, fl: Boolean) =
        if (fl) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${acc(a, isFloat(left))} * ${acc(b, isFloat(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column wrapper for DotProductFF. */
  def dotFF(a: Column, b: Column): Column =
    GraftColumnShim.column(
      DotProductFF(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column wrapper for DotProductWiden (array<float|double> each side). */
  def dotWiden(a: Column, b: Column): Column =
    GraftColumnShim.column(
      DotProductWiden(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
