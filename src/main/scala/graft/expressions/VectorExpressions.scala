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

/** JVM kernels behind the quantization expressions (TextKernels pattern:
  * generated code calls these static forwarders, so eval and codegen share
  * one implementation and cannot drift). */
object VectorKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Scalar int8 quantization against per-dimension scales:
    * `clamp(floor(v_j * 127 / scale_j), -127, 127)`. FLOOR, not round —
    * floor has no tie rule, so any IEEE-double engine (DuckDB included)
    * reproduces it bit-for-bit. The clamp guards the one-ulp division
    * overshoot at v_j = ±scale_j. */
  def quantizeI8(arr: ArrayData, scales: Array[Double]): ArrayData = {
    val n = arr.numElements()
    // strict: silently truncating to min(length) would quantize only a
    // prefix when stale scales meet a re-embedded corpus — recall would
    // collapse with nothing to detect it
    if (n != scales.length) throw new IllegalArgumentException(
      s"quantize_i8: vector has $n dims but scales were fit on ${scales.length}")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val q = math.floor(arr.getFloat(i).toDouble * 127.0 / scales(i))
      out(i) = java.lang.Byte.valueOf(math.max(-127.0, math.min(127.0, q)).toByte)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Signed-projection kernel: `y_j = Σ_i s_{j,i} · round(1e6·x_i)` over
    * a flat row-major ±1 sign matrix. The micro-round replicates Spark's
    * `round()` exactly (BigDecimal.valueOf + HALF_UP — `Math.round`'s
    * floor(x+0.5) differs on negative halves), so the kernel is
    * bit-identical to the HOF form it replaces. Micro values are computed
    * ONCE per input element, then reused across all output dims — the
    * property the interpreted HOF chain lost (it re-evaluated the
    * rounding transform per term). */
  def signedProject(arr: ArrayData, signs: Array[Long], outDims: Int): ArrayData = {
    val n = arr.numElements()
    if (signs.length != outDims * n) throw new IllegalArgumentException(
      s"signed_project: vector has $n dims but the sign matrix was built " +
        s"for ${signs.length / outDims}")
    val m = new Array[Long](n)
    var i = 0
    while (i < n) {
      m(i) = java.math.BigDecimal.valueOf(arr.getFloat(i).toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      i += 1
    }
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var s = 0L
      val base = j * n
      var k = 0
      while (k < n) { s += signs(base + k) * m(k); k += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Integer dot product over two int8 vectors — the coarse-scoring loop:
    * pure int multiply-adds over arrays a quarter the size of float32,
    * which is the whole point at 100 TB (the coarse scan is memory-bandwidth
    * bound). */
  def dotI8(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"dot_i8: mismatched dimensions ${a.numElements()} vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    s
  }
}

/** int8 quantization of an `array<float>` against fixed per-dimension
  * scales (index-build state, O(d) on the driver — same class as IVF
  * centroids). */
case class QuantizeI8(child: Expression, scales: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quantize_i8 expects array<float>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.quantizeI8(a.asInstanceOf[ArrayData], scales)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.quantizeI8($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd signed random projection of an `array<float>` against a
  * fixed flat ±1 sign matrix (data-independent build state, like
  * [[QuantizeI8]]'s scales). */
case class SignedProjectExpr(child: Expression, signs: Array[Long], outDims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"signed_project expects array<float>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.signedProject(a.asInstanceOf[ArrayData], signs, outDims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", signs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.signedProject($c, $ref, $outDims);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Integer dot product over two `array<byte>` int8 vectors. */
case class DotI8(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(org.apache.spark.sql.types.ByteType, _),
          ArrayType(org.apache.spark.sql.types.ByteType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_i8 expects (array<byte>, array<byte>), got ($l, $r)")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorKernels.dotI8($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column wrapper for DotProductFF. */
  def dotFF(a: Column, b: Column): Column =
    GraftColumnShim.column(
      DotProductFF(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column wrapper for QuantizeI8. */
  def quantizeI8(a: Column, scales: Array[Double]): Column =
    GraftColumnShim.column(QuantizeI8(GraftColumnShim.expression(a), scales))

  /** Column wrapper for SignedProjectExpr. */
  def signedProject(a: Column, signs: Array[Long], outDims: Int): Column =
    GraftColumnShim.column(
      SignedProjectExpr(GraftColumnShim.expression(a), signs, outDims))

  /** Column wrapper for DotI8. */
  def dotI8(a: Column, b: Column): Column =
    GraftColumnShim.column(
      DotI8(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column wrapper for DotProductWiden (array<float|double> each side). */
  def dotWiden(a: Column, b: Column): Column =
    GraftColumnShim.column(
      DotProductWiden(GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
