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
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot_ff expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // dimension mismatch throws (the quantizeI8/dotI8 rule): a silent
    // prefix dot product between a stale index and a re-embedded corpus
    // would rank on garbage cosines with nothing to detect it
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"dot_ff: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
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
         |if ($a.numElements() != $b.numElements())
         |  throw new IllegalArgumentException(
         |    "dot_ff: dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |int $n = $a.numElements();
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
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true

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
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"dot_widen: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
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
         |if ($a.numElements() != $b.numElements())
         |  throw new IllegalArgumentException(
         |    "dot_widen: dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |int $n = $a.numElements();
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

  /** PQ subspace assignment: argmax over `nCodes` codewords of
    * `cos(v[off..off+sd), codeword_c) = dot/(|v_sub|·cn_c)` — ties →
    * lowest code. Bit-identical to the column form it replaced
    * (`dotWiden(sub, cvLit) / (norm(sub) * cn)` under a struct argmax):
    * every sum is the same sequential float-widened loop, `cns` carries
    * the constant-folded `sqrt(dotWiden(cv, cv))` values. One compact
    * kernel instead of an nCodes-arm expression tree — the Catalyst
    * analysis/janino cost of the literal-heavy form was the dominant
    * per-call cost of the PQ fit, not the data. */
  def pqAssign(arr: ArrayData, book: Array[Double], cns: Array[Double],
      off: Int, sd: Int): Int = {
    if (arr.numElements() < off + sd) throw new IllegalArgumentException(
      s"pq_assign: vector has ${arr.numElements()} dims, need ${off + sd}")
    val v = new Array[Double](sd)
    var i = 0
    var nvAcc = 0.0
    while (i < sd) {
      val x = arr.getFloat(off + i).toDouble
      v(i) = x
      nvAcc += x * x
      i += 1
    }
    val nv = math.sqrt(nvAcc)
    val nCodes = cns.length
    var best = Double.NegativeInfinity
    var bestCode = 0
    var c = 0
    while (c < nCodes) {
      var dot = 0.0
      val base = c * sd
      var k = 0
      while (k < sd) { dot += v(k) * book(base + k); k += 1 }
      val score0 = dot / (nv * cns(c))
      // NaN (a zero-norm side) maps to +Inf — the SAME rule as
      // [[pqTopCells]] and as Spark's descending double order (struct
      // argmax / greatest place NaN first). Strict `>` skipping NaN
      // would make assignment and probe ranking disagree on degenerate
      // cells: probes would rank a NaN cell first while nothing was
      // ever assigned to it — zero candidates at nprobe=1.
      val score = if (java.lang.Double.isNaN(score0)) Double.PositiveInfinity else score0
      if (score > best) { best = score; bestCode = c }
      c += 1
    }
    bestCode
  }

  /** Top-`nprobe` cell ids of a query vector against the coarse
    * codebook, by the SAME score rule as [[pqAssign]]
    * (`dot/(|v|·cn_c)`, every sum the sequential widened loop) and the
    * SAME ordering as the former windowed probe (`row_number` over
    * (score desc, cid asc)): repeated strict-`>` selection keeps the
    * lowest cid on ties, and NaN scores map to +Inf so they rank first
    * exactly as Spark's descending double sort places NaN. Replaces the
    * broadcast-centroid crossJoin + window rank — the probe side's cell
    * choice is a pure projection, zero exchange, zero driver job. */
  def pqTopCells(arr: ArrayData, book: Array[Double], cns: Array[Double],
      nprobe: Int): ArrayData = {
    val sd = if (cns.length == 0) 0 else book.length / cns.length
    if (arr.numElements() < sd) throw new IllegalArgumentException(
      s"pq_top_cells: vector has ${arr.numElements()} dims, need $sd")
    val v = new Array[Double](sd)
    var i = 0
    var nvAcc = 0.0
    while (i < sd) {
      val x = arr.getFloat(i).toDouble
      v(i) = x
      nvAcc += x * x
      i += 1
    }
    val nv = math.sqrt(nvAcc)
    val nCodes = cns.length
    val scores = new Array[Double](nCodes)
    var c = 0
    while (c < nCodes) {
      var dot = 0.0
      val base = c * sd
      var k = 0
      while (k < sd) { dot += v(k) * book(base + k); k += 1 }
      val sc = dot / (nv * cns(c))
      scores(c) = if (java.lang.Double.isNaN(sc)) Double.PositiveInfinity else sc
      c += 1
    }
    val n = math.min(nprobe, nCodes)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](nCodes)
    var r = 0
    while (r < n) {
      var best = Double.NegativeInfinity
      var bestCode = -1
      var c2 = 0
      while (c2 < nCodes) {
        if (!taken(c2) && (bestCode < 0 || scores(c2) > best)) {
          best = scores(c2); bestCode = c2
        }
        c2 += 1
      }
      taken(bestCode) = true
      out(r) = bestCode
      r += 1
    }
    new GenericArrayData(out)
  }

  /** PQ ADC lookup table for one subspace of a query vector:
    * `t[c] = round(1e6·dot(q_sub, codeword_c))` as exact longs — the
    * micro-round replicates Spark `round()` (BigDecimal HALF_UP), each
    * dot the sequential widened loop. */
  def pqAdcTable(arr: ArrayData, book: Array[Double], nCodes: Int,
      off: Int, sd: Int): ArrayData = {
    if (arr.numElements() < off + sd) throw new IllegalArgumentException(
      s"pq_adc_table: vector has ${arr.numElements()} dims, need ${off + sd}")
    val v = new Array[Double](sd)
    var i = 0
    while (i < sd) { v(i) = arr.getFloat(off + i).toDouble; i += 1 }
    val out = new Array[Long](nCodes)
    var c = 0
    while (c < nCodes) {
      var dot = 0.0
      val base = c * sd
      var k = 0
      while (k < sd) { dot += v(k) * book(base + k); k += 1 }
      out(c) = java.math.BigDecimal.valueOf(dot * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** PQ subspace code assignment of an `array<float>` against a fixed
  * flattened codebook (index-build state, nCodes×sd doubles — same class
  * as [[QuantizeI8]]'s scales). `cns` are the codeword norms, precomputed
  * with the identical sequential loop. */
case class PqAssignExpr(child: Expression, book: Array[Double],
    cns: Array[Double], off: Int, sd: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_assign expects array<float>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqAssign(a.asInstanceOf[ArrayData], book, cns, off, sd)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", book, "double[]")
    val cnsRef = ctx.addReferenceObj("cns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.pqAssign($c, $bookRef, $cnsRef, $off, $sd);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-nprobe coarse-cell pick for a query `array<float>` — see
  * [[VectorKernels.pqTopCells]]. */
case class PqTopCellsExpr(child: Expression, book: Array[Double],
    cns: Array[Double], nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_top_cells expects array<float>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqTopCells(a.asInstanceOf[ArrayData], book, cns, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", book, "double[]")
    val cnsRef = ctx.addReferenceObj("cns", cns, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.pqTopCells($c, $bookRef, $cnsRef, $nprobe);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ ADC lookup-table build for one subspace of a query `array<float>`. */
case class PqAdcTableExpr(child: Expression, book: Array[Double],
    nCodes: Int, off: Int, sd: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_adc_table expects array<float>, got $t")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqAdcTable(a.asInstanceOf[ArrayData], book, nCodes, off, sd)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", book, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorKernels.pqAdcTable($c, $bookRef, $nCodes, $off, $sd);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** int8 quantization of an `array<float>` against fixed per-dimension
  * scales (index-build state, O(d) on the driver — same class as IVF
  * centroids). */
case class QuantizeI8(child: Expression, scales: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
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
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
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
  // nullSafeEval contract: null in -> null out (see TextExpressions.KernelCall)
  override def nullIntolerant: Boolean = true
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

  /** Column wrapper for PqAssignExpr: codebook rows flattened, codeword
    * norms precomputed with the kernel's own sequential loop. */
  /** THE codeword norm, in one place: left-to-right sequential sum of
    * squares then sqrt — bit-compat-critical (the fit's replaying
    * oracles compute the identical association), so every caller must
    * use this one definition, never a local copy. */
  private[graft] def normOf(cw: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < cw.length) { s += cw(i) * cw(i); i += 1 }
    math.sqrt(s)
  }

  def pqAssign(a: Column, book: Seq[Array[Double]], off: Int): Column = {
    require(book.nonEmpty, "pq_assign needs a non-empty codebook")
    val sd = book.head.length
    require(book.forall(_.length == sd), "pq_assign codewords must share one width")
    val cns = book.map(normOf).toArray
    GraftColumnShim.column(PqAssignExpr(
      GraftColumnShim.expression(a), book.flatten.toArray, cns, off, sd))
  }

  /** Column wrapper for PqTopCellsExpr: codebook rows flattened, norms
    * precomputed with the kernel's own sequential loop (the pqAssign
    * discipline — the values must match what the fit's replaying oracles
    * compute bit-for-bit). */
  def topCells(a: Column, book: Seq[Array[Double]], nprobe: Int): Column = {
    require(book.nonEmpty, "pq_top_cells needs a non-empty codebook")
    val sd = book.head.length
    require(book.forall(_.length == sd), "pq_top_cells codewords must share one width")
    val cns = book.map(normOf).toArray
    GraftColumnShim.column(PqTopCellsExpr(
      GraftColumnShim.expression(a), book.flatten.toArray, cns, nprobe))
  }

  /** Column wrapper for PqAdcTableExpr. */
  def pqAdcTable(a: Column, book: Seq[Array[Double]], off: Int): Column = {
    require(book.nonEmpty, "pq_adc_table needs a non-empty codebook")
    val sd = book.head.length
    require(book.forall(_.length == sd), "pq_adc_table codewords must share one width")
    GraftColumnShim.column(PqAdcTableExpr(
      GraftColumnShim.expression(a), book.flatten.toArray, book.length, off, sd))
  }
}
