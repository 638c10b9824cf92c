package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text expressions: each wraps a TextKernels method so the work
  * runs as one compiled call per row inside WholeStageCodegen, instead of a
  * per-element interpreted lambda tree (transform/filter/aggregate HOFs are
  * CodegenFallback in Spark — they were the bench's dominant cost).
  *
  * `nullSafeEval` delegates to the same kernel, so interpreted fallback and
  * generated code cannot drift.
  */
private[expressions] trait KernelCall extends UnaryExpression {
  /** Java source for the kernel call on input variable `c`. */
  def kernelCall(ctx: CodegenContext, c: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelCall(ctx, c)};")

  // Every kernel is null-in -> null-out (the nullSafeEval contract), so
  // tell the optimizer (r16, guide §4): without this, a join/aggregate
  // key derived from a kernel column infers `isnotnull(kernel(text))`
  // and pushes the KERNEL into the scan filter — the expensive hash ran
  // per-row in the filter and again in the project (measured on the s02
  // plan for the PQ twin of this trait). Null-intolerant lets Catalyst
  // reason `isnotnull(kernel(x)) <=> isnotnull(x)` at the constraint
  // level instead of shipping the kernel into the predicate.
  override def nullIntolerant: Boolean = true
}

private[expressions] trait StringInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
}

private[expressions] trait StringArrayInput extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got $t")
  }
}

/** Whitespace tokens, empties dropped. */
case class TokensExpr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any = TextKernels.tokens(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.tokens($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles. */
case class WordShinglesExpr(child: Expression, n: Int) extends KernelCall with StringInput {
  require(n >= 1, s"shingle n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any = TextKernels.shingles(s.asInstanceOf[UTF8String], n)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.shingles($c, $n)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [total, distinct, max-count] n-gram repetition stats (Gopher signals). */
case class NgramRepetitionExpr(child: Expression, n: Int)
    extends KernelCall with StringInput {
  require(n >= 1, s"ngram n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.ngramRepetition(s.asInstanceOf[UTF8String], n)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.ngramRepetition($c, $n)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles as a sorted array of hash60 values. */
case class ShingleHashesExpr(child: Expression, n: Int) extends KernelCall with StringInput {
  require(n >= 1, s"shingle n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.shingleHashes(s.asInstanceOf[UTF8String], n)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.shingleHashes($c, $n)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-row MinHash signature over distinct word n-gram shingles — the
  * shuffle-free signature build behind LSH banding. */
case class MinhashSigExpr(child: Expression, n: Int, numHashes: Int)
    extends KernelCall with StringInput {
  require(n >= 1 && numHashes >= 1,
    s"need shingle n >= 1 and numHashes >= 1, got ($n, $numHashes)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.minhashSig(s.asInstanceOf[UTF8String], n, numHashes)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.minhashSig($c, $n, $numHashes)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-row LSH band hashes (minhash signature → per-band md5 hex). */
case class MinhashBandsExpr(child: Expression, n: Int, numHashes: Int, rowsPerBand: Int)
    extends KernelCall with StringInput {
  // plan-time fence (the nBuckets/maxDist convention): a bad parameter
  // must fail at construction, not per-row inside codegen at scale
  require(n >= 1 && numHashes >= 1 && rowsPerBand >= 1 && numHashes % rowsPerBand == 0,
    s"need n >= 1, numHashes >= 1, rowsPerBand >= 1 dividing numHashes, " +
      s"got ($n, $numHashes, $rowsPerBand)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.minhashBands(s.asInstanceOf[UTF8String], n, numHashes, rowsPerBand)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.minhashBands($c, $n, $numHashes, $rowsPerBand)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 60-bit md5-derived hash (≡ conv(substring(md5(x),1,15),16,10)::long). */
case class Hash60Expr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any = TextKernels.hash60(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.hash60($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of elements of a string array contained in a fixed word set. */
case class CountInSetExpr(child: Expression, words: Seq[String])
    extends KernelCall with StringArrayInput {
  override def dataType: DataType = IntegerType

  @transient private lazy val wordArr: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def nullSafeEval(a: Any): Any =
    TextKernels.countInSet(a.asInstanceOf[ArrayData], wordArr)

  override def kernelCall(ctx: CodegenContext, c: String): String = {
    val ref = ctx.addReferenceObj("words", wordArr, "org.apache.spark.unsafe.types.UTF8String[]")
    s"graft.expressions.TextKernels.countInSet($c, $ref)"
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-word occurrence counts of a fixed word list in a token array
  * (array<long>, aligned with `words`). */
case class TermFreqsExpr(child: Expression, words: Seq[String])
    extends KernelCall with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val wordArr: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def nullSafeEval(a: Any): Any =
    TextKernels.termFreqs(a.asInstanceOf[ArrayData], wordArr)

  override def kernelCall(ctx: CodegenContext, c: String): String = {
    val ref = ctx.addReferenceObj("words", wordArr, "org.apache.spark.unsafe.types.UTF8String[]")
    s"graft.expressions.TextKernels.termFreqs($c, $ref)"
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of purely-[a-z] elements of a string array. */
case class CountAlphaExpr(child: Expression) extends KernelCall with StringArrayInput {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any): Any = TextKernels.countAlpha(a.asInstanceOf[ArrayData])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.countAlpha($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Σ character-length over a string array. */
case class SumLenExpr(child: Expression) extends KernelCall with StringArrayInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = TextKernels.sumLen(a.asInstanceOf[ArrayData])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.sumLen($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Position-weighted rolling-hash fingerprint of a token array. */
case class FingerprintExpr(child: Expression) extends KernelCall with StringArrayInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = TextKernels.fingerprint(a.asInstanceOf[ArrayData])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.fingerprint($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [emails, ipv4s, phones] PII token counts (TextKernels.piiStats). */
case class PiiStatsExpr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any = TextKernels.piiStats(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.piiStats($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** NFC + ROOT-lowercase + collapsed ASCII whitespace (TextKernels doc). */
case class NormalizeTextExpr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextKernels.normalizeText(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.normalizeText($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PII tokens replaced by placeholders, whitespace preserved. */
case class PiiScrubExpr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any = TextKernels.piiScrub(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.piiScrub($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** [n_features, score_sum] of the hashed-feature linear quality model. */
case class HashedLinearScoreExpr(child: Expression, nBuckets: Int)
    extends KernelCall with StringInput {
  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.hashedLinearScore(s.asInstanceOf[UTF8String], nBuckets)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.hashedLinearScore($c, $nBuckets)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Raw-deflate byte count of the UTF-8 text at level 6. */
case class DeflateLenExpr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any = TextKernels.deflateLen(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.deflateLen($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ALL word n-grams in order, repeats kept (counting form of shingles). */
case class NgramListExpr(child: Expression, n: Int) extends KernelCall with StringInput {
  require(n >= 1, s"ngram n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.ngramList(s.asInstanceOf[UTF8String], n)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.ngramList($c, $n)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct ≤ maxDist-deletion variants incl. the string itself — the
  * SymSpell index-key set (EntityResolution blocking). */
case class DeletionVariantsExpr(child: Expression, maxDist: Int)
    extends KernelCall with StringInput {
  require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any): Any =
    TextKernels.deletionVariants(s.asInstanceOf[UTF8String], maxDist)
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.deletionVariants($c, $maxDist)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Repeats of earlier lines within the document dropped (intra-doc dedup). */
case class DedupLinesInDocExpr(child: Expression) extends KernelCall with StringInput {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextKernels.dedupLinesInDoc(s.asInstanceOf[UTF8String])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.dedupLinesInDoc($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 32-bit simhash of a token array. */
case class Simhash32Expr(child: Expression) extends KernelCall with StringArrayInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any = TextKernels.simhash32(a.asInstanceOf[ArrayData])
  override def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.expressions.TextKernels.simhash32($c)"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** |A ∩ B| for two ascending long arrays — a codegen'd merge walk, the
  * verify-side primitive of the hashed Jaccard join (array_intersect on
  * string arrays builds an intermediate set + array per row; this is a
  * single pass with no allocation). */
case class SortedIntersectCountExpr(
    left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  // nullSafeEval contract: null in -> null out (see KernelCall)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects (array<bigint>, array<bigint>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.TextKernels.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TextExpressions {
  private def col(e: Expression): Column = GraftColumnShim.column(e)
  private def ex(c: Column): Expression = GraftColumnShim.expression(c)

  def tokens(c: Column): Column = col(TokensExpr(ex(c)))
  def wordShingles(c: Column, n: Int): Column = col(WordShinglesExpr(ex(c), n))
  def minhashSig(c: Column, n: Int, numHashes: Int): Column =
    col(MinhashSigExpr(ex(c), n, numHashes))
  def minhashBands(c: Column, n: Int, numHashes: Int, rowsPerBand: Int): Column =
    col(MinhashBandsExpr(ex(c), n, numHashes, rowsPerBand))
  def shingleHashes(c: Column, n: Int): Column = col(ShingleHashesExpr(ex(c), n))
  def ngramRepetition(c: Column, n: Int): Column = col(NgramRepetitionExpr(ex(c), n))
  def piiStats(c: Column): Column = col(PiiStatsExpr(ex(c)))
  def piiScrub(c: Column): Column = col(PiiScrubExpr(ex(c)))
  def normalizeText(c: Column): Column = col(NormalizeTextExpr(ex(c)))
  def dedupLinesInDoc(c: Column): Column = col(DedupLinesInDocExpr(ex(c)))
  def ngramList(c: Column, n: Int): Column = col(NgramListExpr(ex(c), n))
  def deletionVariants(c: Column, maxDist: Int): Column =
    col(DeletionVariantsExpr(ex(c), maxDist))
  def deflateLen(c: Column): Column = col(DeflateLenExpr(ex(c)))
  def hashedLinearScore(c: Column, nBuckets: Int): Column =
    col(HashedLinearScoreExpr(ex(c), nBuckets))
  def sortedIntersectCount(a: Column, b: Column): Column =
    col(SortedIntersectCountExpr(ex(a), ex(b)))
  def hash60(c: Column): Column = col(Hash60Expr(ex(c)))
  def countInSet(arr: Column, words: Seq[String]): Column = col(CountInSetExpr(ex(arr), words))
  def termFreqs(arr: Column, words: Seq[String]): Column = col(TermFreqsExpr(ex(arr), words))
  def countAlpha(arr: Column): Column = col(CountAlphaExpr(ex(arr)))
  def sumLen(arr: Column): Column = col(SumLenExpr(ex(arr)))
  def fingerprint(arr: Column): Column = col(FingerprintExpr(ex(arr)))
  def simhash32(arr: Column): Column = col(Simhash32Expr(ex(arr)))
}
