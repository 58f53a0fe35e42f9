package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSessionExtensions, functions => F}

/** Custom scalar Catalyst expressions for dense-vector / fingerprint work
  * where the built-in higher-order functions are too slow (interpreted
  * per-element lambdas, or giant expression trees for per-plane sums).
  *
  * All three codegen by delegating to [[VectorOps]] statics, so they stay
  * inside whole-stage codegen spans. Register for SQL via
  * [[GraftExtensions]] (`graft_cosine`, `graft_hyperplane_sig`,
  * `graft_simhash`) or use the Column API in [[exprs]].
  */
private[graft] object ExprUtil {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Analysis-time input check (AsOfJoin.requireOrderable precedent): a
    * mistyped child should fail analysis with a clear message, not throw
    * ClassCastException inside an executor's generated code. */
  def requireType(fn: String, dt: DataType, ok: DataType => Boolean,
                  expected: String): TypeCheckResult =
    if (ok(dt)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn expects $expected, got ${dt.simpleString}")

  val isStringArray: DataType => Boolean = {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  val isNumericVector: DataType => Boolean = {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
}

case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine expects array<float|double>, got ${left.dataType} / ${right.dataType}")
    }
  private lazy val aF = ExprUtil.isFloatArray(left.dataType)
  private lazy val bF = ExprUtil.isFloatArray(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorOps.cosine($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SqL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sq_l2 expects array<float|double>, got ${left.dataType} / ${right.dataType}")
    }
  private lazy val aF = ExprUtil.isFloatArray(left.dataType)
  private lazy val bF = ExprUtil.isFloatArray(right.dataType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorOps.sqL2($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_d expects (bigint, bigint), got ${left.dataType} / ${right.dataType}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.hilbertD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class HyperplaneSignature(child: Expression, planes: Int, planeOffset: Int = 0)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64, "planes must be in [1, 64] per signature word")
  require(planeOffset >= 0, "planeOffset must be >= 0")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("hyperplane_sig", child.dataType, ExprUtil.isNumericVector, "array<float|double>")
  private lazy val isF = ExprUtil.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.hyperplaneSignature(v.asInstanceOf[ArrayData], isF, planes, planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.VectorOps.hyperplaneSignature($v, $isF, $planes, $planeOffset)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash64 over an array<string> of tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("simhash", child.dataType, ExprUtil.isStringArray, "array<string>")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.simhash64($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingles of a single-space-tokenized string.
  * Native replacement for the transform/slice/concat_ws HOF tree, which
  * (a) interprets per element and (b) re-evaluates its `split` child per
  * lambda iteration — O(tokens²) chars per row. This evaluates its child
  * ONCE and builds shingles in O(total chars). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("word_shingles", child.dataType, _ == StringType, "string")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.wordShingles(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.wordShingles($v, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ALL word n-grams of a single-space-tokenized string, in order with
  * multiplicity — the counting counterpart of [[WordShingles]] (which
  * dedups for set similarity). Same native one-pass rationale. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("word_ngrams", child.dataType, _ == StringType, "string")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.wordNgrams(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.wordNgrams($v, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** DEFLATE-compressed byte length of a string — the kernel of the
  * compression-ratio quality gate ([[graft.operators.Quality]]). Native
  * expression so the Deflater runs inside whole-stage codegen per row
  * (a UDF would break the codegen span; there is no HOF formulation of
  * zlib at all). */
case class DeflatedLength(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("deflated_length", child.dataType, _ == StringType, "string")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.deflatedLength(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.deflatedLength($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Order-sensitive rolling hash over an array<string> of tokens. */
case class TokenRollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("token_rolling_hash", child.dataType, ExprUtil.isStringArray, "array<string>")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.tokenRollingHash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.tokenRollingHash($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-element 64-bit hash: array<string> → array<long>. Native one-pass
  * expression (a `transform(arr, x => hash(x))` HOF would interpret per
  * element and can re-evaluate an inlined child array per element). */
case class HashTokens64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("hash_tokens64", child.dataType, ExprUtil.isStringArray, "array<string>")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.hashTokens64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.hashTokens64($v)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** k-hash MinHash signature over an array<string>; elements hashed once,
  * k seed-mixes each — one pass, no per-hash re-evaluation of the child. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, "k must be in [1, 1024]")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("minhash_sig", child.dataType, ExprUtil.isStringArray, "array<string>")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.minhashSig(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.minhashSig($v, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fraction of a doc's tokens covered by its most frequent word n-gram
  * (Gopher-style repetition filter). Needs a per-row count map — not
  * expressible with codegen'd built-ins and pathological as an HOF. */
case class TopNgramFrac(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("top_ngram_frac", child.dataType, _ == StringType, "string")
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.topNgramFrac(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.VectorOps.topNgramFrac($v, $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Top-n nearest IVF cells of a vector, against a driver-collected
  * centroid matrix embedded in the expression (k×dim doubles — model
  * parameters, not row data; the MLlib KMeansModel shape). Returns
  * array<long> of cell ids ordered by cosine desc, ties → smaller id.
  * Makes corpus→cell assignment a zero-shuffle map projection; codegen
  * ships the arrays once per task via `ctx.addReferenceObj`, not per row.
  */
case class NearestCells(child: Expression, cellIds: Array[Long],
                        centers: Array[Double], n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  require(cellIds.nonEmpty, "centroid set must be non-empty")
  require(centers.length % cellIds.length == 0,
    s"centroid matrix length ${centers.length} not a multiple of k=${cellIds.length}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("nearest_cells", child.dataType, ExprUtil.isNumericVector, "array<float|double>")
  private lazy val isF = ExprUtil.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.nearestCells(v.asInstanceOf[ArrayData], isF, cellIds, centers, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    val ctrRef = ctx.addReferenceObj("centers", centers, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.VectorOps.nearestCells($v, $isF, $idsRef, $ctrRef, $n)")
  }
  // case-class equality on Array fields is reference-based, which defeats
  // canonicalization/subexpression elimination across separately-collected
  // (but identical) centroid sets — compare contents instead
  override def equals(other: Any): Boolean = other match {
    case o: NearestCells => child == o.child && n == o.n &&
      java.util.Arrays.equals(cellIds, o.cellIds) &&
      java.util.Arrays.equals(centers, o.centers)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(n), Integer.valueOf(java.util.Arrays.hashCode(cellIds)),
    Integer.valueOf(java.util.Arrays.hashCode(centers)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Quantized-grid nearest cell (see [[VectorOps.nearestCellQuantized]]):
  * argmax over cells of round(cosine·simScale) as a long, ties → smaller
  * id — the cross-engine-exact routing of the bucketed facility-location
  * family, one codegen'd call at ANY centroid count (replaces a
  * |cells|-struct `greatest()` fold that outgrows codegen). Centroids
  * ship once per task via `ctx.addReferenceObj` (model parameters, the
  * [[NearestCells]] shape). */
case class NearestCellQuantized(child: Expression, cellIds: Array[Long],
                                centers: Array[Double],
                                simScale: Double) extends UnaryExpression {
  require(cellIds.nonEmpty, "centroid set must be non-empty")
  require(centers.length % cellIds.length == 0,
    s"centroid matrix length ${centers.length} not a multiple of k=${cellIds.length}")
  require(simScale > 0 && !simScale.isNaN && !simScale.isInfinite,
    "simScale must be a positive finite double")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("nearest_cell_quantized", child.dataType,
      ExprUtil.isNumericVector, "array<float|double>")
  private lazy val isF = ExprUtil.isFloatArray(child.dataType)
  // row-invariant centroid norms, hoisted once per expression (same
  // accumulation order as the fused loop — bit-identical quantization)
  private lazy val norms: Array[Double] =
    VectorOps.centroidNorms(cellIds, centers)
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.nearestCellQuantized(v.asInstanceOf[ArrayData], isF, cellIds,
      centers, norms, simScale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    val ctrRef = ctx.addReferenceObj("centers", centers, "double[]")
    val nrmRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.VectorOps.nearestCellQuantized($v, $isF, $idsRef, $ctrRef, $nrmRef, $simScale)")
  }
  // content equality over the Array fields (the NearestCells rationale:
  // reference equality defeats canonicalization across identical sets)
  override def equals(other: Any): Boolean = other match {
    case o: NearestCellQuantized => child == o.child &&
      simScale == o.simScale && java.util.Arrays.equals(cellIds, o.cellIds) &&
      java.util.Arrays.equals(centers, o.centers)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    java.lang.Double.valueOf(simScale),
    Integer.valueOf(java.util.Arrays.hashCode(cellIds)),
    Integer.valueOf(java.util.Arrays.hashCode(centers)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API entry points for the custom expressions. */
/** Product-quantization encode (see [[VectorOps.pqEncode]]): m codes of
  * the squared-L2-nearest codeword per subspace. The codebook ships as a
  * codegen reference object (m×ksub×subDim doubles — model params, the
  * [[NearestCells]] pattern), so encoding is a map-only projection. */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, ksub: Int) extends UnaryExpression {
  require(m >= 1 && ksub >= 1, "m and ksub must be >= 1")
  require(codebooks.length % (m * ksub) == 0 && codebooks.length > 0,
    s"codebook length ${codebooks.length} not a positive multiple of m*ksub=${m * ksub}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("pq_encode", child.dataType, ExprUtil.isNumericVector, "array<float|double>")
  private lazy val isF = ExprUtil.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.pqEncode(v.asInstanceOf[ArrayData], isF, codebooks, m, ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.VectorOps.pqEncode($v, $isF, $cbRef, $m, $ksub)")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PqEncode => child == o.child && m == o.m && ksub == o.ksub &&
      java.util.Arrays.equals(codebooks, o.codebooks)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(m), Integer.valueOf(ksub),
    Integer.valueOf(java.util.Arrays.hashCode(codebooks)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** CDC boundary positions (see [[VectorOps.cdcBoundaries]]): the
  * md5-hex6 token coin evaluated in one codegen'd kernel pass instead of
  * per-element HOF lambdas. */
case class CdcBoundaries(child: Expression, salt: String, avg: Int)
    extends UnaryExpression {
  require(avg >= 2, "avg must be >= 2")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("cdc_boundaries", child.dataType, ExprUtil.isStringArray, "array<string>")
  private lazy val saltU = org.apache.spark.unsafe.types.UTF8String.fromString(salt)
  override protected def nullSafeEval(toks: Any): Any =
    VectorOps.cdcBoundaries(toks.asInstanceOf[ArrayData], saltU, avg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", saltU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, t =>
      s"graft.plans.VectorOps.cdcBoundaries($t, $saltRef, $avg)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** T5 span-corruption run ids (see [[VectorOps.t5SpanMask]]): the
  * stateless masked-span rule in one codegen'd kernel pass. */
case class T5SpanMask(left: Expression, right: Expression,
                      pNum: Int, minLen: Int, lenRange: Int)
    extends BinaryExpression {
  require(pNum >= 0 && pNum <= (1 << 24), "pNum must be on the 16^6 grid")
  require(minLen >= 1 && lenRange >= 1, "need minLen >= 1 and lenRange >= 1")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, at) if ExprUtil.isStringArray(at) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"t5_span_mask expects (bigint, array<string>), got ${left.dataType} / ${right.dataType}")
    }
  override protected def nullSafeEval(id: Any, toks: Any): Any =
    VectorOps.t5SpanMask(id.asInstanceOf[Long], toks.asInstanceOf[ArrayData],
      pNum, minLen, lenRange)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (id, toks) =>
      s"graft.plans.VectorOps.t5SpanMask($id, $toks, $pNum, $minLen, $lenRange)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Winnowing fingerprints (see [[VectorOps.winnow]]): packed
  * `(pos << 24) | hex6` longs, the per-row selection loop in one
  * codegen'd kernel pass. */
case class WinnowFingerprints(child: Expression, salt: String, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("winnow_fingerprints", child.dataType,
      _ == StringType, "string")
  private lazy val saltU = org.apache.spark.unsafe.types.UTF8String.fromString(salt)
  override protected def nullSafeEval(t: Any): Any =
    VectorOps.winnow(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      saltU, k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", saltU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, t =>
      s"graft.plans.VectorOps.winnow($t, $saltRef, $k, $w)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-query ADC lookup table (see [[VectorOps.pqLut]]). */
case class PqLut(child: Expression, codebooks: Array[Double],
                 m: Int, ksub: Int) extends UnaryExpression {
  require(m >= 1 && ksub >= 1, "m and ksub must be >= 1")
  require(codebooks.length % (m * ksub) == 0 && codebooks.length > 0,
    s"codebook length ${codebooks.length} not a positive multiple of m*ksub=${m * ksub}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("pq_lut", child.dataType, ExprUtil.isNumericVector, "array<float|double>")
  private lazy val isF = ExprUtil.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.pqLut(v.asInstanceOf[ArrayData], isF, codebooks, m, ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.VectorOps.pqLut($v, $isF, $cbRef, $m, $ksub)")
  }
  override def equals(other: Any): Boolean = other match {
    case o: PqLut => child == o.child && m == o.m && ksub == o.ksub &&
      java.util.Arrays.equals(codebooks, o.codebooks)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(m), Integer.valueOf(ksub),
    Integer.valueOf(java.util.Arrays.hashCode(codebooks)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** ADC distance: codes (array<long>) × lut (array<double>) → double
  * (see [[VectorOps.pqAdc]]). */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub >= 1, "ksub must be >= 1")
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<bigint>, array<double>), got ${left.dataType} / ${right.dataType}")
    }
  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    VectorOps.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (codes, lut) =>
      s"graft.plans.VectorOps.pqAdc($codes, $lut, $ksub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dense matrix×vector projection (see [[VectorOps.matVec]]): the PCA
  * rotation/whitening kernel. Matrix and offsets are driver-held model
  * parameters shipped as codegen reference objects (the [[NearestCells]]
  * pattern), so a full-rank rotation is ONE codegen'd expression instead
  * of `rows` interpreted higher-order dot products. */
case class MatVec(child: Expression, matrix: Array[Double],
                  offsets: Array[Double], dim: Int) extends UnaryExpression {
  require(dim >= 1, "dim must be >= 1")
  require(offsets.nonEmpty && matrix.length == offsets.length * dim,
    s"matrix length ${matrix.length} != rows ${offsets.length} × dim $dim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprUtil.requireType("mat_vec", child.dataType, ExprUtil.isNumericVector, "array<float|double>")
  private lazy val isF = ExprUtil.isFloatArray(child.dataType)
  override protected def nullSafeEval(v: Any): Any =
    VectorOps.matVec(v.asInstanceOf[ArrayData], isF, matrix, offsets, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[]")
    val oRef = ctx.addReferenceObj("offsets", offsets, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.VectorOps.matVec($v, $isF, $mRef, $oRef, $dim)")
  }
  override def equals(other: Any): Boolean = other match {
    case o: MatVec => child == o.child && dim == o.dim &&
      java.util.Arrays.equals(matrix, o.matrix) &&
      java.util.Arrays.equals(offsets, o.offsets)
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(dim), Integer.valueOf(java.util.Arrays.hashCode(matrix)),
    Integer.valueOf(java.util.Arrays.hashCode(offsets)))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object exprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def sqL2(a: Column, b: Column): Column =
    column(SqL2Distance(expression(a), expression(b)))

  def hilbertD(x: Column, y: Column): Column =
    column(HilbertIndex(expression(x), expression(y)))

  def hyperplaneSig(v: Column, planes: Int, planeOffset: Int = 0): Column =
    column(HyperplaneSignature(expression(v), planes, planeOffset))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def wordShingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))

  def wordNgrams(text: Column, n: Int): Column =
    column(WordNgrams(expression(text), n))

  def minhashSig(elems: Column, k: Int): Column =
    column(MinHashSig(expression(elems), k))

  def hashTokens64(tokens: Column): Column =
    column(HashTokens64(expression(tokens)))

  def tokenRollingHash(tokens: Column): Column =
    column(TokenRollingHash(expression(tokens)))

  def deflatedLength(text: Column): Column =
    column(DeflatedLength(expression(text)))

  def nearestCells(v: Column, cellIds: Array[Long], centers: Array[Double],
                   n: Int): Column =
    column(NearestCells(expression(v), cellIds, centers, n))

  def nearestCellQuantized(v: Column, cellIds: Array[Long],
                           centers: Array[Double], simScale: Double): Column =
    column(NearestCellQuantized(expression(v), cellIds, centers, simScale))

  def topNgramFrac(text: Column, n: Int): Column =
    column(TopNgramFrac(expression(text), n))

  def pqEncode(v: Column, codebooks: Array[Double], m: Int, ksub: Int): Column =
    column(PqEncode(expression(v), codebooks, m, ksub))

  def matVec(v: Column, matrix: Array[Double], offsets: Array[Double],
             dim: Int): Column =
    column(MatVec(expression(v), matrix, offsets, dim))

  def pqLut(v: Column, codebooks: Array[Double], m: Int, ksub: Int): Column =
    column(PqLut(expression(v), codebooks, m, ksub))

  def pqAdc(codes: Column, lut: Column, ksub: Int): Column =
    column(PqAdc(expression(codes), expression(lut), ksub))

  def cdcBoundaries(toks: Column, salt: String, avg: Int): Column =
    column(CdcBoundaries(expression(toks), salt, avg))

  def winnowFingerprints(text: Column, salt: String, k: Int, w: Int): Column =
    column(WinnowFingerprints(expression(text), salt, k, w))

  def t5SpanMask(id: Column, toks: Column, pNum: Int, minLen: Int,
                 lenRange: Int): Column =
    column(T5SpanMask(expression(id), expression(toks), pNum, minLen, lenRange))
}

/** `SparkSessionExtensions` hook: registers the custom expressions as SQL
  * functions. Attach with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // parameter args (band counts, k, model arrays) are evaluated once at
  // resolution time, so they must be foldable — guard before eval() so a
  // column argument fails with a clear analysis-time message instead of
  // AttributeReference.eval's raw UnsupportedOperationException
  private def litArg(args: Seq[Expression], i: Int, fn: String,
                     param: String): Any = {
    require(args(i).foldable, s"$fn: $param must be a literal")
    args(i).eval()
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sq_l2"),
      new ExpressionInfo(classOf[SqL2Distance].getName, "graft_sq_l2"),
      (args: Seq[Expression]) => SqL2Distance(args(0), args(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
      (args: Seq[Expression]) => HyperplaneSignature(args(0),
        litArg(args, 1, "graft_hyperplane_sig", "planes").asInstanceOf[Int])))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_top_ngram_frac"),
      new ExpressionInfo(classOf[TopNgramFrac].getName, "graft_top_ngram_frac"),
      (args: Seq[Expression]) => TopNgramFrac(args(0),
        litArg(args, 1, "graft_top_ngram_frac", "n").asInstanceOf[Int])))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0),
        litArg(args, 1, "graft_word_shingles", "n").asInstanceOf[Int])))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "graft_word_ngrams"),
      (args: Seq[Expression]) => WordNgrams(args(0),
        litArg(args, 1, "graft_word_ngrams", "n").asInstanceOf[Int])))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        litArg(args, 1, "graft_minhash_sig", "k").asInstanceOf[Int])))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hash_tokens"),
      new ExpressionInfo(classOf[HashTokens64].getName, "graft_hash_tokens"),
      (args: Seq[Expression]) => HashTokens64(args(0))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[TokenRollingHash].getName, "graft_rolling_hash"),
      (args: Seq[Expression]) => TokenRollingHash(args(0))))
    // model parameters (cell ids + row-major centroid matrix) arrive as
    // foldable array literals and are evaluated once at resolution time
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCells].getName, "graft_nearest_cells"),
      (args: Seq[Expression]) => NearestCells(args(0),
        litArg(args, 1, "graft_nearest_cells", "cellIds")
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(),
        litArg(args, 2, "graft_nearest_cells", "centers")
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray(),
        litArg(args, 3, "graft_nearest_cells", "n").asInstanceOf[Int])))
  }
}
