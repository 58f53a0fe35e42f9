package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` embedding
  * columns, written with codegen'd higher-order functions (`zip_with` /
  * `aggregate`) — no UDF deserialization per row.
  *
  * Arithmetic discipline: cast float elements to double FIRST, then do all
  * accumulation in double, left-to-right — the same order a scalar SQL
  * engine uses, so cosine values are bit-reproducible against an oracle.
  */
object Vectors {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Higher-order-function dot product — reference implementation; the
    * hot path uses the codegen'd native expression below. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dotHof(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** HOF cosine — kept as the executable spec for [[cosine]]; both
    * accumulate sequentially in double, so they agree bitwise. */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (norm(a) * norm(b))

  /** Native codegen'd cosine (graft.plans.CosineSimilarity). */
  def cosine(a: Column, b: Column): Column = graft.plans.exprs.cosineSim(a, b)

  /** Elementwise mean of a group of vectors — centroid for IVF routing.
    * Usage: `groupBy(...).agg(Vectors.centroid(col("embedding"), dim))`. */
  def centroid(v: Column, dim: Int): Column = {
    val sums = (0 until dim).map(i => sum(element_at(toDouble(v), i + 1)))
    val n = count(lit(1)).cast("double")
    array(sums.map(_ / n): _*)
  }

  /** Random-hyperplane LSH bit signature: sign of the projection onto
    * `planes` deterministic pseudo-random hyperplanes, packed in a long.
    * Native codegen'd expression (graft.plans.HyperplaneSignature) — the
    * equivalent built-in-function formulation is an O(planes×dim)-node
    * expression tree that falls out of codegen and chokes the optimizer.
    * `planeOffset` starts this word at global plane index `planeOffset`,
    * so signatures wider than 64 planes compose as several long words. */
  def hyperplaneSignature(v: Column, planes: Int, planeOffset: Int = 0): Column =
    graft.plans.exprs.hyperplaneSig(v, planes, planeOffset)

  /** Per-vector symmetric int8 quantization — the ANN storage path
    * (a float32 corpus shrinks ~4× before the IVF/LSH index is built;
    * recall impact is bounded by the ~0.4%-of-max rounding error per
    * dim). Scale = max |x_i| (the vector's own dynamic range);
    * q_i = round(127·x_i / scale) ∈ [−127, 127]. Dequantize with
    * q_i·scale/127. Purely NARROW arithmetic — no shuffle, no state;
    * all-zero vectors quantize to zeros (scale 0 guarded). All
    * arithmetic runs in double (float inputs cast exactly), so an
    * external SQL oracle replays the quantized values bit-for-bit. */
  def quantizeInt8(v: Column): Column = {
    val dv = toDouble(v)
    val scale = array_max(transform(dv, x => abs(x)))
    when(scale === 0d, transform(dv, _ => lit(0L)))
      .otherwise(transform(dv, x => round(x * 127d / scale).cast("long")))
  }

  /** The [[quantizeInt8]] scale term (max |x_i| as double), stored next
    * to the quantized vector for dequantization. */
  def quantScale(v: Column): Column = array_max(transform(toDouble(v), x => abs(x)))
}
