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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Elementwise mean of a group of vectors — centroid for IVF routing.
    * Usage: `groupBy(...).agg(Vectors.centroid(col("embedding"), dim))`. */
  def centroid(v: Column, dim: Int): Column = {
    val sums = (0 until dim).map(i => sum(element_at(toDouble(v), i + 1)))
    val n = count(lit(1)).cast("double")
    array(sums.map(_ / n): _*)
  }

  /** Random-hyperplane LSH bit signature (SimHash for vectors): sign of
    * the projection onto `planes` deterministic pseudo-random hyperplanes.
    * Plane weights derive from xxhash64(planeIdx, dimIdx) — seedless,
    * reproducible, no driver-side randomness. */
  def hyperplaneSignature(v: Column, dim: Int, planes: Int): Column = {
    val vd = toDouble(v)
    val bits = (0 until planes).map { p =>
      val proj = (0 until dim).map { d =>
        // hash → pseudo-random weight in [-1, 1)
        val w = (xxhash64(lit(p * 7919 + d)) % 1000000L).cast("double") / 1000000.0
        element_at(vd, d + 1) * w
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
