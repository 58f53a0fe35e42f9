package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training corpora.
  *
  * Unlike `df.sample()` (RNG-seeded per partition split — resample on
  * repartition, not reproducible across engines), hash sampling keys the
  * decision on the ROW CONTENT: the same document lands in the sample on
  * every run, on every engine, at any partitioning — which is what makes
  * train/eval splits and cross-system audits reproducible. Rate
  * granularity is 1/256 (first two hex chars of md5).
  */
object Sampling {

  /** Hex prefixes covering round(rate·256) of the 256 two-char buckets. */
  private[operators] def prefixes(rate: Double): Seq[String] = {
    require(rate >= 0 && rate <= 1)
    val n = math.round(rate * 256).toInt
    (0 until n).map(i => f"$i%02x")
  }

  /** Keep rows whose md5(keyCol) falls in the first round(rate·256)
    * buckets. Non-string keys are cast to their canonical string form
    * first (md5 takes binary/string input only). */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    val p = prefixes(rate)
    if (p.isEmpty) df.limit(0)
    else df.filter(substring(md5(keyCol.cast("string")), 1, 2).isin(p: _*))
  }

  /** Per-stratum rates (e.g. downsample dominant languages harder):
    * unlisted strata keep `defaultRate`. */
  def stratifiedHashSample(df: DataFrame, keyCol: Column, strataCol: Column,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    val bucket = substring(md5(keyCol.cast("string")), 1, 2)
    val pred = rates.toSeq.sortBy(_._1).foldRight(
      bucket.isin(prefixes(defaultRate): _*): Column) { case ((s, r), els) =>
      when(strataCol === s, bucket.isin(prefixes(r): _*)).otherwise(els)
    }
    df.filter(pred)
  }
}
