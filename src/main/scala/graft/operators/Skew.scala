package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling joins for hot keys at cluster scale.
  *
  * AQE's skew-join splitting (on by default in our sessions) handles most
  * cases at runtime; [[saltedJoin]] is the explicit fallback for joins
  * AQE can't split (e.g. when the skewed side must aggregate first, or on
  * engines/paths without AQE): the big side gets a random-ish salt in
  * [0, saltFactor), the small side is replicated saltFactor times, and
  * the join key becomes (key, salt) — one hot key spreads over
  * saltFactor partitions at the cost of replicating the small side.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted. `small` is replicated
    * `saltFactor`× (keep it broadcast-small or the factor low).
    * Deterministic salt (hash of the whole row via monotonically
    * increasing id would be nondeterministic across reruns; we hash the
    * key plus a per-row disambiguator column if given). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, saltBy: Option[String] = None,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    val saltSrc = saltBy.map(col).getOrElse(spark_partition_id())
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col(key), saltSrc), lit(saltFactor)).cast("int"))
    val salts = explode(array((0 until saltFactor).map(lit): _*)).as("__salt")
    val smallS = small.withColumn("__salt", salts)
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Frequency-based hot-key report: keys above `threshold` occurrences —
    * feeds either a salting decision or a broadcast-isolate plan (join
    * hot keys separately with a broadcast, union with the rest). */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key).count().filter(col("count") >= threshold)

  /** Hybrid skew join: hot keys (above threshold) take a broadcast join;
    * the long tail takes the normal shuffle join; results union. This is
    * the shape that survives a single pathological key at 100 TB. */
  def hybridSkewJoin(big: DataFrame, small: DataFrame, key: String,
                     hotKeyThreshold: Long): DataFrame = {
    val hot = broadcast(hotKeys(big, key, hotKeyThreshold).select(key))
    val bigHot = big.join(hot, Seq(key), "left_semi")
    val bigCold = big.join(hot, Seq(key), "left_anti")
    bigHot.join(broadcast(small), Seq(key))
      .unionByName(bigCold.join(small, Seq(key)))
  }
}
