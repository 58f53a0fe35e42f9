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

  /** SALT PLAN for a self-joined inverted index — the skew-mitigation
    * manifest behind the dedup candidate joins ([[Dedup.jaccardPairs]]
    * and friends): a key with document frequency df contributes
    * df·(df−1)/2 candidate pairs, all materialized in ONE reducer's
    * partition, so the largest key's df² — not the corpus size — decides
    * the straggler at 100 TB. The plan lists every key whose df exceeds
    * `cap` with the salt factor that splits it (salt = ceil(df/cap)),
    * the pair volume it would have produced unsalted, and the EXACT
    * residual volume after splitting into `salt` near-equal parts
    * (sizes ⌈df/salt⌉ × r and ⌊df/salt⌋ × (salt−r), r = df mod salt) —
    * what one reducer still materializes, the number a capacity planner
    * compares against executor memory. Salting a self-join loses
    * cross-part pairs, which is exactly the LSH/prefix-filter recall
    * trade the caller is deciding on — the plan quantifies it
    * (`pairs_lost`).
    *
    * Scale shape: one token-grain aggregate over the exploded index
    * (the same exchange the join itself would run), then everything is
    * at HOT-KEY grain — bounded by |keys with df > cap|, report-sized.
    * All-integer arithmetic end to end: the whole manifest hash-replays
    * in any engine. */
  def saltPlan(index: DataFrame, keyCol: Column, cap: Long): DataFrame = {
    require(cap >= 1, "cap must be positive")
    val dfc = col("df")
    index.groupBy(keyCol.as("key")).agg(count(lit(1)).as("df"))
      .filter(dfc > cap)
      .withColumn("salt", expr(s"(df + ${cap - 1}) div $cap"))
      .withColumn("q", expr("df div salt"))
      .withColumn("r", dfc - col("q") * col("salt"))
      .withColumn("pairs_before", expr("df * (df - 1) div 2"))
      .withColumn("pairs_after",
        expr("r * ((q + 1) * q div 2) + (salt - r) * (q * (q - 1) div 2)"))
      .select(col("key"), dfc, col("salt"), col("pairs_before"),
        col("pairs_after"),
        (col("pairs_before") - col("pairs_after")).as("pairs_lost"))
  }
}
