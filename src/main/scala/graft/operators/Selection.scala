package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus SELECTION under global constraints — the curation step that
  * turns a scored candidate pool into the corpus that actually trains:
  * "take the best documents until the token budget is spent" and "cap
  * any one source at N documents" (the knobs behind every published
  * data-mixture card; ref analogue: the reference's vote-threshold
  * top-N marts, `docs/top_movies.sql:4-9`, re-expressed as corpus
  * curation).
  */
object Selection {

  /** Greedy budget selection: order rows by `orderBy` (a TOTAL order —
    * give it a unique tiebreaker) and keep the maximal prefix whose
    * running `costCol` sum stays ≤ `budget` (inclusive: a row is kept
    * only if the budget covers it entirely). Appends the running total
    * as `cum_cost` — callers (and the oracle) see the exact prefix-sum
    * arithmetic, not just the survivor set.
    *
    * Scale shape — the naive plan (one global `sum() OVER (ORDER BY …)`
    * window) serializes 100 TB through a single task. This is the
    * classic two-phase parallel prefix sum instead:
    *  1. `repartitionByRange` on the sort key gives a total order
    *     ACROSS partitions with fully parallel partitions;
    *  2. per-partition subtotals (|partitions| rows) pass through ONE
    *     bounded single-task window to become prefix offsets — bounded
    *     by the partition count by design, the same |groups|-row
    *     discipline as [[Sampling.temperatureMixture]]'s rate
    *     aggregate;
    *  3. the offsets broadcast back and every partition computes its
    *     within-partition running sum in parallel.
    * offset + within-partition sum equals the global window EXACTLY
    * (range partition boundaries respect the total order; costs are
    * integer-summed), with no unbounded single task anywhere. The
    * ranged input is persisted — the subtotal aggregate and the final
    * cumsum both read it — under the repo-wide cache lifecycle
    * contract (bench clears between queries; library callers own
    * unpersist — the q76/q86 convention). */
  def takeByBudget(df: DataFrame, orderBy: Seq[Column], costCol: Column,
                   budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val ranged = df.withColumn("__cost", costCol.cast("long"))
      .repartitionByRange(orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val parts = ranged.groupBy(col("__pid"))
      .agg(sum(col("__cost")).as("__psum"))
    // |partitions| rows through a single-task window — bounded by design
    val offs = parts.withColumn("__off",
        coalesce(sum(col("__psum")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    // the pid-partitioned window re-exchanges by __pid, but each pid
    // bucket is exactly one ranged partition — same parallelism, no new
    // skew beyond the range partitioner's own balance
    val w = Window.partitionBy(col("__pid")).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offs), Seq("__pid"))
      .withColumn("cum_cost", col("__off") + sum(col("__cost")).over(w))
      .filter(col("cum_cost") <= budget)
      .drop("__pid", "__off", "__cost")
  }

  /** Per-group quota cap: keep the top `n` rows of each `groupCol`
    * group under `orderBy`, with the 1-based position appended as
    * `rank` — "no single source may contribute more than N documents",
    * the deterministic counterpart of [[Sampling.temperatureMixture]]'s
    * probabilistic rebalancing. The `row_number <= n` filter is
    * rewritten by Spark to WindowGroupLimit (spec-asserted), so each
    * partition retains n rows per group instead of sorting full
    * groups — the W3 top-k discipline applied to the curation
    * surface. */
  def quotaPerGroup(df: DataFrame, groupCol: Column, orderBy: Seq[Column],
                    n: Int): DataFrame = {
    require(n >= 1, "n must be positive")
    val w = Window.partitionBy(groupCol).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }
}
