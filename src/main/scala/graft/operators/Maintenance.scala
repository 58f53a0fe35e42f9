package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance planning: small-file compaction (the OPTIMIZE /
  * bin-packing pass every parquet lakehouse runs — the public shape in
  * Delta Lake's OPTIMIZE and Iceberg's rewrite_data_files).
  *
  * Scale design: the CORPUS is touched exactly once, by the per-unit
  * size rollup (one partial aggregate; the exchange carries one row per
  * compaction unit, never the data). Everything after — ordinal
  * assignment, cumulative fill, bin stats — runs at UNIT grain: at
  * 100 TB that is the file/partition LISTING (10^4..10^6 rows of
  * metadata), the same thing a table format's manifest holds, so the
  * single-partition planning window is bounded by metadata size, not
  * data size. The emitted manifest then drives the rewrite as
  * `repartitionByRange(bin)` write jobs; the planner itself moves no
  * rows.
  */
object Maintenance {

  /** The one corpus-grain pass: per-`partCols` unit sizes and row
    * counts. Callers deriving the target from the total should
    * aggregate THIS (metadata-grain) result, not rescan the corpus —
    * q139 eagerly materializes it (localCheckpoint) and feeds both the
    * target derivation and [[compactionPlanOfUnits]] from the same
    * rollup. */
  def unitRollup(df: DataFrame, partCols: Seq[String],
                 bytesExpr: Column): DataFrame =
    df.groupBy(partCols.map(col): _*)
      .agg(sum(bytesExpr).cast("long").as("u_bytes"),
        count(lit(1)).as("u_rows"))

  /** Greedy listing-order bin packing: units (the per-`partCols` groups
    * of `df`, each sized by `sum(bytesExpr)`) are laid out in listing
    * order and cut into output bins of ~`target` bytes by cumulative
    * fill — bin = floor(bytes-before-this-unit / target), the greedy
    * rule Delta's OPTIMIZE applies to its file listing. Oversize units
    * (≥ target on their own) are NOT split — this is a unit-grain
    * planner; they land in their cumulative bin and are counted in
    * `n_oversize` so the caller can route them to a row-grain rewrite
    * instead.
    *
    * `target` is a 1-row DataFrame with a `target` column (usually
    * derived from the same rollup — e.g. total/`nBins`), joined in as a
    * broadcast 1-row gate so the plan stays a single declarative tree.
    *
    * Returns the bin manifest: `bin, n_units, n_rows, bytes,
    * ord_first, ord_last, n_oversize` — all integer columns, so the
    * whole plan hash-replays in any engine (q139's oracle).
    */
  def compactionPlan(df: DataFrame, partCols: Seq[String],
                     bytesExpr: Column, target: DataFrame): DataFrame =
    compactionPlanOfUnits(unitRollup(df, partCols, bytesExpr), partCols,
      target)

  /** Planning over an existing [[unitRollup]] (columns: partCols,
    * `u_bytes`, `u_rows`) — pure metadata-grain work. */
  def compactionPlanOfUnits(units: DataFrame, partCols: Seq[String],
                            target: DataFrame): DataFrame = {
    // unit-grain from here down: |units| rows of metadata
    val ordered = Window.orderBy(partCols.map(col(_).asc): _*)
    val planned = units
      .withColumn("ord", row_number().over(ordered).cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("u_bytes")).over(
          ordered.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(target))
      .withColumn("bin", floor(col("cum_before") / col("target")).cast("long"))
    planned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("u_rows")).cast("long").as("n_rows"),
        sum(col("u_bytes")).cast("long").as("bytes"),
        min(col("ord")).as("ord_first"),
        max(col("ord")).as("ord_last"),
        sum(when(col("u_bytes") >= col("target"), 1L).otherwise(0L))
          .as("n_oversize"))
  }

  /** Data-versioning MANIFEST with order-invariant content checksums —
    * the integrity record a snapshot release carries so any consumer
    * (or a later [[graft.operators.Incremental]] ingest) can verify a
    * shard byte-for-byte without trusting file metadata: per partition
    * unit, row count, payload bytes, and two independent content
    * checksums, each the SUM over rows of a 24-bit md5-derived integer
    * of (id ':' payload) under a distinct salt, reduced mod 2^61−1.
    * Sums commute, so the checksum is independent of row order, file
    * layout, and partitioning — a rewritten/compacted shard verifies
    * equal, while any dropped, duplicated, or altered ROW moves it
    * (two salts push the per-shard collision odds to ~2^−48).
    *
    * Scale shape: one corpus scan, one unit-grain aggregate (map-side
    * partial sums — the exchange carries one row per unit); the sum is
    * exact DECIMAL(38) before the modulus, so there is no overflow
    * wraparound ambiguity between engines. The digit arithmetic is
    * [[Sampling.hexInt]] — the repo's single replay-exact device. */
  def shardManifest(df: DataFrame, partCols: Seq[String], idCol: String,
                    payload: Column): DataFrame = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    val rowKey = concat(col(idCol).cast("string"), lit(":"), payload)
    def chk(salt: String): Column =
      sum(Sampling.hexInt(rowKey, salt).cast("decimal(38,0)"))
    df.groupBy(partCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(octet_length(payload)).cast("long").as("n_bytes"),
        chk(":manifest.a").as("__ca"), chk(":manifest.b").as("__cb"))
      .select(partCols.map(col) ++ Seq(col("n_rows"), col("n_bytes"),
        expr("CAST(__ca % 2305843009213693951 AS BIGINT)").as("checksum_a"),
        expr("CAST(__cb % 2305843009213693951 AS BIGINT)").as("checksum_b")): _*)
  }

  /** MERGE of [[shardManifest]] outputs — the property that makes the
    * checksums a distributed-systems primitive rather than a report:
    * sums mod p compose, so manifest(old ∪ delta) = merge(manifest(old),
    * manifest(delta)) without ever rescanning old data. An incremental
    * ingest maintains the corpus manifest at DELTA cost; a backfill
    * audit verifies merge-of-parts against a direct scan (q226's
    * oracle). Pure unit-grain arithmetic; DECIMAL-exact before the
    * modulus so part counts never overflow-wrap. */
  def mergeManifests(parts: Seq[DataFrame],
                     partCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "parts must be non-empty")
    parts.reduce(_ unionByName _)
      .groupBy(partCols.map(col): _*)
      .agg(sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("n_bytes")).cast("long").as("n_bytes"),
        expr("CAST(sum(CAST(checksum_a AS DECIMAL(38,0)))" +
          " % 2305843009213693951 AS BIGINT)").as("checksum_a"),
        expr("CAST(sum(CAST(checksum_b AS DECIMAL(38,0)))" +
          " % 2305843009213693951 AS BIGINT)").as("checksum_b"))
  }
}
