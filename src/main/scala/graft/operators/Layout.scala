package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Morton (Z-order) interleaving.
  *
  * A 1-D sort layout keeps file/row-group min-max tight on ONE column;
  * a scan filtering on any other column reads everything. Interleaving
  * the bits of two keys (Morton 1966; the Z-ORDER clustering public in
  * Delta Lake and Iceberg) makes ranges of the combined key map to
  * RECTANGLES in (a, b) space, so per-file min-max stays tight on BOTH
  * dims and a 2-D box predicate prunes to O(perimeter) files instead of
  * O(corpus) — the layout that keeps selective multi-dim scans feasible
  * at 100 TB where per-row filtering alone still reads every byte.
  *
  * Everything here is pure integer Column arithmetic (shift/and/or
  * builtins — codegen'd, zero shuffle for the z computation itself), so
  * the whole surface replays exactly in any engine: q136's DuckDB
  * oracle hash-matches the z-values, bucket stats, and pruning verdicts
  * bit for bit.
  */
object Layout {

  private val SpreadMasks = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Bit-spread of a 16-bit key into the even bit positions of a 32-bit
    * word — the standard magic-number cascade (each step doubles the
    * gap between occupied bit groups, the mask clears the overlap). */
  private def spread(c: Column): Column =
    SpreadMasks.foldLeft(c) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 2-D Morton z-value: `a`'s bits at even positions, `b`'s at odd.
    * Keys are masked to 16 bits (callers with wider domains rank or
    * bucket first), so z fits in 32 bits and every intermediate is a
    * non-negative long on any engine. */
  def mortonZ(a: Column, b: Column): Column =
    spread(a.bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread(b.bitwiseAND(lit(0xFFFFL))), 1))

  /** Write-side clustering: range-partition + sort by z, the layout
    * producer (each output partition covers a contiguous z-range = a
    * tile set in (a, b) space; parquet row-group min-max then stays
    * tight on BOTH dims). Range boundaries come from Spark's sampling,
    * so file CONTENTS depend on the run — the deterministic,
    * oracle-able read-side view of the same layout is [[zBucketStats]]
    * with fixed z-prefix tiles. */
  def zSort(df: DataFrame, aCol: String, bCol: String,
            partitions: Int): DataFrame = {
    val z = df.withColumn("z", mortonZ(col(aCol), col(bCol)))
    z.repartitionByRange(partitions, col("z")).sortWithinPartitions(col("z"))
  }

  /** Reader-side layout manifest over z-prefix tiles: each dim is first
    * scaled to 256 tiles against its own max (the domain-stats pass
    * every layout job runs — here a 1-row broadcast gate, so the tiling
    * adapts to the data's actual range instead of assuming it fills 16
    * bits), then bucket id = top `2·tileBits` bits of the 16-bit tile
    * z-value, with per-bucket count and min/max of both RAW dims —
    * exactly the min-max index a file-skipping scan consults. The
    * scaling arithmetic (int multiply exact in a double, one correctly
    * rounded division, floor) is bit-stable across engines, so q136's
    * oracle hash-replays the whole manifest. One narrow projection +
    * one bucket-keyed partial aggregate; the exchange carries
    * ≤ 4^tileBits stat rows, never the data. */
  def zBucketStats(df: DataFrame, aCol: String, bCol: String,
                   tileBits: Int): DataFrame =
    bucketStats(df, aCol, bCol, tileBits,
      (ta, tb) => mortonZ(ta, tb))

  /** [[zBucketStats]]' Hilbert-curve sibling: same domain-stat tile
    * scaling and manifest shape, but bucket id = top `2·tileBits` bits
    * of the order-8 Hilbert index (a native codegen kernel — the bit
    * walk's per-plane rotation state is a loop, not an expression
    * cascade). At aligned granularity both curves tile identically
    * (a d-prefix segment of 4^k cells IS a 2^k×2^k quadrant); the
    * Hilbert win is UNALIGNED locality — consecutive d are always
    * Manhattan-adjacent (unit-step, spec-asserted), so arbitrary curve
    * ranges stay compact where Z-order jumps corners. q137 hash-oracles
    * the full manifest against an 8-step SQL unroll of the same walk. */
  def hilbertBucketStats(df: DataFrame, aCol: String, bCol: String,
                         tileBits: Int): DataFrame =
    bucketStats(df, aCol, bCol, tileBits,
      (ta, tb) => graft.plans.exprs.hilbertD(ta, tb))

  private def bucketStats(df: DataFrame, aCol: String, bCol: String,
                          tileBits: Int,
                          curve: (Column, Column) => Column): DataFrame = {
    require(tileBits >= 1 && tileBits <= 8, "tileBits in [1, 8]")
    val base = df.select(col(aCol).bitwiseAND(lit(0xFFFFL)).as("a"),
      col(bCol).bitwiseAND(lit(0xFFFFL)).as("b"))
    val mx = base.agg(max(col("a")).as("am"), max(col("b")).as("bm"))
    base.crossJoin(broadcast(mx))
      .withColumn("ta", floor(col("a") * lit(256.0) / (col("am") + 1)))
      .withColumn("tb", floor(col("b") * lit(256.0) / (col("bm") + 1)))
      .withColumn("bucket",
        shiftright(curve(col("ta"), col("tb")), 16 - 2 * tileBits))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("a_min"), max(col("a")).as("a_max"),
        min(col("b")).as("b_min"), max(col("b")).as("b_max"))
  }

  /** Box-query pruning verdict per bucket: 1 iff the bucket's min-max
    * rectangle intersects [a1,a2]×[b1,b2] — the file-skipping decision,
    * sound by construction (a bucket's rows lie inside its min-max, so
    * a non-candidate bucket cannot contain a box row). */
  def boxCandidate(a1: Column, a2: Column, b1: Column, b2: Column): Column =
    when(col("a_max") >= a1 && col("a_min") <= a2 &&
         col("b_max") >= b1 && col("b_min") <= b2, 1L).otherwise(0L)
}
