package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Storage lifecycle for eagerly-checkpointed iteration state.
  *
  * The iterative operators ([[Graph]] PageRank, [[Dedup]] connected
  * components, the store pipelines) truncate per-round lineage with
  * `localCheckpoint(eager = true)` — without it, planning cost grows
  * without bound round over round (measured: minutes of pure analysis
  * by round ~12 of the CC loop). But `Dataset.unpersist` does NOT free
  * a checkpoint's storage: it only clears the CacheManager entry, and
  * checkpoint blocks belong to the underlying RDD's persist, which
  * waits for the ContextCleaner's GC-triggered sweep. A long-lived
  * driver iterating 20 rounds therefore accumulates 20 superseded
  * node-grain block sets per call — a real block-manager leak for a
  * library embedded in a service.
  *
  * [[release]] frees them deterministically: a checkpointed Dataset's
  * analyzed plan is a [[LogicalRDD]] leaf over exactly the RDD whose
  * persist holds the blocks, so unpersisting that RDD releases the
  * storage at the moment the value is superseded — no GC dependence.
  * Safe by construction: a SUPERSEDED checkpoint is never read again
  * (the next round's state was eagerly materialized from it before the
  * release), so losing its blocks cannot trigger recomputation of a
  * truncated lineage.
  *
  * Contract: call only on Datasets produced by `localCheckpoint` /
  * `checkpoint` whose blocks this caller owns, after every consumer of
  * those blocks has materialized. Releasing a checkpoint that other
  * live plans still reference would make THEIR execution fail (local
  * checkpoints cannot recompute). On non-checkpointed plans this is a
  * no-op (no LogicalRDD leaf).
  */
object Checkpoints {

  /** Eager, lineage-truncating materialization for DATA-GRAIN
    * intermediates — pair/edge/corpus-sized tables whose row count
    * scales with the data rather than with a bounded proxy (ids,
    * hashes, rank lists). Same compute-once + flat-lineage semantics
    * as `localCheckpoint(true)`, but blocks are stored SERIALIZED with
    * disk fallback (MEMORY_AND_DISK_SER) instead of the default
    * deserialized MEMORY_AND_DISK: one contiguous buffer per block
    * instead of ~2 JVM objects per row, so materializing a
    * multi-million-row pair table under 32 concurrent tasks costs
    * bounded storage memory and GC (the r20 driver rig regressed
    * q216/q217 2-7x at 32 cores from exactly this deserialized-block
    * pressure while its own 8-core run was clean), and memory-pressed
    * blocks land on disk instead of thrashing the storage pool.
    * Proxy-grain state keeps plain `localCheckpoint(true)` — its
    * blocks are small and deserialized reads are cheaper. */
  def dataGrain(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** Unpersist the RDD blocks backing a checkpointed `df` (async). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
