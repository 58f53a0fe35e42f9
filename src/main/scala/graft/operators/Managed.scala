package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** A DataFrame paired with the lifecycle of the OPERATOR-OWNED cached /
  * checkpointed state backing it — the [[Corpus.PreparedCorpus]]
  * discipline generalized.
  *
  * Two kinds of owned state, released differently:
  *  - `cached`: Dataset-level persists registered in the session
  *    CacheManager (held STRONGLY until unpersist/clearCache) —
  *    released via `unpersist`;
  *  - `checkpointed`: eager localCheckpoints whose blocks belong to the
  *    underlying RDD's persist and wait for the ContextCleaner's
  *    GC-triggered sweep — released via [[Checkpoints.release]].
  *
  * The release handle frees ONLY state the operator itself created.
  * That scoping is the point: directing `Checkpoints.release` at a
  * returned plan would unpersist EVERY LogicalRDD leaf in it, including
  * checkpoints the CALLER owns (whose truncated lineage can never be
  * recomputed) — the exact hazard a shared handle exists to prevent.
  *
  * Contract: call [[release]] once `df` has been materialized
  * (written / collected); long-lived sessions that skip it accumulate
  * the owned blocks for the session lifetime. */
final case class ManagedFrame(df: DataFrame,
                              private val cached: Seq[DataFrame],
                              private val checkpointed: Seq[DataFrame] = Nil) {
  def release(): Unit = {
    cached.foreach(_.unpersist())
    checkpointed.foreach(Checkpoints.release)
    ()
  }
  /** True when every operator-owned Dataset persist is gone (checkpoint
    * block release is async and RDD-level — not observable here). */
  def isReleased: Boolean =
    cached.forall(_.storageLevel == StorageLevel.NONE)
}
