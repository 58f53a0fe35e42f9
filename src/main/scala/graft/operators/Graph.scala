package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics: PageRank (Page, Brin, Motwani & Winograd
  * 1999) over an edge table — the random-surfer importance measure,
  * used pipeline-side to weight interlinked sources (site/domain
  * authority as a quality prior, the public CommonCrawl-curation
  * signal).
  *
  * Scale shape: the classic alternating key pattern — each iteration
  * is ONE join of the edge table against the node-grain rank vector
  * (keyed by src) and ONE aggregate back to node grain (keyed by dst);
  * both exchanges carry ids and doubles, never payloads, and the edge
  * table's partitioning is reusable across iterations. Ranks are
  * materialized per iteration (persist + count, the
  * [[Dedup]]-connected-components discipline) so lineage stays one
  * iteration deep instead of replanning the whole chain each round.
  */
object Graph {

  /** `iters` synchronous PageRank iterations over directed `edges`
    * (`src`, `dst` long columns; supply both directions for an
    * undirected graph). Every node must have out-degree ≥ 1 (true by
    * construction for both-direction edge sets) — dangling mass is not
    * redistributed, and the requirement is checked. Returns
    * (node, pr) with Σpr = 1 (spec-asserted).
    *
    * Determinism: the arithmetic per node is a fixed op chain
    * ((1−d)/N + d·Σ contribs); only the Σ over in-neighbors is
    * engine/partition-order sensitive (~1 ulp per iteration), so
    * consumers round ranks before comparing or ranking (q158). */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // one-time graph layout, eagerly materialized with truncated
    // lineage (the connected-components discipline): the iteration
    // loop must not replan or recompute the node set / degree-joined
    // edge list every round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(outDeg, Seq("src")).localCheckpoint(true)
    // every src has a degree row by construction, so a dangling node
    // (dst-only) is visible as |nodes| > |distinct src|
    val n = nodes.count().toDouble
    val nOut = withDeg.select(col("src")).distinct().count()
    require(nOut == n.toLong,
      s"pageRank: ${n.toLong - nOut} dangling node(s) - supply both directions")
    var pr = nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(true)
    for (_ <- 0 until iters) {
      val contribs = withDeg
        .join(pr, withDeg("src") === pr("node"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      pr = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
    }
    // superseded rank vectors' checkpoint blocks (node-grain doubles,
    // iters of them) stay in the block manager until the session/RDD
    // GC reclaims them — Dataset.unpersist does not free localCheckpoint
    // storage; the bench releases leftover RDD blocks between samples,
    // and long-lived callers should bound iters accordingly
    pr
  }
}
