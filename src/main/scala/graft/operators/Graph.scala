package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame =
    pageRankImpl(edges, None, iters, damping)

  /** PERSONALIZED PageRank (Haveliwala, WWW 2002): the random surfer
    * teleports to the SEED distribution instead of uniformly, so rank
    * measures proximity to the seeds — the seed-based corpus-expansion
    * primitive ("find data like my curated seed set" over a
    * similarity/activity graph; the public web-curation shape behind
    * seed-and-expand crawls). `seeds` is (node, weight ≥ 0) with
    * positive total — weights normalize in-plan to the teleport
    * distribution t; pr₀ = t and each step is
    * (1−d)·t + d·Σ in-mass. Non-seed nodes get teleport 0, so mass
    * drains toward the seed neighborhood. Same per-iteration shape,
    * requirements (no dangling nodes), determinism contract, and
    * round-before-rank consumer discipline as [[pageRank]]. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int, damping: Double): DataFrame =
    pageRankImpl(edges, Some(seeds), iters, damping)

  private def pageRankImpl(edges: DataFrame, seeds: Option[DataFrame],
                           iters: Int, damping: Double): DataFrame = {
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
    // teleport distribution: uniform 1/n, or the normalized seed
    // weights (node-grain, materialized once like the layout)
    val tele = seeds match {
      case None =>
        nodes.withColumn("t", lit(1.0 / n)).localCheckpoint(true)
      case Some(sd) =>
        val sw = sd.select(col("node").cast("long").as("node"),
          col("weight").cast("double").as("w"))
        val tot = sw.agg(sum(col("w")).as("tw"))
        val twRow = tot.head()
        require(!twRow.isNullAt(0) && twRow.getDouble(0) > 0,
          "personalizedPageRank: seed weights must have positive total")
        nodes.join(sw, Seq("node"), "left")
          .crossJoin(broadcast(tot))
          .select(col("node"),
            (coalesce(col("w"), lit(0.0)) / col("tw")).as("t"))
          .localCheckpoint(true)
    }
    // the uniform path keeps its exact historical arithmetic
    // ((1−d)/n as ONE division — the q158 oracle replays that op
    // chain); the personalized path is (1−d)·t_v per node (q159's)
    val teleTerm: Column =
      if (seeds.isEmpty) lit((1.0 - damping) / n)
      else lit(1.0 - damping) * col("t")
    var pr = tele.select(col("node"), col("t").as("pr"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val contribs = withDeg
        .join(pr, withDeg("src") === pr("node"))
        .select(col("dst").as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_mass"))
      pr = tele.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (teleTerm +
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
