package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Checkpoints, Graph}

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Independent reference: dense synchronous PageRank with the
    * standard dangling-mass redistribution (sinks re-enter uniformly). */
  private def refPr(edges: Seq[(Long, Long)], iters: Int,
                    d: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val dangling = nodes.filterNot(out.contains)
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / out(s) }.sum).toMap
      val dm = dangling.map(pr).sum
      pr = nodes.map(v =>
        v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0) + d * dm / n)).toMap
    }
    pr
  }

  test("pageRank: symmetric cycle is uniform; star matches an " +
       "independent reference; mass conserves") {
    import spark.implicits._
    // 2-cycle: exactly uniform at every iteration
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val prC = Graph.pageRank(cyc, 3, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(prC(1L) - 0.5) < 1e-12 && math.abs(prC(2L) - 0.5) < 1e-12)
    // star (center 0, leaves 1..4, both directions): center accumulates
    val star = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L)))
    val prS = Graph.pageRank(star.toDF("src", "dst"), 5, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = refPr(star, 5, 0.85)
    for ((v, p) <- expected)
      assert(math.abs(prS(v) - p) < 1e-9, s"node $v: ${prS(v)} vs $p")
    assert(prS(0L) > prS(1L))
    // probability mass conserves (no dangling leakage)
    assert(math.abs(prS.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: dangling sinks redistribute through the teleport — " +
       "mass conserves and matches the reference") {
    import spark.implicits._
    // chain 1→2→3 plus 1→4: nodes 3 and 4 are sinks (no out-edges);
    // without redistribution their mass would leak every iteration
    val g = Seq((1L, 2L), (2L, 3L), (1L, 4L))
    val got = Graph.pageRank(g.toDF("src", "dst"), 8, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = refPr(g, 8, 0.85)
    assert(got.keySet == expected.keySet)
    for ((v, p) <- expected)
      assert(math.abs(got(v) - p) < 1e-9, s"node $v: ${got(v)} vs $p")
    // the load-bearing property: Σpr stays exactly 1 despite the sinks
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // sinks receive but never forward: the fed sink (3, fed by 2's
    // whole share) outranks the source (1, teleport-only inflow)
    assert(got(3L) > got(1L))
  }

  /** Reference PPR: teleport to the seed distribution; dangling mass
    * re-enters at the seeds (the Haveliwala restart convention). */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Map[Long, Double],
                     iters: Int, d: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tw = seeds.values.sum
    val t = nodes.map(v => v -> seeds.getOrElse(v, 0.0) / tw).toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val dangling = nodes.filterNot(out.contains)
    var pr = t
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / out(s) }.sum).toMap
      val dm = dangling.map(pr).sum
      pr = nodes.map(v =>
        v -> ((1.0 - d) * t(v) + d * in.getOrElse(v, 0.0) +
          d * dm * t(v))).toMap
    }
    pr
  }

  test("personalizedPageRank: mass concentrates near the seed, matches " +
       "the reference, conserves mass; empty seeds rejected") {
    import spark.implicits._
    // path 0-1-2-3 (both directions): seed at node 0
    val path = (0L to 2L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val seeds = Seq((0L, 2.0)).toDF("node", "weight")
    val got = Graph.personalizedPageRank(path.toDF("src", "dst"), seeds,
        5, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = refPpr(path, Map(0L -> 2.0), 5, 0.85)
    for ((v, p) <- expected)
      assert(math.abs(got(v) - p) < 1e-9, s"node $v: ${got(v)} vs $p")
    // proximity: mass concentrates in the seed's neighborhood (the
    // seed itself can rank below its neighbor — deg-1 node 0 exports
    // ALL its mass while node 1 splits; the cohort claim is what PPR
    // guarantees)
    assert(got(0L) + got(1L) > got(2L) + got(3L))
    assert(got(1L) > got(3L) && got(0L) > got(3L))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    val err = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(path.toDF("src", "dst"),
        Seq.empty[(Long, Double)].toDF("node", "weight"), 2, 0.85)
    }
    assert(err.getMessage.contains("positive total"))
  }

  test("personalizedPageRank: dangling mass re-enters at the seeds — " +
       "mass conserves on a sink graph and matches the reference") {
    import spark.implicits._
    // seed 0 feeds a chain into sinks: 0→1, 1→2, 0→3; 2 and 3 dangle
    val g = Seq((0L, 1L), (1L, 2L), (0L, 3L))
    val seeds = Seq((0L, 1.0)).toDF("node", "weight")
    val got = Graph.personalizedPageRank(g.toDF("src", "dst"), seeds,
        6, 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = refPpr(g, Map(0L -> 1.0), 6, 0.85)
    for ((v, p) <- expected)
      assert(math.abs(got(v) - p) < 1e-9, s"node $v: ${got(v)} vs $p")
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("checkpoint storage stays O(1) in iterations: a 20-iteration " +
       "run retains only the result's blocks, released on demand") {
    import spark.implicits._
    val sc = spark.sparkContext
    // settle any async unpersists from earlier tests, then snapshot
    val before = sc.getPersistentRDDs.keySet
    val star = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L)))
    val pr = Graph.pageRank(star.toDF("src", "dst"), 20, 0.85)
    assert(pr.count() == 7)
    // every superseded iteration vector, the layout, the teleport, and
    // the dangling probe were released inside the call: the ONLY new
    // persistent RDD is the returned (checkpointed) rank vector —
    // storage did not grow with the 20 iterations
    val afterRun = sc.getPersistentRDDs.keySet -- before
    assert(afterRun.size <= 1,
      s"expected <= 1 retained checkpoint RDD, got ${afterRun.size}")
    // the documented cleanup hook frees the result too
    Checkpoints.release(pr)
    val afterRelease = sc.getPersistentRDDs.keySet -- before
    assert(afterRelease.isEmpty,
      s"release left ${afterRelease.size} persistent RDD(s)")
  }

  test("connectedComponents releases all superseded round checkpoints: " +
       "only the labels' blocks survive the call") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // two long chains → several star rounds before convergence
    val pairs = ((1L to 40L).sliding(2).map(w => (w(0), w(1))) ++
      (100L to 140L).sliding(2).map(w => (w(0), w(1)))).toSeq
      .toDF("id_a", "id_b")
    val labels = graft.operators.Dedup.connectedComponents(pairs)
    assert(labels.select("rep").distinct().count() == 2)
    val afterRun = sc.getPersistentRDDs.keySet -- before
    assert(afterRun.size <= 1,
      s"expected <= 1 retained checkpoint RDD, got ${afterRun.size}")
    Checkpoints.release(labels)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("triangleStats: clique, chain, and brute-force equality") {
    import spark.implicits._
    // K4 on 1-4 (4 triangles, every node in 3), a chain 5-6-7 (none),
    // and a pendant 4-5 bridging them
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val out = graft.operators.Graph.triangleStats(pairs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(4L) == ((4L, 3L, 0.5)))       // K4 member + pendant
    assert(out(5L) == ((2L, 0L, 0.0)))
    assert(out(7L) == ((1L, 0L, 0.0)))       // degree-1 → cc 0, not NaN
    // brute force on a pseudo-random graph (deterministic edge set)
    val es = (for (a <- 1L to 24L; b <- (a + 1) to 24L
      if (a * 31 + b * 17) % 5 == 0) yield (a, b))
    val got = graft.operators.Graph.triangleStats(es.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = adj.map { case (n, nb) =>
      val t = nb.toSeq.combinations(2).count(p => adj(p(0)).contains(p(1)))
      (n, nb.size.toLong, t.toLong)
    }.toSet
    assert(got == want)
  }
}
