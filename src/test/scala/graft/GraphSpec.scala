package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Independent reference: dense synchronous PageRank. */
  private def refPr(edges: Seq[(Long, Long)], iters: Int,
                    d: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / out(s) }.sum).toMap
      pr = nodes.map(v =>
        v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("pageRank: symmetric cycle is uniform; star matches an " +
       "independent reference; mass conserves; dangling rejected") {
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
    // a one-direction edge set leaves dangling sinks → rejected loudly
    val err = intercept[IllegalArgumentException] {
      Graph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), 2, 0.85)
    }
    assert(err.getMessage.contains("dangling"))
  }

  /** Reference PPR: teleport to the seed distribution. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Map[Long, Double],
                     iters: Int, d: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tw = seeds.values.sum
    val t = nodes.map(v => v -> seeds.getOrElse(v, 0.0) / tw).toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var pr = t
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / out(s) }.sum).toMap
      pr = nodes.map(v =>
        v -> ((1.0 - d) * t(v) + d * in.getOrElse(v, 0.0))).toMap
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
}
