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
}
