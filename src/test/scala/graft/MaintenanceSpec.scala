package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Maintenance

class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(units: Seq[(String, Long)], targetBytes: Long) = {
    // one row per unit, bytes carried directly
    val df = units.toDF("k", "bytes")
    val target = Seq(targetBytes).toDF("target")
    Maintenance.compactionPlan(df, Seq("k"), col("bytes"), target)
      .collect().sortBy(_.getAs[Long]("bin"))
  }

  test("compactionPlan: greedy cumulative fill in listing order") {
    // units a..e of 40,40,40,100,10 bytes, target 100:
    // cum-before 0,40,80,120,220 → bins 0,0,0,1,2
    val bins = plan(Seq("a" -> 40L, "b" -> 40L, "c" -> 40L,
      "d" -> 100L, "e" -> 10L), 100L)
    assert(bins.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 1L, 2L))
    assert(bins.map(_.getAs[Long]("n_units")).toSeq == Seq(3L, 1L, 1L))
    assert(bins.map(_.getAs[Long]("bytes")).toSeq == Seq(120L, 100L, 10L))
    // listing order is contiguous across bins
    assert(bins.map(r => (r.getAs[Long]("ord_first"), r.getAs[Long]("ord_last")))
      .toSeq == Seq((1L, 3L), (4L, 4L), (5L, 5L)))
    // the 100-byte unit is flagged oversize (≥ target), the rest not
    assert(bins.map(_.getAs[Long]("n_oversize")).toSeq == Seq(0L, 1L, 0L))
  }

  test("compactionPlan: conservation and fill-bound invariants on the " +
       "documents fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val bytes = expr("octet_length(text)") + lit(16L)
    val total = docs.agg(sum(bytes).cast("long")).head.getLong(0)
    val targetBytes = total / 8 + 1
    val target = Seq(targetBytes).toDF("target")
    val bins = Maintenance.compactionPlan(docs, Seq("lang", "source"),
      bytes, target).collect()
    // conservation: every byte and row lands in exactly one bin
    assert(bins.map(_.getAs[Long]("bytes")).sum == total)
    assert(bins.map(_.getAs[Long]("n_rows")).sum == docs.count())
    // unit ordinals partition 1..N contiguously across bins
    val spans = bins.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("ord_first"), r.getAs[Long]("ord_last")))
    spans.sliding(2).foreach {
      case Array((_, l1), (f2, _)) => assert(f2 == l1 + 1)
      case _ =>
    }
    // greedy fill bound: a bin only overshoots by its LAST unit, so
    // bytes < target + max unit size; and every bin but the last
    // reaches the target (otherwise the next unit would have joined it)
    val maxUnit = docs.groupBy("lang", "source").agg(sum(bytes).as("b"))
      .agg(max("b").cast("long")).head.getLong(0)
    bins.foreach(r =>
      assert(r.getAs[Long]("bytes") < targetBytes + maxUnit))
    val lastBin = bins.map(_.getAs[Long]("bin")).max
    bins.filter(_.getAs[Long]("bin") != lastBin).foreach(r =>
      assert(r.getAs[Long]("bytes") + maxUnit > targetBytes))
  }

  test("compactionPlan: the planning window runs over the unit rollup, " +
       "not the corpus scan") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val target = Seq(1000L).toDF("target")
    val planDf = Maintenance.compactionPlan(docs, Seq("lang", "source"),
      expr("octet_length(text)") + lit(16L), target)
    val physical = planDf.queryExecution.executedPlan.toString
    // the Window node's child side must already be aggregated: below
    // the Window (tree prints top-down) an aggregate must appear
    // before the file scan — the window consumes |units| rollup rows,
    // never corpus rows
    val lines = physical.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, s"expected a Window in:\n$physical")
    val aggBelow = lines.indexWhere(_.contains("HashAggregate"), winIdx + 1)
    val scanBelow = lines.indexWhere(_.contains("Scan"), winIdx + 1)
    assert(aggBelow >= 0 && (scanBelow < 0 || aggBelow < scanBelow),
      s"planning window must consume the unit rollup (aggregate below " +
        s"it, above the scan):\n$physical")
  }

  test("mergeMomentStats: incremental fold equals the monolithic " +
       "aggregate exactly, including one-sided strata") {
    import graft.operators.Incremental
    // strata: a in both batches, b only in batch 1, c only in batch 2
    val rows1 = Seq(("a", 10L), ("a", 4L), ("b", 7L))
    val rows2 = Seq(("a", 1L), ("c", 100L), ("c", 2L))
    def stats(rows: Seq[(String, Long)]) =
      rows.toDF("k", "v").groupBy("k").agg(
        count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val merged = Incremental.mergeMomentStats(stats(rows1), stats(rows2),
        Seq("k"), sumCols = Seq("n", "s"), minCols = Seq("mn"),
        maxCols = Seq("mx"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("s"), r.getAs[Long]("mn"),
          r.getAs[Long]("mx")))).toMap
    val mono = stats(rows1 ++ rows2).collect().map(r => r.getString(0) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("s"), r.getAs[Long]("mn"),
        r.getAs[Long]("mx")))).toMap
    assert(merged == mono)
    assert(merged("b") == ((1L, 7L, 7L, 7L)) &&
      merged("c") == ((2L, 102L, 2L, 100L)))
  }
}
