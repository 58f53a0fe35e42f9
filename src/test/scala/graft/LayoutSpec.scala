package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mortonZ: hand values, bit interleave, 16-bit masking") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 3L), (255L, 0L), (0L, 255L),
      (65535L, 65535L), (65536L + 3L, 0L)).toDF("a", "b")
      .select(Layout.mortonZ($"a", $"b").as("z")).collect().map(_.getLong(0))
    assert(df(0) == 1L)         // a bits at even positions
    assert(df(1) == 2L)         // b bits at odd positions
    assert(df(2) == 15L)        // 0b11 ⨯ 0b11 → 0b1111
    assert(df(3) == 0x5555L)    // 8 a-bits spread over 16
    assert(df(4) == 0xAAAAL)
    assert(df(5) == 0xFFFFFFFFL)
    assert(df(6) == 5L)         // keys are masked to 16 bits
  }

  test("zBucketStats: uniform 256x256 grid tiles exactly; a 2-D box " +
       "prunes to a small candidate rectangle that covers all box rows") {
    val grid = spark.range(256L * 256L)
      .select(($"id" / 256).cast("long").as("pa"), ($"id" % 256).as("pb"))
    val stats = Layout.zBucketStats(grid, "pa", "pb", tileBits = 4)
      .withColumn("cand", Layout.boxCandidate(
        lit(63L), lit(127L), lit(63L), lit(127L)))
      .collect()
    assert(stats.length == 256) // 16x16 tiles, all populated
    // every tile of a uniform grid covers exactly one 16x16 rectangle
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == 256L)
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") == 15L)
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") == 15L)
    }
    // box [63,127]^2 touches tiles 3..7 per dim → 25 of 256 candidates
    val cands = stats.filter(_.getAs[Long]("cand") == 1L)
    assert(cands.length == 25, s"got ${cands.length} candidate tiles")
    // soundness: every box row's (a, b) lies inside some candidate tile
    val boxRows = grid.filter($"pa".between(63, 127) && $"pb".between(63, 127))
      .count()
    val candCap = cands.map(r =>
      (r.getAs[Long]("a_max") - r.getAs[Long]("a_min") + 1) *
      (r.getAs[Long]("b_max") - r.getAs[Long]("b_min") + 1)).sum
    assert(boxRows == 65L * 65L)
    assert(candCap >= boxRows) // candidates cover the box
  }

  test("zBucketStats plan: one bucket-keyed hash exchange, partial " +
       "map-side aggregation; z computation is a narrow projection") {
    val li = sources.Tables(spark, TestSpark.sf0001, "lineitem")
      .repartition(5)
    val plan = Layout.zBucketStats(li, "l_partkey", "l_suppkey", tileBits = 4)
      .queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1, hashEx.mkString("\n"))
    assert(hashEx.head.contains("bucket"), hashEx.head)
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      plan.take(1200))
  }

  test("hilbertD kernel: bijective over the full order-8 grid, unit-step " +
       "curve, nested quadrants; expression matches the kernel") {
    // pure-JVM sweep of all 65536 cells — properties that DEFINE a
    // Hilbert-family curve without reference to any particular snippet
    val cells = for (x <- 0 until 256; y <- 0 until 256)
      yield (graft.plans.VectorOps.hilbertD(x, y), x, y)
    val byD = cells.sortBy(_._1).toIndexedSeq
    assert(byD.map(_._1) == (0L until 65536L)) // bijection onto [0, 2^16)
    (1 until byD.length).foreach { i =>
      val (_, x1, y1) = byD(i - 1); val (_, x2, y2) = byD(i)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step at d=$i") // THE Hilbert property; Z-order fails it
    }
    // quadrant nesting: each d-quartile covers exactly one 128x128 quadrant
    byD.grouped(16384).foreach { seg =>
      val xs = seg.map(_._2); val ys = seg.map(_._3)
      assert(xs.max - xs.min == 127 && ys.max - ys.min == 127)
    }
    // the Morton curve, by contrast, jumps: max step exceeds 1
    val zSteps = (for (x <- 0 until 16; y <- 0 until 16)
      yield (zOf(x, y), x, y)).sortBy(_._1)
    val maxZStep = (1 until zSteps.length).map { i =>
      math.abs(zSteps(i)._2 - zSteps(i - 1)._2) +
        math.abs(zSteps(i)._3 - zSteps(i - 1)._3) }.max
    assert(maxZStep > 1)
    // DF expression plumbing: a sample of cells through the Column API
    val sample = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (37L, 201L), (128L, 127L)).toDF("x", "y")
      .select($"x", $"y", graft.plans.exprs.hilbertD($"x", $"y").as("d"))
      .collect()
    sample.foreach { r =>
      assert(r.getLong(2) ==
        graft.plans.VectorOps.hilbertD(r.getLong(0), r.getLong(1)))
    }
  }

  private def zOf(x: Int, y: Int): Long = {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      (x | (x << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }

  test("hilbertBucketStats: aligned tiles match Z-order's exact 16x16 " +
       "quadrants on the uniform grid") {
    val grid = spark.range(256L * 256L)
      .select(($"id" / 256).cast("long").as("pa"), ($"id" % 256).as("pb"))
    val stats = Layout.hilbertBucketStats(grid, "pa", "pb", tileBits = 4)
      .collect()
    assert(stats.length == 256)
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == 256L)
      assert(r.getAs[Long]("a_max") - r.getAs[Long]("a_min") == 15L)
      assert(r.getAs[Long]("b_max") - r.getAs[Long]("b_min") == 15L)
    }
  }

  test("zSort: output is globally z-ordered across range partitions") {
    val li = sources.Tables(spark, TestSpark.sf0001, "lineitem")
    val sorted = Layout.zSort(li, "l_partkey", "l_suppkey", partitions = 4)
    val zs = sorted.select($"z").collect().map(_.getLong(0))
    assert(zs.length > 0)
    assert(zs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "z values not globally sorted")
  }
}
