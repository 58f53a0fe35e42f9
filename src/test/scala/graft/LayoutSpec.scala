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

  test("zSort: output is globally z-ordered across range partitions") {
    val li = sources.Tables(spark, TestSpark.sf0001, "lineitem")
    val sorted = Layout.zSort(li, "l_partkey", "l_suppkey", partitions = 4)
    val zs = sorted.select($"z").collect().map(_.getLong(0))
    assert(zs.length > 0)
    assert(zs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "z values not globally sorted")
  }
}
