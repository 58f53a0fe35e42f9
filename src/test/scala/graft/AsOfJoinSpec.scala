package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val left = Seq(
    ("u1", 100L, "e1"), ("u1", 250L, "e2"), ("u2", 50L, "e3"),
    ("u1", 20L, "e4")).toDF("k", "t", "id")
  private val right = Seq(
    ("u1", 100L, "r100"), ("u1", 200L, "r200"), ("u2", 60L, "r60"))
    .toDF("k", "t", "ref")

  test("inner: most recent right row <= left time; unmatched dropped") {
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ref"))
      .collect().map(r => (r.getString(2), r.getString(3))).toMap
    assert(got == Map(
      "e1" -> "r100",   // tie at t=100 is inclusive
      "e2" -> "r200"))  // most recent, not first
    // e4 (t=20, before any u1 right row) and e3 (u2 t=50 < 60) dropped
  }

  test("left: unmatched rows kept with null payload") {
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("ref"), "left")
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got("e4").isEmpty && got("e3").isEmpty && got("e1").contains("r100"))
    assert(got.size == 4)
  }

  test("non-orderable payload type fails fast with a clear message") {
    val r = right.withColumn("m",
      org.apache.spark.sql.functions.map(
        org.apache.spark.sql.functions.lit("a"), org.apache.spark.sql.functions.lit(1)))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, r, "k", "t", Seq("ref", "m"))
    }
    assert(e.getMessage.contains("non-orderable"))
  }

  test("bucketed == plain on the base case, across bucket widths") {
    for (w <- Seq(1L, 7L, 100L, 1000L); jt <- Seq("inner", "left")) {
      val plain = AsOfJoin.asOf(left, right, "k", "t", Seq("ref"), jt)
        .collect().map(_.toSeq).toSet
      val bucketed = AsOfJoin.asOfBucketed(left, right, "k", "t", Seq("ref"), w, jt)
        .collect().map(_.toSeq).toSet
      assert(bucketed == plain, s"width=$w joinType=$jt")
    }
  }

  test("bucketed == plain on a pathological hot key, with bounded buckets") {
    // ONE key holds every row — the exact shape that forces asOf's window
    // to sort the whole input in a single task. 5k left probes at odd
    // times, 2.5k right rows at multiples of 4 (so matches cross bucket
    // boundaries constantly), plus a negative-time region to exercise
    // floor division and an empty-bucket gap [10000, 30000).
    val hotLeft = spark.range(5000)
      .selectExpr("'hot' AS k", "id * 2 + 1 - 3000 AS t", "CAST(id AS STRING) AS id")
      .union(spark.range(100).selectExpr(
        "'hot' AS k", "id + 30000 AS t", "CAST(id + 90000 AS STRING) AS id"))
    val hotRight = spark.range(2500)
      .selectExpr("'hot' AS k", "id * 4 - 3000 AS t", "concat('r', id) AS ref")
    val plain = AsOfJoin.asOf(hotLeft, hotRight, "k", "t", Seq("ref"), "left")
      .collect().map(_.toSeq).toSet
    val bucketed = AsOfJoin.asOfBucketed(hotLeft, hotRight, "k", "t", Seq("ref"),
      bucketWidth = 256L, joinType = "left")
    assert(bucketed.collect().map(_.toSeq).toSet == plain)
    // the skew bound: max rows any in-bucket sort sees is ~bucketWidth/2
    // per side + 1 seed, NOT the 10k-row key history
    import org.apache.spark.sql.functions._
    val maxBucket = hotLeft.select(col("k"),
        expr("CASE WHEN t >= 0 THEN t DIV 256 ELSE (t - 255) DIV 256 END").as("b"))
      .groupBy("k", "b").count().agg(max("count")).head().getLong(0)
    assert(maxBucket <= 256, s"bucket not bounded: $maxBucket")
  }

  test("bucketed rejects null and near-Long.MinValue times with a clear error") {
    // null time: asOf carries a null-time right row to all later rows;
    // bucketed has no bucket for it — divergence must throw, not differ
    val nullRight = Seq(("u1", Option(100L), "r100"), ("u1", Option.empty[Long], "rN"))
      .toDF("k", "t", "ref")
    val e1 = intercept[Exception] {
      AsOfJoin.asOfBucketed(left, nullRight, "k", "t", Seq("ref"), 100L).collect()
    }
    assert(e1.getMessage.contains("non-null"), e1.getMessage)
    // Long.MinValue neighborhood: negative-branch bucket arithmetic
    // overflows and collides with the seed sentinel — guarded
    val extremeLeft = Seq(("u1", Long.MinValue + 5L, "eX")).toDF("k", "t", "id")
    val e2 = intercept[Exception] {
      AsOfJoin.asOfBucketed(extremeLeft, right, "k", "t", Seq("ref"), 100L).collect()
    }
    assert(e2.getMessage.contains("Long.MinValue + bucketWidth"), e2.getMessage)
    // guard is inert on healthy data (same rows as before)
    assert(AsOfJoin.asOfBucketed(left, right, "k", "t", Seq("ref"), 100L)
      .count() == 2)
  }

  test("duplicate right timestamps: bucketed picks the same deterministic winner") {
    val dupRight = Seq(("u1", 100L, "rA"), ("u1", 100L, "rB"), ("u1", 100L, "rC"))
      .toDF("k", "t", "ref")
    val plain = AsOfJoin.asOf(left, dupRight, "k", "t", Seq("ref"))
      .collect().map(_.toSeq).toSet
    for (w <- Seq(3L, 50L, 1000L)) {
      val b = AsOfJoin.asOfBucketed(left, dupRight, "k", "t", Seq("ref"), w)
        .collect().map(_.toSeq).toSet
      assert(b == plain, s"width=$w")
    }
  }
}
