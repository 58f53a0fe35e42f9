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
}
