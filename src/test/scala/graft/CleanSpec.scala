package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Clean

class CleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nullify scrubs \\N, blanks, and whitespace-only") {
    val df = Seq("ok", "\\N", "", "   ", "\tx").toDF("v")
      .select(Clean.nullify(col("v")).as("c"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("ok"), None, None, None, Some("\tx")))
  }

  test("tryCastClean: lenient cast with \\N awareness") {
    val df = Seq("42", "\\N", "abc", " ", "-7").toDF("v")
      .select(Clean.tryCastClean(col("v"), "long").as("c"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ==
      Seq(Some(42L), None, None, None, Some(-7L)))
  }

  test("decadeOf floors toward -inf (negative years too)") {
    val df = Seq(1994, 2000, 1899, -5).toDF("y")
      .select(Clean.decadeOf(col("y")).as("d"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1990L, 2000L, 1890L, -10L))
  }

  test("flag and caseBucket") {
    val df = Seq(5, 50, 500).toDF("v").select(
      Clean.flag(col("v") > 10).as("f"),
      Clean.caseBucket(Seq((col("v") >= 100) -> "big", (col("v") >= 10) -> "mid"), "small").as("b"))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((0L, "small"), (1L, "mid"), (1L, "big")))
  }
}
