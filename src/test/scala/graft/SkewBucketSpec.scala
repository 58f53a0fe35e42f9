package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.{ParquetSink, Tables}

class SkewBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("saltedJoin result == plain join (inner)") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables(spark, TestSpark.sf0001, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val salted = Skew.saltedJoin(li, part, "l_partkey", saltFactor = 4)
    assert(asSet(salted.select(plain.columns.map(col): _*)) == asSet(plain))
  }

  test("hybridSkewJoin result == plain join") {
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables(spark, TestSpark.sf0001, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val hybrid = Skew.hybridSkewJoin(li, part, "l_partkey", hotKeyThreshold = 5)
    assert(asSet(hybrid.select(plain.columns.map(col): _*)) == asSet(plain))
  }

  test("hotKeys finds injected hot key") {
    val df = (Seq.fill(100)(7L) ++ (1L to 20L)).toDF("k")
    val hot = Skew.hotKeys(df, "k", 50).collect()
    assert(hot.length == 1 && hot.head.getLong(0) == 7L)
  }

  test("bucketed tables join with no shuffle exchange") {
    val orders = Tables(spark, TestSpark.sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables(spark, TestSpark.sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    ParquetSink.bucketed(orders, "b_orders", Seq("o_orderkey"), 8)
    ParquetSink.bucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", Seq("o_orderkey"), 8)
    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    assert(joined.count() == li.count())
    spark.sql("DROP TABLE b_orders"); spark.sql("DROP TABLE b_lineitem")
  }
}
