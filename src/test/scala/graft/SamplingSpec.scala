package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hashSample: deterministic, repartition-invariant, rate ballpark") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val a = Sampling.hashSample(docs, col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), col("text"), 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    val rate = a.size.toDouble / docs.count()
    assert(rate > 0.15 && rate < 0.35, s"rate $rate far from 0.25")
  }

  test("rate 0 and 1 edge cases") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    assert(Sampling.hashSample(docs, col("text"), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, col("text"), 1.0).count() == docs.count())
  }

  test("stratified: per-stratum rates apply; sample nests in larger sample") {
    val docs = Tables(spark, TestSpark.sf0001, "documents")
    val s = Sampling.stratifiedHashSample(docs, col("text"), col("lang"),
      Map("en" -> 0.125), defaultRate = 0.5)
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en").toDouble / total("en") < 0.3)
    assert(byLang.filterNot(_._1 == "en").map(_._2).sum.toDouble /
      total.filterNot(_._1 == "en").map(_._2).sum > 0.3)
    // prefix buckets nest: the 12.5% sample is a subset of the 50% one
    val small = Sampling.hashSample(docs, col("text"), 0.125)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(docs, col("text"), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
  }
}
