package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs at sf0.001 and most return rows.
  * (Full value-level correctness runs through Verify + the DuckDB oracle
  * gate — see tools/check.py.) */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // pair-finding queries may legitimately return 0 rows at tiny SF
  private val mayBeEmpty = Set("q09_join_anti", "q27_embedding_dup_pairs")

  Queries.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.run(spark, TestSpark.sf0001).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle SQL or a documented reason") {
    val noOracle = Queries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }
}
