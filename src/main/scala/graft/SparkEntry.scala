package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real surface lives in [[Queries]]; this object just adapts it.
  */
object SparkEntry {

  /** Flagship query (TPC-H-Q1-shaped rollup, SURVEY §2.6 A1/A5/A6) on
    * sf=0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q11_agg_rollup").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline operator set). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** DuckDB oracle SQL per query; omitted for ops whose hashing is not
    * expressible in ANSI SQL (driver then records a rows-only check). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
