package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the harness test tables (TESTDATA.md).
  *
  * One parquet file per table under `{sfDir}/{name}.parquet`. Reads are
  * plain `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown and column pruning all apply; at cluster scale the same call
  * works on a partitioned directory tree unchanged.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
  * (see [[nanosConf]]) and the loader converts the nanos long back to a
  * TimestampType via exact integer division (micro truncation — the same
  * ns→µs truncation other engines apply when reading ns timestamps).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  val nanosConf: (String, String) = "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      // `div` = exact integer division; a double `/` would lose precision
      // on epoch-nanos magnitudes (> 2^53).
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
