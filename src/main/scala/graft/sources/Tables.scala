package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the harness test tables (TESTDATA.md).
  *
  * One parquet file per table under `{sfDir}/{name}.parquet`. Reads are
  * plain `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown and column pruning all apply; at cluster scale the same call
  * works on a partitioned directory tree unchanged.
  *
  * `events.ts` has shipped in two physical encodings across harness
  * revisions, both normalized here to session-zoned TimestampType so
  * every downstream operator (unix_micros, windows, watermarks) sees one
  * type:
  *   - parquet TIMESTAMP(NANOS), which Spark's reader rejects; sessions
  *     set `spark.sql.legacy.parquet.nanosAsLong` (see [[nanosConf]]) and
  *     the loader converts the nanos long back via exact integer division
  *     (micro truncation — the same ns→µs truncation other engines apply)
  *   - parquet TIMESTAMP(MICROS) without timezone, which Spark reads as
  *     TIMESTAMP_NTZ; cast to TimestampType interprets the naive value in
  *     the session timezone (all entrypoints pin UTC), matching how the
  *     DuckDB oracle treats the same naive value.
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
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }
}
