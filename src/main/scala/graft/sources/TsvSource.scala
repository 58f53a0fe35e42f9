package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** `\N`-aware TSV reader, reproducing the reference raw-ingest semantics
  * (ref: glue_jobs/etl_movies_episodes_analytics_advanced.py:53-60 — gzipped
  * tab-delimited, header row, every column string, literal `\N` as NULL).
  *
  * Spark-first: the `nullValue` option turns `\N` into SQL NULL at scan
  * time, so no per-column `when(col === "\\N", null)` scrub is needed and
  * the whole read stays inside the vectorized CSV reader. Gzip codec is
  * inferred from the `.gz` extension.
  */
object TsvSource {

  /** All-string read (mirrors the reference's dynamic raw layer). */
  def apply(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "\\N")
      .csv(path)

  /** Typed read with an explicit schema (our preferred strict layer). */
  def apply(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("nullValue", "\\N")
      .schema(schema)
      .csv(path)
}
