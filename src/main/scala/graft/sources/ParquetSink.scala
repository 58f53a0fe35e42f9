package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Partitioned parquet sinks with the reference's two write disciplines
  * (ref: glue append `glue_jobs/etl_movies_episodes_analytics_advanced.py:196-202`;
  * Snowflake DELETE+INSERT slice reload `airflow/dags/imdb_batch_pipeline.py:211-299`).
  *
  * Scale notes:
  *  - `repartition(partitionCols)` before `partitionBy` gives ~1 file per
  *    output partition instead of (tasks × partitions) small files — the
  *    same trick the reference uses, and the one that matters at 100 TB
  *    where small files kill the downstream scans.
  *  - `partitionOverwriteMode=dynamic` + `SaveMode.Overwrite` is the
  *    Spark-native replacement for DELETE+INSERT idempotent slice reload:
  *    only the partitions present in the batch are replaced.
  */
object ParquetSink {

  /** Append a run-stamped snapshot (raw history layer, I2 semantics). */
  def append(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Append)
      .parquet(path)

  /** Idempotently replace just the partitions present in `df` (I4). */
  def overwriteSlices(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Bucketed catalog table: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with NO
    * exchange on either side (asserted in SourcesAndQualitySpec). The
    * cluster-scale tool for repeated joins on the same key (e.g. facts ⋈
    * facts on tconst): pay the shuffle once at write time, never again. */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
               numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .mode(SaveMode.Overwrite)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}
