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

  /** Materialized latest-slice pointer (ref imdb_raw_ingest.py:199-200's
    * `latest/` copy): a `_LATEST` file at the table root naming the
    * newest run_date, so helper-less readers address the latest slice
    * directly (`path/run_date=<value>`) without listing partitions or
    * running the latestSlice window. Monotone: a rerun of an OLD
    * run_date never moves the pointer backward. */
  def writeLatestPointer(path: String, runDate: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    if (readLatestPointer(path).forall(_ <= runDate)) {
      // write-temp + atomic rename: an in-place truncate+write exposes an
      // empty/partial pointer to a concurrent reader (and to the next run
      // if this one dies mid-write); ATOMIC_MOVE makes the swap all-or-
      // nothing on POSIX filesystems (on object stores, pair the pointer
      // with the manifest's _SUCCESS discipline instead)
      val tmp = Files.createTempFile(Paths.get(path), "._LATEST.", ".tmp")
      Files.write(tmp, runDate.getBytes)
      Files.move(tmp, Paths.get(path, "_LATEST"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def readLatestPointer(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path, "_LATEST")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p)).trim).filter(_.nonEmpty)
    else None
  }

  /** Bucketed catalog table: co-locates future joins/aggregations on
    * `bucketCols` — two tables bucketed the same way join with NO
    * exchange on either side (asserted in SourcesAndQualitySpec). The
    * cluster-scale tool for repeated joins on the same key (e.g. facts ⋈
    * facts on tconst): pay the shuffle once at write time, never again. */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
               numBuckets: Int, sortCols: Seq[String] = Seq.empty,
               mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .mode(mode)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}
