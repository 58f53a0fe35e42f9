package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.{ImdbSchemas, ImdbTransforms, ImdbMarts}
import graft.quality.Expectations
import graft.quality.Expectations.dsl._
import graft.sources.{ParquetSink, TsvSource}

/** Single-process driver reproducing the reference DAG's semantics
  * (SURVEY §2.11/§3.1):
  * `ingest → transform(movies|episodes|seasons|dq) → validate → publish`.
  * Airflow/Glue/Athena process boundaries collapse into method calls; the
  * Spark driver/executor boundary (#5) remains.
  *
  *  - X2: runDate propagation (explicit arg, UTC-today fallback)
  *  - X4: smoke gate — new run_date slice must have ≥ minRows
  *  - GE layer: range-with-mostly expectations, hard-fail
  *  - S5/I1: IngestRegistry fingerprint skip; S6: manifest + _SUCCESS
  *  - I2/I4: facts append run-scoped partitions; marts dynamically
  *    overwrite their latest slice (the DELETE+INSERT analogue)
  */
final class Runner(spark: SparkSession, rawDir: String, outDir: String) {

  def resolveRunDate(arg: Option[String]): String =                       // X2
    arg.getOrElse(java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE))

  private def raw(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    TsvSource(spark, s"$rawDir/$name.tsv", schema)

  def run(runDateArg: Option[String] = None, minRows: Long = 1): RunReport = {
    val runDate = resolveRunDate(runDateArg)

    // ingest fingerprint gate (S4/S5/I1)
    val registry = new IngestRegistry(s"$outDir/_control")
    val sources = Seq("title_basics", "title_ratings", "title_crew",
      "name_basics", "title_principals", "title_akas", "title_episode")
    val statuses = sources.map { s =>
      s -> registry.decide(s, new java.io.File(s"$rawDir/$s.tsv"))
    }

    val basics = raw("title_basics", ImdbSchemas.titleBasics)
    val ratings = raw("title_ratings", ImdbSchemas.titleRatings)
    val crew = raw("title_crew", ImdbSchemas.titleCrew)
    val names = raw("name_basics", ImdbSchemas.nameBasics)
    val principals = raw("title_principals", ImdbSchemas.titlePrincipals)
    val akas = raw("title_akas", ImdbSchemas.titleAkas)
    val episode = raw("title_episode", ImdbSchemas.titleEpisode)

    // transform — episodes feed two consumers (seasons + DQ): cache the
    // lineage once instead of the reference's triple recompute (SURVEY §4)
    val movies = ImdbTransforms.movieFacts(basics, ratings, crew, principals,
      names, akas, runDate)
    val episodes = ImdbTransforms.episodeFacts(episode, basics, ratings,
      principals, names, runDate).cache()
    val seasons = ImdbTransforms.seasonSummary(episodes)

    ParquetSink.append(movies, s"$outDir/analytics_movie_facts_v2",
      Seq("run_date", "decade", "genre"))                                 // S2
    ParquetSink.append(episodes, s"$outDir/analytics_episode_facts_v2",
      Seq("run_date", "series_decade", "seasonNumber"))
    ParquetSink.append(seasons, s"$outDir/series_season_summary_v2",
      Seq("run_date", "series_decade"))

    // DQ snapshots (one-row aggs, S3/A5) — movies measured post-explode,
    // matching the reference's grain choice (SURVEY §7.4.1)
    val dq = Seq(
      graft.operators.Relational.dqSnapshot(movies, "movies",
        Seq("primaryTitle"), Seq("averageRating", "numVotes"), Seq("tconst")),
      graft.operators.Relational.dqSnapshot(episodes, "episodes",
        Seq("episodeTitle"), Seq("averageRating", "seasonNumber"), Seq("tconst", "seriesId")),
      graft.operators.Relational.dqSnapshot(seasons, "seasons",
        Seq("seriesTitle"), Seq("avgSeasonRating"), Seq("seriesId")))
      .map(_.withColumn("run_date", lit(runDate)))
      .reduce(_.unionByName(_, allowMissingColumns = true))               // O3
    ParquetSink.append(dq, s"$outDir/analytics_quality", Seq("dataset", "run_date"))

    // smoke gate (X4): the new slice must be non-trivially populated
    val published = spark.read.parquet(s"$outDir/analytics_movie_facts_v2")
      .filter(col("run_date") === runDate)
    val smokeCount = published.count()
    require(smokeCount >= minRows, s"smoke gate: $smokeCount < $minRows rows")

    // GE-layer gates (§5.3 semantics, tolerances from the reference)
    Expectations.assertAll(published, Seq(
      notNull("tconst"),
      between("averageRating", 0, 10, mostly = 0.995),
      between("numVotes", 0, Double.MaxValue, mostly = 1.0),
      between("runtimeMinutes", 1, Double.MaxValue, mostly = 0.98)))
    Expectations.assertAll(episodes, Seq(
      between("averageRating", 0, 10, mostly = 0.99)))

    // publish marts — idempotent slice reload (I4)
    val mfv = ImdbMarts.movieFactsView(published)
    ParquetSink.overwriteSlices(ImdbMarts.topMoviesByGenre(mfv)
        .withColumn("run_date", lit(runDate)),
      s"$outDir/marts_top_movies_by_genre", Seq("run_date"))
    ParquetSink.overwriteSlices(ImdbMarts.episodeSeasonTrends(episodes)
        .withColumn("run_date", lit(runDate)),
      s"$outDir/marts_episode_season_trends", Seq("run_date"))

    // dbt-test layer (§5.4): not_null probes on the marts
    Expectations.assertAll(spark.read.parquet(s"$outDir/marts_episode_season_trends"),
      Seq(notNull("seasonNumber")))

    episodes.unpersist()
    val report = RunReport(runDate, smokeCount, statuses.toMap)
    Manifest.write(s"$outDir/_manifests/$runDate", report)                // S6
    sources.foreach(s => registry.record(s, new java.io.File(s"$rawDir/$s.tsv")))
    report
  }
}

final case class RunReport(runDate: String, movieFactRows: Long,
                           ingestStatus: Map[String, String])

/** Control records for change-detected ingest (ref
  * airflow/dags/imdb_raw_ingest.py:70-90,176-187): fingerprint =
  * (length, mtime) — the local-file analogue of
  * Last-Modified/Content-Length/ETag. `decide` → fetch | skip_unchanged. */
final class IngestRegistry(controlDir: String) {
  Files.createDirectories(Paths.get(controlDir))
  private def ctl(name: String) = Paths.get(controlDir, s"$name.fp")

  private def fingerprint(f: java.io.File): String =
    s"${f.length()}:${f.lastModified()}"

  def decide(name: String, f: java.io.File): String =
    if (!f.exists()) "missing"
    else if (Files.exists(ctl(name)) &&
      new String(Files.readAllBytes(ctl(name))) == fingerprint(f)) "skip_unchanged"
    else "fetch"

  def record(name: String, f: java.io.File): Unit =
    if (f.exists()) Files.write(ctl(name), fingerprint(f).getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
}

/** Run manifest + _SUCCESS marker (ref imdb_raw_ingest.py:281-307). */
object Manifest {
  def write(dir: String, report: RunReport): Unit = {
    Files.createDirectories(Paths.get(dir))
    val statuses = report.ingestStatus.map { case (k, v) => s""""$k": "$v"""" }
      .mkString("{", ", ", "}")
    Files.write(Paths.get(dir, "_MANIFEST.json"),
      s"""{"run_date": "${report.runDate}", "movie_fact_rows": ${report.movieFactRows},
         | "sources": $statuses}""".stripMargin.getBytes)
    Files.write(Paths.get(dir, "_SUCCESS"), Array.emptyByteArray)
  }
}
