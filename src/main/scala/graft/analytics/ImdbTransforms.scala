package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Clean
import graft.operators.Relational

/** The reference ETL's transformation semantics re-expressed Spark-first
  * (ref: glue_jobs/etl_movies_episodes_analytics_advanced.py — movies
  * :122-202, episodes :208-297, seasons :300-318; SURVEY §2/§7.4).
  *
  * Intentional divergences from the reference, per SURVEY §7.4.1:
  *  - top-cast list order made deterministic (the reference's bare
  *    collect_list order is undefined);
  *  - isFinale's dead constant-0 placeholder is dropped; net semantics
  *    (episodeNumber == max over (series, season)) are kept;
  *  - isPilot stays "episodeNumber == 1 in ANY season" (reference bug
  *    kept deliberately — the BI layer re-filters to season 1).
  *
  * Scale notes: every lookup-shaped join takes a broadcast hint
  * (oscar-mark set, top-cast agg is fact-sized so it shuffles on tconst
  * like the facts themselves); the shared TopCast window (ref computes it
  * twice) is built once and reused by movies and episodes.
  */
object ImdbTransforms {

  /** `\N`-scrubbed int cast (C1/C2). */
  private def cInt(c: Column): Column = Clean.tryCastClean(c, "int")
  private def cDouble(c: Column): Column = Clean.tryCastClean(c, "double")

  /** Top-k billed cast per title as ordered "name, name, name" strings +
    * parallel nconst list (ref W1+A2+A3, :146-168; shared with episodes
    * :260-270). Deterministic: sorted by (ordering, nconst). */
  def topCast(principals: DataFrame, names: DataFrame, k: Int = 3): DataFrame = {
    val actors = principals
      .filter(col("category").isin("actor", "actress"))                 // P5
      .select(col("tconst"), cInt(col("ordering")).as("ordering"), col("nconst"))
      .filter(col("ordering") <= k)                                     // P6 pre-prune
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("tconst")).orderBy(col("ordering"), col("nconst"))))
      .filter(col("rn") <= k)                                           // W1
      .join(names.select(col("nconst"), col("primaryName")), Seq("nconst"), "left") // J3
    actors.groupBy("tconst")
      .agg(sort_array(collect_list(struct(col("ordering"), col("nconst"),
        col("primaryName")))).as("cast"))                               // A2
      .select(col("tconst"),
        concat_ws(", ", transform(col("cast"), x => x.getField("primaryName")))
          .as("topActors"),                                             // A3
        concat_ws(", ", transform(col("cast"), x => x.getField("nconst")))
          .as("topActors_nconst"))
  }

  /** Distinct titleIds whose aka title smells like an Oscar/Academy-Award
    * mention (ref :176-183). */
  def oscarTitleIds(akas: DataFrame): DataFrame =
    akas.filter(lower(col("title")).like("%oscar%") ||
                lower(col("title")).like("%academy award%"))            // P7
      .select(col("titleId")).distinct()                               // A10

  /** Movie facts at movie×genre grain (ref :122-202). */
  def movieFacts(basics: DataFrame, ratings: DataFrame, crew: DataFrame,
                 principals: DataFrame, names: DataFrame, akas: DataFrame,
                 runDate: String): DataFrame = {
    val movies = basics
      .filter(col("titleType") === "movie" &&                           // P1
        !Clean.isNullish(col("startYear")) &&
        col("primaryTitle").isNotNull &&
        !Clean.isNullish(col("genres")))
      .select(col("tconst"), col("primaryTitle"), col("originalTitle"),
        cInt(col("startYear")).as("startYear"),
        cInt(col("runtimeMinutes")).as("runtimeMinutes"), col("genres"))
      .withColumn("decade", Clean.decadeOf(col("startYear")).cast("int")) // C3

    val rated = movies
      .join(ratings.select(col("tconst"),
        cDouble(col("averageRating")).as("averageRating"),
        cInt(col("numVotes")).as("numVotes")), Seq("tconst"), "left")    // J1
      .join(crew.select(col("tconst"), col("directors"), col("writers")),
        Seq("tconst"), "left")                                           // J2
      .join(topCast(principals, names), Seq("tconst"), "left")           // J4

    val flagged = Relational.flagJoin(rated, col("tconst"),
      oscarTitleIds(akas), col("titleId"), "oscarWinner")                // J5/C5

    flagged
      .withColumn("genre", explode(split(col("genres"), ",")))           // L1
      .withColumn("run_date", lit(runDate))                              // C10
      .withColumn("run_date_dt", to_date(col("run_date"), "yyyyMMdd"))   // C8
  }

  /** Episode facts at series×season×episode grain (ref :208-297).
    * Sentinel: null seasonNumber → isSpecial=1 and seasonNumber=-1 —
    * flag computed BEFORE the sentinel substitution (SURVEY §7.4.3). */
  def episodeFacts(episode: DataFrame, basics: DataFrame, ratings: DataFrame,
                   principals: DataFrame, names: DataFrame,
                   runDate: String): DataFrame = {
    val epMeta = basics.select(col("tconst").as("ep_tconst"),               // P3/J6
      col("primaryTitle").as("episodeTitle"),
      cInt(col("startYear")).as("episodeYear"))
    val seriesMeta = basics.select(col("tconst").as("seriesId"),            // J8 role
      col("primaryTitle").as("seriesTitle"),
      cInt(col("startYear")).as("seriesStartYear"),
      col("genres").as("seriesGenres"))

    val base = episode.select(col("tconst"), col("parentTconst"),
        cInt(col("seasonNumber")).as("seasonNumberRaw"),
        cInt(col("episodeNumber")).as("episodeNumber"))
      .join(epMeta, col("tconst") === col("ep_tconst"), "left").drop("ep_tconst") // J6/P4
      .join(ratings.select(col("tconst").as("rt_tconst"),
          cDouble(col("averageRating")).as("averageRating"),
          cInt(col("numVotes")).as("numVotes")),
        col("tconst") === col("rt_tconst"), "left").drop("rt_tconst")     // J7
      .join(seriesMeta, col("parentTconst") === col("seriesId"), "left")  // J8
      .join(topCast(principals, names).withColumnRenamed("topActors", "epTopActors")
          .select(col("tconst"), col("epTopActors")), Seq("tconst"), "left") // J9

    base
      .withColumn("series_decade", Clean.decadeOf(col("seriesStartYear")).cast("int"))
      .withColumn("isPilot", Clean.flag(col("episodeNumber") === 1))      // C4 (any season — kept)
      .withColumn("isSpecial", Clean.flag(col("seasonNumberRaw").isNull)) // C4, pre-sentinel
      .withColumn("seasonNumber", coalesce(col("seasonNumberRaw"), lit(-1))) // sentinel
      .withColumn("maxEp", max(col("episodeNumber")).over(                // W2
        Window.partitionBy(col("seriesId"), col("seasonNumber"))))
      .withColumn("isFinale", Clean.flag(
        col("episodeNumber").isNotNull && col("episodeNumber") === col("maxEp")))
      .drop("seasonNumberRaw", "maxEp")
      .withColumn("run_date", lit(runDate))
      .withColumn("run_date_dt", to_date(col("run_date"), "yyyyMMdd"))
  }

  /** Series×season rollup (ref :300-318, A1). run_date keys ride along in
    * the groupBy (constant per run — no extra shuffle width). */
  def seasonSummary(episodeFacts: DataFrame): DataFrame =
    episodeFacts
      .groupBy("seriesId", "seriesTitle", "series_decade", "seasonNumber",
        "run_date", "run_date_dt")
      .agg(count(lit(1)).as("episodesInSeason"),
        avg(col("averageRating")).as("avgSeasonRating"),
        min(col("episodeYear")).as("seasonStartYear"),
        max(col("episodeYear")).as("seasonEndYear"))
}
