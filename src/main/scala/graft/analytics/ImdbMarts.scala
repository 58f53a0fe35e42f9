package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Clean
import graft.operators.Relational

/** The reference's downstream query surface: dbt mart models (Athena +
  * Snowflake projects) and the docs/ ad-hoc analytics, each a named
  * DataFrame transformation (`ref`/`source` = function composition —
  * SURVEY §3.2/§3.3).
  */
object ImdbMarts {

  /** Latest-run filtered view of movie facts (ref
    * imdb_analytics/models/marts_movie_facts_view.sql:1-19, J12/A9) with
    * its quality filters. */
  def movieFactsView(movieFacts: DataFrame): DataFrame =
    Relational.latestSlice(movieFacts, col("run_date"))
      .filter(col("averageRating").isNotNull && col("numVotes") >= 0)     // P9

  /** Top-25 per (genre, decade) by rating then votes (ref
    * marts_top_movies_by_genre.sql:1-19, W3/O2/P10). */
  def topMoviesByGenre(movieFactsView: DataFrame, k: Int = 25): DataFrame =
    Relational.topKPerGroup(
      movieFactsView.filter(col("numVotes") >= 1000),
      partitionCols = Seq(col("genre"), col("decade")),
      orderCols = Seq(col("averageRating").desc, col("numVotes").desc, col("tconst")),
      k = k, rankCol = "rnk")
      .select(col("genre"), col("decade"), col("tconst"), col("primaryTitle"),
        col("averageRating"), col("numVotes"), col("rnk"))

  /** Per-series/season trends on the latest run (ref
    * marts_episode_season_trends.sql:1-37, A8). */
  def episodeSeasonTrends(episodeFacts: DataFrame): DataFrame =
    Relational.latestSlice(episodeFacts, col("run_date"))
      .filter(col("seasonNumber").isNotNull && col("seasonNumber") =!= -1)
      .groupBy("seriesId", "seriesTitle", "seasonNumber")
      .agg(avg(col("averageRating")).as("avg_rating"),
        sum(col("numVotes")).as("total_votes"),
        count(lit(1)).as("n_episodes"))

  /** Snowflake mart: renamed movie facts + label/bucket columns, full
    * documented contract (ref
    * airflow/dags/dbt/models/marts/movie_facts_anl.sql:4-41, C6):
    * MOVIE_KEY, ORIGINALTITLE, RUNTIME_MIN, AVG_RATING/NUM_VOTES, the
    * crew/cast carry-columns, and RUN_DATE sourced from the DATE-typed
    * run_date_dt. Bucket labels use the reference's exact strings
    * (en-dash ranges). */
  def movieFactsAnl(movieFacts: DataFrame): DataFrame =
    movieFacts.select(
      col("tconst").as("MOVIE_KEY"),
      col("primaryTitle").as("PRIMARYTITLE"),
      col("originalTitle").as("ORIGINALTITLE"),
      col("startYear").as("STARTYEAR"),
      col("decade").as("DECADE"),
      col("runtimeMinutes").cast("int").as("RUNTIME_MIN"),
      col("genre").as("GENRE"),
      col("genres").as("GENRES"),
      col("averageRating").cast("double").as("AVG_RATING"),
      col("numVotes").cast("int").as("NUM_VOTES"),
      col("directors").as("DIRECTORS"),
      col("writers").as("WRITERS"),
      col("topActors").as("TOPACTORS"),
      col("topActors_nconst").as("TOPACTORS_NCONST"),
      col("oscarWinner").as("OSCARWINNER"),
      col("run_date_dt").as("RUN_DATE"))
      .withColumn("DECADE_LABEL", concat(col("DECADE").cast("string"), lit("s")))
      .withColumn("VOTE_BUCKET", Clean.caseBucket(Seq(
        (col("NUM_VOTES") >= 50000) -> "50k+",
        (col("NUM_VOTES") >= 10000) -> "10k–49k",
        (col("NUM_VOTES") >= 1000)  -> "1k–9k",
        col("NUM_VOTES").isNotNull  -> "<1k"), "unknown"))
      .withColumn("RATING_BAND", Clean.caseBucket(Seq(
        (col("AVG_RATING") >= 8) -> "Excellent",
        (col("AVG_RATING") >= 7) -> "Great",
        (col("AVG_RATING") >= 6) -> "Good",
        col("AVG_RATING").isNotNull -> "OK"), "unknown"))

  /** Snowflake mart: renamed episode facts, full documented contract (ref
    * airflow/dags/dbt/models/marts/episode_facts_anl.sql:1-19) — pure
    * rename/projection: EPISODE_KEY, SERIES_KEY, AVG_RATING, NUM_VOTES,
    * RUN_DATE from run_date_dt. */
  def episodeFactsAnl(episodeFacts: DataFrame): DataFrame =
    episodeFacts.select(
      col("tconst").as("EPISODE_KEY"),
      col("seriesId").as("SERIES_KEY"),
      col("seriesTitle").as("SERIESTITLE"),
      col("seriesStartYear").as("SERIESSTARTYEAR"),
      col("series_decade").as("SERIES_DECADE"),
      col("seasonNumber").as("SEASONNUMBER"),
      col("episodeNumber").as("EPISODENUMBER"),
      col("episodeTitle").as("EPISODETITLE"),
      col("episodeYear").as("EPISODEYEAR"),
      col("averageRating").cast("double").as("AVG_RATING"),
      col("numVotes").cast("int").as("NUM_VOTES"),
      col("isPilot").as("ISPILOT"),
      col("isFinale").as("ISFINALE"),
      col("isSpecial").as("ISSPECIAL"),
      col("run_date_dt").as("RUN_DATE"))

  /** Season mart label: zero-padded season (ref
    * series_season_summary_anl.sql:13). */
  def seasonSummaryAnl(seasonSummary: DataFrame): DataFrame =
    seasonSummary.withColumn("SEASON_LABEL",
      lpad(col("seasonNumber").cast("string"), 2, "0"))

  /** `Dim Series` dimension (README.md:146-148): one row per series,
    * latest-run seriesStartYear, display label "Title (Year)". */
  def dimSeries(episodeFacts: DataFrame): DataFrame =
    Relational.latestSlice(episodeFacts, col("run_date"))
      .filter(col("seriesId").isNotNull)
      .groupBy(col("seriesId").as("SERIES_KEY"))
      .agg(max(col("seriesTitle")).as("SERIES_TITLE"),
        max(col("seriesStartYear")).as("SERIESSTARTYEAR"))
      .withColumn("SERIES_LABEL",
        concat(col("SERIES_TITLE"), lit(" ("),
          coalesce(col("SERIESSTARTYEAR").cast("string"), lit("?")), lit(")")))

  // ── docs/ ad-hoc analytics ──────────────────────────────────────────

  /** Top movies by rating with a vote floor (ref
    * docs/top_movies_by_rating.sql, J10/P10/O1). */
  def topMoviesByRating(movieFacts: DataFrame, minVotes: Int = 10000,
                        n: Int = 10): DataFrame =
    movieFacts.select("tconst", "primaryTitle", "averageRating", "numVotes").distinct()
      .filter(col("numVotes") > minVotes)
      .orderBy(col("averageRating").desc, col("numVotes").desc, col("tconst"))
      .limit(n)

  /** Genre frequency (ref docs/top_genre.sql, L2/A8/O1). */
  def topGenres(movieFacts: DataFrame, n: Int = 10): DataFrame =
    movieFacts.groupBy("genre").agg(count(lit(1)).as("num_titles"))
      .orderBy(col("num_titles").desc, col("genre")).limit(n)

  /** Longest-running shows by endYear − startYear (ref
    * docs/top_10_longest_running_tv_show.sql, C9/O1). */
  def longestRunningShows(basics: DataFrame, n: Int = 10): DataFrame =
    basics.filter(col("titleType") === "tvSeries" &&
        !Clean.isNullish(col("startYear")) && !Clean.isNullish(col("endYear")))
      .select(col("tconst"), col("primaryTitle"),
        Clean.tryCastClean(col("startYear"), "int").as("startYear"),
        Clean.tryCastClean(col("endYear"), "int").as("endYear"))
      .withColumn("run_years", col("endYear") - col("startYear"))
      .orderBy(col("run_years").desc, col("tconst")).limit(n)

  /** Most versatile actors: distinct genres played (ref
    * docs/most_verstaile_actor_actress.sql, J11/A6/A7/L2). */
  def mostVersatileActors(principals: DataFrame, basics: DataFrame,
                          names: DataFrame, n: Int = 10): DataFrame =
    principals.filter(col("category").isin("actor", "actress"))
      .join(basics.filter(!Clean.isNullish(col("genres")))
        .select(col("tconst"), col("genres")), Seq("tconst"))
      .withColumn("genre", explode(split(col("genres"), ",")))
      .join(names.select(col("nconst"), col("primaryName")), Seq("nconst"))
      .groupBy("nconst")
      .agg(max(col("primaryName")).as("primaryName"),                     // A7
        countDistinct(col("genre")).as("num_genres"))                     // A6
      .orderBy(col("num_genres").desc, col("nconst")).limit(n)

  // ── BI measures (README.md:152-161 semantics) ───────────────────────

  /** Pilot★ per series: coalesce chain — S1E1 flagged pilot → any S1
    * pilot → S1E1 rated → earliest rated episode → 0. */
  def pilotRating(episodeFacts: DataFrame): DataFrame = {
    val rated = episodeFacts.filter(col("averageRating").isNotNull)
    def best(df: DataFrame, name: String) =
      df.withColumn("rn", row_number().over(Window.partitionBy(col("seriesId"))
          .orderBy(col("seasonNumber"), col("episodeNumber"), col("tconst"))))
        .filter(col("rn") === 1)
        .select(col("seriesId"), col("averageRating").as(name))
    val s1e1p = best(rated.filter(col("seasonNumber") === 1 &&
      col("episodeNumber") === 1 && col("isPilot") === 1), "r1")
    val s1p = best(rated.filter(col("seasonNumber") === 1 && col("isPilot") === 1), "r2")
    val s1e1 = best(rated.filter(col("seasonNumber") === 1 && col("episodeNumber") === 1), "r3")
    val earliest = best(rated, "r4")
    episodeFacts.select("seriesId").distinct()
      .join(s1e1p, Seq("seriesId"), "left").join(s1p, Seq("seriesId"), "left")
      .join(s1e1, Seq("seriesId"), "left").join(earliest, Seq("seriesId"), "left")
      .select(col("seriesId"),
        coalesce(col("r1"), col("r2"), col("r3"), col("r4"), lit(0.0)).as("pilot_rating"))
  }

  /** Finale★ and Finale Δ vs season average, per series (latest season's
    * finale vs that season's avg). */
  def finaleDelta(episodeFacts: DataFrame, seasonSummary: DataFrame): DataFrame =
    episodeFacts.filter(col("isFinale") === 1 && col("averageRating").isNotNull)
      .join(seasonSummary.select(col("seriesId"), col("seasonNumber"),
        col("avgSeasonRating")), Seq("seriesId", "seasonNumber"))
      .select(col("seriesId"), col("seasonNumber"),
        col("averageRating").as("finale_rating"),
        (col("averageRating") - col("avgSeasonRating")).as("finale_delta"))

  /** Best Season★: highest avgSeasonRating per series. */
  def bestSeason(seasonSummary: DataFrame): DataFrame =
    Relational.topKPerGroup(seasonSummary.filter(col("avgSeasonRating").isNotNull),
      Seq(col("seriesId")),
      Seq(col("avgSeasonRating").desc, col("seasonNumber")), k = 1)
      .select(col("seriesId"), col("seasonNumber").as("best_season"),
        col("avgSeasonRating").as("best_season_rating"))
}
