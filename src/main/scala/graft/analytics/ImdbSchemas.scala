package graft.analytics

import org.apache.spark.sql.types._

/** Explicit schemas for the 7 raw IMDb TSV tables — all strings at
  * ingest, mirroring the reference's dynamic raw layer (ref:
  * glue_jobs/etl_movies_episodes_analytics_advanced.py:53-60; column
  * usage per SURVEY §1.1), typed during cleaning.
  */
object ImdbSchemas {

  private def s(names: String*): StructType =
    StructType(names.map(StructField(_, StringType, nullable = true)))

  val titleBasics: StructType = s("tconst", "titleType", "primaryTitle",
    "originalTitle", "isAdult", "startYear", "endYear", "runtimeMinutes", "genres")

  val titleRatings: StructType = s("tconst", "averageRating", "numVotes")

  val titleCrew: StructType = s("tconst", "directors", "writers")

  val nameBasics: StructType = s("nconst", "primaryName", "birthYear",
    "deathYear", "primaryProfession", "knownForTitles")

  val titlePrincipals: StructType = s("tconst", "ordering", "nconst",
    "category", "job", "characters")

  val titleAkas: StructType = s("titleId", "ordering", "title", "region",
    "language", "types", "attributes", "isOriginalTitle")

  val titleEpisode: StructType = s("tconst", "parentTconst", "seasonNumber",
    "episodeNumber")
}
