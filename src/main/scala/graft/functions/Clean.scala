package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cleaning / casting / bucketing scalar helpers, centralizing the
  * reference's three null conventions and its derivation idioms
  * (ref: glue_jobs/etl_movies_episodes_analytics_advanced.py:90-96,130-132,
  * 241-248; airflow/dags/dbt/models/marts/movie_facts_anl.sql:27-40).
  *
  * Everything here is built from `org.apache.spark.sql.functions` so it
  * stays inside whole-stage codegen — no UDFs.
  */
object Clean {

  /** Null-ish: SQL NULL, literal `\N`, or whitespace-only (ref P8). */
  def isNullish(c: Column): Column =
    c.isNull || c === "\\N" || length(trim(c)) === 0

  /** Scrub null-ish values to real NULL (ref C1). */
  def nullify(c: Column): Column = when(isNullish(c), lit(null)).otherwise(c)

  /** `\N`-aware lenient cast: scrub then try_cast (ref C1 + C7
    * TRY_TO_NUMBER(NULLIF(x,'\N')) semantics). */
  def tryCastClean(c: Column, to: String): Column =
    nullify(c).try_cast(to)

  /** Decade bucket via explicit floor — identical semantics in Spark and
    * ANSI SQL for any sign, unlike `cast(x/10 as int)` whose truncation
    * direction differs between engines (ref C3; SURVEY §7.4.4). */
  def decadeOf(year: Column): Column = (floor(year / 10) * 10).cast("long")

  /** 0/1 flag from a boolean condition (ref C4 isPilot/isFinale/oscar). */
  def flag(cond: Column): Column = when(cond, 1L).otherwise(0L)

  /** Chained CASE bucketing from (threshold-or-condition, label) pairs with
    * a default — the VOTE_BUCKET / RATING_BAND idiom (ref C6). */
  def caseBucket(cases: Seq[(Column, String)], default: String): Column =
    cases.foldRight(lit(default): Column) { case ((cond, label), acc) =>
      when(cond, lit(label)).otherwise(acc)
    }
}
