package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native re-implementation of the reference's four validation layers
  * (SURVEY §5): partition smoke counts, Great-Expectations-style
  * range-with-`mostly` tolerances, and dbt-style not_null / unique —
  * each evaluated as ONE aggregate over ONE scan (no per-expectation
  * passes), returning a result row per expectation.
  */
object Expectations {

  final case class Result(name: String, passed: Boolean, detail: String)

  sealed trait Expectation { def name: String; def agg: Column }

  /** ≥ `mostly` fraction of non-null rows satisfy `cond` (GE semantics:
    * nulls are excluded from the denominator). */
  final case class MostlySatisfies(name: String, cond: Column, nonNull: Column,
                                   mostly: Double) extends Expectation {
    // coalesce: sum over ZERO rows is NULL (an empty table — or an empty
    // sample in sampled mode — must read as 0/0 ok, not crash the gate)
    def agg: Column = struct(
      coalesce(sum(when(nonNull && cond, 1L).otherwise(0L)), lit(0L)).as("ok"),
      coalesce(sum(when(nonNull, 1L).otherwise(0L)), lit(0L)).as("tot")).as(name)
  }

  object dsl {
    def notNull(c: String): Expectation =
      MostlySatisfies(s"not_null_$c", col(c).isNotNull, lit(true), 1.0)
    def between(c: String, lo: Double, hi: Double, mostly: Double = 1.0): Expectation =
      MostlySatisfies(s"between_$c", col(c) >= lo && col(c) <= hi, col(c).isNotNull, mostly)
    def unique(c: String): Expectation = new Expectation {
      val name = s"unique_$c"
      def agg: Column = struct(
        (count(lit(1)) - countDistinct(col(c))).as("dupes"), count(lit(1)).as("tot")).as(name)
    }
    def rowCountAtLeast(n: Long): Expectation = new Expectation {
      val name = "row_count_at_least"
      def agg: Column = struct(count(lit(1)).as("ok"), lit(n).as("tot")).as(name)
    }
  }

  /** Evaluate all expectations in a single job; returns per-expectation
    * results. Throws nothing — callers decide whether failures gate. */
  def validate(df: DataFrame, expectations: Seq[Expectation]): Seq[Result] =
    resultsFrom(df.agg(expectations.head.agg, expectations.tail.map(_.agg): _*).head(),
      expectations)

  private def resultsFrom(row: org.apache.spark.sql.Row,
                          expectations: Seq[Expectation]): Seq[Result] =
    expectations.zipWithIndex.map {
      case (e: MostlySatisfies, i) =>
        val s = row.getStruct(i); val ok = s.getLong(0); val tot = s.getLong(1)
        val frac = if (tot == 0) 1.0 else ok.toDouble / tot
        Result(e.name, frac >= e.mostly, s"$ok/$tot ok (mostly=${e.mostly})")
      case (e, i) if e.name.startsWith("unique_") =>
        val s = row.getStruct(i)
        Result(e.name, s.getLong(0) == 0, s"${s.getLong(0)} duplicate rows")
      case (e, i) =>
        val s = row.getStruct(i)
        Result(e.name, s.getLong(0) >= s.getLong(1), s"count=${s.getLong(0)} min=${s.getLong(1)}")
    }

  def assertAll(df: DataFrame, expectations: Seq[Expectation]): Unit =
    requirePassed(validate(df, expectations))

  /** GE sampled-validation mode (ref tests/ge_validate_athena.py:25,54 —
    * the LIMIT 5000 gate, made deterministic): validate a content-keyed
    * hash sample instead of the full table. At 100 TB a full-scan gate
    * is the pipeline's most expensive no-op; `mostly` tolerances hold on
    * a uniform sample up to sampling noise, and hash keying gates the
    * SAME rows on every run and engine (LIMIT is
    * partition-order-dependent — a different 5000 rows per run).
    * Count-exact expectations (`unique`, `rowCountAtLeast`) are
    * evaluated on the sample; use the full [[validate]] when those must
    * be exact.
    *
    * An EMPTY sample of a non-empty table does NOT pass vacuously (every
    * mostly-gate would read 0/0 ok — silently validating nothing): a
    * small table at a low rate can legitimately hash-select zero rows, so
    * the gate falls back to validating the FULL table in that corner.
    * P(empty sample) ≈ e^(-rows×rate), so the fallback only triggers when
    * rows×rate is tiny — i.e. the full pass it falls back to is cheap;
    * the `df.isEmpty` probe that detects the corner is a LIMIT-1 scan. */
  def validateSampled(df: DataFrame, expectations: Seq[Expectation],
                      sampleKey: Column, rate: Double): Seq[Result] = {
    val sample = graft.operators.Sampling.hashSample(df, sampleKey, rate)
    val aggs = expectations.map(_.agg) :+ count(lit(1)).as("__sample_rows")
    val row = sample.agg(aggs.head, aggs.tail: _*).head()
    if (row.getLong(expectations.size) == 0 && !df.isEmpty)
      validate(df, expectations)
    else resultsFrom(row, expectations)
  }

  def assertAllSampled(df: DataFrame, expectations: Seq[Expectation],
                       sampleKey: Column, rate: Double): Unit =
    requirePassed(validateSampled(df, expectations, sampleKey, rate))

  private def requirePassed(results: Seq[Result]): Unit = {
    val failed = results.filterNot(_.passed)
    require(failed.isEmpty, "expectations failed: " +
      failed.map(r => s"${r.name} [${r.detail}]").mkString("; "))
  }
}
