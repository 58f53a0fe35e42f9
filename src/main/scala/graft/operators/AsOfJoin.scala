package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the most recent right row of
  * the same key with rightTime <= leftTime.
  *
  * Spark has no native as-of join. Preference order from the build brief:
  * compose built-ins first — and the composition here is the one that
  * scales: tag and UNION the two inputs, shuffle ONCE on the key, and
  * carry the latest right-row payload forward with a running `last(...,
  * ignoreNulls)` window. Cost: one shuffle + one sort of |L|+|R| — no
  * range-condition join (which Spark would plan as a broadcast nested
  * loop or an exploding theta join), no per-key collect.
  *
  * Tie semantics: a right row at exactly leftTime matches (<=), because
  * right rows sort before left rows at equal timestamps.
  *
  * Skew bound: [[asOf]] sorts each key's full history in one task. For a
  * pathological hot key (one key = a large fraction of all rows),
  * [[asOfBucketed]] sub-buckets by time range so no task sorts more than
  * one bucket of one key — same results, bounded per-task rows.
  */
object AsOfJoin {

  /** The running-last carry sorts the payload struct as the deterministic
    * tiebreaker among right rows at equal (key, time), so every payload
    * column must have an orderable type — fail analysis-time with a clear
    * message instead of a deep Catalyst error. */
  private def requireOrderable(right: DataFrame, payloadCols: Seq[String]): Unit =
    payloadCols.foreach { c =>
      val dt = right.schema(c).dataType
      require(RowOrdering.isOrderable(dt),
        s"asOf payload column '$c' has non-orderable type ${dt.simpleString}; " +
          "the deterministic tiebreak sorts the payload struct — drop the column " +
          "or pre-serialize it (e.g. to_json) on the right side")
    }

  /** @param left        probe side (each row seeks its as-of match)
    * @param right       reference side (time series per key)
    * @param keyCol      equi-key name present in both inputs
    * @param timeCol     long/timestamp ordering column name in both
    * @param payloadCols right-side columns to carry onto left rows
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           payloadCols: Seq[String], joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
    requireOrderable(right, payloadCols)
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    // ALL payload columns ride in ONE struct, carried by a single
    // last(ignoreNulls) — carrying each column independently would fill a
    // null field of the newest right row from an OLDER right row, mixing
    // fields of different right rows. The struct is never null on right
    // rows (it always holds the right timestamp), so ignoreNulls skips
    // exactly the left rows, and a matched row's payload is one coherent
    // right row even when user payload fields are legitimately null.
    val r = right.select(col(keyCol), col(timeCol),
        struct(col(timeCol).as("__mt") +: payloadCols.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side=0) sort before left rows at equal time → inclusive.
    // __p as the final sort key is a deterministic tiebreaker among right
    // rows at equal (key, time): the lexicographically-largest payload
    // struct wins, on every run and partitioning (left rows have __p null,
    // which sorts consistently and cannot interleave: __side separates).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__asof",
      last(col("__p"), ignoreNulls = true).over(w))
    val matched = carried.filter(col("__side") === 1)
    val filtered =
      if (joinType == "inner") matched.filter(col("__asof").isNotNull)
      else matched
    filtered.select((leftCols.map(col) ++
      payloadCols.map(c => col("__asof").getField(c).as(c))): _*)
  }

  /** [[asOf]] with time-range sub-bucketing: the carry window partitions
    * by (key, floor(time / bucketWidth)) instead of key alone, so a hot
    * key's history splits across many tasks — no task ever sorts more
    * than one key's rows inside one time bucket. Same results as [[asOf]]
    * (AsOfJoinSpec proves equality, including a pathological single-key
    * input).
    *
    * Cross-bucket continuity: each (key, bucket) window is seeded with
    * the latest right row from all EARLIER buckets, computed at bucket
    * granularity — a per-(key, bucket) max aggregate (one row per
    * non-empty bucket, not per input row) followed by a running last over
    * bucket summaries, the same union-window trick one level up. The
    * seed enters the bucket window at time −∞, so in-bucket right rows
    * override it exactly when they should.
    *
    * `timeCol` must be integral (long event-time); bucket ids use exact
    * integer floor division. Choose bucketWidth so a hot key's densest
    * bucket fits a task comfortably — e.g. for microsecond timestamps and
    * ~10⁶ rows/key/day, an hour (3.6e9) bounds buckets at ~4e4 rows.
    *
    * Unlike [[asOf]] (which tolerates null times — they sort first and a
    * null-time right row is carried to every later row), this variant
    * REQUIRES non-null times strictly above Long.MinValue + bucketWidth:
    * a null time has no bucket (the carry chain would silently skip it),
    * and times within bucketWidth of Long.MinValue overflow the
    * negative-branch bucket expression and collide with the internal
    * Long.MinValue seed sentinel. Violations raise a clear runtime error
    * (in-plan guard) instead of returning silently-divergent results.
    */
  def asOfBucketed(left: DataFrame, right: DataFrame, keyCol: String,
                   timeCol: String, payloadCols: Seq[String],
                   bucketWidth: Long, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireOrderable(right, payloadCols)
    Seq(left, right).foreach { df =>
      import org.apache.spark.sql.types._
      val ok = df.schema(timeCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"asOfBucketed needs an integral time column, got " +
        df.schema(timeCol).dataType.simpleString)
    }
    // in-plan time-domain guard (see scaladoc): nulls have no bucket and
    // the Long.MinValue neighborhood overflows the negative-branch bucket
    // expression / collides with the seed sentinel. raise_error is
    // non-foldable, so the branch only fires on an actual bad row.
    val minT = Long.MinValue + bucketWidth
    def guardedT: Column = {
      val t = col(timeCol).cast("long")
      when(t.isNull || t < minT, raise_error(concat(
        lit(s"asOfBucketed: time must be non-null and >= $minT "),
        lit(s"(Long.MinValue + bucketWidth); got "),
        coalesce(t.cast("string"), lit("null"))))).otherwise(t)
    }
    // exact integer floor division on the pre-cast __t column (DIV
    // truncates toward zero → shift negatives)
    val bucketExpr = expr(s"CASE WHEN __t >= 0 THEN __t DIV $bucketWidth " +
      s"ELSE (__t - ${bucketWidth - 1}) DIV $bucketWidth END")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
      .withColumn("__t", guardedT)
      .withColumn("__b", bucketExpr)
    val r = right.select(col(keyCol), col(timeCol),
        struct(col(timeCol).as("__mt") +: payloadCols.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
      .withColumn("__t", guardedT)
      .withColumn("__b", bucketExpr)

    // latest right row per (key, bucket): max struct (time, payload) —
    // the same largest-payload tiebreak as the in-bucket sort
    val bucketLast = r.groupBy(col(keyCol), col("__b"))
      .agg(max(struct(col("__t"), col("__p"))).as("__last"))
    // buckets that NEED a seed: every bucket containing a left row
    // (a bucket with no right rows still needs the carry from earlier
    // buckets). Need-rows sort BEFORE same-bucket summaries so a seed
    // never includes its own bucket's right rows — those are handled by
    // the in-bucket sort below.
    val needs = l.select(col(keyCol), col("__b")).distinct()
      .withColumn("__sb", lit(1))
      .withColumn("__last", lit(null).cast(bucketLast.schema("__last").dataType))
    val seedW = Window.partitionBy(col(keyCol))
      .orderBy(col("__b"), col("__sb").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val seeds = bucketLast.withColumn("__sb", lit(0))
      .unionByName(needs)
      .withColumn("__seed", last(col("__last"), ignoreNulls = true).over(seedW))
      .filter(col("__sb") === 1 && col("__seed").isNotNull)
      .select(col(keyCol), col("__b"), col("__seed").getField("__p").as("__p"))
      .withColumn("__side", lit(0))
      .withColumn("__t", lit(Long.MinValue))

    val unioned = l.unionByName(r.drop(timeCol), allowMissingColumns = true)
      .unionByName(seeds, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__asof",
      last(col("__p"), ignoreNulls = true).over(w))
    val matched = carried.filter(col("__side") === 1)
    val filtered =
      if (joinType == "inner") matched.filter(col("__asof").isNotNull)
      else matched
    filtered.select((leftCols.map(col) ++
      payloadCols.map(c => col("__asof").getField(c).as(c))): _*)
  }
}
