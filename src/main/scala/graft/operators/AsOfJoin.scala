package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  */
object AsOfJoin {

  /** @param left        probe side (each row seeks its as-of match)
    * @param right       reference side (time series per key)
    * @param keyCol      equi-key name present in both inputs
    * @param timeCol     long/timestamp ordering column name in both
    * @param payloadCols right-side columns to carry onto left rows
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           payloadCols: Seq[String], joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType))
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
}
