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
    // carry the right timestamp too: it marks matched-ness even when all
    // user payloads are legitimately null
    val r = right.select((Seq(col(keyCol), col(timeCol),
        col(timeCol).as("__p___mt")) ++
        payloadCols.map(c => col(c).as(s"__p_$c"))): _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side=0) sort before left rows at equal time → inclusive
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = (payloadCols :+ "__mt").foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    val matched = carried.filter(col("__side") === 1)
    val filtered =
      if (joinType == "inner") matched.filter(col("__asof___mt").isNotNull)
      else matched
    filtered.select((leftCols.map(col) ++
      payloadCols.map(c => col(s"__asof_$c").as(c))): _*)
  }
}
