package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (batch form): split each user's event sequence at
  * gaps > `gapSeconds`, assign session ids, roll up per session.
  *
  * One shuffle on the user key serves both windows (lag + running sum use
  * the same partitioning), then the rollup groupBy reuses it — Catalyst
  * plans a single Exchange. Timestamps are compared in epoch microseconds
  * (exact integers) for engine-portable determinism.
  */
object Sessionize {

  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val gapMicros = gapSeconds * 1000000L
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionSummary(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, gapSeconds: Long): DataFrame =
    sessions(events, userCol, tsCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(col("__us")) - min(col("__us"))) / 1000000L).cast("long").as("duration_sec"),
        round(sum(col(valueCol)), 4).as("total_value"))
}
