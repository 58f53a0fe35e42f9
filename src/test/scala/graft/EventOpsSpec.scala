package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

/** Round-15 behavioral-event operators: funnel, retention, transitions. */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(sec: Long) =
    new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("funnel: strict order enforced, lags exact") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes in order: view@0, click@10, purchase@30
      (1L, 1L, "view", ts(0)), (2L, 1L, "click", ts(10)),
      (3L, 1L, "purchase", ts(30)),
      // u2 clicked BEFORE viewing — click must not count; no purchase
      (4L, 2L, "click", ts(5)), (5L, 2L, "view", ts(20)),
      // u3 views only
      (6L, 3L, "view", ts(7)),
      // u4 view@0, click@1, purchase BEFORE click — purchase dropped
      (7L, 4L, "view", ts(0)), (8L, 4L, "click", ts(100)),
      (9L, 4L, "purchase", ts(50)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "view", 4L, 0L),
      (2L, "click", 2L, (10L + 100L) * 1000000L),
      (3L, "purchase", 1L, 30L * 1000000L)), s"got $out")
  }

  test("funnel: an empty stage yields a zero row, not a missing row") {
    import spark.implicits._
    val ev = Seq((1L, 1L, "view", ts(0)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 0L), (2L, 0L, 0L)))
  }

  test("retentionCohorts: integer week buckets off corpus day0") {
    import spark.implicits._
    def day(n: Long) = ts(n * 86400L)
    val ev = Seq(
      (1L, day(0)), (1L, day(8)),            // cohort 0, offsets 0 and 1
      (2L, day(3)), (2L, day(4)),            // cohort 0, offset 0 only
      (3L, day(15)), (3L, day(16)))          // cohort 2, offset 0
      .toDF("user_id", "ts")
    val out = Sessionize.retentionCohorts(ev, "user_id", "ts")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (2L, 0L) -> 1L),
      s"got $out")
  }

  test("transitionMatrix: deterministic tie order, exact probabilities") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(1)), (3L, 1L, "a", ts(2)),
      // u2: two events at the SAME timestamp — event_id breaks the tie
      (4L, 2L, "b", ts(0)), (5L, 2L, "a", ts(0)), (6L, 2L, "c", ts(9)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Sessionize.transitionMatrix(ev, "user_id", "ts",
        "event_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // u1: a→b, b→a; u2 ordered by id at t0: b(4) then a(5) → b→a, a→c
    assert(out == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "a") -> ((2L, 1.0))), s"got $out")
  }
}
