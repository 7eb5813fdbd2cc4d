package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Events

class EventsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, Long)*) =
    spark.createDataFrame(rows.map { case (id, t, u) => (id, ts(t), u, "e", 1.0) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionize starts a new session after the gap") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-01 10:10:00", 7L), // same session (10 min)
      (3L, "2024-01-01 11:00:00", 7L), // 50 min gap > 30 -> new session
      (4L, "2024-01-01 10:00:00", 8L)) // other user
    val out = Events.sessionize(events, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out((7L, 1L)) == ((2L, 1L, 600000000L))) // 2 events, 10 min span
    assert(out((7L, 2L)) == ((1L, 3L, 0L)))
    assert(out((8L, 1L)) == ((1L, 4L, 0L)))
  }

  test("asofJoin picks latest right event at or before each left event") {
    val left = ev(
      (10L, "2024-01-01 10:05:00", 1L),
      (11L, "2024-01-01 10:20:00", 1L),
      (12L, "2024-01-01 09:00:00", 1L)) // before any right
    val right = ev(
      (100L, "2024-01-01 10:00:00", 1L),
      (101L, "2024-01-01 10:10:00", 1L))
    val out = Events.asofJoin(left, right).collect()
      .map(r => r.getLong(1) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(out(10L) == Some(100L))
    assert(out(11L) == Some(101L))
    assert(out(12L) == None)
  }

  test("funnel counts step-A users and in-window conversions") {
    val df = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 1.0), // converted (30m)
      (3L, ts("2024-01-01 10:00:00"), 2L, "view", 1.0),
      (4L, ts("2024-01-01 14:00:00"), 2L, "purchase", 1.0), // too late (4h)
      (5L, ts("2024-01-01 10:00:00"), 3L, "purchase", 1.0), // B before any A
      (6L, ts("2024-01-01 11:00:00"), 3L, "view", 1.0),
      (7L, ts("2024-01-01 09:00:00"), 4L, "view", 1.0))) // A only
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.funnel(df, "view", "purchase", windowMinutes = 120).collect()(0)
    assert(r.getLong(0) == 4) // users 1,2,3,4 did a view
    assert(r.getLong(1) == 1) // only user 1 converted in window
  }

  test("retention cohorts count distinct active users per day offset") {
    val df = spark.createDataFrame(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "e", 1.0),
      (2L, ts("2024-01-01 12:00:00"), 1L, "e", 1.0), // same day, one activity
      (3L, ts("2024-01-03 10:00:00"), 1L, "e", 1.0), // day 2
      (4L, ts("2024-01-02 10:00:00"), 2L, "e", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.retentionCohorts(df).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L, ("2024-01-02", 0) -> 1L))
  }

  test("hourlyWindows buckets by hour and type") {
    val events = ev(
      (1L, "2024-01-01 10:05:00", 1L),
      (2L, "2024-01-01 10:55:00", 1L),
      (3L, "2024-01-01 11:05:00", 1L))
    val out = Events.hourlyWindows(events).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("2024-01-01 10:00:00") == 2L)
    assert(out("2024-01-01 11:00:00") == 1L)
  }
}
