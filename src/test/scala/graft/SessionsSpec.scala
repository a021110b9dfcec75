package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Sessions

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  // user 1: events at 10:00, 10:10, 10:45 (gap 35m → new session), 10:50
  // user 2: single event
  private val events = Seq(
    (1L, 10L, ts(0), 1.0), (2L, 10L, ts(10), 2.0),
    (3L, 10L, ts(45), 3.0), (4L, 10L, ts(50), 4.0),
    (5L, 20L, ts(5), 9.0)
  ).toDF("event_id", "user_id", "ts", "value")

  test("gap > 30min starts a new session; runs are numbered per user") {
    val a = Sessions.assign(events, 30)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(a(1L) == 1L && a(2L) == 1L) // same session
    assert(a(3L) == 2L && a(4L) == 2L) // after the 35-min gap
    assert(a(5L) == 1L)                // other user starts at 1
  }

  test("stats aggregates per session with micros-exact duration") {
    val st = Sessions.stats(events, 30, col("value"))
      .select("user_id", "session_id", "n_events", "dur_sec", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(st((10L, 1L))._3 == 2L && st((10L, 1L))._4 == 600L) // 10 min
    assert(st((10L, 2L))._3 == 2L && st((10L, 2L))._4 == 300L) // 5 min
    assert(st((20L, 1L))._5 == 9.0)
  }

  test("an exact 30-minute gap does NOT split (strictly greater)") {
    val e = Seq((1L, 1L, ts(0), 1.0), (2L, 1L, Timestamp.valueOf("2024-01-01 10:30:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val n = Sessions.stats(e, 30, col("value")).count()
    assert(n == 1L)
  }

  test("parity with Spark's native session_window up to its boundary semantics") {
    // session_window merges events whose [t, t+gap) windows overlap —
    // i.e. it SPLITS on gap >= duration, where Sessions splits on
    // gap > duration. Away from the exact-boundary case the two agree;
    // this pins the engine operator against the built-in.
    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("v"))
      .select("user_id", "n_events", "v")
      .as[(Long, Long, Double)].collect().toSet
    val custom = Sessions.stats(events, 30, col("value"))
      .select(col("user_id"), col("n_events"), col("value_sum"))
      .as[(Long, Long, Double)].collect().toSet
    assert(native == custom)
  }
}
