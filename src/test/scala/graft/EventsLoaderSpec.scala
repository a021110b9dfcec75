package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.core.Tables

/** The type-adaptive events loader (core.Tables.events): the driver has
  * shipped events.parquet both as TIMESTAMP(NANOS) and as timestamp[us]
  * (read by Spark as TIMESTAMP_NTZ); the loader must normalize either
  * layout to TimestampType with microsecond values identical to what
  * DuckDB reads from the same file — independent of the session TZ.
  */
class EventsLoaderSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("events loads with ts normalized to TimestampType and rows present") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.count() > 0)
    assert(ev.filter(col("ts").isNull).count() == 0)
  }

  test("ts micros are session-TZ-independent (NTZ micros recovered arithmetically, no conf write)") {
    val tzKey = "spark.sql.session.timeZone"
    val utcMicros = Tables.events(spark, dir)
      .orderBy("event_id").limit(50)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val offMicros = Tables.events(spark, dir)
        .orderBy("event_id").limit(50)
        .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
      assert(offMicros == utcMicros)
      // the r9 verdict finding: the loader must not have silently
      // re-timezoned the caller's session as a read side effect
      assert(spark.conf.get(tzKey) == "America/New_York")
    } finally spark.conf.set(tzKey, saved)
  }
}
