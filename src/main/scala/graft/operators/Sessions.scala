package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the standard
  * event-pipeline operator (a training-data pipeline's unit of user
  * context): a new session starts whenever the gap to the previous
  * event of the same user exceeds `gapMinutes`.
  *
  * Two windows, ONE exchange: both the lag and the running session
  * counter partition by `user_id` with the same ordering, so Catalyst
  * plans a single hash-partitioning on user_id followed by one sort —
  * the minimum possible for an order-dependent per-user computation.
  * At 100 TB the shuffle is by user (high cardinality, naturally
  * balanced); no state beyond the sort buffer, no driver involvement.
  *
  * Gap comparison runs on integer epoch-micros, not timestamps, so the
  * boundary decision is bit-identical across engines (no interval /
  * float-seconds coercion).
  */
object Sessions {

  /** Per-event session assignment: adds `session_id` (1-based per user,
    * in time order with `event_id` as the tiebreak). */
  def assign(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    val prev = lag(unix_micros(col("ts")), 1).over(w)
    val newSession = when(prev.isNull || unix_micros(col("ts")) - prev > gapUs, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count, start/end (as epoch micros — the
    * portable integer form), duration in seconds, value sum. */
  def stats(events: DataFrame, gapMinutes: Int, valueCol: Column): DataFrame =
    assign(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / lit(1000000L))
          .cast("long").as("dur_sec"),
        graft.functions.Funcs.r(sum(valueCol)).as("value_sum"))
}
