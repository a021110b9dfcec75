package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event stream: for every
  * conversion event, the touch events (e.g. view/click) by the same
  * user in a lookback window, with first-touch and last-touch credit —
  * the standard marketing-attribution query, and for a training-data
  * pipeline the shape of "context events preceding a positive".
  *
  * Scale shape: one equi-join on the user key (conversions ⋈ touches,
  * SortMergeJoin — the time-window predicate is a post-join filter, so
  * there is no range-join blowup beyond per-user fan-out), then windows
  * partitioned by conversion id. Users are naturally hash-partitioned;
  * a pathological single user with millions of events is the only skew
  * case (salt the user key upstream if so).
  */
object Attribution {

  /** One row per conversion: touch count and first/last touch identity.
    * Conversions with no in-window touches are kept with NULL touch
    * columns and `n_touches` = 0. */
  def touchAttribution(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String,
                       convType: String, touchTypes: Seq[String],
                       lookbackDays: Int): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conversion_id"), col(userCol).as("user"),
        col(tsCol).as("__cts"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__tuser"), col(idCol).as("__tid"),
        col(typeCol).as("__ttype"), col(tsCol).as("__tts"))
    // the time window is part of the JOIN condition (not a post-filter):
    // a conversion whose touches are all out-of-window must keep its
    // NULL-extended row instead of disappearing
    val joined = conv.join(touch,
      col("user") === col("__tuser") &&
        col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $lookbackDays DAYS"),
      "left")
    val asc = Window.partitionBy(col("conversion_id"))
      .orderBy(col("__tts").asc, col("__tid").asc)
    val desc = Window.partitionBy(col("conversion_id"))
      .orderBy(col("__tts").desc, col("__tid").desc)
    joined
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col("conversion_id"), col("user"), col("__cts"))
      .agg(count(col("__tid")).as("n_touches"),
        max(when(col("__ra") === 1, col("__tid"))).as("first_touch_id"),
        max(when(col("__ra") === 1, col("__ttype"))).as("first_touch_type"),
        max(when(col("__rd") === 1, col("__tid"))).as("last_touch_id"),
        max(when(col("__rd") === 1, col("__ttype"))).as("last_touch_type"))
      .select(col("conversion_id"), col("user").as("user_id"),
        unix_micros(col("__cts")).as("conv_us"), col("n_touches"),
        col("first_touch_id"), col("first_touch_type"),
        col("last_touch_id"), col("last_touch_type"))
  }
}
