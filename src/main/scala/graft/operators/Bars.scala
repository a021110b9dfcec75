package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** OHLC bar aggregation: collapse an event stream to fixed time-bucket
  * bars per key — open/close (first/last value by event time, id
  * tie-break), high/low, volume, count. The standard downsampling shape
  * for metric/tick streams before temporal feature extraction.
  *
  * Scale shape: windows partitioned by (key, bucket) — the same
  * partitioning the final aggregate needs, so Catalyst plans ONE
  * exchange for both; no global ordering anywhere. open/close via
  * row_number-over-(ts, id) rather than min_by/max_by keeps the
  * tie-break explicit and engine-portable.
  */
object Bars {

  /** @param bucket `date_trunc` unit for the bar (e.g. "hour", "day"). */
  def ohlc(events: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valueCol: String, bucket: String = "hour"): DataFrame = {
    val withBar = events.select(col(keyCol), col(tsCol), col(idCol), col(valueCol))
      .withColumn("__bar", date_trunc(bucket, col(tsCol)))
    val asc = Window.partitionBy(col(keyCol), col("__bar"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val desc = Window.partitionBy(col(keyCol), col("__bar"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    withBar
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col(keyCol), col("__bar"))
      .agg(count(lit(1)).as("n"),
        max(when(col("__ra") === 1, col(valueCol))).as("open"),
        max(when(col("__rd") === 1, col(valueCol))).as("close"),
        max(col(valueCol)).as("high"), min(col(valueCol)).as("low"),
        Funcs.r(sum(col(valueCol))).as("volume"))
      .select(col(keyCol), unix_micros(col("__bar")).as("bar_us"), col("n"),
        col("open"), col("close"), col("high"), col("low"), col("volume"))
  }
}
