package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Event-sequence analytics: first-order Markov transitions and top
  * event paths — the sequence-mining companions to funnel/cohort
  * analysis (and, for a training-data pipeline, the shape of building
  * next-event supervision pairs from a clickstream).
  *
  * Scale shape: one window pass partitioned by the user key (lead of
  * the next event) feeding one hash aggregate on the transition pair —
  * per-user event order never leaves its partition, no per-user lists.
  */
object EventSeq {

  /** First-order transition matrix: per (from, to) event-type pair the
    * count and the row-normalized probability P(to | from). The final
    * event of each user (no successor) is excluded. */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("__ft"))
    pairs.join(broadcast(fromTotals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        Funcs.r(col("n") / col("__ft")).as("p"))
  }

  /** Top event paths: each user's first `k` event types joined with
    * '>' (ordered by time, id tie-break), counted across users. The
    * per-user path is bounded at `k` BEFORE aggregation — a
    * million-event user contributes a k-step prefix, never a list. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, idCol: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col(userCol))
      // array_sort on (rn, type) structs keeps the time order inside
      // the aggregated list regardless of partial-agg arrival order
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("__rn"), col(typeCol).as("t")))), _.getField("t")), ">")
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
  }
}
