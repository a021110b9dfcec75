package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Cohort retention analysis: group users by the week of their FIRST
  * event (the cohort), then measure what fraction of each cohort is
  * still active k weeks later — the standard activity-retention triangle.
  *
  * Scale shape: first-event per user is a partial-aggregated min (one
  * user-key exchange); activity weeks are a distinct over (user, week)
  * riding the same key; the cohort join is user-keyed; the final rollup
  * is (cohort, k)-keyed and tiny. No windows, no per-user lists.
  */
object Cohorts {

  /** (cohort_week, week_k, cohort_size, n_active, retention) — one row
    * per cohort × offset with at least one active user; week 0 is the
    * cohort week itself (retention 1.0 by construction). */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                maxWeeks: Int = 8): DataFrame = {
    val wk = date_trunc("week", col(tsCol)).cast("date")
    val firstWeek = events.groupBy(col(userCol))
      .agg(min(wk).as("cohort_week"))
    val activeWeeks = events.select(col(userCol), wk.as("active_week")).distinct()

    val joined = activeWeeks.join(firstWeek, Seq(userCol))
      .withColumn("week_k",
        floor(datediff(col("active_week"), col("cohort_week")) / 7).cast("long"))
      .filter(col("week_k").between(0, maxWeeks))

    val sizes = firstWeek.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))

    joined.groupBy(col("cohort_week"), col("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_k"), col("cohort_size"),
        col("n_active"),
        Funcs.r(col("n_active") / col("cohort_size")).as("retention"))
  }

  /** RFM segmentation — recency / frequency / monetary quintiles per
    * customer plus the classic marketing segment ladder, the
    * customer-value summary built from the reference's recency /
    * purchase-frequency behavioral features
    * (src/features/behavioral_features_engine.py:134-148).
    * Score 5 is best on every axis (most recent, most orders, most
    * spend).
    *
    * Determinism: monetary is [[Funcs.r]]-rounded BEFORE the ntile
    * ordering (float sums are partial-agg-order dependent; rounded
    * they are not) and every ntile ORDER BY ends on the customer key —
    * a total order, which is exactly when Spark and DuckDB ntile
    * agree.
    *
    * Scale note: the three ntile windows are UN-partitioned — bounded
    * by customer cardinality (dimension grain, same posture as the ABC
    * cumulative share), not by the fact. The fact collapses first in
    * one partial-aggregated pass. */
  def rfm(orders: DataFrame, custCol: String, dateCol: String,
          amountCol: String, asOf: String, nTiles: Int = 5): DataFrame = {
    val perCust = orders.groupBy(col(custCol))
      .agg(datediff(lit(asOf).cast("date"), max(col(dateCol).cast("date")))
        .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        Funcs.r(sum(col(amountCol))).as("monetary"))
    def tile(order: Seq[org.apache.spark.sql.Column]) =
      ntile(nTiles).over(org.apache.spark.sql.expressions.Window
        .orderBy(order: _*)).cast("long")
    perCust
      .withColumn("r_score",
        tile(Seq(col("recency_days").desc, col(custCol))))
      .withColumn("f_score", tile(Seq(col("frequency"), col(custCol))))
      .withColumn("m_score", tile(Seq(col("monetary"), col(custCol))))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
          .when(col("r_score") >= 3 && col("f_score") >= 3, "loyal")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .otherwise("hibernating"))
  }
}
