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
}
