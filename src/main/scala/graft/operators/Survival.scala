package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Kaplan-Meier survival estimation with right-censoring — the
  * product-limit estimator over durations (time-to-purchase,
  * time-to-churn, SKU lifetime): at each distinct event time t_i with
  * d_i events out of n_i still at risk,
  *   S(t) = Π_{t_i ≤ t} (1 − d_i/n_i).
  *
  * Scale shape: the fact collapses to the distinct-duration grain with
  * one partial-agg hash aggregate; the risk-set and product windows run
  * on that grain (O(|distinct durations|) rows — bounded by the time
  * resolution, not the population). The cumulative product is
  * exp(Σ ln(·)) with an explicit zero guard (a final time where
  * everyone at risk converts gives S = 0 without ln(0)).
  */
object Survival {

  /** @param duration non-negative duration column.
    * @param event    1 = observed event, 0 = right-censored.
    * @return per distinct EVENT time: t, n_risk, n_events, survival. */
  def kaplanMeier(df: DataFrame, duration: Column, event: Column): DataFrame = {
    val g = df.select(duration.as("t"), event.cast("long").as("__e"))
      .groupBy(col("t"))
      .agg(sum(col("__e")).as("n_events"), count(lit(1)).as("__total"))
    val before = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("n_risk", sum(col("__total")).over(all)
        - coalesce(sum(col("__total")).over(before), lit(0L)))
      .withColumn("__f", lit(1.0) - col("n_events") / col("n_risk"))
      .withColumn("survival", when(min(col("__f")).over(cum) <= 0.0, lit(0.0))
        .otherwise(exp(sum(log(col("__f"))).over(cum))))
      .filter(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"),
        Funcs.r(col("survival")).as("survival"))
  }

  /** Gini concentration coefficient over a per-key value frame
    * (e.g. per-SKU revenue): 1 − Σ (L_i + L_{i−1})/n with L the
    * cumulative value share over keys sorted ascending (trapezoid rule
    * under the Lorenz curve). Windows run on the KEY grain. */
  def gini(perKey: DataFrame, keyCol: String, value: Column): DataFrame = {
    val byV = Window.orderBy(value.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perKey
      .withColumn("__L", sum(value).over(byV) / sum(value).over(all))
      .withColumn("__Lprev", coalesce(lag(col("__L"), 1)
        .over(Window.orderBy(value.asc, col(keyCol).asc)), lit(0.0)))
      .agg(count(lit(1)).as("n_keys"), sum(col("__L") + col("__Lprev")).as("__s"))
      .select(col("n_keys"),
        Funcs.r(lit(1.0) - col("__s") / col("n_keys")).as("gini"))
  }
}
