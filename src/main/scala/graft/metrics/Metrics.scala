package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.Eps

/** Forecast-error metric family as reusable aggregate `Column`
  * expressions — one distributed agg, no UDAF needed
  * (reference: src/evaluation/metrics.py:12-217, SURVEY §2.4 A31-A34).
  *
  * All are plain expression aggregates → map-side partial aggregation,
  * single shuffle, whole-stage codegen. At 100 TB these reduce to one
  * pass over the scored table.
  */
object Metrics {

  /** WMAPE = Σ|a−p| / Σ|a| × 100 (reference: src/evaluation/metrics.py:12-57). */
  def wmape(actual: Column, pred: Column): Column =
    sum(abs(actual - pred)) / (sum(abs(actual)) + lit(Eps)) * lit(100.0)

  /** Volume-weighted WMAPE (reference: src/evaluation/metrics.py:159-180). */
  def weightedWmape(actual: Column, pred: Column, w: Column): Column =
    sum(abs(actual - pred) * w) / (sum(abs(actual) * w) + lit(Eps)) * lit(100.0)

  /** MAPE with ε-guard (reference: src/evaluation/metrics.py:59-77). */
  def mape(actual: Column, pred: Column): Column =
    avg(abs(actual - pred) / (abs(actual) + lit(Eps))) * lit(100.0)

  /** Symmetric MAPE (reference: src/evaluation/metrics.py:79-97). */
  def smape(actual: Column, pred: Column): Column =
    avg(abs(actual - pred) / ((abs(actual) + abs(pred)) / 2 + lit(Eps))) * lit(100.0)

  def mae(actual: Column, pred: Column): Column = avg(abs(actual - pred))

  def rmse(actual: Column, pred: Column): Column = sqrt(avg(pow(actual - pred, 2)))

  /** Mean signed error (bias) (reference: src/evaluation/metrics.py:99-126). */
  def bias(actual: Column, pred: Column): Column = avg(pred - actual)

  /** Per-group WMAPE table (reference `wmape_by_group`,
    * src/evaluation/metrics.py:128-157): one shuffle on the group key.
    */
  def wmapeByGroup(df: DataFrame, groupCols: Seq[String], actual: Column, pred: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(wmape(actual, pred).as("wmape"), count(lit(1)).as("n_rows"))

  /** All headline metrics in one pass. */
  def scorecard(df: DataFrame, actual: Column, pred: Column): DataFrame =
    df.agg(
      wmape(actual, pred).as("wmape"),
      mape(actual, pred).as("mape"),
      smape(actual, pred).as("smape"),
      mae(actual, pred).as("mae"),
      rmse(actual, pred).as("rmse"),
      bias(actual, pred).as("bias"),
      count(lit(1)).as("n_rows"))
}
