package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{Eps, microSum, r}

/** Performance-tracked ensemble weighting — the engine core of the
  * reference's meta-ensemble orchestrator
  * (src/models/meta_ensemble.py:110-171 ModelPerformanceTracker):
  * per-scenario model WMAPEs become inverse-error weights,
  * `w_m ∝ 1/(wmape_m + 1e-8)` normalized within the scenario
  * (get_model_weights, :151-170), and the weighted combination of the
  * member predictions is the ensemble forecast (predict_ensemble's
  * weighted-average path, :508-579).
  *
  * Scale shape: the scored long frame (one row per observation ×
  * model) collapses to the (scenario, model) grain with ONE
  * hash-aggregate of exact micro-int error sums; normalization is a
  * scenario-partitioned window over that tiny grain. The blend joins
  * the weight table back at (scenario, model) — broadcast-sized by
  * construction.
  */
object Ensembles {

  /** Per-(scenario, model) WMAPE and the normalized inverse-error
    * weight. WMAPE here is the fraction Σ|a−p|/Σ|a| (the reference
    * tracker feeds wmape into 1/(x+1e-8) without a percent scale —
    * meta_ensemble.py:160-166; only relative magnitude matters for the
    * normalized weights, but the fraction convention is preserved so
    * the weights match the reference's numerically).
    *
    * Determinism: WMAPE is a ratio of exact micro-int sums rounded to
    * the 4dp grid; each raw weight 1/(wmape+ε) is rounded before the
    * scenario-sum normalization, and the final weight is a ratio of a
    * rounded numerator over an exact micro-int sum of those rounded
    * numerators — no order-dependent double accumulation.
    */
  def scenarioWeights(df: DataFrame, scenarioCols: Seq[String],
                      modelCol: Column, actual: Column,
                      pred: Column): DataFrame = {
    val keys = scenarioCols.map(col)
    val g = df.select(keys ++ Seq(modelCol.as("model"), r(actual).as("__a"),
      r(pred).as("__p")): _*)
      .groupBy(keys :+ col("model"): _*)
      .agg(count(lit(1)).as("n_rows"),
        microSum(abs(col("__a") - col("__p"))).as("__sad"),
        microSum(abs(col("__a"))).as("__saa"))
      .withColumn("wmape", r(col("__sad") / (col("__saa") + lit(Eps))))
      .withColumn("__raw", r(lit(1.0) / (col("wmape") + lit(Eps)), 8))
    val wNorm = if (scenarioCols.isEmpty) Window.partitionBy(lit(0))
    else Window.partitionBy(keys: _*)
    g.withColumn("__tot",
      sum(graft.expr.RoundHalfUpExpr.column(col("__raw") * lit(1e8)).cast("decimal(38,0)")).over(wNorm)
        .cast("double") / lit(1e8))
      .select(keys ++ Seq(col("model"), col("n_rows"), col("wmape"),
        r(col("__raw") / col("__tot"), 6).as("weight")): _*)
  }

  /** Weighted ensemble prediction: the long (obs × model) frame joined
    * to its scenario weight table, blended per observation as
    * Σw·p / Σw over the models present for that row (predict_ensemble's
    * weighted average with renormalization over available models).
    * `obsCols` identifies an observation. Exact micro-int accumulation
    * as in Champion.blendForecast. */
  def weightedBlend(scored: DataFrame, weights: DataFrame,
                    scenarioCols: Seq[String], obsCols: Seq[String],
                    modelCol: Column, pred: Column): DataFrame = {
    val keys = (scenarioCols ++ obsCols).map(col)
    val joined = scored.select((scenarioCols ++ obsCols).map(col) ++
      Seq(modelCol.as("model"), r(pred).as("__p")): _*)
      .join(broadcast(weights.select(scenarioCols.map(col) ++
        Seq(col("model"), col("weight")): _*)), scenarioCols :+ "model")
    joined.groupBy(keys: _*)
      .agg(
        graft.functions.Funcs.microSumProd(col("weight"), 1e6, col("__p"), 1e4)
          .as("__num"),
        graft.functions.Funcs.microSumScaled(col("weight"), 1e6).as("__den"),
        count(lit(1)).as("n_models"))
      // degenerate all-zero-weight rows (every present model's weight
      // rounds to 0 on the 1e-6 grid) emit an explicit NULL, not NaN
      .select(keys ++ Seq(
        r(when(col("__den") > 0, col("__num") / col("__den"))).as("ensemble_pred"),
        col("n_models")): _*)
  }
}
