package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Split-conformal prediction intervals (Vovk et al.; the
  * distribution-free finite-sample interval recipe): given a
  * prediction and a held-out CALIBRATION set, the conformity scores
  * s_i = |y_i − ŷ_i| on calibration rows yield
  *   q̂ = the ⌈(n+1)(1−α)⌉-th smallest score,
  * and [ŷ − q̂, ŷ + q̂] covers a fresh point with probability ≥ 1 − α
  * with NO distributional assumption — the model-agnostic companion
  * to the engine's parametric AR intervals (q251) and bootstrap bands
  * (q261), valid for any point forecaster the pipeline ships.
  *
  * Scale shape: one rank window over calibration rows + one group
  * aggregate for q̂ (group-keyed exchanges only), then a broadcast-size
  * per-group join back onto the test rows for the coverage report.
  *
  * Determinism: scores round to the 4dp grid before ranking (the
  * order statistic is then exact cross-engine — duplicate scores make
  * rank ties, but the k-th smallest VALUE is tie-invariant); k is an
  * exact integer from the exact calibration count; the coverage
  * comparison runs rounded-score ≤ rounded-q̂. */
object Conformal {

  /** Per-group split-conformal report: q̂ from the calibration rows
    * (`isCalib`), then empirical coverage of [ŷ ± q̂] on the REST (the
    * test rows). Returns one row per group:
    * (keys..., n_calib, k_order, qhat, n_test, n_covered, coverage).
    * Groups with no calibration rows are absent; k clamps to n_calib
    * (α smaller than 1/(n+1) cannot be honored by a finite sample —
    * the standard caveat, documented rather than hidden). Groups with
    * calibration rows but NO test rows report coverage = NULL (with
    * n_test = 0), never 0.0 — absent test data is not 0% coverage. */
  def splitConformal(df: DataFrame, groupCols: Seq[String], y: Column,
                     pred: Column, isCalib: Column,
                     alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(Funcs.r(abs(y - pred)).as("__s"),
      isCalib.cast("boolean").as("__c")): _*)
      .filter(col("__c").isNotNull && col("__s").isNotNull)
    val calib = base.filter(col("__c"))
    val wRank = Window.partitionBy(keys: _*).orderBy(col("__s"))
    val ranked = calib.withColumn("__rn", row_number().over(wRank))
    val nCal = calib.groupBy(keys: _*).agg(count(lit(1)).as("n_calib"))
      .withColumn("k_order",
        least(ceil((col("n_calib") + 1) * lit(1.0 - alpha)).cast("long"),
          col("n_calib")))
    val qhat = ranked.join(nCal, groupCols)
      .filter(col("__rn") === col("k_order"))
      .select(keys ++ Seq(col("n_calib"), col("k_order"),
        col("__s").as("qhat")): _*)
    val test = base.filter(!col("__c"))
    val cov = test.join(qhat, groupCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__s") <= col("qhat"), 1L).otherwise(0L)).as("n_covered"))
    qhat.join(cov, groupCols, "left")
      .select(keys ++ Seq(col("n_calib"), col("k_order"), col("qhat"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        // NULL (not 0.0) when the group has no test rows: 0% empirical
        // coverage is a meaningful (bad) outcome, absent test data is
        // not — conflating them would hide the difference from readers
        // who don't cross-check n_test (r16 ADVICE)
        Funcs.r(when(coalesce(col("n_test"), lit(0L)) > 0,
          col("n_covered").cast("double") / col("n_test"))
          .otherwise(lit(null).cast("double"))).as("coverage")): _*)
  }
}
