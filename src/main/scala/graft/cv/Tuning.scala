package graft.cv

import org.apache.spark.ml.regression.GBTRegressionModel
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs
import graft.metrics.Metrics
import graft.model.Models

/** Hyperparameter search over leak-free time-series folds — the
  * reference's Optuna loop (src/models/lightgbm_master.py:447-530)
  * re-expressed as a deterministic grid over MLlib fits scored by mean
  * WMAPE across `TimeSplits` walk-forward folds. Optuna's TPE sampler
  * is replaced by an explicit grid: the engine's contract is the
  * LEAK-FREE EVALUATION HARNESS (date-bounded folds, per-fold fit,
  * distributed WMAPE); the proposal strategy is orchestration and can
  * be swapped without touching the fold discipline.
  *
  * Scale shape: each trial×fold is one MLlib fit over a date-filtered
  * frame (filters push to the scan) plus one aggregate. Trials run
  * sequentially like MLlib's own CrossValidator; the DATA never
  * collects to the driver — only the per-fold scalar WMAPE does.
  */
object Tuning {

  /** One hyperparameter combination for the GBT baseline. */
  final case class GbtParams(maxDepth: Int, maxIter: Int, seed: Long = 42L)

  /** One evaluated trial: params, per-fold WMAPEs, and their mean. */
  final case class Trial(params: GbtParams, foldWmapes: Seq[Double], meanWmape: Double)

  /** Search result: every trial (sorted best-first) and the winning
    * model refit on ALL data through the last fold's train end. */
  final case class SearchResult(trials: Seq[Trial], best: Trial,
                                model: GBTRegressionModel)

  /** Grid search: evaluate every params combination on every fold,
    * rank by mean WMAPE (ties broken by smaller maxDepth then maxIter —
    * prefer the simpler model), refit the winner on the full train
    * range. `folds` must be nonempty (use TimeSplits.walkForward). */
  def gridSearchGbt(df: DataFrame, dateCol: Column, features: Seq[String], target: String,
                    grid: Seq[GbtParams], folds: Seq[TimeSplits.Fold]): SearchResult = {
    require(grid.nonEmpty, "empty parameter grid")
    require(folds.nonEmpty, "no folds — widen the date range or shrink the windows")
    val trials = grid.map { p =>
      val wmapes = folds.map { f =>
        val (train, test) = TimeSplits.split(df, dateCol, f)
        val model = Models.fitGbt(train, features, target,
          maxIter = p.maxIter, maxDepth = p.maxDepth, seed = p.seed)
        Models.predictGbt(model, test, features)
          .agg(Metrics.wmape(col(target), col("prediction")))
          .head().getDouble(0)
      }
      Trial(p, wmapes, wmapes.sum / wmapes.size)
    }
    val ranked = trials.sortBy(t => (t.meanWmape, t.params.maxDepth, t.params.maxIter))
    val best = ranked.head
    val trainEnd = folds.map(_.trainEnd).max(Ordering.by((d: java.time.LocalDate) => d.toString))
    val full = df.filter(org.apache.spark.sql.functions.to_date(dateCol) <
      org.apache.spark.sql.functions.lit(trainEnd.toString))
    val model = Models.fitGbt(full, features, target,
      maxIter = best.params.maxIter, maxDepth = best.params.maxDepth, seed = best.params.seed)
    SearchResult(ranked, best, model)
  }

  /** The SELECTION arithmetic of the hyperparameter search as a pure
    * engine operator — the piece of the reference's Optuna loop
    * (src/models/optimization_pipeline.py) that is fully
    * oracle-expressible. Input: one row per (config, fold, test
    * observation) with actual `y` and the candidate's prediction
    * `pred` (from ANY member family — MLlib fits, deterministic
    * forecasters, blends). Output: one row per config —
    *   config, n_folds, cv_wmape (mean of per-fold micro-int WMAPEs,
    *   4dp), rank (1 = champion; ties break on config name so the
    *   board is deterministic), is_champion.
    * Rows with NULL y or pred are dropped (a config that cannot
    * predict an observation simply doesn't get scored on it — the
    * fold WMAPE is over its scored rows). Folds whose |y| sum is 0
    * report no WMAPE and drop from that config's mean (mirrors
    * [[Metrics.wmape]]'s undefined-denominator contract).
    *
    * Scale shape: one hash aggregate to (config, fold) grain with
    * map-side combine, one to config grain, then a rank over the
    * CONFIG table — grid-sized (dozens of rows), so the single-
    * partition window is free. Fact-sized inputs never hit a window. */
  def cvScoreboard(scored: DataFrame, config: Column, fold: Column,
                   y: Column, pred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perFold = scored
      .filter(y.isNotNull && pred.isNotNull)
      .groupBy(config.as("config"), fold.as("fold"))
      .agg(Funcs.microSum(abs(y - pred)).as("__sae"),
        Funcs.microSum(abs(y)).as("__say"))
      .filter(col("__say") > 0)
      .withColumn("fold_wmape", Funcs.r(col("__sae") / col("__say")))
    val perConfig = perFold.groupBy(col("config"))
      .agg(count(lit(1)).as("n_folds"),
        Funcs.r(Funcs.microMean(col("fold_wmape"))).as("cv_wmape"))
    perConfig
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cv_wmape"), col("config")))
          .cast("long"))
      .withColumn("is_champion", when(col("rank") === 1, 1L).otherwise(0L))
  }
}
