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

  /** Successive-halving (SHA/Hyperband-bracket) schedule over
    * walk-forward folds — the PRUNER arithmetic of the reference's
    * Optuna loop (optuna.pruners in optimization_pipeline.py) as a
    * deterministic dataflow, the same way [[cvScoreboard]] carries the
    * sampler's selection arithmetic. Round r scores the surviving
    * configs on the first `budgetFolds` folds (a PREFIX of the
    * time-ordered fold index — early rounds are cheap, later rounds
    * spend the full budget only on survivors) and keeps the top
    * `keep` by (cv_wmape, config-name) rank.
    *
    * Input: one row per (config, fold, test observation) with actual
    * `y` and prediction `pred` — identical contract to
    * [[cvScoreboard]], except `fold` must be the INTEGER walk-forward
    * index (0-based, time order) so "first b folds" is well defined.
    * `schedule` is a LITERAL list of (budgetFolds, keep) rounds with
    * strictly increasing budgets — the caller-pinned bracket, so both
    * engines replay the identical fixed dataflow (no data-dependent
    * round count).
    *
    * Output: one row per (round, config) that was still alive when
    * the round ran — round, config, budget_folds, n_folds (folds the
    * config actually scored within budget), cv_wmape, rank, survived,
    * and is_champion = 1 exactly on the final round's rank-1 row.
    * A config with NO scoreable fold inside the budget drops from
    * that round's board (and therefore from all later rounds) — the
    * [[cvScoreboard]] absent-fold convention.
    *
    * Scale shape: ONE fact-grain aggregate to the (config, fold)
    * WMAPE table (map-side combine), checkpointed; every round is a
    * grid-sized join + aggregate + rank over that tiny frame, so the
    * fixed round loop adds zero fact passes. The single-partition
    * rank window is grid-bounded, same as [[cvScoreboard]]. */
  def successiveHalving(scored: DataFrame, config: Column, fold: Column,
                        y: Column, pred: Column,
                        schedule: Seq[(Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(schedule.nonEmpty, "empty halving schedule")
    require(schedule.forall { case (b, k) => b >= 1 && k >= 1 },
      "budgets and keeps must be positive")
    require(schedule.map(_._1) == schedule.map(_._1).sorted &&
      schedule.map(_._1).distinct.size == schedule.size,
      "fold budgets must strictly increase across rounds")
    val perFold = scored
      .filter(y.isNotNull && pred.isNotNull)
      .groupBy(config.as("config"), fold.cast("int").as("fold"))
      .agg(Funcs.microSum(abs(y - pred)).as("__sae"),
        Funcs.microSum(abs(y)).as("__say"))
      .filter(col("__say") > 0)
      .withColumn("fold_wmape", Funcs.r(col("__sae") / col("__say")))
      .localCheckpoint(true) // grid x folds rows; rounds re-read it
    var survivors = perFold.select(col("config")).distinct()
    val boards = schedule.zipWithIndex.map { case ((budget, keep), rIx) =>
      val board = perFold.filter(col("fold") < budget)
        .join(survivors, Seq("config"))
        .groupBy(col("config"))
        .agg(count(lit(1)).as("n_folds"),
          Funcs.r(Funcs.microMean(col("fold_wmape"))).as("cv_wmape"))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("cv_wmape"), col("config")))
            .cast("long"))
        .withColumn("survived",
          when(col("rank") <= keep, 1L).otherwise(0L))
        .withColumn("round", lit(rIx))
        .withColumn("budget_folds", lit(budget))
      survivors = board.filter(col("survived") === 1).select(col("config"))
      board
    }
    boards.reduce(_ unionByName _)
      .withColumn("is_champion",
        when(col("round") === lit(schedule.size - 1) && col("rank") === 1, 1L)
          .otherwise(0L))
      .select(col("round"), col("config"), col("budget_folds"),
        col("n_folds"), col("cv_wmape"), col("rank"), col("survived"),
        col("is_champion"))
  }

  /** The standard SHA bracket as a literal schedule: geometric fold
    * budgets (1, η, η², … capped at `totalFolds`, final round always
    * at the full budget) with keeps halving by η down to 1. Pure
    * driver arithmetic — callers pin the returned literal next to the
    * query so the oracle replays the same bracket. */
  def shaSchedule(nConfigs: Int, totalFolds: Int, eta: Int = 2): Seq[(Int, Int)] = {
    require(nConfigs >= 1 && totalFolds >= 1 && eta >= 2, "degenerate bracket")
    val rounds = math.max(1,
      math.ceil(math.log(nConfigs.toDouble) / math.log(eta.toDouble)).toInt)
    val raw = (0 until rounds).map { r =>
      val budget = math.min(totalFolds, math.pow(eta.toDouble, r.toDouble).toInt)
      val keep = math.max(1,
        math.ceil(nConfigs / math.pow(eta.toDouble, (r + 1).toDouble)).toInt)
      (budget, keep)
    }
    // force the last round onto the full budget, then collapse
    // duplicate-budget rounds the cap created — the LATER round (the
    // smaller keep) wins, so the bracket still narrows to its final
    // keep even when every budget saturates at totalFolds
    val full = raw.dropRight(1) :+ ((totalFolds, raw.last._2))
    full.foldLeft(Vector.empty[(Int, Int)]) { case (acc, bk) =>
      if (acc.nonEmpty && acc.last._1 >= bk._1) acc.init :+ bk else acc :+ bk
    }
  }
}
