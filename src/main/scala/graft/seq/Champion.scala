package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{microMean, r}

/** Per-series model selection — the engine-side equivalent of the
  * reference's auto-ARIMA champion pick
  * (src/models/arima_temporal.py:277-361: stepwise order search scored
  * by AIC at :322/:355, the winner forecasts). The full stepwise
  * pmdarima search is ML-layer; the engine-expressible core is exactly
  * what the reference's scorer consumes: an in-sample fit score per
  * candidate model, an argmin per series, and the winner's h-step
  * forecast. Every candidate here is one of the already-closed-form
  * family members, so the whole selection is a composition of existing
  * single-exchange kernels:
  *
  *   member        k  in-sample one-step fit            forecaster
  *   ------------  -  --------------------------------  -------------------
  *   mean_naive    1  x̂_t = μ (exact micro-int mean)    f_s = μ
  *   snaive        0  x̂_t = x_{t−m}                     f_s = x_{n+s−m}
  *   ar2           3  Ar.fitted (OLS, Cramer)           Ar.forecast
  *   ari           3  x̂_t = x_{t−1} + ÂR(Δx)_t          Ar.forecastIntegrated
  *   ma1           2  CLS grid innovation filter        μ + θ·ε_n then flat
  *   arma11        3  CLS (φ,θ) grid filter             ARMA recursion
  *   theta         2  x̂_t = fitted_{t−1} + b/2          Theta.forecast
  *   holt_damped   2  x̂_t = l_{t−1} + φ_d·b_{t−1}       l_n + b_n·Σφ_dⁱ
  *
  * Scoring follows the verdict-specified closed form
  * AIC = n_eff·ln(SSE/n_eff) + 2k with a LITERAL k per member (the
  * parameter counts above) and n_eff the member's own residual count —
  * each member is scored on the one-step-ahead scale it predicts.
  * SSE accumulates by the house exact convention (squares rounded to
  * the 1e-8 grid, summed in decimal(38,0) — partial-aggregation-order
  * independent, the Ar.forecastIntervals σ² recipe) for the
  * aggregate-fit members; the MA/ARMA members reuse the SSE their own
  * sequential fold emits (identical IEEE chain cross-engine). The AIC
  * is rounded to the 1e-4 grid before the argmin, and ties break to
  * the fixed member order above, so the pick is deterministic in both
  * engines (a cross-engine ln() may differ in the last ulp; on the 4dp
  * grid that difference is dead except on an exact .00005 knife edge).
  *
  * A member enters a series' scoreboard only when its fit is genuinely
  * identified there (snaive needs n > m; ar2 needs ≥ 3 regression
  * rows; ari ≥ 3 diff-regression rows; arma11 needs n ≥ 3; ma1/theta
  * n ≥ 2; holt_damped n ≥ 3), which also guarantees the winner's
  * forecaster emits rows. Series of length 1 still forecast: the mean
  * member is always eligible — the reference's fallback-to-simple
  * behavior (arima_temporal.py error_action='ignore' degrades to the
  * simplest candidate).
  *
  * Execution shape: the input series frame is localCheckpointed once
  * (eight member pipelines would each re-derive it — the
  * forecastIntervals/Dsir house trade), every member is its own
  * key-partitioned window/fold + key-grain aggregate, and the final
  * pick is one key-grain window over a union of key-grain scoreboards
  * (rows = #series × #members — tiny next to the series frame). The
  * winner join runs key-grain against the unioned forecast tables.
  * Scales in the series count, never materializes a per-group vector.
  */
object Champion {

  /** Exact SSE of a 4dp-grid residual column: square → 1e-8 grid →
    * guarded exact-long sum → one division back (Ar.forecastIntervals
    * σ² convention), rounded at emit. */
  private def sqSum(resid: Column): Column =
    r(graft.functions.Funcs.microSumSq(resid))

  /** Shared member machinery: the eight family members' AIC scoreboard
    * (keys..., model, __mrank, aic) and their h-step forecast union
    * (keys..., model, step, forecast) — consumed by the argmin pick
    * ([[championForecast]]) and the Akaike-weight average
    * ([[blendForecast]]). */
  private def memberTables(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                           valueCol: String, h: Int, m: Int,
                           alpha: Double, beta: Double,
                           damp: Double): (DataFrame, DataFrame, DataFrame) = {
    require(h >= 1 && h <= m, "horizon must lie in [1, m]")
    val keys = keyCols.map(col)
    val x = col(valueCol).cast("double")
    val src = df.localCheckpoint(true)
    val wAsc = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val counts = src.groupBy(keys: _*).agg(count(lit(1)).as("__n"))

    def tag(d: DataFrame, name: String, rank: Int, k: Int): DataFrame =
      d.select(keys ++ Seq(lit(name).as("model"), lit(rank).as("__mrank"),
        lit(k.toDouble).as("__k"), col("sse"), col("neff")): _*)

    def fcTag(d: DataFrame, name: String): DataFrame =
      d.select(keys ++ Seq(lit(name).as("model"), col("step").cast("long").as("step"),
        col("forecast")): _*)

    def explodeSteps(d: DataFrame, steps: Seq[Column]): DataFrame =
      d.select(keys :+ explode(array(steps.zipWithIndex.map { case (f, i) =>
        struct(lit(i + 1L).as("step"), f.as("forecast"))
      }: _*)).as("__e"): _*)
        .select(keys ++ Seq(col("__e.step").as("step"),
          col("__e.forecast").as("forecast")): _*)

    // ---- mean_naive: rounded exact mean, flat forecast
    val muT = src.groupBy(keys: _*).agg(r(microMean(x)).as("__mu"))
    val meanScore = tag(src.join(muT, keyCols)
      .withColumn("__res", x - col("__mu"))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("neff")), "mean_naive", 0, 1)
    val meanFc = fcTag(explodeSteps(muT, (1 to h).map(_ => col("__mu"))),
      "mean_naive")

    // ---- snaive: last season's value, both as fit and as forecast
    val snLag = src.withColumn("__lm", lag(x, m).over(wAsc))
      .withColumn("__rn", row_number().over(wAsc))
    val snScore = tag(snLag.filter(col("__lm").isNotNull)
      .withColumn("__res", x - col("__lm"))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("neff")), "snaive", 1, 0)
    val snFc = fcTag(snLag.join(counts, keyCols)
      .filter(col("__rn") > col("__n") - m && col("__rn") <= col("__n") - m + h)
      .select(keys ++ Seq((col("__rn") - (col("__n") - m)).as("step"),
        r(x).as("forecast")): _*), "snaive")

    // ---- ar2: the OLS fit's own rounded one-step predictions
    val arFit = Ar.fitted(src, keyCols, ordCols, valueCol)
    val arScore = tag(arFit.filter(col("ar_fitted").isNotNull)
      .withColumn("__res", x - col("ar_fitted"))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("neff"))
      .filter(col("neff") >= 3), "ar2", 2, 3)
    val arFc = fcTag(Ar.forecast(src, keyCols, ordCols, valueCol, h)
      .withColumnRenamed("ar_forecast", "forecast"), "ar2")

    // ---- ari: AR(2) on first differences; the one-step residual on
    // the original scale equals the diff-scale residual
    // (x_t − (x_{t−1} + d̂_t) = Δx_t − d̂_t), so the diff fit scores it
    val dif = src.withColumn("__d", x - lag(x, 1).over(wAsc))
      .filter(col("__d").isNotNull)
    val ariScore = tag(Ar.fitted(dif, keyCols, ordCols, "__d")
      .filter(col("ar_fitted").isNotNull)
      .withColumn("__res", col("__d") - col("ar_fitted"))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("neff"))
      .filter(col("neff") >= 3), "ari", 3, 3)
    val ariFc = fcTag(Ar.forecastIntegrated(src, keyCols, ordCols, valueCol, h)
      .withColumnRenamed("ari_forecast", "forecast"), "ari")

    // ---- ma1: the CLS grid fold's own SSE; forecast μ + θ·ε_n then flat
    val maFull = SequentialKernels.fitMa1Full(src, keyCols, ordCols, valueCol)
    val maScore = tag(maFull.join(counts, keyCols).filter(col("__n") >= 2)
      .select(keys ++ Seq(col("ma1_sse").as("sse"),
        col("__n").cast("double").as("neff")): _*), "ma1", 4, 2)
    val maFc = fcTag(explodeSteps(maFull, (1 to h).map { s =>
      if (s == 1) r(col("ma1_mu") + col("ma1_theta") * col("ma1_eps_last"))
      else r(col("ma1_mu"))
    }), "ma1")

    // ---- arma11: the (φ,θ) grid fold's own SSE (conditioned on t ≥ 2)
    val armaFull = SequentialKernels.fitArma11Full(src, keyCols, ordCols, valueCol)
    val armaScore = tag(armaFull.join(counts, keyCols).filter(col("__n") >= 3)
      .select(keys ++ Seq(col("arma_sse").as("sse"),
        (col("__n") - 1).cast("double").as("neff")): _*), "arma11", 5, 3)
    val armaSteps = (1 to h).foldLeft(Vector.empty[Column]) { (acc, s) =>
      val f =
        if (s == 1) r(col("arma_mu") + col("arma_phi") * col("arma_xc_last") +
          col("arma_theta") * col("arma_eps_last"))
        else r(col("arma_mu") + col("arma_phi") * (acc(s - 2) - col("arma_mu")))
      acc :+ f
    }
    val armaFc = fcTag(explodeSteps(armaFull, armaSteps), "arma11")

    // ---- theta: scored on its honest one-step prediction (the
    // reference's fittedvalues convention — no peek at x_t). From
    // ŷ_t = ½·l_t + ½·ses_{t−1} and ses_{t−1} = 2·fitted_{t−1} −
    // l_{t−1}, the prediction collapses to fitted_{t−1} + b/2.
    val thFit = Theta.fitted(src, keyCols, ordCols, valueCol, alpha)
    val thScore = tag(thFit
      .withColumn("__pf", lag(col("theta_fitted"), 1).over(wAsc))
      .filter(col("__pf").isNotNull)
      .withColumn("__res", x - r(col("__pf") + col("theta_b") / 2))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("neff")), "theta", 6, 2)
    val thFc = fcTag(Theta.forecast(src, keyCols, ordCols, valueCol, alpha, h)
      .withColumnRenamed("theta_forecast", "forecast"), "theta")

    // ---- holt_damped: one-step x̂_t = l_{t−1} + φ_d·b_{t−1} (defined
    // once the trend exists, t ≥ 3), damped extrapolation beyond
    val holt = SequentialKernels.withHolt(src, keyCols, ordCols, valueCol,
      alpha, beta)
    val holtScore = tag(holt
      .withColumn("__pl", lag(col("holt_level"), 1).over(wAsc))
      .withColumn("__pt", lag(col("holt_trend"), 1).over(wAsc))
      .filter(col("__pt").isNotNull)
      .withColumn("__res", x - r(col("__pl") + lit(damp) * col("__pt")))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("neff")), "holt_damped", 7, 2)
    val holtFc = fcTag(SequentialKernels.dampedHoltForecast(src, keyCols,
      ordCols, valueCol, alpha, beta, damp, h)
      .withColumnRenamed("holt_forecast", "forecast"), "holt_damped")

    // ---- scoreboard → AIC (the pick/average happens in the consumers)
    val scores = Seq(meanScore, snScore, arScore, ariScore, maScore,
      armaScore, thScore, holtScore).reduce(_ unionByName _)
      .filter(col("sse").isNotNull && col("neff") >= 1)
    val aic = scores.withColumn("aic",
      r(col("neff") * log(greatest(col("sse"), lit(1e-8)) / col("neff")) +
        lit(2.0) * col("__k")))
    val fcs = Seq(meanFc, snFc, arFc, ariFc, maFc, armaFc, thFc, holtFc)
      .reduce(_ unionByName _)
    // src rides along so a caller that re-materializes aic/fcs can
    // unpersist the source checkpoint — Spark pins persisted RDDs in
    // SparkContext.persistentRdds (strong refs), so an intermediate
    // localCheckpoint left behind leaks for the JVM's life
    (aic, fcs, src)
  }

  /** One row per (series, step) with the champion member's id, its
    * rounded AIC and its h-step forecast. Output columns:
    * keys..., champion, aic, step, forecast. `ord` must be unique per
    * key; `h` must not exceed the seasonal period `m` (so every snaive
    * forecast base is observed). */
  def championForecast(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                       valueCol: String, h: Int = 4, m: Int = 13,
                       alpha: Double = 0.3, beta: Double = 0.1,
                       damp: Double = 0.9): DataFrame = {
    val (aic, fcs, _) = memberTables(df, keyCols, ordCols, valueCol, h, m,
      alpha, beta, damp)
    pickFrom(aic, fcs, keyCols)
  }

  /** Argmin tail over already-built member tables. */
  private def pickFrom(aic: DataFrame, fcs: DataFrame,
                       keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val wPick = Window.partitionBy(keys: _*).orderBy(col("aic"), col("__mrank"))
    val champ = aic.withColumn("__rk", row_number().over(wPick))
      .filter(col("__rk") === 1)
      .select(keys ++ Seq(col("model"), col("aic")): _*)
    champ.join(fcs, keyCols :+ "model")
      .select(keys ++ Seq(col("model").as("champion"), col("aic"),
        col("step"), col("forecast")): _*)
  }

  /** The full order-search TRACE — what the reference's stepwise
    * auto-ARIMA loop logs per candidate order
    * (src/models/arima_temporal.py:277-361: each tried (p,d,q) with its
    * AIC, then the argmin): every identified family member's parameter
    * count, exact SSE, effective n, rounded AIC and its deterministic
    * rank within the series (rank 1 = the champion q259 forecasts).
    * Exposes the member scoreboard that championForecast argmins over,
    * so model-selection diagnostics (AIC gaps, near-ties, member
    * eligibility) are queryable rather than implicit. */
  def scoreboard(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                 valueCol: String, h: Int = 4, m: Int = 13,
                 alpha: Double = 0.3, beta: Double = 0.1,
                 damp: Double = 0.9): DataFrame = {
    val (aic, _, _) = memberTables(df, keyCols, ordCols, valueCol, h, m,
      alpha, beta, damp)
    scoreboardFrom(aic, keyCols)
  }

  /** Both consumers from ONE member-pipeline execution: the scoreboard
    * and forecast union are materialized (they are series-grain tiny —
    * #series × 8 and × 8·h rows), so the eight member fits run once
    * however many of the returned frames are consumed. The single-query
    * paths (championForecast / blendForecast) deliberately stay
    * unmaterialized one-plan shapes (the measured-fastest form —
    * BENCH_NOTES r10); this entry exists for multi-consumer jobs like
    * the walk-forward backtest, which was paying the family twice. */
  def pickAndBlend(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                   valueCol: String, h: Int = 4, m: Int = 13,
                   alpha: Double = 0.3, beta: Double = 0.1,
                   damp: Double = 0.9): (DataFrame, DataFrame) = {
    val (pick, blend, _) = pickBlendScore(df, keyCols, ordCols, valueCol,
      h, m, alpha, beta, damp)
    (pick, blend)
  }

  /** All THREE consumers — champion pick, Akaike blend and the
    * order-search scoreboard — from one materialized member-pipeline
    * execution (the pickAndBlend contract extended with the q286
    * trace). */
  def pickBlendScore(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                     valueCol: String, h: Int = 4, m: Int = 13,
                     alpha: Double = 0.3, beta: Double = 0.1,
                     damp: Double = 0.9): (DataFrame, DataFrame, DataFrame) = {
    val (pick, blend, board, _) = pickBlendScoreFcs(df, keyCols, ordCols,
      valueCol, h, m, alpha, beta, damp)
    (pick, blend, board)
  }

  /** [[pickBlendScore]] plus the materialized member FORECAST union
    * (keys..., model, step, forecast) as a fourth frame — what an
    * extended search ([[OrderSearch.championForecastExt]]) joins its
    * winner against without re-fitting the family. */
  def pickBlendScoreFcs(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                        valueCol: String, h: Int = 4, m: Int = 13,
                        alpha: Double = 0.3, beta: Double = 0.1,
                        damp: Double = 0.9): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (aic0, fcs0, src) = memberTables(df, keyCols, ordCols, valueCol, h, m,
      alpha, beta, damp)
    val aic = aic0.localCheckpoint(true)
    val fcs = fcs0.localCheckpoint(true)
    // aic/fcs are materialized now and every returned frame derives
    // from THEM — the source checkpoint's blocks are dead weight, and
    // persistentRdds would otherwise pin them for the JVM's life
    org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoints(src)
    (pickFrom(aic, fcs, keyCols), blendFrom(aic, fcs, keyCols),
      scoreboardFrom(aic, keyCols), fcs)
  }

  /** Scoreboard tail over an already-built member score table. */
  private def scoreboardFrom(aic: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("aic"), col("__mrank"))
    aic.withColumn("rank", row_number().over(w).cast("long"))
      .select(keys ++ Seq(col("model"), col("__k").as("k"), col("sse"),
        col("neff").as("n_eff"), col("aic"), col("rank")): _*)
  }

  /** Akaike-weight model averaging — the combination twin of the
    * argmin pick (Burnham & Anderson: w_i ∝ exp(−Δ_i/2) with
    * Δ_i = AIC_i − AIC_min). Every scored member contributes its
    * forecast, weighted by its evidence ratio; a single dominant
    * member (Δ ≫ 0 for the rest) collapses to the champion, while
    * near-ties average instead of knife-edge flipping — the usual
    * practical argument for averaging over selection.
    *
    * Determinism: Δ is a difference of 4dp-grid AICs (identical IEEE
    * operands cross-engine), each weight rounds to the 4dp grid after
    * exp() (same knife-edge ulp class as the AIC's ln(), documented
    * there), and the blend is a ratio of exact micro-int sums
    * Σ w·f / Σ w — no normalization step, so no order-dependent
    * double accumulation anywhere. Output: keys..., step,
    * blend_forecast, n_members. */
  def blendForecast(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                    valueCol: String, h: Int = 4, m: Int = 13,
                    alpha: Double = 0.3, beta: Double = 0.1,
                    damp: Double = 0.9): DataFrame = {
    val (aic, fcs, _) = memberTables(df, keyCols, ordCols, valueCol, h, m,
      alpha, beta, damp)
    blendFrom(aic, fcs, keyCols)
  }

  /** Akaike-weight tail over already-built member tables. */
  private[seq] def blendFrom(aic: DataFrame, fcs: DataFrame,
                        keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    // Δ via a window-min, NOT a groupBy+join-back: the join shape
    // consumes the scoreboard twice and re-executes all eight member
    // score pipelines (measured +3s at sf0.1); the window keeps one
    // consumer on the series-key partitioning the scoreboard already has
    val wts = aic
      .withColumn("__amin", min(col("aic")).over(Window.partitionBy(keys: _*)))
      .withColumn("__w", r(exp((col("__amin") - col("aic")) / 2)))
      .select(keys ++ Seq(col("model"), col("__w")): _*)
    fcs.join(wts, keyCols :+ "model")
      .groupBy(keys :+ col("step"): _*)
      .agg(
        (sum(graft.expr.RoundHalfUpExpr.column(col("__w") * lit(1e4)).cast("long") *
          graft.expr.RoundHalfUpExpr.column(col("forecast") * lit(1e4)).cast("long"))
          .cast("double") / lit(1e8)).as("__num"),
        (sum(graft.expr.RoundHalfUpExpr.column(col("__w") * lit(1e4)).cast("long"))
          .cast("double") / lit(1e4)).as("__den"),
        count(lit(1)).as("n_members"))
      .select(keys ++ Seq(col("step"),
        r(col("__num") / col("__den")).as("blend_forecast"),
        col("n_members")): _*)
  }
}
