package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Extended ARIMA order search — the family members past the champion
  * eight that close the engine toward the reference's stepwise
  * auto-ARIMA search space (src/models/arima_temporal.py:277-361:
  * pmdarima stepwise over p ≤ 5, q ≤ 5, d ≤ 2; statsmodels fallback
  * fits a literal (2,1,2)). pmdarima's stepwise walk is a SEQUENTIAL
  * cost-saving device for a single in-memory series — it prunes the
  * candidate grid because each candidate fit is expensive on one core.
  * The engine re-expresses the search Spark-first: every candidate
  * order fits for EVERY series in the same handful of distributed
  * passes (each member is one fold/window + key-grain aggregate), so
  * the full grid costs what one stepwise path costs and the argmin is
  * the global optimum over the searched space, never a local stepwise
  * trap. The searched orders:
  *
  *   family (Champion)   (0,0,0)+μ, snaive, (2,0,0), (2,1,0),
  *                       (0,0,1), (1,0,1), theta, damped Holt
  *   this module         (0,2,1)  MA(1) on SECOND differences (d = 2
  *                                coverage — pmdarima's max_d)
  *                       (2,1,1)  ARMA(2,1) on first differences
  *                                (p = 2 with a joint MA side)
  *                       (2,1,2)  ARMA(2,2) on first differences —
  *                                the reference's statsmodels-fallback
  *                                LITERAL order (arima_temporal.py:341)
  *                       sari     SARIMA(2,0,0)(0,1,0)_m — AR(2) on
  *                                the lag-m seasonal differences
  *                                (the seasonal-P + seasonal-D legs)
  *                       sma      SARIMA(0,0,1)(0,1,0)_m — MA(1) on
  *                                the lag-m seasonal differences
  *                                (the seasonal-Q leg, max_Q)
  *                       sarma    SARIMA(1,0,1)(0,1,0)_m — ARMA(1,1)
  *                                on the lag-m seasonal differences
  *                                (the JOINT seasonal P=1,Q=1 member,
  *                                the reference's configured
  *                                seasonal_order=(1,1,1,period) shape,
  *                                arima_temporal.py:224)
  *
  * Scoring and ranking follow the Champion conventions exactly:
  * AIC = n_eff·ln(max(SSE, 1e-8)/n_eff) + 2k rounded to the 4dp grid,
  * k the literal parameter count ((0,2,1): θ + μ = 2; (2,1,1):
  * φ₁ + φ₂ + θ + μ = 4; (2,1,2): φ₁ + φ₂ + θ₁ + θ₂ + μ = 5; sari: the
  * AR(2) intercept + 2 coefs = 3; sma: θ + μ = 2; sarma:
  * φ + θ + μ = 3), ties break to the fixed member
  * order with the new members ranked after the family eight. A member
  * enters a series' scoreboard only when identified: (0,2,1) needs ≥ 2
  * second-difference residuals (n ≥ 4), (2,1,1) and (2,1,2) need ≥ 2
  * conditioned diff residuals (n ≥ 5), sari needs ≥ 3 seasonal-diff
  * regression rows (n ≥ m + 5), sma needs ≥ 2 seasonal-diff rows
  * (n ≥ m + 2), sarma needs ≥ 3 seasonal-diff rows — ≥ 2 conditioned
  * residuals — (n ≥ m + 3).
  *
  * Execution shape: the grid-fold members reuse the family's single-
  * exchange kernels ([[SequentialKernels.fitMa1Full]] on Δ²x and on
  * the lag-m seasonal differences, [[SequentialKernels.fitArma11Full]]
  * on the lag-m seasonal differences, [[SequentialKernels
  * .fitArma21Full]] and [[SequentialKernels.fitArma22Full]] on Δx);
  * the union scoreboard is series-grain tiny. Scales in the series
  * count like Champion.
  */
object OrderSearch {

  /** ARIMA(0,2,1) fit: the MA(1) CLS grid fold run on the second
    * differences, with the integration state a forecast needs. One row
    * per series with ≥ 3 observations (two differencing passes):
    * d2_theta, d2_sse, d2_neff (the residual count, n − 2), d2_mu (the
    * exact micro-int mean of Δ²x), d2_eps_last, plus y_last (= y_n)
    * and dy_last (= Δy_n) for the double integration. */
  def arima021Full(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                   valueCol: String,
                   grid: Seq[Double] = Seq(-0.8, -0.4, 0.0, 0.4, 0.8)): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val wd = Window.partitionBy(keys: _*).orderBy(ordCols.map(_.desc): _*)
    val dy = df.withColumn("__yraw", col(valueCol).cast("double"))
      .withColumn("__dy", col("__yraw") - lag(col("__yraw"), 1).over(w))
      .withColumn("__d2", col("__dy") - lag(col("__dy"), 1).over(w))
    val lastRow = dy.withColumn("__rdL", row_number().over(wd))
      .filter(col("__rdL") === 1)
      .select(keys ++ Seq(col("__yraw").as("y_last"), col("__dy").as("dy_last")): _*)
    val d2 = dy.filter(col("__d2").isNotNull)
    val fit = SequentialKernels.fitMa1Full(d2, keyCols, ordCols, "__d2", grid)
    val neff = d2.groupBy(keys: _*).agg(count(lit(1)).cast("double").as("d2_neff"))
    fit.join(neff, keyCols).join(lastRow, keyCols)
      .select(keys ++ Seq(col("ma1_theta").as("d2_theta"),
        col("ma1_sse").as("d2_sse"), col("d2_neff"),
        col("ma1_mu").as("d2_mu"), col("ma1_eps_last").as("d2_eps_last"),
        col("y_last"), col("dy_last")): _*)
  }

  /** h-step ARIMA(0,2,1) forecast by double integration: on the Δ²
    * scale f_1 = r(μ + θ·ε_n) and f_{s≥2} = r(μ) (the MA(1) forecast),
    * then Δŷ_{n+s} = r(Δy_n + Σ_{j≤s} f_j) and
    * ŷ_{n+s} = r(y_n + Σ_{j≤s} Δŷ_{n+j}) — every summand lives on the
    * 4dp grid so the per-step rounding chain is exact in both engines.
    * One row per (series, step), with the winning θ and SSE attached. */
  def arima021Forecast(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                       valueCol: String, h: Int,
                       grid: Seq[Double] = Seq(-0.8, -0.4, 0.0, 0.4, 0.8)): DataFrame =
    arima021ForecastFrom(arima021Full(df, keyCols, ordCols, valueCol, grid),
      keyCols, h)

  /** The [[arima021Forecast]] integration tail over an ALREADY-BUILT
    * [[arima021Full]] table — so a caller holding a materialized fit
    * derives the forecast without re-running the fold. */
  def arima021ForecastFrom(base: DataFrame, keyCols: Seq[String], h: Int): DataFrame = {
    require(h >= 1, "horizon must be at least 1")
    val keys = keyCols.map(col)
    val steps = (1 to h).map { s =>
      if (s == 1) r(col("d2_mu") + col("d2_theta") * col("d2_eps_last"))
      else r(col("d2_mu"))
    }
    val wcum = Window.partitionBy(keys: _*).orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.select(keys ++ Seq(col("d2_theta"), col("d2_sse"), col("y_last"),
      col("dy_last")) :+
      posexplode(array(steps: _*)).as(Seq("__p", "__f2")): _*)
      .withColumn("step", (col("__p") + 1).cast("long"))
      .withColumn("__dhat", r(col("dy_last") + sum(col("__f2")).over(wcum)))
      .withColumn("arima_forecast", r(col("y_last") + sum(col("__dhat")).over(wcum)))
      .select(keys ++ Seq(col("d2_theta"), col("d2_sse"), col("step"),
        col("arima_forecast")): _*)
  }

  /** SARIMA(0,0,1)(0,1,0)_m fit: the MA(1) CLS grid fold run on the
    * lag-m seasonal differences — the seasonal-Q leg of the searched
    * space (pmdarima max_Q; this member is Q = 1, complementing the
    * sari member's seasonal-P side). One row per series with > m
    * observations: sma_theta, sma_sse, sma_neff (the seasonal-diff row
    * count), sma_mu (the exact micro-int mean of the diffs) and
    * sma_eps_last. */
  def sarima011Full(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                    valueCol: String, m: Int,
                    grid: Seq[Double] = Seq(-0.8, -0.4, 0.0, 0.4, 0.8)): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val sd = df.withColumn("__sd", col(valueCol).cast("double")
      - lag(col(valueCol).cast("double"), m).over(w))
      .filter(col("__sd").isNotNull)
    val fit = SequentialKernels.fitMa1Full(sd, keyCols, ordCols, "__sd", grid)
    val neff = sd.groupBy(keys: _*).agg(count(lit(1)).cast("double").as("sma_neff"))
    fit.join(neff, keyCols)
      .select(keys ++ Seq(col("ma1_theta").as("sma_theta"),
        col("ma1_sse").as("sma_sse"), col("sma_neff"),
        col("ma1_mu").as("sma_mu"),
        col("ma1_eps_last").as("sma_eps_last")): _*)
  }

  /** SARIMA(1,0,1)(0,1,0)_m fit — the JOINT seasonal member: the
    * ARMA(1,1) CLS (φ, θ) grid fold run on the lag-m seasonal
    * differences, so the seasonal-AR and seasonal-MA legs are fit
    * TOGETHER the way the reference configures pmdarima's seasonal
    * search (`seasonal_order=(1,1,1,period)`,
    * src/models/arima_temporal.py:224 — P and Q jointly, on the
    * seasonally differenced scale; the sari and sma members cover each
    * leg alone). One row per series with > m observations: sarma_phi,
    * sarma_theta, sarma_sse, sarma_nsd (the seasonal-diff row count;
    * the CLS conditions on the first diff, so n_eff = nsd − 1),
    * sarma_mu (exact micro-int mean of the diffs), sarma_eps_last and
    * sarma_xc_last (the forecast state). */
  def sarma11Full(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                  valueCol: String, m: Int,
                  phiGrid: Seq[Double] = Seq(-0.5, 0.0, 0.5, 0.9),
                  thetaGrid: Seq[Double] = Seq(-0.4, 0.0, 0.4)): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val sd = df.withColumn("__sd", col(valueCol).cast("double")
      - lag(col(valueCol).cast("double"), m).over(w))
      .filter(col("__sd").isNotNull)
    val fit = SequentialKernels.fitArma11Full(sd, keyCols, ordCols, "__sd",
      phiGrid, thetaGrid)
    val nsd = sd.groupBy(keys: _*).agg(count(lit(1)).cast("double").as("sarma_nsd"))
    fit.join(nsd, keyCols)
      .select(keys ++ Seq(col("arma_phi").as("sarma_phi"),
        col("arma_theta").as("sarma_theta"),
        col("arma_sse").as("sarma_sse"), col("sarma_nsd"),
        col("arma_mu").as("sarma_mu"),
        col("arma_eps_last").as("sarma_eps_last"),
        col("arma_xc_last").as("sarma_xc_last")): _*)
  }

  /** h-step SARIMA(1,0,1)(0,1,0)_m forecast over an ALREADY-BUILT
    * [[sarma11Full]] table: the ARMA(1,1) recursion on the
    * seasonal-diff scale —
    *
    *   f_1 = r( μ + φ·(z_n − μ̄) + θ·ε_n )   (z_n − μ̄ = the stored xc)
    *   f_s = r( μ + φ·(f_{s−1} − μ) )        s ≥ 2
    *
    * each step rounded before feeding forward, then seasonally
    * integrated against the observed last season:
    * ŷ_{n+s} = r(y_{n+s−m} + f_s) ([[seasonalBase]]). */
  def sarma11ForecastFrom(base: DataFrame, seasonBase: DataFrame,
                          keyCols: Seq[String], h: Int): DataFrame = {
    require(h >= 1, "horizon must be at least 1")
    val keys = keyCols.map(col)
    val steps = (1 to h).foldLeft(Vector.empty[Column]) { (acc, s) =>
      val f =
        if (s == 1) r(col("sarma_mu") + col("sarma_phi") * col("sarma_xc_last") +
          col("sarma_theta") * col("sarma_eps_last"))
        else r(col("sarma_mu") + col("sarma_phi") * (acc(s - 2) - col("sarma_mu")))
      acc :+ f
    }
    base.select(keys ++ Seq(col("sarma_phi"), col("sarma_theta"),
      col("sarma_sse")) :+
      posexplode(array(steps: _*)).as(Seq("__p", "__f")): _*)
      .withColumn("step", (col("__p") + 1).cast("long"))
      .join(seasonBase, keyCols :+ "step")
      .withColumn("sarma_forecast", r(col("__base") + col("__f")))
      .select(keys ++ Seq(col("sarma_phi"), col("sarma_theta"),
        col("sarma_sse"), col("step"), col("sarma_forecast")): _*)
  }

  /** [[sarma11Full]] + [[sarma11ForecastFrom]] in one call. */
  def sarma11Forecast(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                      valueCol: String, h: Int, m: Int,
                      phiGrid: Seq[Double] = Seq(-0.5, 0.0, 0.5, 0.9),
                      thetaGrid: Seq[Double] = Seq(-0.4, 0.0, 0.4)): DataFrame =
    sarma11ForecastFrom(
      sarma11Full(df, keyCols, ordCols, valueCol, m, phiGrid, thetaGrid),
      seasonalBase(df, keyCols, ordCols, valueCol, h, m), keyCols, h)

  /** The last-season base frame the seasonal integration adds forecasts
    * onto: (keys..., step, `__base` = y_{n−m+step}) for step 1..h —
    * the snaive/sari base convention; needs h ≤ m so every step's base
    * is an OBSERVED value. */
  def seasonalBase(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                   valueCol: String, h: Int, m: Int): DataFrame = {
    require(h >= 1 && h <= m, s"seasonal base needs 1 <= h <= m (got h=$h m=$m)")
    val keys = keyCols.map(col)
    val wd = Window.partitionBy(keys: _*).orderBy(ordCols.map(_.desc): _*)
    df.withColumn("__rd", row_number().over(wd))
      .filter(col("__rd") <= m && col("__rd") > m - h)
      .select(keys ++ Seq((lit(m) - col("__rd") + 1).cast("long").as("step"),
        col(valueCol).cast("double").as("__base")): _*)
  }

  /** h-step SARIMA(0,0,1)(0,1,0)_m forecast over an ALREADY-BUILT
    * [[sarima011Full]] table: on the seasonal-diff scale
    * f_1 = r(μ + θ·ε_n), f_{s≥2} = r(μ) (the MA(1) forecast), then
    * ŷ_{n+s} = r(y_{n+s−m} + f_s) — seasonal integration against the
    * observed last season ([[seasonalBase]]). */
  def sarima011ForecastFrom(base: DataFrame, seasonBase: DataFrame,
                            keyCols: Seq[String], h: Int): DataFrame = {
    require(h >= 1, "horizon must be at least 1")
    val keys = keyCols.map(col)
    val steps = (1 to h).map { s =>
      if (s == 1) r(col("sma_mu") + col("sma_theta") * col("sma_eps_last"))
      else r(col("sma_mu"))
    }
    base.select(keys ++ Seq(col("sma_theta"), col("sma_sse")) :+
      posexplode(array(steps: _*)).as(Seq("__p", "__f")): _*)
      .withColumn("step", (col("__p") + 1).cast("long"))
      .join(seasonBase, keyCols :+ "step")
      .withColumn("sma_forecast", r(col("__base") + col("__f")))
      .select(keys ++ Seq(col("sma_theta"), col("sma_sse"), col("step"),
        col("sma_forecast")): _*)
  }

  /** [[sarima011Full]] + [[sarima011ForecastFrom]] in one call. */
  def sarima011Forecast(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                        valueCol: String, h: Int, m: Int,
                        grid: Seq[Double] = Seq(-0.8, -0.4, 0.0, 0.4, 0.8)): DataFrame =
    sarima011ForecastFrom(
      sarima011Full(df, keyCols, ordCols, valueCol, m, grid),
      seasonalBase(df, keyCols, ordCols, valueCol, h, m), keyCols, h)

  /** Fixed tiebreak order across the sixteen searched members (r16:
    * ma3/ar5 promoted from parked probes to board members — the r15
    * verdict's optional ask #7, closing the 3 ≤ p,q ≤ 5 gap with the
    * grid's cheapest representatives of each leg: the q-side MA(3)
    * CLS fold and the p-side AR(5) Levinson closed form). */
  private val MemberRank: Map[String, Int] = Map(
    "mean_naive" -> 0, "snaive" -> 1, "ar2" -> 2, "ari" -> 3, "ma1" -> 4,
    "arma11" -> 5, "theta" -> 6, "holt_damped" -> 7,
    "arima021" -> 8, "arima211" -> 9, "sari" -> 10, "arima212" -> 11,
    "sma" -> 12, "sarma" -> 13, "ma3" -> 14, "ar5" -> 15)

  /** MA(3) + AR(5) member SCORE rows over already-built fit tables
    * ([[SequentialKernels.fitMa3Full]] / [[graft.seq.YuleWalker.ar5Full]]
    * — the q311/q313 probes' shared state, fit once per session):
    * ma3 follows the family's MA(q) conventions (n_eff = series length,
    * the CLS recursion conditions nothing; k = θ₁+θ₂+θ₃+μ = 4; entry
    * gate n ≥ 4 = k, the ma1 n ≥ k rule); ar5 scores its
    * lag-5-conditioned SSE over yw_neff = n − 5 rows (k = φ₁..φ₅+μ = 6;
    * the fit table itself gates n_eff ≥ 3). Same (model, k, sse,
    * n_eff, aic) schema as every member — union into [[boardFrom]]. */
  def wideMemberScoresFrom(ma3Full: DataFrame, ar5Full: DataFrame,
                           df: DataFrame, keyCols: Seq[String],
                           valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    def aicOf(sse: Column, neff: Column, k: Double): Column =
      r(neff * log(greatest(sse, lit(1e-8)) / neff) + lit(2.0 * k))
    val counts = df.groupBy(keys: _*).agg(count(col(valueCol)).as("__n"))
    val ma3Score = ma3Full.join(counts, keyCols).filter(col("__n") >= 4)
      .select(keys ++ Seq(lit("ma3").as("model"), lit(4.0).as("k"),
        col("ma3_sse").as("sse"), col("__n").cast("double").as("n_eff"),
        aicOf(col("ma3_sse"), col("__n").cast("double"), 4.0).as("aic")): _*)
    val ar5Score = ar5Full.filter(col("yw_neff") >= 1)
      .select(keys ++ Seq(lit("ar5").as("model"), lit(6.0).as("k"),
        col("yw_sse").as("sse"), col("yw_neff").cast("double").as("n_eff"),
        aicOf(col("yw_sse"), col("yw_neff").cast("double"), 6.0).as("aic")): _*)
    ma3Score.unionByName(ar5Score)
  }

  /** MA(3) + AR(5) member FORECAST rows (keys..., model, step,
    * forecast) over the same fit tables — the union leg [[pickFrom]]
    * joins the full-board winner against. */
  def wideMemberForecastsFrom(ma3Full: DataFrame, ar5Full: DataFrame,
                              keyCols: Seq[String], h: Int): DataFrame = {
    val keys = keyCols.map(col)
    val ma3Fc = graft.seq.SequentialKernels.ma3ForecastFrom(ma3Full, keyCols, h)
      .select(keys ++ Seq(lit("ma3").as("model"), col("step"),
        col("ma3_forecast").as("forecast")): _*)
    val ar5Fc = graft.seq.YuleWalker.ar5ForecastFrom(ar5Full, keyCols, h)
      .select(keys ++ Seq(lit("ar5").as("model"), col("step"),
        col("forecast")): _*)
    ma3Fc.unionByName(ar5Fc)
  }

  /** The fourteen-member order-search scoreboard: the Champion family's
    * eight rows per series ([[Champion.scoreboard]] columns model, k,
    * sse, n_eff, aic) unioned with the (0,2,1), (2,1,1), (2,1,2) and
    * seasonal sari/sma members and re-ranked by (aic, member order). Same
    * output schema as the family scoreboard — (keys..., model, k, sse,
    * n_eff, aic, rank) — so diagnostics consumers swap in the wider
    * search unchanged. */
  def extendedScoreboard(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                         valueCol: String, h: Int = 4, m: Int = 13,
                         alpha: Double = 0.3, beta: Double = 0.1,
                         damp: Double = 0.9): DataFrame =
    extendedScoreboardFrom(
      Champion.scoreboard(df, keyCols, ordCols, valueCol, h, m, alpha, beta, damp),
      df, keyCols, ordCols, valueCol, m)

  /** The six extended members' score AND forecast tables from ONE
    * fit execution each — the [[Champion]] memberTables discipline:
    * the (0,2,1), (2,1,1) and (2,1,2) grid-fit bases are
    * localCheckpointed (series-grain tiny) so the score row and the
    * forecast recursion read the same materialized fit instead of
    * re-running the fold; the sari member's fit and forecast are both
    * cheap closed-form aggregates (no fold), so they stay
    * unmaterialized.
    *
    * Scores: (keys..., model, k, sse, n_eff, aic) gated per member
    * ((0,2,1) ≥ 2 Δ² residuals, (2,1,1)/(2,1,2) ≥ 2 conditioned diff
    * residuals, sari ≥ 3 seasonal-diff regression rows — each
    * strictly tighter than its forecaster's support, so every scored
    * member forecasts). Forecasts: (keys..., model, step, forecast). */
  def extMemberTables(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                      valueCol: String, h: Int = 4, m: Int = 13): (DataFrame, DataFrame) = {
    val (d2base, a21base, a22base, lastLevel) = extFitBases(df, keyCols, ordCols, valueCol)
    extMemberTablesFrom(d2base, a21base, a22base, lastLevel, df, keyCols, ordCols,
      valueCol, h, m)
  }

  /** The three grid-fit bases the extended members rank and forecast
    * from, fit ONCE and localCheckpointed (series-grain tiny): the
    * [[arima021Full]] table on Δ², the [[SequentialKernels
    * .fitArma21Full]] and [[SequentialKernels.fitArma22Full]] tables
    * on Δ, and the last-observed-level frame (keys..., `__yn`) the
    * integrations need. Exposed so a sweep registering q297/q298/q307
    * AND the extended scoreboard pays each fold exactly once (the
    * championShared memo discipline). */
  def extFitBases(df: DataFrame, keyCols: Seq[String], ordCols: Seq[Column],
                  valueCol: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val wd = Window.partitionBy(keys: _*).orderBy(ordCols.map(_.desc): _*)
    val d2base = arima021Full(df, keyCols, ordCols, valueCol).localCheckpoint(true)
    val dy0 = df.withColumn("__yraw", col(valueCol).cast("double"))
      .withColumn("__dy", col("__yraw") - lag(col("__yraw"), 1).over(w))
    val lastLevel = dy0.withColumn("__rdL", row_number().over(wd))
      .filter(col("__rdL") === 1)
      .select(keys :+ col("__yraw").as("__yn"): _*)
      .localCheckpoint(true)
    val diffed = dy0.filter(col("__dy").isNotNull).drop("__yraw")
    val a21base = SequentialKernels.fitArma21Full(diffed, keyCols, ordCols, "__dy")
      .localCheckpoint(true)
    val a22base = SequentialKernels.fitArma22Full(diffed, keyCols, ordCols, "__dy")
      .localCheckpoint(true)
    (d2base, a21base, a22base, lastLevel)
  }

  /** [[extMemberTables]] over ALREADY-BUILT [[extFitBases]] frames —
    * the score rows and forecast recursions read the materialized
    * fits; only the sari member (cheap closed-form aggregates, no
    * fold) computes from `df` here. `onCheckpoint` observes every
    * checkpoint this call creates (the seasonal sma/sarma fit bases)
    * so a memoizing caller can unpersist them on eviction — Spark's
    * persistentRdds pins them for the JVM's life otherwise. */
  def extMemberTablesFrom(d2base: DataFrame, a21base: DataFrame,
                          a22base: DataFrame,
                          lastLevel: DataFrame, df: DataFrame,
                          keyCols: Seq[String], ordCols: Seq[Column],
                          valueCol: String, h: Int = 4, m: Int = 13,
                          onCheckpoint: DataFrame => Unit = _ => ()): (DataFrame, DataFrame) = {
    val keys = keyCols.map(col)
    def aicOf(sse: Column, neff: Column, k: Double): Column =
      r(neff * log(greatest(sse, lit(1e-8)) / neff) + lit(2.0 * k))
    val d2Score = d2base.filter(col("d2_neff") >= 2)
      .select(keys ++ Seq(lit("arima021").as("model"), lit(2.0).as("k"),
        col("d2_sse").as("sse"), col("d2_neff").as("n_eff"),
        aicOf(col("d2_sse"), col("d2_neff"), 2.0).as("aic")): _*)
    val d2Fc = arima021ForecastFrom(d2base, keyCols, h)
      .select(keys ++ Seq(lit("arima021").as("model"), col("step"),
        col("arima_forecast").as("forecast")): _*)
    val w = Window.partitionBy(keys: _*).orderBy(ordCols: _*)
    val a21Score = a21base.filter(col("arma2_neff") >= 2)
      .select(keys ++ Seq(lit("arima211").as("model"), lit(4.0).as("k"),
        col("arma2_sse").as("sse"), col("arma2_neff").as("n_eff"),
        aicOf(col("arma2_sse"), col("arma2_neff"), 4.0).as("aic")): _*)
    val a21Fc = SequentialKernels.arima211ForecastFrom(a21base, lastLevel,
      keyCols, h)
      .select(keys ++ Seq(lit("arima211").as("model"), col("step"),
        col("arima_forecast").as("forecast")): _*)
    val a22Score = a22base.filter(col("arma22_neff") >= 2)
      .select(keys ++ Seq(lit("arima212").as("model"), lit(5.0).as("k"),
        col("arma22_sse").as("sse"), col("arma22_neff").as("n_eff"),
        aicOf(col("arma22_sse"), col("arma22_neff"), 5.0).as("aic")): _*)
    val a22Fc = SequentialKernels.arima212ForecastFrom(a22base, lastLevel,
      keyCols, h)
      .select(keys ++ Seq(lit("arima212").as("model"), col("step"),
        col("arima_forecast").as("forecast")): _*)
    // ---- sari — SARIMA(2,0,0)(0,1,0)_m: AR(2) on the lag-m SEASONAL
    // differences (the Ar.forecastSeasonalIntegrated / q254 fit),
    // scored exactly like the family's ari member (k = 3, n_eff the
    // regression-row count, ≥ 3 to be identified) — the seasonal-D leg
    // of the reference's search space (pmdarima max_D = 1)
    val sd = df.withColumn("__sd",
      col(valueCol).cast("double") - lag(col(valueCol).cast("double"), m).over(w))
      .filter(col("__sd").isNotNull)
    val sqSum = (resid: Column) =>
      r(graft.functions.Funcs.microSumSq(resid))
    val sariScore = Ar.fitted(sd, keyCols, ordCols, "__sd")
      .filter(col("ar_fitted").isNotNull)
      .withColumn("__res", col("__sd") - col("ar_fitted"))
      .groupBy(keys: _*).agg(sqSum(col("__res")).as("sse"),
        count(lit(1)).cast("double").as("n_eff"))
      .filter(col("n_eff") >= 3)
      .select(keys ++ Seq(lit("sari").as("model"), lit(3.0).as("k"),
        col("sse"), col("n_eff"),
        aicOf(col("sse"), col("n_eff"), 3.0).as("aic")): _*)
    val sariFc = Ar.forecastSeasonalIntegrated(df, keyCols, ordCols,
      valueCol, m, h)
      .select(keys ++ Seq(lit("sari").as("model"), col("step"),
        col("sari_forecast").as("forecast")): _*)
    // ---- sma — SARIMA(0,0,1)(0,1,0)_m: MA(1) on the lag-m seasonal
    // differences (the seasonal-Q leg; k = θ + μ = 2, ≥ 2 diff rows);
    // one fold, materialized once for the score row AND the forecast
    val smaBase = sarima011Full(df, keyCols, ordCols, valueCol, m)
      .localCheckpoint(true)
    onCheckpoint(smaBase)
    val smaScore = smaBase.filter(col("sma_neff") >= 2)
      .select(keys ++ Seq(lit("sma").as("model"), lit(2.0).as("k"),
        col("sma_sse").as("sse"), col("sma_neff").as("n_eff"),
        aicOf(col("sma_sse"), col("sma_neff"), 2.0).as("aic")): _*)
    val seasonBase = seasonalBase(df, keyCols, ordCols, valueCol, h, m)
    val smaFc = sarima011ForecastFrom(smaBase, seasonBase, keyCols, h)
      .select(keys ++ Seq(lit("sma").as("model"), col("step"),
        col("sma_forecast").as("forecast")): _*)
    // ---- sarma — SARIMA(1,0,1)(0,1,0)_m: the JOINT seasonal member,
    // ARMA(1,1) on the lag-m seasonal differences (P and Q legs fit
    // together, the reference's seasonal_order=(1,1,1,m) shape;
    // k = φ + θ + μ = 3; the CLS conditions on the first diff row, so
    // n_eff = nsd − 1 and identification needs nsd ≥ 3, the family
    // arma11 gate on the seasonal scale); one fold, materialized once
    val sarmaBase = sarma11Full(df, keyCols, ordCols, valueCol, m)
      .localCheckpoint(true)
    onCheckpoint(sarmaBase)
    val sarmaScore = sarmaBase.filter(col("sarma_nsd") >= 3)
      .select(keys ++ Seq(lit("sarma").as("model"), lit(3.0).as("k"),
        col("sarma_sse").as("sse"),
        (col("sarma_nsd") - 1).as("n_eff"),
        aicOf(col("sarma_sse"), col("sarma_nsd") - 1, 3.0).as("aic")): _*)
    val sarmaFc = sarma11ForecastFrom(sarmaBase, seasonBase, keyCols, h)
      .select(keys ++ Seq(lit("sarma").as("model"), col("step"),
        col("sarma_forecast").as("forecast")): _*)
    (d2Score.unionByName(a21Score).unionByName(a22Score).unionByName(sariScore)
      .unionByName(smaScore).unionByName(sarmaScore),
      d2Fc.unionByName(a21Fc).unionByName(a22Fc).unionByName(sariFc)
        .unionByName(smaFc).unionByName(sarmaFc))
  }

  /** Union + re-rank tail: the family scoreboard rows (rank ignored)
    * with the extended member scores, ranked by (aic, member order). */
  def boardFrom(familyBoard: DataFrame, extScores: DataFrame,
                keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    val base = familyBoard
      .select(keys ++ Seq(col("model"), col("k"), col("sse"), col("n_eff"),
        col("aic")): _*)
    val all = base.unionByName(
      extScores.select(keys ++ Seq(col("model"), col("k"), col("sse"),
        col("n_eff"), col("aic")): _*))
    val mrank = MemberRank.foldLeft(lit(99)) { case (acc, (name, rk)) =>
      when(col("model") === name, rk).otherwise(acc)
    }
    val wRank = Window.partitionBy(keys: _*).orderBy(col("aic"), col("__mrank"))
    all.withColumn("__mrank", mrank)
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .select(keys ++ Seq(col("model"), col("k"), col("sse"), col("n_eff"),
        col("aic"), col("rank")): _*)
  }

  /** Winner-join tail: rank-1 per series joined against a forecast
    * union (keys..., model, step, forecast). */
  def pickFrom(board: DataFrame, fcs: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    board.filter(col("rank") === 1)
      .select(keys ++ Seq(col("model"), col("aic")): _*)
      .join(fcs.select(keys ++ Seq(col("model"), col("step"),
        col("forecast")): _*), keyCols :+ "model")
      .select(keys ++ Seq(col("model").as("champion"), col("aic"),
        col("step"), col("forecast")): _*)
  }

  /** [[extendedScoreboard]] over an ALREADY-BUILT family scoreboard
    * (the [[Champion.scoreboard]] output, rank column ignored) — so a
    * caller holding a memoized family table pays only the six new
    * member fits. `m` is the seasonal period the sari member
    * differences at (must match the family board's m). */
  def extendedScoreboardFrom(familyBoard: DataFrame, df: DataFrame,
                             keyCols: Seq[String], ordCols: Seq[Column],
                             valueCol: String, m: Int = 13): DataFrame =
    boardFrom(familyBoard,
      extMemberTables(df, keyCols, ordCols, valueCol, m = m)._1, keyCols)

  /** The extended champion: argmin over the FOURTEEN-member scoreboard,
    * the winner's h-step forecast joined back — [[Champion
    * .championForecast]] widened to the searched orders. Consumes an
    * already-materialized family scoreboard and forecast union (the
    * [[Champion.pickBlendScoreFcs]] frames) so the family fits once;
    * the extended members fit once each via [[extMemberTables]].
    * Output mirrors championForecast: (keys..., champion, aic, step,
    * forecast). Every scoreboard-eligible member's forecaster emits
    * rows, so the winner join never drops a series. */
  def championForecastExt(familyBoard: DataFrame, familyFcs: DataFrame,
                          df: DataFrame, keyCols: Seq[String],
                          ordCols: Seq[Column], valueCol: String,
                          h: Int = 4, m: Int = 13): DataFrame = {
    val keys = keyCols.map(col)
    val (extScores, extFcs) = extMemberTables(df, keyCols, ordCols, valueCol, h, m)
    val fcs = familyFcs.select(keys ++ Seq(col("model"), col("step"),
      col("forecast")): _*).unionByName(extFcs)
    pickFrom(boardFrom(familyBoard, extScores, keyCols), fcs, keyCols)
  }

  /** Akaike-weight blend over the FOURTEEN-member board —
    * [[Champion.blendForecast]] widened to the searched orders: per
    * series w ∝ exp(−Δaic/2) over every identified member, blend =
    * Σ(w·f)/Σw as exact micro-int sums (the q267 arithmetic,
    * unchanged). Consumes the same already-materialized family frames
    * as [[championForecastExt]]; callers holding the extShared memo
    * pass its (board, fcs) directly to [[Champion.blendFrom]]. */
  def blendForecastExt(familyBoard: DataFrame, familyFcs: DataFrame,
                       df: DataFrame, keyCols: Seq[String],
                       ordCols: Seq[Column], valueCol: String,
                       h: Int = 4, m: Int = 13): DataFrame = {
    val keys = keyCols.map(col)
    val (extScores, extFcs) = extMemberTables(df, keyCols, ordCols, valueCol, h, m)
    val fcs = familyFcs.select(keys ++ Seq(col("model"), col("step"),
      col("forecast")): _*).unionByName(extFcs)
    blendFromBoards(boardFrom(familyBoard, extScores, keyCols), fcs, keyCols)
  }

  /** The blend tail over ALREADY-BUILT (board, forecast-union) frames
    * — e.g. a memoized extended board. Exact [[Champion]] blend
    * arithmetic. */
  def blendFromBoards(board: DataFrame, fcs: DataFrame,
                      keyCols: Seq[String]): DataFrame =
    Champion.blendFrom(board, fcs, keyCols)
}
