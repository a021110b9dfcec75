package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Additive time-series decomposition (STL-lite): per series,
  *   trend    = centered moving average (window 2k+1),
  *   seasonal = per-period mean of the detrended value over the series
  *              history (classical decomposition's seasonal estimate),
  *   residual = y − trend − seasonal.
  * The moving-average flavor of the reference's Prophet-style
  * trend/seasonality split (src/models/prophet_seasonal.py), computed
  * as pure window aggregates — no per-series model fit, no iteration.
  *
  * Scale shape: ONE series exchange carries the centered-MA window; the
  * seasonal mean rides a second exchange on (series, period) — both
  * keyed on the series prefix, partial-aggregated. A million series is
  * two shuffles total.
  */
object Decompose {

  /** @param period  column yielding the seasonal period index of a row
    *                (e.g. week-of-year for yearly seasonality on weekly
    *                data)
    * @param halfWin centered-MA half width k (window = 2k+1 rows,
    *                truncated at series edges) */
  def additive(df: DataFrame, keys: Seq[String], ord: Column, y: Column,
               period: Column, halfWin: Int = 2): DataFrame = {
    val series = Window.partitionBy(keys.map(col): _*).orderBy(ord)
      .rowsBetween(-halfWin, halfWin)
    val withTrend = df
      .withColumn("__period", period)
      .withColumn("trend", avg(y).over(series))
      .withColumn("__detr", y - col("trend"))
    val seasonal = Window.partitionBy((keys.map(col) :+ col("__period")): _*)
    withTrend
      .withColumn("seasonal", avg(col("__detr")).over(seasonal))
      .withColumn("residual", y - col("trend") - col("seasonal"))
      .drop("__detr")
  }

  /** Trend/seasonality strength (Hyndman's feature-based measures):
    *   F_T = max(0, 1 − Var(R)/Var(T+R)),  F_S = max(0, 1 − Var(R)/Var(S+R))
    * over a decomposed frame (the [[additive]] output) — near 1 when
    * the component explains most of the de-other-component variance,
    * near 0 for noise. One hash aggregate per series carrying six
    * portable sufficient sums; NULL when a variance denominator is
    * degenerate (constant series). */
  def strength(decomposed: DataFrame, keys: Seq[String], y: Column): DataFrame = {
    import graft.functions.Funcs
    val r = col("residual")
    val tr = y - col("seasonal")   // T + R
    val sr = col("seasonal") + r   // S + R
    def varOf(s: Column, ss: Column, n: Column): Column =
      (ss - s * s / n) / (n - 1)
    val agg = decomposed.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(r).as("__sr"), sum(r * r).as("__srr"),
      sum(tr).as("__st"), sum(tr * tr).as("__stt"),
      sum(sr).as("__ss"), sum(sr * sr).as("__sss"))
    val n = col("__n")
    val varR = varOf(col("__sr"), col("__srr"), n)
    val varTR = varOf(col("__st"), col("__stt"), n)
    val varSR = varOf(col("__ss"), col("__sss"), n)
    agg.select(keys.map(col) :+
      Funcs.r(when(n > 1 && varTR > 0, greatest(lit(0.0), lit(1.0) - varR / varTR)))
        .as("trend_strength") :+
      Funcs.r(when(n > 1 && varSR > 0, greatest(lit(0.0), lit(1.0) - varR / varSR)))
        .as("seasonal_strength"): _*)
  }

  /** Population Stability Index between a reference and a current
    * population of `value`, binned by the REFERENCE deciles (the
    * standard drift-monitoring setup: fixed bins from the baseline
    * period, shares compared per bin).
    *
    * PSI = Σ_bins (cur% − ref%) · ln(cur% / ref%), ε-smoothed.
    * Output: one row per bin with both shares and the contribution
    * (sum the column for the headline PSI; per-bin rows localize WHERE
    * the drift is).
    *
    * Scale shape: decile edges are one exact/approx percentile agg on
    * the reference slice (9 doubles, broadcast); binning is a codegen'd
    * when-ladder; shares are one groupBy over (population, bin).
    */
  def psi(df: DataFrame, isReference: Column, value: Column,
          nBins: Int = 10, exact: Option[Boolean] = None): DataFrame = {
    val qs = (1 until nBins).map(_.toDouble / nBins)
    // r17: one array-percentile — the nBins-1 edges share a single
    // value->count buffer and one sort instead of nBins-1 independent
    // TypedImperativeAggregate buffers over the same column (guide §1.2
    // per-task work; values are identical to the per-quantile calls)
    val edges = df.agg(Funcs.pctArray(when(isReference, value), qs, exact)
        .as("__edges"))
      .select(qs.indices.map(i => col("__edges").getItem(i).as(s"__e$i")): _*)
    // bin = number of edges strictly below the value (0..nBins-1)
    val bin = (0 until nBins - 1)
      .map(i => when(value > col(s"__e$i"), 1).otherwise(0))
      .reduce(_ + _)
    val eps = lit(1e-6)
    val binned = df.crossJoin(broadcast(edges))
      .withColumn("bin", bin.cast("long"))
      .groupBy(col("bin"))
      .agg(
        sum(when(isReference, 1L).otherwise(0L)).as("ref_n"),
        sum(when(!isReference, 1L).otherwise(0L)).as("cur_n"))
    val totals = binned.agg(
      sum(col("ref_n")).cast("double").as("__ref_total"),
      sum(col("cur_n")).cast("double").as("__cur_total"))
    binned.crossJoin(broadcast(totals))
      .withColumn("ref_share", col("ref_n") / col("__ref_total"))
      .withColumn("cur_share", col("cur_n") / col("__cur_total"))
      .withColumn("psi_contrib",
        (col("cur_share") - col("ref_share")) *
          log((col("cur_share") + eps) / (col("ref_share") + eps)))
      .select(col("bin"), col("ref_n"), col("cur_n"),
        col("ref_share"), col("cur_share"), col("psi_contrib"))
  }

  /** Dominant-period detection: for each series, score every candidate
    * period p by the ADJUSTED R² of the one-way phase ANOVA (variance
    * explained by the period-p seasonal means, penalized by the number
    * of occupied phase bins k: `1 − (SSE_w/(n−k)) / (SSE_t/(n−1))`) —
    * the discrete analogue of a periodogram peak, and the
    * model-selection step in front of [[additive]] / Holt-Winters,
    * whose period the reference hardcodes per dataset. Plain R² is
    * mechanically monotone in k (more bins always fit better; on short
    * series the smallest period degenerately wins everywhere); the
    * adjustment makes periods with different bin counts comparable. A
    * saturated fit (n ≤ k: every phase holds ≤1 point) scores the −1
    * sentinel.
    *
    * Fully relational: ONE ordered window indexes each series, the
    * candidate list explodes map-side (|periods| ≪ ∞), one aggregate
    * to the (series, p, phase) grain, one rollup to (series, p) —
    * within-phase SSE, total SSE and k all fall out of the same exact
    * phase sums — and a `row_number` argmax. The score is [[r]]-rounded
    * BEFORE the argmax ordering; ties break to the SHORTEST period.
    *
    * Scale: two shuffles on the series key (index window + phase agg;
    * the rollup and the pick reuse the hash partitioning), fan-out
    * bounded by |periods|. No joins, no collect. */
  def dominantPeriod(df: DataFrame, keys: Seq[String], ord: Column,
                     value: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), "periods must be >= 2")
    val keyCols = keys.map(col)
    val v = col(value)
    val idx = df
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols: _*).orderBy(ord)))
      .withColumn("__p", explode(array(periods.map(lit(_)): _*)))
      .withColumn("__phase", (col("__rn") - 1) % col("__p"))
    val phase = idx.groupBy(keyCols ++ Seq(col("__p"), col("__phase")): _*)
      .agg(count(lit(1)).as("__np"), sum(v).as("__sp"),
        sum(v * v).as("__ssp"))
    val per = phase.groupBy(keyCols :+ col("__p"): _*)
      .agg(sum(col("__np")).as("__n"), count(lit(1)).as("__k"),
        sum(col("__sp")).as("__s"), sum(col("__ssp")).as("__ss"),
        sum(col("__ssp") - col("__sp") * col("__sp") / col("__np"))
          .as("__sse_within"))
      .withColumn("__sse_total",
        col("__ss") - col("__s") * col("__s") / col("__n"))
      .withColumn("r2",
        when(col("__n") > col("__k") && col("__n") > 1,
          Funcs.r(lit(1.0) - (col("__sse_within") / (col("__n") - col("__k"))) /
            (col("__sse_total") / (col("__n") - lit(1)) + lit(Funcs.Eps))))
          .otherwise(lit(-1.0)))
    val pick = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col("r2").desc, col("__p"))
    per.withColumn("__pk", row_number().over(pick))
      .filter(col("__pk") === 1)
      .select(keyCols ++ Seq(col("__p").as("best_period"),
        col("__n").as("n_points"), col("r2")): _*)
  }
}
