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
    val edgeCols = qs.zipWithIndex.map { case (q, i) =>
      Funcs.pct(when(isReference, value), q, exact).as(s"__e$i") }
    val edges = df.agg(edgeCols.head, edgeCols.tail: _*)
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
}
