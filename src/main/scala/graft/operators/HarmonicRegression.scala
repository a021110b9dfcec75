package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Per-series seasonal fit in closed form: ordinary least squares of
  *   y ≈ b0 + b1·sin(2πt/period) + b2·cos(2πt/period)
  * solved analytically from the 3×3 normal equations — the distributed
  * "Prophet-lite" seasonal component (reference scope:
  * src/models/prophet_seasonal.py's yearly-seasonality term; the
  * reference fits it per series in a Python loop, one process per
  * series).
  *
  * Scale shape (100 TB): ONE partial-aggregated groupBy computes the
  * nine moment sums (n, Σs, Σc, Σss, Σcc, Σsc, Σy, Σsy, Σcy) — map-side
  * combine reduces each partition to one row per series before the
  * shuffle — then Cramer's rule solves each series' 3×3 system inside
  * whole-stage codegen. No iteration, no per-series driver loop, no
  * MLlib fit: a million series cost one aggregation pass.
  *
  * Cross-engine determinism: each moment is rounded to 6 decimals
  * ([[Funcs.r]]) BEFORE solving (the repo's ratio-of-sums convention —
  * both engines then divide bit-identical inputs), so fitted
  * coefficients hash-match the oracle after output rounding.
  */
object HarmonicRegression {

  /** Fit one harmonic per series. `t` is the (continuous) time index in
    * the same unit as `period` (e.g. weeks since an epoch with
    * period = 52 for a yearly cycle on weekly data).
    *
    * Output: keys, n_obs, b0 (level), b1 (sin), b2 (cos),
    * amplitude = √(b1²+b2²). Series whose design matrix is singular
    * (fewer than 3 distinct time points, or a degenerate season
    * sampling) yield NULL coefficients.
    */
  def fit(df: DataFrame, keys: Seq[String], t: Column, y: Column,
          period: Double): DataFrame = {
    val omega = 2.0 * math.Pi / period
    val s = sin(t * omega)
    val c = cos(t * omega)
    def m(col: Column) = Funcs.r(sum(col), 6) // moment, rounded pre-solve
    val moments = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_obs"),
      m(s).as("ss"), m(c).as("sc"),
      m(s * s).as("sss"), m(c * c).as("scc"), m(s * c).as("ssc"),
      m(y).as("sy"), m(s * y).as("ssy"), m(c * y).as("scy"))

    val n = col("n_obs").cast("double")
    val (ss, sc, sss, scc, ssc) =
      (col("ss"), col("sc"), col("sss"), col("scc"), col("ssc"))
    val (sy, ssy, scy) = (col("sy"), col("ssy"), col("scy"))
    // Cramer's rule on A = [[n,ss,sc],[ss,sss,ssc],[sc,ssc,scc]], b = [sy,ssy,scy]
    val det = n * (sss * scc - ssc * ssc) -
      ss * (ss * scc - ssc * sc) +
      sc * (ss * ssc - sss * sc)
    val det0 = sy * (sss * scc - ssc * ssc) -
      ss * (ssy * scc - ssc * scy) +
      sc * (ssy * ssc - sss * scy)
    val det1 = n * (ssy * scc - ssc * scy) -
      sy * (ss * scc - ssc * sc) +
      sc * (ss * scy - ssy * sc)
    val det2 = n * (sss * scy - ssy * ssc) -
      ss * (ss * scy - ssy * sc) +
      sy * (ss * ssc - sss * sc)
    val ok = abs(det) > lit(1e-9)
    moments
      .withColumn("b0", when(ok, det0 / det))
      .withColumn("b1", when(ok, det1 / det))
      .withColumn("b2", when(ok, det2 / det))
      .withColumn("amplitude", sqrt(col("b1") * col("b1") + col("b2") * col("b2")))
      .drop("ss", "sc", "sss", "scc", "ssc", "sy", "ssy", "scy")
  }

  /** In-sample prediction: joins fitted coefficients back to the series
    * frame (a key-partitioned shuffle join — the fitted table is
    * series-dim, which grows with the data, so it is NOT broadcast) and
    * evaluates b0 + b1·sin + b2·cos per row. */
  def predict(df: DataFrame, fitted: DataFrame, keys: Seq[String], t: Column,
              period: Double, out: String = "yhat"): DataFrame = {
    val omega = 2.0 * math.Pi / period
    df.join(fitted.select((keys.map(col) :+ col("b0") :+ col("b1") :+ col("b2")): _*),
        keys)
      .withColumn(out,
        col("b0") + col("b1") * sin(t * omega) + col("b2") * cos(t * omega))
      .drop("b0", "b1", "b2")
  }
}
