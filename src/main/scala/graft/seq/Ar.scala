package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Per-series AR(2) with intercept — the autoregressive member of the
  * sequential family (the AR core of the reference's ARIMA engine,
  * src/models/arima_temporal.py; full auto-ARIMA order search is
  * ML-layer, the closed-form AR fit is engine-expressible):
  *
  *   x_t = c + φ1·x_{t−1} + φ2·x_{t−2} + ε_t
  *
  * fit by ordinary least squares over the rows where both lags exist,
  * solved in closed form from nine sufficient sums via Cramer's rule
  * on the 3×3 normal equations. Execution shape: one series window for
  * the lags, one map-side-combinable aggregate for the sums, the
  * key-grain coefficient table joined back — no iteration, no driver
  * loop, no per-group materialization.
  *
  * Determinism convention (the q213 Theta recipe, unified here in r10):
  * every value quantizes to the 1e-4 grid once (round(x·1e4) as a
  * micro-int) and every sufficient sum accumulates EXACTLY in
  * decimal(38,0) — linear sums in 1e-4 units, lag-product sums in 1e-8
  * units — then converts to double once before the Cramer solve. The
  * sums are therefore identical in any partial-aggregation order and
  * for fractional-valued series, not just integer-valued ones (the r9
  * verdict carried the integer-only bound of the earlier rounded-double
  * sums as a knife-edge risk; this closes it). Coefficients are rounded
  * before use and the h-step forecast recursion rounds each step before
  * feeding it forward, which is what lets a recursive-CTE oracle
  * reproduce the chain exactly. Off-grid (finer than 4dp) series fit
  * against their 1e-4-quantized values — the same documented
  * quantization Theta applies.
  *
  * Decimal bound: a product sum accumulates Σ round(x·1e4)² — with
  * |x| ≤ 10^10 and 10^9 rows per series that is < 10^38 with headroom;
  * beyond it Spark's decimal overflows to null (ANSI off) rather than
  * silently wrapping.
  *
  * Degenerate series (fewer than 3 regression rows, or |det| < 1e-8 —
  * e.g. perfectly collinear lags from a linear series) fall back to
  * the sample-mean forecast: c = mean, φ1 = φ2 = 0. Series too short
  * to regress at all get null coefficients.
  */
object Ar {

  private val DetEps = 1e-8

  /** Key-grain coefficient table: (keys..., ar_c, ar_phi1, ar_phi2).
    * Series with no regression rows are absent. */
  private def coefs(indexed: DataFrame, keyCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val sample = indexed.filter(col("__l2").isNotNull)
    // exact micro-int accumulation (see object scaladoc): m() quantizes
    // to decimal micro-units for the exact sum, mL() is the long twin
    // used as the second product factor (decimal × long stays decimal)
    val dec = "decimal(38,0)"
    def m(c: Column) = graft.expr.RoundHalfUpExpr.column(c * lit(1e4)).cast(dec)
    def mL(c: Column) = graft.expr.RoundHalfUpExpr.column(c * lit(1e4)).cast("long")
    def d4(c: Column) = c.cast("double") / lit(1e4) + lit(0.0)
    def d8(c: Column) = c.cast("double") / lit(1e8) + lit(0.0)
    val (y, l1, l2) = (col("__y"), col("__l1"), col("__l2"))
    val sums = sample.groupBy(key: _*).agg(
      count(lit(1)).cast("double").as("__n"),
      d4(sum(m(y))).as("__sy"),
      d4(sum(m(l1))).as("__s1"),
      d4(sum(m(l2))).as("__s2"),
      d8(sum(m(y) * mL(l1))).as("__sy1"),
      d8(sum(m(y) * mL(l2))).as("__sy2"),
      d8(sum(m(l1) * mL(l1))).as("__s11"),
      d8(sum(m(l2) * mL(l2))).as("__s22"),
      d8(sum(m(l1) * mL(l2))).as("__s12"))
    val (n, sy, s1, s2) = (col("__n"), col("__sy"), col("__s1"), col("__s2"))
    val (sy1, sy2, s11, s22, s12) =
      (col("__sy1"), col("__sy2"), col("__s11"), col("__s22"), col("__s12"))
    // Cramer on the symmetric normal matrix [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]]
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val detC = sy * (s11 * s22 - s12 * s12) - s1 * (sy1 * s22 - s12 * sy2) +
      s2 * (sy1 * s12 - s11 * sy2)
    val detP1 = n * (sy1 * s22 - s12 * sy2) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * sy2 - sy1 * s2)
    val detP2 = n * (s11 * sy2 - s12 * sy1) - s1 * (s1 * sy2 - sy1 * s2) +
      sy * (s1 * s12 - s11 * s2)
    val ok = (n >= 3) && abs(det) >= DetEps
    sums.select(key ++ Seq(
      r(when(ok, detC / det).otherwise(sy / n)).as("ar_c"),
      r(when(ok, detP1 / det).otherwise(lit(0.0))).as("ar_phi1"),
      r(when(ok, detP2 / det).otherwise(lit(0.0))).as("ar_phi2")): _*)
  }

  private def indexedLags(df: DataFrame, keyCols: Seq[String], ord: Seq[Column],
                          valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    df.withColumn("__y", col(valueCol).cast("double"))
      .withColumn("__l1", lag(col("__y"), 1).over(w))
      .withColumn("__l2", lag(col("__y"), 2).over(w))
  }

  /** Adds `ar_c`/`ar_phi1`/`ar_phi2` plus `ar_fitted` (the one-step
    * in-sample prediction c + φ1·x_{t−1} + φ2·x_{t−2}; null where a
    * lag is missing or the series was too short to fit). `ord` must be
    * unique per key; `valueCol` non-null. */
  def fitted(df: DataFrame, keyCols: Seq[String], ord: Seq[Column],
             valueCol: String): DataFrame = {
    val indexed = indexedLags(df, keyCols, ord, valueCol)
    indexed.join(coefs(indexed, keyCols), keyCols, "left")
      .withColumn("ar_fitted", when(col("__l2").isNotNull,
        r(col("ar_c") + col("ar_phi1") * col("__l1") + col("ar_phi2") * col("__l2"))))
      .drop("__y", "__l1", "__l2")
  }

  /** h-step-ahead forecast recursion, one output row per (series, step):
    *   f_1 = c + φ1·x_n + φ2·x_{n−1}
    *   f_s = c + φ1·f_{s−1} + φ2·f_{s−2}   (forecasts feed back as lags)
    * each step rounded before feeding forward. Series too short to fit
    * (no coefficient row) or shorter than 2 observations are dropped.
    * The unrolled chain is pure column arithmetic at the key grain —
    * h small (forecast horizons), so no exchange beyond the fit's. */
  def forecast(df: DataFrame, keyCols: Seq[String], ord: Seq[Column],
               valueCol: String, h: Int): DataFrame = {
    require(h >= 1, "horizon must be at least 1")
    val key = keyCols.map(col)
    val indexed = indexedLags(df, keyCols, ord, valueCol)
    val w = Window.partitionBy(key: _*).orderBy(ord.map(_.desc): _*)
    val lastVals = indexed.withColumn("__rd", row_number().over(w))
      .groupBy(key: _*)
      .agg(max(when(col("__rd") === 1, col("__y"))).as("__xn"),
        max(when(col("__rd") === 2, col("__y"))).as("__xn1"))
      .filter(col("__xn1").isNotNull)
    val base = lastVals.join(coefs(indexed, keyCols), keyCols)
    val steps = (1 to h).foldLeft(Vector.empty[Column]) { (acc, s) =>
      val (p1, p2) = s match {
        case 1 => (col("__xn"), col("__xn1"))
        case 2 => (acc(0), col("__xn"))
        case _ => (acc(s - 2), acc(s - 3))
      }
      acc :+ r(col("ar_c") + col("ar_phi1") * p1 + col("ar_phi2") * p2)
    }
    base.select(key :+ posexplode(array(steps: _*)).as(Seq("__p", "ar_forecast")): _*)
      .withColumn("step", (col("__p") + 1).cast("long"))
      .select(key ++ Seq(col("step"), col("ar_forecast")): _*)
  }

  /** h-step forecasts WITH prediction intervals — the engine-side
    * equivalent of the reference's `predict_with_intervals`
    * (src/models/arima_temporal.py:404-461): a z-band around each
    * forecast from the closed-form h-step forecast variance
    *
    *   Var(h) = σ² · Σ_{j=0}^{h−1} ψ_j²,   ψ_0 = 1,
    *   ψ_j = φ1·ψ_{j−1} + φ2·ψ_{j−2}       (AR(2) MA(∞) weights)
    *
    * with σ² the in-sample one-step residual variance (mean of squared
    * rounded-fit residuals, rounded — the house determinism
    * convention) and z a literal constant (default the 95% normal
    * quantile). ψ and the cumulative ψ² sum unroll as rounded column
    * arithmetic next to the forecast fold, so the recursive-CTE oracle
    * replays the identical chain. Output grain: (keys, step,
    * ar_forecast, ar_lo, ar_hi). */
  def forecastIntervals(df: DataFrame, keyCols: Seq[String], ord: Seq[Column],
                        valueCol: String, h: Int,
                        z: Double = 1.959964): DataFrame = {
    require(h >= 1, "horizon must be at least 1")
    val key = keyCols.map(col)
    // three consumers (coefs, residual variance, last values) would
    // each re-scan the source; checkpoint the lagged series once — the
    // house pattern for multi-consumer grains (Dsir/OOF-encode)
    val indexed = indexedLags(df, keyCols, ord, valueCol).localCheckpoint(true)
    val cf = coefs(indexed, keyCols)
    val resid = indexed.join(cf, keyCols)
      .withColumn("__fit", when(col("__l2").isNotNull,
        r(col("ar_c") + col("ar_phi1") * col("__l1") + col("ar_phi2") * col("__l2"))))
      .filter(col("__fit").isNotNull)
    // residuals are 4dp-grid (fit is rounded), so their squares live on
    // the 1e-8 grid: sum exact micro²-longs in decimal and divide back
    // once — a raw double avg would be partial-agg-order dependent (the
    // Theta knife-edge class)
    val sig = resid.groupBy(key: _*)
      .agg(r(graft.functions.Funcs.microSumSq(col("__y") - col("__fit"))
        / count(lit(1))).as("__s2"))
    val w = Window.partitionBy(key: _*).orderBy(ord.map(_.desc): _*)
    val lastVals = indexed.withColumn("__rd", row_number().over(w))
      .groupBy(key: _*)
      .agg(max(when(col("__rd") === 1, col("__y"))).as("__xn"),
        max(when(col("__rd") === 2, col("__y"))).as("__xn1"))
      .filter(col("__xn1").isNotNull)
    val base = lastVals.join(cf, keyCols).join(sig, keyCols)
    val steps = (1 to h).foldLeft(Vector.empty[Column]) { (acc, s) =>
      val (p1, p2) = s match {
        case 1 => (col("__xn"), col("__xn1"))
        case 2 => (acc(0), col("__xn"))
        case _ => (acc(s - 2), acc(s - 3))
      }
      acc :+ r(col("ar_c") + col("ar_phi1") * p1 + col("ar_phi2") * p2)
    }
    // ψ weights and the left-folded cumulative ψ² sums, both rounded
    // per step exactly as the oracle's recursive CTE carries them
    val psis = (1 until h).foldLeft(Vector[Column](lit(1.0))) { (acc, j) =>
      val prev2 = if (j >= 2) acc(j - 2) else lit(0.0)
      acc :+ r(col("ar_phi1") * acc(j - 1) + col("ar_phi2") * prev2)
    }
    val cums = (1 until h).foldLeft(Vector[Column](lit(1.0))) { (acc, s) =>
      acc :+ (acc(s - 1) + psis(s) * psis(s))
    }
    val rows = (1 to h).map { s =>
      val f = steps(s - 1)
      val half = lit(z) * sqrt(col("__s2") * cums(s - 1))
      struct(f.as("f"), r(f - half).as("lo"), r(f + half).as("hi"))
    }
    base.select(key :+ posexplode(array(rows: _*)).as(Seq("__p", "__r")): _*)
      .withColumn("step", (col("__p") + 1).cast("long"))
      .select(key ++ Seq(col("step"), col("__r.f").as("ar_forecast"),
        col("__r.lo").as("ar_lo"), col("__r.hi").as("ar_hi")): _*)
  }

  /** Seasonal ARI: the seasonal-differencing member (the reference's
    * seasonal ARIMA order (1,1,1,m), src/models/arima_temporal.py:224)
    * — AR(2) fit on the lag-m SEASONAL differences y_t − y_{t−m},
    * h diff forecasts, each integrated against its own observed
    * seasonal base:
    *
    *   ŷ_{n+s} = r( y_{n+s−m} + d̂_{n+s} )      (requires h ≤ m, so
    *                                             every base is observed)
    *
    * No cumulative chain: unlike d=1 integration each step anchors on
    * an observed value, which also stops error compounding across the
    * horizon. Series too short to difference-and-fit drop, matching
    * [[forecastIntegrated]]'s support rule. */
  def forecastSeasonalIntegrated(df: DataFrame, keyCols: Seq[String],
                                 ord: Seq[Column], valueCol: String,
                                 m: Int, h: Int): DataFrame = {
    require(m >= 1, "seasonal period must be at least 1")
    require(h >= 1 && h <= m, "horizon must lie in [1, m] so bases are observed")
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    val wd = Window.partitionBy(key: _*).orderBy(ord.map(_.desc): _*)
    val dy = df.withColumn("__yraw", col(valueCol).cast("double"))
      .withColumn("__dy", col("__yraw") - lag(col("__yraw"), m).over(w))
    val bases = dy.withColumn("__rd", row_number().over(wd))
      .filter(col("__rd") <= m && col("__rd") > m - h)
      .select(key ++ Seq((lit(m) - col("__rd") + 1).cast("long").as("step"),
        col("__yraw").as("__base")): _*)
    val diffed = dy.filter(col("__dy").isNotNull).drop("__yraw")
    forecast(diffed, keyCols, ord, "__dy", h)
      .join(bases, keyCols :+ "step")
      .withColumn("sari_forecast", r(col("__base") + col("ar_forecast")))
      .select(key ++ Seq(col("step"), col("sari_forecast")): _*)
  }

  /** ARI(2,1): the d=1 member of the family (reference fits
    * ARIMA(2,1,2), src/models/arima_temporal.py:339-345) — fit the
    * AR(2) on the FIRST DIFFERENCES, forecast h diff steps with the
    * same rounded recursion, then integrate back from the last
    * observed level:
    *
    *   ŷ_{n+s} = r( y_n + Σ_{j≤s} d̂_{n+j} )
    *
    * The cumulative sum runs in step order inside one key partition
    * (both engines left-fold the same rounded diff forecasts, so the
    * IEEE chain is identical). Series with fewer than 2 differences
    * (3 observations) are dropped, matching the AR fit's own support
    * rule on the differenced series. Pure composition: one extra lag
    * window for the differencing, everything else rides the AR fit's
    * exchanges. */
  def forecastIntegrated(df: DataFrame, keyCols: Seq[String], ord: Seq[Column],
                         valueCol: String, h: Int): DataFrame = {
    require(h >= 1, "horizon must be at least 1")
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    val wd = Window.partitionBy(key: _*).orderBy(ord.map(_.desc): _*)
    val dy = df.withColumn("__yraw", col(valueCol).cast("double"))
      .withColumn("__dy", col("__yraw") - lag(col("__yraw"), 1).over(w))
    val lastLevel = dy.withColumn("__rd", row_number().over(wd))
      .filter(col("__rd") === 1)
      .select(key :+ col("__yraw").as("__yn"): _*)
    val diffed = dy.filter(col("__dy").isNotNull)
      .drop("__yraw")
    val wcum = Window.partitionBy(key: _*).orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    forecast(diffed, keyCols, ord, "__dy", h)
      .join(lastLevel, keyCols)
      .withColumn("ari_forecast",
        r(col("__yn") + sum(col("ar_forecast")).over(wcum)))
      .select(key ++ Seq(col("step"), col("ari_forecast")): _*)
  }
}
