package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{nanToNull, pct, r}

/** M15 (diagnostics leg) — residual diagnostics over a scored frame:
  * lag-k residual autocorrelation + Ljung-Box statistic, the runs test
  * (median cutoff) and a Breusch-Pagan-style fitted-vs-squared-residual
  * correlation, per analysis slice (reference:
  * src/evaluation/error_analysis.py:36-67 runs test,
  * 726-760 Ljung-Box/ACF, 762-790 heteroskedasticity).
  *
  * Execution shape: ONE exchange on the slice key — the slice stats
  * (mean/median of residuals) are a dim-sized agg broadcast back, the
  * lag features ride a single window over (slice, time order), and the
  * final reduction groups on the same slice key, so Catalyst reuses the
  * window's partitioning. p-values need distribution CDFs (driver-side
  * scalar math in the reference); the engine emits the test STATISTICS,
  * which is the distributed part.
  *
  * Oracle-parity discipline: residuals and the fitted values are
  * rounded (Funcs.r) once up front and every ratio divides
  * pre-rounded sums, so both engines divide bit-identical inputs.
  */
object ResidualDiagnostics {

  /** Diagnose residuals of (actual − pred) per slice.
    *
    * Output per slice row: n, resid_mean, acf1..acf{maxLag} (ACF with
    * the standard overall-variance denominator), lb_q (Ljung-Box over
    * maxLag lags), runs / n_above / runs_z (median-cutoff runs test),
    * bp_corr / bp_t (corr(fitted, resid²) and its t-statistic).
    */
  /** @param broadcastStats broadcast the per-slice centering stats back
    *   to the fact (right for dimension-sized slices like status codes);
    *   set false for fact-like slice cardinality (per-SKU diagnostics) —
    *   the stats join then shuffles on the slice key, the SAME key the
    *   ACF window needs, so the fact still moves only once. */
  def diagnose(df: DataFrame, sliceCols: Seq[String], actual: Column, pred: Column,
               ord: Seq[Column], maxLag: Int = 3, exactMedian: Option[Boolean] = None,
               broadcastStats: Boolean = true): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val slice = sliceCols.map(col)
    val base = df
      .withColumn("__fitted", r(pred))
      .withColumn("__resid", r(actual - pred))
    // Slice-level centering stats: dim-sized agg, broadcast back.
    val stats = base.groupBy(slice: _*).agg(
      r(avg(col("__resid"))).as("__rmean"),
      pct(col("__resid"), 0.5, exactMedian).as("__rmedian"))
    val w = Window.partitionBy(slice: _*).orderBy(ord: _*)
    var lagged = base.join(if (broadcastStats) broadcast(stats) else stats, sliceCols)
      .withColumn("__c", col("__resid") - col("__rmean"))
      .withColumn("__bin", (col("__resid") > col("__rmedian")).cast("int"))
      .withColumn("__binprev", lag(col("__bin"), 1).over(w))
    (1 to maxLag).foreach { k =>
      lagged = lagged.withColumn(s"__c$k", lag(col("__c"), k).over(w))
    }
    val aggCols = Seq(
      count(lit(1)).as("n"),
      first(col("__rmean")).as("resid_mean"),
      sum(col("__c") * col("__c")).as("__ss")) ++
      (1 to maxLag).map(k =>
        sum(when(col(s"__c$k").isNotNull, col("__c") * col(s"__c$k"))
          .otherwise(lit(0.0))).as(s"__s$k")) ++ Seq(
      sum(when(col("__binprev").isNotNull && col("__bin") =!= col("__binprev"), 1L)
        .otherwise(0L)).as("__changes"),
      sum(col("__bin").cast("long")).as("n_above"),
      nanToNull(corr(col("__fitted"), col("__resid") * col("__resid"))).as("__bp"))
    var out = lagged.groupBy(slice: _*).agg(aggCols.head, aggCols.tail: _*)
    // ACF_k = centered lag-k cross sum / centered total sum of squares;
    // both sums rounded BEFORE dividing (cross-engine sum-order ulps).
    // Degenerate slices (constant residuals, e.g. single-row series at
    // high slice cardinality) have ss = 0 → acf is null, not 0/0 NaN.
    (1 to maxLag).foreach { k =>
      out = out.withColumn(s"acf$k",
        r(when(r(col("__ss")) =!= 0.0, r(col(s"__s$k")) / r(col("__ss")))))
    }
    // Ljung-Box Q = n(n+2) Σ acf_k²/(n−k), from the already-rounded acf;
    // null when n ≤ maxLag (no degrees of freedom — avoids a 0/0 whose
    // NaN-vs-NULL convention differs across engines).
    val lbSum = (1 to maxLag).map(k => pow(col(s"acf$k"), 2) / (col("n") - lit(k)))
      .reduce(_ + _)
    out = out
      .withColumn("lb_q",
        r(when(col("n") > lit(maxLag), col("n") * (col("n") + lit(2)) * lbSum)))
      // Runs test (reference error_analysis.py:38-67): binary = resid >
      // median; runs = 1 + sign changes; expected/variance in DOUBLE
      // arithmetic (2·n1·n2 overflows BIGINT beyond ~100k rows/slice).
      .withColumn("runs", col("__changes") + lit(1L))
      .withColumn("__n1d", col("n_above").cast("double"))
      .withColumn("__n2d", (col("n") - col("n_above")).cast("double"))
      .withColumn("__nd", col("n").cast("double"))
      .withColumn("__expected", lit(2.0) * col("__n1d") * col("__n2d") / col("__nd") + lit(1.0))
      .withColumn("__variance",
        (lit(2.0) * col("__n1d") * col("__n2d") *
          (lit(2.0) * col("__n1d") * col("__n2d") - col("__nd"))) /
          (col("__nd") * col("__nd") * (col("__nd") - lit(1.0))))
      .withColumn("runs_z",
        r(when(col("__variance") > 0,
          (col("runs") - col("__expected")) / sqrt(col("__variance")))
          .otherwise(lit(0.0))))
      .withColumn("bp_corr", r(col("__bp")))
      // t-statistic from the ROUNDED corr so it is a deterministic
      // transform of an already-parity-stable value.
      .withColumn("bp_t",
        r(when(abs(col("bp_corr")) < 1,
          col("bp_corr") * sqrt((col("n") - lit(2)) / (lit(1.0) - pow(col("bp_corr"), 2))))))
    out.select(slice ++ Seq(col("n"), col("resid_mean")) ++
      (1 to maxLag).map(k => col(s"acf$k")) ++
      Seq(col("lb_q"), col("runs"), col("n_above"), col("runs_z"),
        col("bp_corr"), col("bp_t")): _*)
  }

  private val Dec = "decimal(38,0)"

  /** Jarque–Bera normality statistic per slice (reference:
    * src/evaluation/error_analysis.py:29-30,687-700 — the named
    * normality test of the residual suite): JB = n/6·(S² + K²/4) with
    * S = m₃/m₂^{3/2} the population skewness and K = m₄/m₂² − 3 the
    * excess kurtosis (Fisher g₁/g₂, the scipy/statsmodels moment
    * convention — no small-sample bias correction).
    *
    * ONE exchange on the slice key (mean agg joined back, moment agg
    * on the same key). Central moments accumulate as exact micro-int
    * sums: residuals round to the 4dp grid, center against the
    * [[graft.functions.Funcs.microMean]] slice mean, quantize to
    * micro-ints, and Σm², Σm³, Σm⁴ are exact decimal(38,0) integers
    * (headroom: |m| ≤ 5e5-ish micro-units → m⁴ ≲ 1e23/row, ~15 digits
    * to spare) — so both engines divide bit-identical inputs. S and K
    * round to the 4dp grid and JB is the deterministic transform of
    * the ROUNDED pair (the lb_q device). Degenerate slices (m₂ = 0)
    * report S = K = JB = 0. */
  def jarqueBera(df: DataFrame, sliceCols: Seq[String], actual: Column,
                 pred: Column): DataFrame = {
    val slice = sliceCols.map(col)
    val base = df.withColumn("__resid", r(actual - pred))
    val stats = base.groupBy(slice: _*)
      .agg(graft.functions.Funcs.microMean(col("__resid")).as("__rmean"))
    val m = base.join(broadcast(stats), sliceCols)
      .withColumn("__m",
        graft.expr.RoundHalfUpExpr.column((col("__resid") - col("__rmean")) * lit(1e4)).cast(Dec))
    val sums = m.groupBy(slice: _*).agg(
      count(lit(1)).as("n_obs"),
      sum(col("__m") * col("__m")).as("__s2"),
      sum(col("__m") * col("__m") * col("__m")).as("__s3"),
      sum(col("__m") * col("__m") * col("__m") * col("__m")).as("__s4"))
    val nd = col("n_obs").cast("double")
    val m2 = col("__s2").cast("double") / lit(1e8) / nd
    val m3 = col("__s3").cast("double") / lit(1e12) / nd
    val m4 = col("__s4").cast("double") / lit(1e16) / nd
    val out = sums
      .withColumn("jb_skew",
        r(when(m2 > 0, m3 / (m2 * sqrt(m2))).otherwise(lit(0.0))))
      .withColumn("jb_kurt",
        r(when(m2 > 0, m4 / (m2 * m2) - lit(3.0)).otherwise(lit(0.0))))
      .withColumn("jb_stat",
        r(nd / lit(6.0) * (col("jb_skew") * col("jb_skew") +
          col("jb_kurt") * col("jb_kurt") / lit(4.0))))
    out.select(slice ++ Seq(col("n_obs"), col("jb_skew"), col("jb_kurt"),
      col("jb_stat")): _*)
  }

  /** Engle's ARCH-LM statistic (+ McLeod–Li portmanteau) per slice over
    * SQUARED residuals (reference error_analysis.py:29-30,687-700 names
    * the heteroskedasticity/ARCH leg): with one lag the LM statistic is
    * n·r₁² where r₁ is the lag-1 sample autocorrelation of ε²_t under
    * the biased (Box–Jenkins, overall-c₀ denominator) convention the
    * engine's ACF family already ships — the large-sample equivalent of
    * Engle's T·R² auxiliary regression with q = 1. The companion
    * `ml_q` is McLeod–Li (1983): Ljung–Box at h = maxLag pointed at
    * ε², the standard portmanteau form of the same ARCH probe.
    *
    * Execution shape mirrors [[diagnose]]: slice-mean agg joined back,
    * one window over (slice, ord) for the lags, one reduction on the
    * slice key. ε² values round to the 4dp grid, center against the
    * micro-int slice mean, and all cross-sums are exact decimal(38,0)
    * micro-int products (ε² reaches ~1e3-1e4 on count-like residuals,
    * so Σm² can pass 2⁶³ — decimal state, never a long). r_k round to
    * the 4dp grid; the statistics are deterministic transforms of the
    * rounded r_k. Slices with zero variance report 0; ml_q is NULL
    * when n ≤ maxLag (no degrees of freedom), matching [[diagnose]]. */
  def archLm(df: DataFrame, sliceCols: Seq[String], actual: Column,
             pred: Column, ord: Seq[Column], maxLag: Int = 5): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val slice = sliceCols.map(col)
    val e = r(actual - pred)
    val base = df.withColumn("__sq", r(e * e))
    val stats = base.groupBy(slice: _*)
      .agg(graft.functions.Funcs.microMean(col("__sq")).as("__smean"))
    val w = Window.partitionBy(slice: _*).orderBy(ord: _*)
    var lagged = base.join(broadcast(stats), sliceCols)
      .withColumn("__m",
        graft.expr.RoundHalfUpExpr.column((col("__sq") - col("__smean")) * lit(1e4)).cast("long"))
    (1 to maxLag).foreach { k =>
      lagged = lagged.withColumn(s"__m$k", lag(col("__m"), k).over(w))
    }
    val aggCols = Seq(
      count(lit(1)).as("n_obs"),
      sum(col("__m").cast(Dec) * col("__m").cast(Dec)).as("__c0")) ++
      (1 to maxLag).map(k =>
        sum(when(col(s"__m$k").isNotNull,
          col("__m").cast(Dec) * col(s"__m$k").cast(Dec))
          .otherwise(lit(0L).cast(Dec))).as(s"__c$k"))
    var out = lagged.groupBy(slice: _*).agg(aggCols.head, aggCols.tail: _*)
    val c0d = col("__c0").cast("double") / lit(1e8)
    (1 to maxLag).foreach { k =>
      out = out.withColumn(s"sr_acf$k",
        r(when(c0d > 0, (col(s"__c$k").cast("double") / lit(1e8)) / c0d)
          .otherwise(lit(0.0))))
    }
    val nd = col("n_obs").cast("double")
    val mlSum = (1 to maxLag).map(k =>
      col(s"sr_acf$k") * col(s"sr_acf$k") / (nd - lit(k.toDouble)))
      .reduce(_ + _)
    out
      .withColumn("arch_lm1", r(nd * col("sr_acf1") * col("sr_acf1")))
      .withColumn("ml_q",
        r(when(col("n_obs") > lit(maxLag), nd * (nd + lit(2.0)) * mlSum)))
      .select(slice ++ Seq(col("n_obs"), col("sr_acf1"), col("arch_lm1"),
        col("ml_q")): _*)
  }
}
