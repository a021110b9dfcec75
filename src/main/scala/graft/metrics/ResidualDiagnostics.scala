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
}
