package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Per-group closed-form two-feature OLS: fit y = b0 + b1·x1 + b2·x2
  * for every group in one aggregation pass, solving the 3×3 normal
  * equations by Cramer's rule over the nine sufficient statistics
  * (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y) — the distributed
  * generalization of the reference's per-series trend slope
  * (aggregation_features_engine.py set-based slope) to two regressors.
  *
  * Scale shape: ONE key-partitioned hash aggregate with map-side
  * partial combine carries everything; the determinant arithmetic is a
  * per-group scalar epilogue. No windows, no iteration, no driver math.
  * With integer-valued inputs the sums are exact in doubles, so the
  * coefficients are bit-identical across engines and partitionings.
  */
object Ols {

  /** @return per group: n, b0, b1, b2 (NULL when the design matrix is
    *         singular, e.g. a constant regressor). */
  def fit2(df: DataFrame, groupCols: Seq[String], x1: Column, x2: Column,
           y: Column): DataFrame = {
    val prepped = df.select(groupCols.map(col) ++ Seq(
      x1.cast("double").as("__x1"), x2.cast("double").as("__x2"),
      y.cast("double").as("__y")): _*)
    val agg = prepped.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("__x1")).as("s1"), sum(col("__x2")).as("s2"),
      sum(col("__y")).as("sy"),
      sum(col("__x1") * col("__x1")).as("s11"),
      sum(col("__x1") * col("__x2")).as("s12"),
      sum(col("__x2") * col("__x2")).as("s22"),
      sum(col("__x1") * col("__y")).as("s1y"),
      sum(col("__x2") * col("__y")).as("s2y"))
    // Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] b = [sy,s1y,s2y]
    val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 = col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val d = when(det === 0.0, lit(null).cast("double")).otherwise(det)
    agg.select(groupCols.map(col) ++ Seq(col("n").cast("long").as("n"),
      Funcs.r(det0 / d).as("b0"), Funcs.r(det1 / d).as("b1"),
      Funcs.r(det2 / d).as("b2")): _*)
  }

  /** Theil–Sen robust trend (Theil 1950; Sen 1968): per-series slope =
    * exact interpolated median of all pairwise slopes
    * (y_j − y_i)/(x_j − x_i) over x_i < x_j, intercept = median of
    * (y − slope·x). ~29% breakdown point — the robust complement of
    * the least-squares line, which one promo spike drags arbitrarily
    * (retail series are exactly that shape).
    *
    * Scale shape: exact Theil–Sen is inherently O(n²) pairs PER
    * SERIES. The self-join is equi on the series key with the
    * x-inequality refined inside the matched key, so total cost is
    * Σₖ n_k² — bounded by the series LENGTH the time grain implies
    * (weekly retail: a few hundred rows → tens of thousands of pairs
    * per series), while the series COUNT remains the distributed
    * axis. For very long series, coarsen the grain or sample pairs;
    * the estimator degrades gracefully.
    *
    * Determinism: every pairwise slope and intercept candidate rounds
    * to the 4dp grid before the exact interpolated median
    * (`percentile` ↔ `quantile_cont`), and the medians round again on
    * output. Pairs with equal x are excluded (vertical slope); series
    * with fewer than 2 distinct x values are absent. */
  def theilSen(df: DataFrame, keyCols: Seq[String], x: Column,
               y: Column): DataFrame = {
    val keys = keyCols.map(col)
    val a = df.select(keys ++ Seq(
      x.cast("double").as("__x"), y.cast("double").as("__y")): _*)
    val b = a.withColumnRenamed("__x", "__x2").withColumnRenamed("__y", "__y2")
    val pairs = a.join(b, keyCols).filter(col("__x") < col("__x2"))
      .withColumn("__s",
        Funcs.r((col("__y2") - col("__y")) / (col("__x2") - col("__x"))))
    val slope = pairs.groupBy(keys: _*)
      .agg(Funcs.r(percentile(col("__s"), lit(0.5))).as("ts_slope"),
        count(lit(1)).as("n_pairs"))
    // one consumption of the slope subtree: join the points back, then
    // fold slope/pairs through the intercept aggregate with first()
    // (constant per key) — a separate slope ⨝ intercept join would
    // recompute the whole pairwise subtree a second time
    a.join(slope, keyCols)
      .withColumn("__ic", Funcs.r(col("__y") - col("ts_slope") * col("__x")))
      .groupBy(keys: _*)
      .agg(first(col("ts_slope")).as("ts_slope"),
        first(col("n_pairs")).as("n_pairs"),
        Funcs.r(percentile(col("__ic"), lit(0.5))).as("ts_intercept"))
  }

  /** Sampled Theil–Sen for LONG series (r14 verdict ask #6 — the
    * [[theilSen]] scaladoc's "sample pairs" option made real): instead
    * of the exact O(n²)-pairs-per-series self-join, draw
    * `pairsPerSeries` deterministic index pairs per series and join
    * each endpoint by (series, rank) — cost O(n + s) per series, so
    * series LENGTH stops being the quadratic axis. Slopes are the
    * median of the sampled pairwise slopes (sampling WITH replacement
    * — a repeated draw weights its pair twice; the estimator keeps
    * Theil–Sen's median robustness with Monte-Carlo error ~O(1/√s) in
    * the slope's rank position, degrading gracefully exactly as the
    * exact operator's doc promises). Intercept is the full-data median
    * of y − slope·x, unchanged from [[theilSen]].
    *
    * Draws are PORTABLE (PortableHash.lehmer of seed + 2t / seed +
    * 2t + 1 → i = h₁ mod n, j skips i — pure integer arithmetic any
    * engine replays bit-identically), so the whole operator admits a
    * plain-SQL oracle. Contract: x distinct within a series (ranks
    * order by (x, y) and pairs with equal x are excluded, as in
    * [[theilSen]]); series with < 2 points are absent. */
  def theilSenSampled(df: DataFrame, keyCols: Seq[String], x: Column,
                      y: Column, pairsPerSeries: Int,
                      seed: Long = 42L): DataFrame = {
    require(pairsPerSeries >= 1,
      s"pairsPerSeries must be >= 1, got $pairsPerSeries")
    import graft.functions.PortableHash.lehmer
    val keys = keyCols.map(col)
    val a = df.select(keys ++ Seq(
      x.cast("double").as("__x"), y.cast("double").as("__y")): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("__x"), col("__y"))
    val idxd = a.withColumn("__i", row_number().over(w))
    val slots = idxd.groupBy(keys: _*).agg(max(col("__i")).as("__n"))
      .filter(col("__n") >= 2)
      .withColumn("__t", explode(sequence(lit(1), lit(pairsPerSeries))))
      .withColumn("__h1", lehmer(lit(seed) + col("__t") * 2))
      .withColumn("__h2", lehmer(lit(seed) + col("__t") * 2 + 1))
      .withColumn("__pi", pmod(col("__h1"), col("__n")) + 1)
      .withColumn("__j0", pmod(col("__h2"), col("__n") - 1) + 1)
      .withColumn("__pj",
        when(col("__j0") >= col("__pi"), col("__j0") + 1).otherwise(col("__j0")))
      .select(keys ++ Seq(col("__pi"), col("__pj")): _*)
    val p1 = idxd.select(keys ++ Seq(col("__i").as("__pi"),
      col("__x").as("__x1"), col("__y").as("__y1")): _*)
    val p2 = idxd.select(keys ++ Seq(col("__i").as("__pj"),
      col("__x").as("__x2"), col("__y").as("__y2")): _*)
    val pairs = slots.join(p1, keyCols :+ "__pi").join(p2, keyCols :+ "__pj")
      .filter(col("__x1") =!= col("__x2"))
      .withColumn("__s",
        Funcs.r((col("__y2") - col("__y1")) / (col("__x2") - col("__x1"))))
    val slope = pairs.groupBy(keys: _*)
      .agg(Funcs.r(percentile(col("__s"), lit(0.5))).as("ts_slope"),
        count(lit(1)).as("n_pairs"))
    // intercept folds through first() — one consumption of the slope
    // subtree, the q318 device
    a.join(slope, keyCols)
      .withColumn("__ic", Funcs.r(col("__y") - col("ts_slope") * col("__x")))
      .groupBy(keys: _*)
      .agg(first(col("ts_slope")).as("ts_slope"),
        first(col("n_pairs")).as("n_pairs"),
        Funcs.r(percentile(col("__ic"), lit(0.5))).as("ts_intercept"))
  }

  /** Mann–Kendall trend test (Mann 1945; Kendall 1975) — the
    * nonparametric significance companion of [[theilSen]], over the
    * same x-ordered pairwise structure: S = Σ_{i<j} sign(y_j − y_i)
    * over strictly x-ordered pairs (tied-x pairs score 0, exactly the
    * τ_a convention), the FULL Kendall (1975 §4) tie-corrected
    * variance with tied groups in BOTH coordinates —
    *   Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5) − Σ u(u−1)(2u+5)]/18
    *          + [Σ t(t−1)(t−2) · Σ u(u−1)(u−2)] / (9n(n−1)(n−2))
    *          + [Σ t(t−1) · Σ u(u−1)] / (2n(n−1))
    * (t over tied-x groups, u over tied-y groups; every term vanishes
    * when that coordinate is tie-free, so unique-x input reduces to
    * the familiar tied-y-only form) — continuity-corrected
    * z = (S∓1)/√Var(S), and Kendall's τ_a = S / (n(n−1)/2) (the τ_a
    * denominator counts ALL pairs by definition; tied pairs score 0
    * and shrink |τ| — use duplicate-free x for the classical trend
    * reading). Monotone-trend detection with NO distributional or
    * linearity assumption — spikes move S by at most their pair count
    * of sign flips.
    *
    * Same O(grain²)-pairs-per-series cost model and equal-x exclusion
    * as [[theilSen]]; sign sums are small exact integers, √ is IEEE
    * correctly rounded, z and τ round to the 4dp grid. All-tied-y
    * series have Var(S) = 0 and report z = 0; series with no
    * x-ordered pair at all are absent (the [[theilSen]] contract). */
  def mannKendall(df: DataFrame, keyCols: Seq[String], x: Column,
                  y: Column): DataFrame = {
    val keys = keyCols.map(col)
    val a = df.select(keys ++ Seq(
      x.cast("double").as("__x"), y.cast("double").as("__y")): _*)
    val b = a.withColumnRenamed("__x", "__x2").withColumnRenamed("__y", "__y2")
    val sAgg = a.join(b, keyCols).filter(col("__x") < col("__x2"))
      .groupBy(keys: _*)
      .agg(sum(signum(col("__y2") - col("__y")).cast("long")).as("mk_s"))
    // one tie table per coordinate: Σ t(t−1)(2t+5), Σ t(t−1)(t−2),
    // Σ t(t−1) over the tied groups — all three Kendall correction
    // sums from a single two-level aggregate, zero for a tie-free
    // coordinate
    def tieSums(c: String, p: String) = a.groupBy((keys :+ col(c)): _*)
      .agg(count(lit(1)).cast("double").as("__t"))
      .groupBy(keys: _*)
      .agg(sum(col("__t") * (col("__t") - 1) * (lit(2.0) * col("__t") + 5))
        .as(s"__${p}1"),
        sum(col("__t") * (col("__t") - 1) * (col("__t") - 2)).as(s"__${p}2"),
        sum(col("__t") * (col("__t") - 1)).as(s"__${p}3"))
    val tiesY = tieSums("__y", "ty")
    val tiesX = tieSums("__x", "tx")
    val nAgg = a.groupBy(keys: _*).agg(count(lit(1)).cast("double").as("n_obs"))
    val n = col("n_obs")
    val varS = (n * (n - 1) * (lit(2.0) * n + 5) - col("__ty1") - col("__tx1")) / lit(18.0) +
      when(n > 2, col("__tx2") * col("__ty2") / (lit(9.0) * n * (n - 1) * (n - 2)))
        .otherwise(lit(0.0)) +
      when(n > 1, col("__tx3") * col("__ty3") / (lit(2.0) * n * (n - 1)))
        .otherwise(lit(0.0))
    val s = col("mk_s").cast("double")
    val z = when(col("mk_s") > 0, (s - 1) / sqrt(col("__var")))
      .when(col("mk_s") < 0, (s + 1) / sqrt(col("__var")))
      .otherwise(lit(0.0))
    nAgg.join(sAgg, keyCols).join(tiesY, keyCols).join(tiesX, keyCols)
      .withColumn("__var", varS)
      .select(keys ++ Seq(col("n_obs"), col("mk_s"),
        Funcs.r(col("__var")).as("var_s"),
        Funcs.r(when(col("__var") > 0, z).otherwise(lit(0.0))).as("mk_z"),
        Funcs.r(s / (n * (n - 1) / 2)).as("mk_tau")): _*)
  }
}
