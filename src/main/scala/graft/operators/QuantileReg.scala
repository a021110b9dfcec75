package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Linear quantile regression by fixed-iteration IRLS — the
  * engine-side equivalent of the reference's `QuantileRegressor`
  * (model_calibration.py:296-375: one sklearn pinball fit per
  * quantile, with a weighted-least-squares fallback at :341-346 when
  * the exact solver is unavailable; this operator IS that fallback's
  * iterated form, which converges to the same pinball minimizer).
  *
  * Model: per (group, τ), y ≈ a + b·x minimizing the smoothed pinball
  * loss. Each IRLS round recomputes asymmetric weights from the
  * current residuals,
  *
  *   w_i = τ / max(|r_i|, ε)        if r_i > 0
  *       = (1−τ) / max(|r_i|, ε)    otherwise
  *
  * and solves the 2×2 weighted normal equations in closed form. The
  * iteration count is a LITERAL (default 8), not a convergence test,
  * so the computation is a fixed dataflow both engines replay exactly:
  * weights round to the 1e-4 grid, every weighted sum accumulates as
  * micro-int products in decimal(38,0) (the Ar/Theta exact-sum
  * convention — partial-aggregation-order independent), and each
  * round's (a, b) round before feeding the next round.
  *
  * Execution shape (the Platt.scala distinct-grain device): the fact
  * first collapses to the DISTINCT (group, x, y) grain with a
  * multiplicity count — one fact pass — and THAT tiny frame is
  * checkpointed for the iters+1 consumers. IRLS weights depend only on
  * (x, y, a, b, τ), so every weighted sum is exactly the distinct-cell
  * sum scaled by the cell count (integer arithmetic — bit-identical to
  * the row-grain sum in any order), and each round is a hash-aggregate
  * over cells, not rows: for bounded-cardinality measures (prices,
  * quantities, discounts — the retail reality) round cost is
  * independent of fact size; in the worst (all-distinct) case it
  * degrades to the row grain, i.e. never worse than one extra
  * exchange. τ rides the aggregation key (one `explode` of the literal
  * τ list), so any number of quantiles costs zero extra passes.
  *
  * Degenerate groups (no x variance → |den| < 1e-8) fall back to
  * b = 0 with a the weighted mean — the reference's Ridge fallback
  * shape. Output: group..., tau, qr_a, qr_b, pinball (the final mean
  * pinball loss, 4dp-rounded per row then exactly summed).
  */
object QuantileReg {

  def fit(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
          taus: Seq[Double] = Seq(0.25, 0.5, 0.75), iters: Int = 8,
          eps: Double = 0.01): DataFrame = {
    require(taus.nonEmpty && taus.forall(t => t > 0 && t < 1),
      "quantiles must lie in (0, 1)")
    require(iters >= 1, "need at least one reweighted round")
    val groups = groupCols.map(col)
    val dec = "decimal(38,0)"
    // distinct-(group, x, y) grain with multiplicities: every weighted
    // sum below is the row-grain sum exactly (integer products scale by
    // the cell count), but round cost is cell-bounded, not fact-bounded
    val base = df.select(groups ++ Seq(x.cast("double").as("__x"),
        y.cast("double").as("__y")): _*)
      .groupBy(groups ++ Seq(col("__x"), col("__y")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true)
      .withColumn("tau", explode(array(taus.map(lit): _*)))
    val keys = groupCols :+ "tau"

    def mxL = graft.expr.RoundHalfUpExpr.column(col("__x") * lit(1e4)).cast("long")
    def myL = graft.expr.RoundHalfUpExpr.column(col("__y") * lit(1e4)).cast("long")
    def cntL = col("__cnt")

    def solve(weighted: DataFrame, w: Column): DataFrame = {
      val mw = graft.expr.RoundHalfUpExpr.column(w * lit(1e4)).cast(dec) * cntL
      val sums = weighted.groupBy(keys.map(col): _*).agg(
        (sum(mw).cast("double") / lit(1e4)).as("__sw"),
        (sum(mw * mxL).cast("double") / lit(1e8)).as("__swx"),
        (sum(mw * mxL * mxL).cast("double") / lit(1e12)).as("__swxx"),
        (sum(mw * myL).cast("double") / lit(1e8)).as("__swy"),
        (sum(mw * mxL * myL).cast("double") / lit(1e12)).as("__swxy"))
      val den = col("__sw") * col("__swxx") - col("__swx") * col("__swx")
      sums
        .withColumn("__b", r(when(abs(den) >= 1e-8,
          (col("__sw") * col("__swxy") - col("__swx") * col("__swy")) / den)
          .otherwise(lit(0.0))))
        .withColumn("__a", r((col("__swy") - col("__b") * col("__swx")) / col("__sw")))
        .select(keys.map(col) ++ Seq(col("__a"), col("__b")): _*)
    }

    def weight(tau: Column, resid: Column): Column = {
      val scale = greatest(abs(resid), lit(eps))
      r(when(resid > 0, tau / scale).otherwise((lit(1.0) - tau) / scale))
    }

    // round 0: unit weights = the plain OLS start. Each round's state
    // (one (a, b) row per (group, tau) — broadcast-sized by the same
    // assumption broadcast(state) already makes) is eagerly
    // checkpointed so round k is planned against a LEAF, not the
    // k-deep join/aggregate tree: without this, every action re-plans
    // and re-codegens the full nested tree and the per-round marginal
    // is dominated by the driver, not the 2x2 solve (QrProbe r17).
    val init = solve(base, lit(1.0)).localCheckpoint(true)
    val fitted = (1 to iters).foldLeft(init) { (state, _) =>
      val joined = base.join(broadcast(state), keys)
      val resid = col("__y") - col("__a") - col("__b") * col("__x")
      solve(joined, weight(col("tau"), resid)).localCheckpoint(true)
    }
    val scored = base.join(broadcast(fitted), keys)
      .withColumn("__r", col("__y") - col("__a") - col("__b") * col("__x"))
      .withColumn("__rho", r(greatest(col("tau") * col("__r"),
        (col("tau") - 1) * col("__r"))))
    scored.groupBy(keys.map(col): _*)
      .agg(max(col("__a")).as("qr_a"), max(col("__b")).as("qr_b"),
        r((sum(graft.expr.RoundHalfUpExpr.column(col("__rho") * lit(1e4)).cast(dec) * cntL).cast("double") /
          lit(1e4) / sum(cntL).cast("double"))).as("pinball"))
  }
}
