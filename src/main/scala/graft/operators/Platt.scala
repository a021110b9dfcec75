package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Platt scaling — the sigmoid member of the calibration family
  * (reference: src/models/model_calibration.py PlattCalibrator /
  * sklearn _SigmoidCalibration): fit p = σ(a·f + b) to (score, label)
  * by penalized maximum likelihood with Platt's target smoothing
  * (t⁺ = (N⁺+1)/(N⁺+2), t⁻ = 1/(N⁻+2) — the prior that keeps the fit
  * finite on separable data).
  *
  * The fit is a FIXED number of Newton steps (the q204 Lloyd recipe
  * for iterative algorithms): data collapses once to the distinct
  * (score, label) grain with counts — one map-side-combinable
  * aggregate, after which every Newton step is one pass over the tiny
  * grain (sums of count-weighted gradient/Hessian terms, ROUNDED, the
  * 2×2 solve in closed form, the updated (a, b) ROUNDED) — so both
  * engines iterate from bit-identical doubles and the whole recursion
  * admits an unrolled-CTE oracle (q220).
  *
  * Scale shape: grain size = distinct (score, label) pairs — pre-round
  * the score (the caller passes it through [[graft.functions.Funcs.r]])
  * so the grain is bounded by score resolution, not rows; each Newton
  * step cross-joins the 1-row state and re-aggregates the grain.
  * Degenerate inputs (single class, or a singular Hessian) leave the
  * state unchanged for that step rather than diverging.
  */
object Platt {

  /** 1-row fit report: `platt_a`, `platt_b` (p = σ(a·f + b)), class
    * counts, and the smoothed targets. `score` must be deterministic
    * cross-engine (pre-rounded); `label` boolean. */
  def fit(df: DataFrame, score: Column, label: Column,
          iters: Int = 3): DataFrame = {
    require(iters >= 1, "need at least one Newton step")
    // Eager-checkpoint the collapsed grain (the lloydCentroids recipe):
    // every Newton step and the class-count aggregate reuse it, so the
    // fact is scanned ONCE instead of iters+1 times. The grain itself
    // is bounded by score resolution (pre-rounded scores), not rows.
    val grain = df
      .select(score.cast("double").as("__f"), label.cast("boolean").as("__y"))
      .groupBy(col("__f"), col("__y"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint(true)
    val classes = grain.agg(
      sum(when(col("__y"), col("__n")).otherwise(0.0)).as("__np"),
      sum(when(!col("__y"), col("__n")).otherwise(0.0)).as("__nn"))
    // Platt's smoothed targets — exact rationals of the class counts
    val state0 = classes
      .withColumn("__tp", (col("__np") + 1.0) / (col("__np") + 2.0))
      .withColumn("__tn", lit(1.0) / (col("__nn") + 2.0))
      .withColumn("platt_a", lit(0.0))
      .withColumn("platt_b", lit(0.0))
    val fitted = (1 to iters).foldLeft(state0) { (state, _) =>
      val p = lit(1.0) / (lit(1.0)
        + exp(-(col("platt_a") * col("__f") + col("platt_b"))))
      val t = when(col("__y"), col("__tp")).otherwise(col("__tn"))
      val sums = grain.crossJoin(broadcast(state))
        .select(col("__n"), col("__f"), col("__np"), col("__nn"),
          col("__tp"), col("__tn"), col("platt_a"), col("platt_b"),
          p.as("__p"), t.as("__t"))
        .groupBy(col("__np"), col("__nn"), col("__tp"), col("__tn"),
          col("platt_a"), col("platt_b"))
        .agg(
          r(sum(col("__n") * col("__f") * (col("__p") - col("__t")))).as("__ga"),
          r(sum(col("__n") * (col("__p") - col("__t")))).as("__gb"),
          r(sum(col("__n") * col("__f") * col("__f") * col("__p") * (lit(1.0) - col("__p")))).as("__haa"),
          r(sum(col("__n") * col("__f") * col("__p") * (lit(1.0) - col("__p")))).as("__hab"),
          r(sum(col("__n") * col("__p") * (lit(1.0) - col("__p")))).as("__hbb"))
      val det = col("__haa") * col("__hbb") - col("__hab") * col("__hab")
      val ok = abs(det) >= 1e-12
      sums
        .withColumn("__a2", r(when(ok, col("platt_a")
          - (col("__hbb") * col("__ga") - col("__hab") * col("__gb")) / det)
          .otherwise(col("platt_a"))))
        .withColumn("__b2", r(when(ok, col("platt_b")
          - (col("__haa") * col("__gb") - col("__hab") * col("__ga")) / det)
          .otherwise(col("platt_b"))))
        .select(col("__np"), col("__nn"), col("__tp"), col("__tn"),
          col("__a2").as("platt_a"), col("__b2").as("platt_b"))
    }
    fitted.select(
      col("platt_a"), col("platt_b"),
      col("__np").cast("long").as("n_pos"), col("__nn").cast("long").as("n_neg"),
      r(col("__tp")).as("t_pos"), r(col("__tn")).as("t_neg"))
  }

  /** Apply a fit: calibrated probability σ(a·f + b). */
  def calibrate(score: Column, a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-(a * score + b)))

  /** Temperature scaling — the 1-parameter sibling (reference:
    * model_calibration.py TemperatureScaling): p = σ(β·z) with
    * β = 1/T, fit by the same fixed-Newton recipe on hard 0/1 targets
    * (temperature scaling does not smooth — it only rescales an
    * existing logit). g = Σn·z·(p−t), h = Σn·z²·p·(1−p), β ← β − g/h,
    * β₀ = 1 (T = 1, the identity). Same single-fact-scan grain
    * checkpoint and rounded-state determinism as [[fit]] (oracle
    * q221). */
  def fitTemperature(df: DataFrame, logit: Column, label: Column,
                     iters: Int = 3): DataFrame = {
    require(iters >= 1, "need at least one Newton step")
    val grain = df
      .select(logit.cast("double").as("__z"), label.cast("boolean").as("__y"))
      .groupBy(col("__z"), col("__y"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint(true)
    val state0 = grain.agg(
      sum(when(col("__y"), col("__n")).otherwise(0.0)).as("__np"),
      sum(when(!col("__y"), col("__n")).otherwise(0.0)).as("__nn"))
      .withColumn("temp_beta", lit(1.0))
    val fitted = (1 to iters).foldLeft(state0) { (state, _) =>
      val p = lit(1.0) / (lit(1.0) + exp(-(col("temp_beta") * col("__z"))))
      val t = when(col("__y"), lit(1.0)).otherwise(lit(0.0))
      grain.crossJoin(broadcast(state))
        .select(col("__n"), col("__z"), col("__np"), col("__nn"),
          col("temp_beta"), p.as("__p"), t.as("__t"))
        .groupBy(col("__np"), col("__nn"), col("temp_beta"))
        .agg(
          r(sum(col("__n") * col("__z") * (col("__p") - col("__t")))).as("__g"),
          r(sum(col("__n") * col("__z") * col("__z") * col("__p") * (lit(1.0) - col("__p")))).as("__h"))
        .select(col("__np"), col("__nn"),
          r(when(col("__h") >= 1e-12,
            col("temp_beta") - col("__g") / col("__h"))
            .otherwise(col("temp_beta"))).as("temp_beta"))
    }
    fitted.select(col("temp_beta"),
      r(lit(1.0) / col("temp_beta")).as("temp_t"),
      col("__np").cast("long").as("n_pos"), col("__nn").cast("long").as("n_neg"))
  }
}
