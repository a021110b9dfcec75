package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Distributed model-evaluation metrics over (score, binary label)
  * columns — the ranking/classification half of the reference's
  * evaluation stack (reference: src/evaluation/metrics.py computes
  * regression metrics; these are the standard classifier-side
  * companions a model-selection pipeline needs: ROC AUC, KS,
  * gains/lift, threshold sweep, calibration).
  *
  * Scale shape: every metric first collapses the fact table to the
  * (group, distinct score) grain with one key-partitioned
  * hash-aggregate — windows and joins then run on O(|distinct scores|)
  * rows, never O(rows). With a continuous score at 100 TB, bucket the
  * score first (e.g. `round(score, 3)` or `Eval.calibration`'s binning)
  * so the grain stays bounded; the tie-aware formulas below are exact
  * for whatever grain is chosen.
  */
object Eval {

  /** (groups..., score, np, nn): positives/negatives per distinct score
    * value — the grain every metric here runs on. */
  private def scoreGroups(df: DataFrame, score: Column, label: Column,
                          groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col) :+ score.as("score"): _*)
      .agg(sum(label.cast("long")).as("np"),
        sum(lit(1L) - label.cast("long")).as("nn"))

  private def part(groupCols: Seq[String]) =
    if (groupCols.isEmpty) Window.partitionBy(lit(0)) else Window.partitionBy(groupCols.map(col): _*)

  /** ROC AUC via the tie-aware Mann-Whitney U formulation:
    *   U = Σ_s np_s · (cum_nn_below(s) + nn_s/2),  AUC = U/(NP·NN)
    * — each positive scores 1 per negative ranked strictly below it and
    * ½ per tied negative. Exact under arbitrary ties; no per-row global
    * rank (the usual rank-based formulation needs a total order over all
    * rows — this one only orders distinct scores). */
  def auc(df: DataFrame, score: Column, label: Column,
          groupCols: Seq[String] = Nil): DataFrame = {
    val g = scoreGroups(df, score, label, groupCols)
    val w = part(groupCols).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum_nn", coalesce(sum(col("nn")).over(w), lit(0L)))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("cum_nn") + col("nn") / lit(2.0))).as("__u"))
      .select(groupCols.map(col) ++ Seq(col("n_pos"), col("n_neg"),
        Funcs.r(col("__u") / (col("n_pos") * col("n_neg"))).as("auc")): _*)
  }

  /** Kolmogorov-Smirnov statistic: max over score cutoffs of
    * |CDF_pos − CDF_neg|, with the smallest score attaining the max as
    * the reported cutoff (deterministic tie-break). */
  def ks(df: DataFrame, score: Column, label: Column,
         groupCols: Seq[String] = Nil): DataFrame = {
    val g = scoreGroups(df, score, label, groupCols)
    val cum = part(groupCols).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = part(groupCols)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // both engines compute the identical double from identical integer
    // cumulative counts, so the diff == max(diff) equality is exact
    val d = g.withColumn("cp", sum(col("np")).over(cum))
      .withColumn("cn", sum(col("nn")).over(cum))
      .withColumn("diff", abs(col("cp") / sum(col("np")).over(all)
        - col("cn") / sum(col("nn")).over(all)))
    d.withColumn("__mx", max(col("diff")).over(all))
      .filter(col("diff") === col("__mx"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("score")).as("ks_score"), Funcs.r(max(col("diff"))).as("ks"))
  }

  /** Gains/lift curve at each distinct score cutoff (descending):
    * targeting all rows with score ≥ s, the fraction of positives
    * captured and the lift over the base rate. */
  def gains(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = scoreGroups(df, score, label, Nil)
    val cum = Window.partitionBy(lit(0)).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("cum_n", sum(col("np") + col("nn")).over(cum))
      .withColumn("cum_pos", sum(col("np")).over(cum))
      .withColumn("__tp", sum(col("np")).over(all))
      .withColumn("__tn", sum(col("np") + col("nn")).over(all))
      .select(col("score"), col("cum_n"), col("cum_pos"),
        Funcs.r(col("cum_pos") / col("__tp")).as("capture"),
        Funcs.r((col("cum_pos") / col("cum_n")) / (col("__tp") / col("__tn"))).as("lift"))
  }

  /** Confusion-matrix sweep: tp/fp/fn/tn + precision/recall/F1 at each
    * threshold i/denom, i ∈ [0, steps]. Predicted positive ⟺ score ≥ t.
    * The sweep is a broadcast cross-join of the score grain against
    * `steps`+1 threshold rows — no per-threshold pass over the fact. */
  def thresholdSweep(df: DataFrame, score: Column, label: Column,
                     steps: Int, denom: Double): DataFrame = {
    val g = scoreGroups(df, score, label, Nil)
    val th = g.sparkSession.range(0, steps + 1)
      .select((col("id") / lit(denom)).as("threshold"))
    def rate(num: Column, den: Column): Column =
      Funcs.r(num / when(den === 0, lit(null)).otherwise(den))
    g.crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(sum(when(col("score") >= col("threshold"), col("np")).otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("threshold"), col("nn")).otherwise(0L)).as("fp"),
        sum(when(col("score") < col("threshold"), col("np")).otherwise(0L)).as("fn"),
        sum(when(col("score") < col("threshold"), col("nn")).otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        rate(col("tp"), col("tp") + col("fp")).as("precision"),
        rate(col("tp"), col("tp") + col("fn")).as("recall"),
        rate(lit(2L) * col("tp"), lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }

  /** Calibration table: scores in [0,1] binned into `bins` equal-width
    * buckets (top edge closed); per bin the mean predicted score vs the
    * observed positive rate. One hash-aggregate, no windows. */
  def calibration(df: DataFrame, score: Column, label: Column,
                  bins: Int = 10): DataFrame =
    df.select(least(floor(score * lit(bins)), lit(bins - 1)).cast("long").as("bin"),
      score.as("__s"), label.cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), Funcs.r(avg(col("__s"))).as("avg_score"),
        Funcs.r(avg(col("__y"))).as("pos_rate"))

  /** WMAPE-calibrated uncertainty map (reference
    * model_calibration.py:499-570): per-sample WMAPE contributions
    * |a−p|/(|a|+1e-8) bucketed by the uncertainty's ntile; each bin's
    * (mean raw uncertainty → mean WMAPE contribution) pair is one knot
    * of the reference's interpolated calibration curve — emitting the
    * knots IS the fitted calibrator. The reference bins by
    * np.percentile edges of the uncertainty; ntile is the equal-count
    * equivalent and needs `tieBreak` to extend the uncertainty order to
    * a total one so both engines assign identical bins on ties.
    *
    * Scale shape: ONE sort-window partitioned by the group (never a
    * global single-partition sort — calibrate per segment) and one
    * hash-aggregate on (group, bin). */
  def wmapeCalibration(df: DataFrame, groupCols: Seq[String], pred: Column,
                       actual: Column, rawUnc: Column, tieBreak: Seq[Column],
                       bins: Int = 10): DataFrame = {
    val groups = groupCols.map(col)
    val w = Window.partitionBy(groups: _*).orderBy(rawUnc +: tieBreak: _*)
    df.select(groups ++ Seq(pred.cast("double").as("__p"),
        actual.cast("double").as("__a"), rawUnc.cast("double").as("__u"),
        ntile(bins).over(w).cast("long").as("bin")): _*)
      .groupBy(groups :+ col("bin"): _*)
      .agg(count(lit(1)).as("n_rows"),
        Funcs.r(avg(col("__u"))).as("bin_uncertainty"),
        Funcs.r(avg(abs(col("__a") - col("__p")) /
          (abs(col("__a")) + lit(1e-8)))).as("bin_wmape"))
  }

  /** Welch two-sample test between variants A and B of a metric:
    * per-variant mean/variance from explicit sufficient statistics
    * (n, Σv, Σv² — portable across engines, unlike Welford-based
    * var_samp), the Welch t statistic, and the Welch-Satterthwaite
    * degrees of freedom. One hash-aggregate over the fact; the A-vs-B
    * combination is a 2-row epilogue. */
  def abTest(df: DataFrame, variantCol: Column, value: Column,
             variantA: String, variantB: String): DataFrame = {
    val g = df.filter(variantCol.isin(variantA, variantB))
      .select(variantCol.as("__v"), value.cast("double").as("__m"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("n"), sum(col("__m")).as("s"),
        sum(col("__m") * col("__m")).as("ss"))
      .withColumn("mean", col("s") / col("n"))
      .withColumn("vr",
        (col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1))
    val a = g.filter(col("__v") === variantA)
      .select(col("n").as("n_a"), col("mean").as("__ma"), col("vr").as("__va"))
    val b = g.filter(col("__v") === variantB)
      .select(col("n").as("n_b"), col("mean").as("__mb"), col("vr").as("__vb"))
    val se2 = col("__va") / col("n_a") + col("__vb") / col("n_b")
    a.crossJoin(b).select(
      col("n_a"), col("n_b"),
      Funcs.r(col("__ma")).as("mean_a"), Funcs.r(col("__mb")).as("mean_b"),
      Funcs.r(col("__ma") - col("__mb")).as("diff"),
      Funcs.r((col("__ma") - col("__mb")) / sqrt(se2)).as("t_stat"),
      Funcs.r(se2 * se2 /
        ((col("__va") / col("n_a")) * (col("__va") / col("n_a")) / (col("n_a") - 1) +
          (col("__vb") / col("n_b")) * (col("__vb") / col("n_b")) / (col("n_b") - 1)))
        .as("df_welch"))
  }
}
