package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{Eps, microSum, microSumSq, nanToNull, r}

/** Model-diagnostics operators — the engine-expressible core of the
  * reference's monitoring stack (src/evaluation/model_diagnostics.py):
  * the multi-channel drift detector (:147-440), the prediction-quality
  * assessor with its weighted component scores and A-F grade ladder
  * (:530-755) and the feature-importance stability monitor (:445-527).
  *
  * House determinism discipline throughout: every input column is
  * rounded to the 4dp grid up front, every mean/sum of grid values
  * accumulates as micro-ints in decimal(38,0) (partial-aggregation-
  * order independent), and every derived score is rounded BEFORE it
  * feeds a comparison or a weighted combination — so both engines
  * branch and grade on bit-identical doubles.
  *
  * The reference gates drift on scipy p-values; p-value CDFs are
  * driver-side scalar math there, so — per the ResidualDiagnostics
  * precedent — the engine emits the test STATISTICS and gates on
  * literal statistic thresholds, documented per method.
  */
object Diagnostics {

  /** The reference's letter ladder (model_diagnostics.py:732-743). */
  def grade(score: Column): Column =
    when(score >= 90, "A").when(score >= 80, "B").when(score >= 70, "C")
      .when(score >= 60, "D").otherwise("F")

  /** Prediction-quality scorecard (model_diagnostics.py:539-755): per
    * group, the four component assessments and the weighted overall.
    *
    *   accuracy      WMAPE/MAE/RMSE/R²/MAPE; score = max(0, 100−WMAPE)
    *   calibration   empirical coverage of pred ± z·unc vs 0.95;
    *                 score = max(0, 100 − |cov−0.95|·200)
    *   consistency   successive-prediction changes along `ord`;
    *                 score = max(0, 100 − cv(changes)·20)
    *   alignment     |pred−target| ≤ 0.1·|target+1e-8| rate ·100
    *   overall       0.4·acc + 0.25·calib + 0.2·cons + 0.15·align,
    *                 graded A-F
    *
    * Execution shape: ONE window over (group, ord) for the lagged
    * prediction + ONE hash-aggregate on the same group key (Catalyst
    * reuses the window's exchange) — a single pass however wide the
    * scorecard. std(changes) is the population std (np.std ddof=0,
    * the reference's convention) from exact micro sums.
    */
  def qualityScorecard(df: DataFrame, groupCols: Seq[String], actual: Column,
                       pred: Column, unc: Column, target: Column,
                       ord: Seq[Column], z: Double = 1.96): DataFrame = {
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(r(actual).as("__a"), r(pred).as("__p"),
      r(unc).as("__u"), r(target).as("__t")) ++ ord.zipWithIndex.map {
      case (c, i) => c.as(s"__o$i")
    }: _*)
    val w = Window.partitionBy(keys: _*)
      .orderBy(ord.indices.map(i => col(s"__o$i")): _*)
    val lagged = base.withColumn("__pprev", lag(col("__p"), 1).over(w))
      .withColumn("__ch", abs(col("__p") - col("__pprev")))
    val g = lagged.groupBy(keys: _*).agg(
      count(lit(1)).as("n_rows"),
      microSum(abs(col("__a") - col("__p"))).as("__sad"),
      microSum(abs(col("__a"))).as("__saa"),
      microSum(col("__a")).as("__sa"),
      microSumSq(col("__a")).as("__saa2"),
      microSumSq(col("__a") - col("__p")).as("__sse"),
      // per-row MAPE terms rounded to the grid, then summed exactly —
      // the ADVICE-class fix for order-dependent avg of raw ratios
      microSum(r(abs(col("__a") - col("__p")) / (abs(col("__a")) + lit(Eps))))
        .as("__mapesum"),
      sum(when(col("__a") >= col("__p") - lit(z) * col("__u") &&
        col("__a") <= col("__p") + lit(z) * col("__u"), 1L).otherwise(0L))
        .as("__cov"),
      sum(when(col("__pprev").isNotNull, 1L).otherwise(0L)).as("__nch"),
      microSum(when(col("__pprev").isNotNull, col("__ch")).otherwise(lit(null)))
        .as("__chs"),
      microSumSq(when(col("__pprev").isNotNull, col("__ch")).otherwise(lit(null)))
        .as("__chss"),
      sum(when(abs(col("__p") - col("__t")) <= lit(0.1) * abs(col("__t") + lit(Eps)),
        1L).otherwise(0L)).as("__close"))
    val n = col("n_rows").cast("double")
    val wmapeC = r(col("__sad") / (col("__saa") + lit(Eps)) * lit(100.0))
    val meanA = col("__sa") / n
    val sst = col("__saa2") - n * meanA * meanA
    val cvRaw = r(when(col("__nch") > 1,
      sqrt(greatest(col("__chss") / col("__nch") -
        pow(col("__chs") / col("__nch"), 2), lit(0.0))) /
        (col("__chs") / col("__nch") + lit(Eps))).otherwise(lit(0.0)))
    val scored = g
      .withColumn("wmape", wmapeC)
      .withColumn("mae", r(col("__sad") / n))
      .withColumn("rmse", r(sqrt(col("__sse") / n)))
      .withColumn("r2", r(when(sst > 0, lit(1.0) - col("__sse") / sst)))
      .withColumn("mape", r(col("__mapesum") / n * lit(100.0)))
      .withColumn("accuracy_score", r(greatest(lit(0.0), lit(100.0) - col("wmape"))))
      .withColumn("coverage", r(col("__cov") / n))
      .withColumn("calibration_error", r(abs(col("coverage") - lit(0.95))))
      .withColumn("calibration_score",
        r(greatest(lit(0.0), lit(100.0) - col("calibration_error") * lit(200.0))))
      .withColumn("mean_change", r(when(col("__nch") > 0, col("__chs") / col("__nch"))
        .otherwise(lit(0.0))))
      .withColumn("cv_changes", cvRaw)
      .withColumn("consistency_score",
        r(greatest(lit(0.0), lit(100.0) - col("cv_changes") * lit(20.0))))
      .withColumn("alignment_rate", r(col("__close") / n))
      .withColumn("alignment_score", r(col("alignment_rate") * lit(100.0)))
      .withColumn("overall_quality",
        r(col("accuracy_score") * lit(0.4) + col("calibration_score") * lit(0.25) +
          col("consistency_score") * lit(0.2) + col("alignment_score") * lit(0.15)))
      .withColumn("quality_grade", grade(col("overall_quality")))
    scored.select(keys ++ Seq(col("n_rows"), col("wmape"), col("mae"),
      col("rmse"), col("r2"), col("mape"), col("accuracy_score"),
      col("coverage"), col("calibration_error"), col("calibration_score"),
      col("mean_change"), col("cv_changes"), col("consistency_score"),
      col("alignment_rate"), col("alignment_score"), col("overall_quality"),
      col("quality_grade")): _*)
  }

  /** Multi-channel drift report (model_diagnostics.py:147-440): one row
    * per (group, channel) comparing a reference slice (`isCurrent` =
    * false) against the current slice.
    *
    * Value channels (e.g. target / prediction / residual — the
    * reference's `_detect_target_drift` / `_detect_prediction_drift` /
    * `_detect_residual_drift` distribution legs): the two-sample KS
    * statistic (the Eval.ks cumulative-CDF formulation over the
    * distinct-value grain), per-slice means and population stds with
    * the reference's mean/std-change deltas, gated on a literal
    * D-statistic threshold.
    *
    * The `performance` channel (`_detect_performance_drift`): WMAPE per
    * slice and the relative degradation (cur−ref)/ref, gated at
    * `perfThreshold` (the reference's 20%), drift score
    * max(0, change) as at :239.
    *
    * Execution shape: the channel melt is a per-row explode
    * (projection, no shuffle); ONE hash-aggregate collapses it to the
    * (group, channel, distinct value) grain carrying the per-value
    * slice counts, and BOTH the KS cumulative-CDF windows and the
    * slice moments (exact micro-int value sums weighted by the counts
    * — identical integers to per-row accumulation) ride that tiny
    * grain on the same (group, channel) partitioning, so the fact is
    * scanned once for all channels. Per-value weighted products
    * multiply in decimal(38,0) BEFORE summing (a long×long product
    * would wrap silently), so the sums stay exact to ~1e38; pre-bucket
    * continuous channels per the Eval scale note, which also bounds
    * the grain. The performance leg is its own single aggregate. */
  def driftReport(df: DataFrame, groupCols: Seq[String],
                  channels: Seq[(String, Column)], isCurrent: Column,
                  actual: Column, pred: Column,
                  ksThreshold: Double = 0.1,
                  perfThreshold: Double = 0.2): DataFrame = {
    val keys = groupCols.map(col)
    val entries = channels.map { case (name, c) =>
      struct(lit(name).as("channel"), r(c).as("value"))
    }
    val melted = df.select(keys ++ Seq(isCurrent.cast("int").as("__cur"),
      explode(array(entries: _*)).as("__e")): _*)
      .select(keys ++ Seq(col("__e.channel").as("channel"),
        col("__e.value").as("value"), col("__cur")): _*)
    val grain = melted.groupBy(keys ++ Seq(col("channel"), col("value")): _*)
      .agg(sum(col("__cur").cast("long")).as("np"),
        sum(lit(1L) - col("__cur")).as("nn"))
    val pAll = Window.partitionBy(keys :+ col("channel"): _*)
    val cum = pAll.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // decimal BEFORE the multiply (the Validation.__spxy convention) —
    // a long×long product of micro(value²)·count would wrap past 2⁶³
    // at ~10³ rows per distinct value for values near 1e4
    def wSum(weight: Column, micro: Column, scale: Double): Column =
      sum(micro.cast("decimal(38,0)") * weight.cast("decimal(38,0)")).over(pAll)
        .cast("double") / lit(scale)
    val withCdf = grain
      .withColumn("__cp", sum(col("np")).over(cum))
      .withColumn("__cn", sum(col("nn")).over(cum))
      .withColumn("__tp", sum(col("np")).over(pAll))
      .withColumn("__tn", sum(col("nn")).over(pAll))
      .withColumn("__rs", wSum(col("nn"), graft.expr.RoundHalfUpExpr.column(col("value") * lit(1e4)), 1e4))
      .withColumn("__rss",
        wSum(col("nn"), graft.expr.RoundHalfUpExpr.column(col("value") * col("value") * lit(1e8)), 1e8))
      .withColumn("__cs", wSum(col("np"), graft.expr.RoundHalfUpExpr.column(col("value") * lit(1e4)), 1e4))
      .withColumn("__css",
        wSum(col("np"), graft.expr.RoundHalfUpExpr.column(col("value") * col("value") * lit(1e8)), 1e8))
      .withColumn("diff",
        abs(col("__cp") / col("__tp") - col("__cn") / col("__tn")))
      .withColumn("__mx", max(col("diff")).over(pAll))
    def popSd(s: Column, ss: Column, n: Column): Column =
      r(sqrt(greatest(ss / n - pow(s / n, 2), lit(0.0))))
    val valueRows = withCdf.filter(col("diff") === col("__mx"))
      .groupBy(keys :+ col("channel"): _*)
      .agg(first(col("__tn")).as("n_ref"), first(col("__tp")).as("n_cur"),
        r(max(col("diff"))).as("ks_stat"),
        first(col("__rs")).as("__rs"), first(col("__rss")).as("__rss"),
        first(col("__cs")).as("__cs"), first(col("__css")).as("__css"))
      .withColumn("ref_mean", r(col("__rs") / col("n_ref")))
      .withColumn("cur_mean", r(col("__cs") / col("n_cur")))
      .withColumn("mean_change", r(abs(col("cur_mean") - col("ref_mean"))))
      .withColumn("std_change",
        r(abs(popSd(col("__cs"), col("__css"), col("n_cur")) -
          popSd(col("__rs"), col("__rss"), col("n_ref")))))
      .withColumn("drift_detected",
        (col("ks_stat") > lit(ksThreshold)).cast("int"))
      .withColumn("drift_score",
        r(when(col("drift_detected") === 1, col("ks_stat")).otherwise(lit(0.0))))
    val outCols = Seq(col("channel"), col("n_ref"), col("n_cur"),
      col("ks_stat"), col("ref_mean"), col("cur_mean"), col("mean_change"),
      col("std_change"), col("drift_detected"), col("drift_score"))
    def sliceStat(curSide: Int, c: Column): Column =
      when(col("__cur") === curSide, c).otherwise(lit(null))
    val perf = df.select(keys ++ Seq(isCurrent.cast("int").as("__cur"),
      r(actual).as("__a"), r(pred).as("__p")): _*)
      .groupBy(keys: _*).agg(
        sum(lit(1L) - col("__cur")).as("n_ref"),
        sum(col("__cur").cast("long")).as("n_cur"),
        microSum(sliceStat(0, abs(col("__a") - col("__p")))).as("__rsad"),
        microSum(sliceStat(0, abs(col("__a")))).as("__rsaa"),
        microSum(sliceStat(1, abs(col("__a") - col("__p")))).as("__csad"),
        microSum(sliceStat(1, abs(col("__a")))).as("__csaa"))
      .withColumn("ref_mean", r(col("__rsad") / (col("__rsaa") + lit(Eps)) * lit(100.0)))
      .withColumn("cur_mean", r(col("__csad") / (col("__csaa") + lit(Eps)) * lit(100.0)))
      .withColumn("mean_change",
        r(when(col("ref_mean") > 0, (col("cur_mean") - col("ref_mean")) / col("ref_mean"))))
      .withColumn("channel", lit("performance"))
      .withColumn("ks_stat", lit(null).cast("double"))
      .withColumn("std_change", lit(null).cast("double"))
      .withColumn("drift_detected",
        coalesce(col("mean_change") > lit(perfThreshold), lit(false)).cast("int"))
      .withColumn("drift_score",
        r(when(col("drift_detected") === 1, greatest(lit(0.0), col("mean_change")))
          .otherwise(lit(0.0))))
    valueRows.select(keys ++ outCols: _*)
      .unionByName(perf.select(keys ++ outCols: _*))
  }

  /** Model-health report (model_diagnostics.py:757-963
    * ModelHealthDashboard): per group, the error metrics, the
    * prediction-stability score max(0, 1−cv) (:870-882), the
    * calibration score from the quality assessor's coverage leg, the
    * drift scores, the business-impact score, the weighted health
    * composite (:884-925: 0.4·acc + 0.2·(predstab+impstab)·50 +
    * 0.15·calib·100 + 0.25·biz − 0.1·(concept+data)·50, the >20%
    * degradation ×0.8 penalty, clamped to [0,100]) and the alert /
    * warning flags (:927-963) as integer columns.
    *
    * Where the reference stubs its drift inputs with literals
    * (concept 0.02 / data 0.01 at :821-823, "would use actual drift
    * detector"), the engine wires the REAL detector: the residual
    * channel's KS drift score feeds concept drift and the target
    * channel's feeds data drift, computed against the `isCurrent` =
    * false reference slice with [[driftReport]]'s gate convention.
    * The reference WMAPE is likewise the reference slice's own WMAPE.
    * Feature-importance stability keeps the reference's no-history
    * default 1.0 (compose [[importanceStability]] for the real thing).
    *
    * Execution shape: one conditional aggregate on the group key for
    * every current/reference metric + one KS pass on the two-channel
    * melt; a group-grain join merges them.
    */
  def healthReport(df: DataFrame, groupCols: Seq[String], actual: Column,
                   pred: Column, unc: Column, isCurrent: Column,
                   ksThreshold: Double = 0.1, z: Double = 1.96): DataFrame = {
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(r(actual).as("__a"), r(pred).as("__p"),
      r(unc).as("__u"), isCurrent.cast("int").as("__cur")): _*)
    def curOnly(c: Column): Column = when(col("__cur") === 1, c).otherwise(lit(null))
    val g = base.groupBy(keys: _*).agg(
      sum(col("__cur").cast("long")).as("n_cur"),
      sum(lit(1L) - col("__cur")).as("n_ref"),
      microSum(curOnly(abs(col("__a") - col("__p")))).as("__sad"),
      microSum(curOnly(abs(col("__a")))).as("__saa"),
      microSum(curOnly(col("__a"))).as("__sa"),
      microSumSq(curOnly(col("__a"))).as("__saa2"),
      microSumSq(curOnly(col("__a") - col("__p"))).as("__sse"),
      microSum(curOnly(col("__p"))).as("__sp"),
      microSumSq(curOnly(col("__p"))).as("__spp"),
      microSum(curOnly(abs(col("__p")))).as("__sap"),
      sum(when(col("__cur") === 1 &&
        col("__a") >= col("__p") - lit(z) * col("__u") &&
        col("__a") <= col("__p") + lit(z) * col("__u"), 1L).otherwise(0L))
        .as("__cov"),
      microSum(when(col("__cur") === 0, abs(col("__a") - col("__p")))
        .otherwise(lit(null))).as("__rsad"),
      microSum(when(col("__cur") === 0, abs(col("__a"))).otherwise(lit(null)))
        .as("__rsaa"))
    // drift scores: the two-channel melt through the KS device, gated
    // exactly as driftReport gates its value channels
    val entries = Seq("target" -> col("__a"), "residual" -> (col("__a") - col("__p")))
      .map { case (n, c) => struct(lit(n).as("channel"), r(c).as("value")) }
    val melted = base.select(keys ++ Seq(col("__cur"),
      explode(array(entries: _*)).as("__e")): _*)
      .select(keys ++ Seq(col("__e.channel").as("channel"),
        col("__e.value").as("value"), col("__cur")): _*)
    val ks = Eval.ks(melted, col("value"), col("__cur"), groupCols :+ "channel")
      .withColumn("__dscore",
        r(when(col("ks") > lit(ksThreshold), col("ks")).otherwise(lit(0.0))))
    val drift = ks.groupBy(keys: _*).agg(
      max(when(col("channel") === "residual", col("__dscore")))
        .as("concept_drift_score"),
      max(when(col("channel") === "target", col("__dscore")))
        .as("data_drift_score"))
    val n = col("n_cur").cast("double")
    val meanA = col("__sa") / n
    val sst = col("__saa2") - n * meanA * meanA
    val cvPred = sqrt(greatest(col("__spp") / n - pow(col("__sp") / n, 2), lit(0.0))) /
      (col("__sap") / n + lit(Eps))
    val joined = (if (groupCols.isEmpty) g.crossJoin(drift) else g.join(drift, groupCols))
      .withColumn("wmape", r(col("__sad") / (col("__saa") + lit(Eps)) * lit(100.0)))
      .withColumn("mae", r(col("__sad") / n))
      .withColumn("rmse", r(sqrt(col("__sse") / n)))
      .withColumn("r2", r(when(sst > 0, lit(1.0) - col("__sse") / sst)))
      .withColumn("prediction_stability",
        r(when(col("n_cur") < 2, lit(1.0))
          .otherwise(greatest(lit(0.0), lit(1.0) - cvPred))))
      .withColumn("feature_importance_stability", lit(1.0))
      // n_cur = 0 (group present only in the reference slice) would give
      // 0/0.0 = NaN here vs NULL in the SQL oracle; the guard keeps the
      // house NaN-parity convention on the score chain
      .withColumn("coverage", r(when(col("n_cur") > 0, col("__cov") / n)))
      .withColumn("calibration_score",
        nanToNull(r(greatest(lit(0.0),
          lit(100.0) - r(abs(col("coverage") - lit(0.95))) * lit(200.0))
          / lit(100.0))))
      .withColumn("business_impact_score",
        r(greatest(lit(0.0), lit(100.0) - col("wmape"))))
      .withColumn("reference_wmape",
        r(when(col("n_ref") > 0,
          col("__rsad") / (col("__rsaa") + lit(Eps)) * lit(100.0))))
      .withColumn("degradation",
        r(when(col("reference_wmape") > 0,
          (col("wmape") - col("reference_wmape")) / col("reference_wmape"))))
    val accScore = r(greatest(lit(0.0), lit(100.0) - col("wmape")))
    val rawHealth =
      accScore * lit(0.4) +
        (col("prediction_stability") + col("feature_importance_stability")) *
          lit(50.0) * lit(0.2) +
        col("calibration_score") * lit(100.0) * lit(0.15) +
        col("business_impact_score") * lit(0.25) -
        (col("concept_drift_score") + col("data_drift_score")) * lit(50.0) * lit(0.1)
    val out = joined
      .withColumn("__raw", nanToNull(r(rawHealth)))
      .withColumn("health_score",
        nanToNull(r(greatest(lit(0.0), least(lit(100.0),
          when(col("degradation").isNotNull && col("degradation") > 0.2,
            col("__raw") * lit(0.8)).otherwise(col("__raw")))))))
      // every flag is coalesce-guarded: a group with an empty current
      // slice has NULL wmape/health, and the oracle's CASE...ELSE 0
      // emits 0 there — an unguarded cast would emit NULL instead
      .withColumn("alert_degradation",
        coalesce(col("degradation") > 0.2, lit(false)).cast("int"))
      .withColumn("alert_drift",
        coalesce(col("concept_drift_score") > 0.05, lit(false)).cast("int"))
      .withColumn("alert_low_health",
        coalesce(col("health_score") < 70, lit(false)).cast("int"))
      .withColumn("alert_high_error",
        coalesce(col("wmape") > 30, lit(false)).cast("int"))
      .withColumn("warn_low_stability",
        coalesce(col("prediction_stability") < 0.7, lit(false)).cast("int"))
      .withColumn("warn_elevated_error",
        coalesce(col("wmape") > 20 && col("wmape") <= 30, lit(false)).cast("int"))
      .withColumn("n_alerts",
        col("alert_degradation") + col("alert_drift") +
          col("alert_low_health") + col("alert_high_error"))
      .withColumn("n_warnings",
        col("warn_low_stability") + col("warn_elevated_error"))
    out.select(keys ++ Seq(col("n_cur"), col("n_ref"), col("wmape"),
      col("mae"), col("rmse"), col("r2"), col("prediction_stability"),
      col("feature_importance_stability"), col("calibration_score"),
      col("concept_drift_score"), col("data_drift_score"),
      col("business_impact_score"), col("reference_wmape"),
      col("degradation"), col("health_score"), col("alert_degradation"),
      col("alert_drift"), col("alert_low_health"), col("alert_high_error"),
      col("warn_low_stability"), col("warn_elevated_error"),
      col("n_alerts"), col("n_warnings")): _*)
  }

  /** Feature-importance stability monitor (model_diagnostics.py:
    * 445-527): per group over (feature, baseline importance, current
    * importance) rows — mean/max absolute change, the |Spearman| rank
    * correlation between the two importance vectors, the composite
    * stability score |ρ|·(1−mean_change), the stability gate
    * (> 1 − threshold) and the most-changed feature (deterministic:
    * largest change, feature-name max on ties via struct ordering).
    *
    * Execution shape: the input is feature-grain (dim-sized); one
    * rank window pair + two group aggregates joined at group grain.
    */
  def importanceStability(df: DataFrame, groupCols: Seq[String],
                          feature: Column, baseImp: Column, curImp: Column,
                          threshold: Double = 0.3): DataFrame = {
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(feature.as("__f"), r(baseImp).as("__b"),
      r(curImp).as("__c")): _*)
      .withColumn("__chg", r(abs(col("__c") - col("__b"))))
    val agg = base.groupBy(keys: _*).agg(
      count(lit(1)).as("n_features"),
      r(microSum(col("__chg")) / count(lit(1))).as("mean_change"),
      r(max(col("__chg"))).as("max_change"),
      max(struct(col("__chg"), col("__f"))).as("__top"))
    val rho = graft.operators.Assoc.spearman(base, groupCols, col("__b"), col("__c"))
      .select(keys :+ col("spearman"): _*)
    val joined = if (groupCols.isEmpty) agg.crossJoin(rho) else agg.join(rho, groupCols)
    joined
      .withColumn("rank_corr", coalesce(abs(col("spearman")), lit(0.0)))
      .withColumn("stability_score",
        r(col("rank_corr") * (lit(1.0) - col("mean_change"))))
      .withColumn("stable",
        (col("stability_score") > lit(1.0 - threshold)).cast("int"))
      .select(keys ++ Seq(col("n_features"), col("mean_change"),
        col("max_change"), col("rank_corr"), col("stability_score"),
        col("stable"), col("__top.__f").as("top_changed_feature"),
        col("__top.__chg").as("top_change")): _*)
  }
}
