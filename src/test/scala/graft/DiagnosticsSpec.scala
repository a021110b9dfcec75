package graft

import org.apache.spark.sql.functions._
import graft.metrics.Diagnostics
import graft.model.Ensembles

/** Contracts for the model-diagnostics surface (reference
  * model_diagnostics.py / meta_ensemble.py): the quality scorecard's
  * component scores and grade ladder on hand-computable inputs, the
  * drift report's no-drift / disjoint-shift / performance-degradation
  * behaviors, importance stability on identity and reshuffled vectors,
  * and the inverse-WMAPE scenario weights against hand arithmetic. */
class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[(String, Int, Double, Double, Double, Double)]) =
    vals.toDF("g", "t", "actual", "pred", "unc", "target")

  test("qualityScorecard: perfect constant predictions score the hand value") {
    // a == p, wide interval, target == p: wmape 0 → acc 100; coverage 1
    // → |1−.95|·200 = 10 off → calib 90; constant preds → cv 0 → cons
    // 100; aligned → 100. overall = 40 + 22.5 + 20 + 15 = 97.5 → A
    val df = series((1 to 10).map(i => ("g", i, 5.0, 5.0, 1.0, 5.0)))
    val row = Diagnostics.qualityScorecard(df, Seq("g"), col("actual"),
      col("pred"), col("unc"), col("target"), Seq(col("t"))).collect().head
    assert(row.getAs[Double]("wmape") == 0.0)
    assert(row.getAs[Double]("accuracy_score") == 100.0)
    assert(row.getAs[Double]("coverage") == 1.0)
    assert(row.getAs[Double]("calibration_score") == 90.0)
    assert(row.getAs[Double]("consistency_score") == 100.0)
    assert(row.getAs[Double]("alignment_score") == 100.0)
    assert(row.getAs[Double]("overall_quality") == 97.5)
    assert(row.getAs[String]("quality_grade") == "A")
  }

  test("qualityScorecard: hand-computed error metrics") {
    // actual 10, pred 8 on every row: wmape = 20, mae = 2, rmse = 2,
    // mape = 20; SST = 0 → r2 null; nothing inside ±1.96·0.5 → cov 0
    // → calib score = max(0, 100 − .95·200) = 0; pred constant → cons
    // 100; |8−12| > 1.2 → align 0. overall = .4·80 + 0 + 20 + 0 = 52 → F
    val df = series((1 to 8).map(i => ("g", i, 10.0, 8.0, 0.5, 12.0)))
    val row = Diagnostics.qualityScorecard(df, Seq("g"), col("actual"),
      col("pred"), col("unc"), col("target"), Seq(col("t"))).collect().head
    assert(row.getAs[Double]("wmape") == 20.0)
    assert(row.getAs[Double]("mae") == 2.0)
    assert(row.getAs[Double]("rmse") == 2.0)
    assert(row.isNullAt(row.fieldIndex("r2")))
    assert(row.getAs[Double]("mape") == 20.0)
    assert(row.getAs[Double]("coverage") == 0.0)
    assert(row.getAs[Double]("calibration_score") == 0.0)
    assert(row.getAs[Double]("consistency_score") == 100.0)
    assert(row.getAs[Double]("alignment_score") == 0.0)
    assert(row.getAs[Double]("overall_quality") == 52.0)
    assert(row.getAs[String]("quality_grade") == "F")
  }

  test("grade ladder boundaries") {
    val df = Seq(90.0, 89.9999, 80.0, 70.0, 60.0, 59.9999)
      .toDF("s").select(col("s"), Diagnostics.grade(col("s")).as("g"))
    assert(df.as[(Double, String)].collect().toMap ==
      Map(90.0 -> "A", 89.9999 -> "B", 80.0 -> "B", 70.0 -> "C",
        60.0 -> "D", 59.9999 -> "F"))
  }

  test("driftReport: identical slices → zero drift everywhere") {
    // ref and cur contain the same values; predictions carry the same
    // error in both slices → performance change 0
    val rows = for (cur <- Seq(0, 1); i <- 1 to 20)
      yield ("g", cur, i.toDouble, i + 1.0)
    val df = rows.toDF("g", "cur", "a", "p")
    val out = Diagnostics.driftReport(df, Seq("g"),
      Seq("target" -> col("a"), "residual" -> (col("a") - col("p"))),
      col("cur") === 1, col("a"), col("p")).collect()
    assert(out.length == 3)
    out.foreach { r0 =>
      assert(r0.getAs[Int]("drift_detected") == 0, r0.toString)
      assert(r0.getAs[Double]("drift_score") == 0.0)
    }
    val tgt = out.find(_.getAs[String]("channel") == "target").get
    assert(tgt.getAs[Double]("ks_stat") == 0.0)
    assert(tgt.getAs[Double]("mean_change") == 0.0)
    assert(tgt.getAs[Double]("std_change") == 0.0)
    val perf = out.find(_.getAs[String]("channel") == "performance").get
    assert(perf.getAs[Double]("mean_change") == 0.0)
  }

  test("driftReport: disjoint shift and degraded performance detected") {
    // current target values all above reference → KS D = 1; current
    // relative error ~27% vs ~9.5% reference → change ≈ 1.85 > 0.2
    val ref = (1 to 20).map(i => ("g", 0, i.toDouble, i + 1.0))
    val cur = (1 to 20).map(i => ("g", 1, i + 100.0, i + 130.0))
    val df = (ref ++ cur).toDF("g", "cur", "a", "p")
    val out = Diagnostics.driftReport(df, Seq("g"),
      Seq("target" -> col("a")), col("cur") === 1, col("a"), col("p"))
      .collect()
    val tgt = out.find(_.getAs[String]("channel") == "target").get
    assert(tgt.getAs[Double]("ks_stat") == 1.0)
    assert(tgt.getAs[Int]("drift_detected") == 1)
    assert(tgt.getAs[Double]("drift_score") == 1.0)
    assert(tgt.getAs[Double]("mean_change") == 100.0)
    val perf = out.find(_.getAs[String]("channel") == "performance").get
    // ref wmape = 20/Σ|a|·100, cur = 80/Σ|a'|·100; change large
    assert(perf.getAs[Int]("drift_detected") == 1)
    assert(perf.getAs[Double]("drift_score") > 0.2)
  }

  test("healthReport: healthy model scores the hand composite") {
    // perfect predictions in both slices, wide intervals: acc 100,
    // stability 1, calib (100 − 0.05·200)/100 = 0.9, zero drift →
    // health = 40 + 20 + 13.5 + 25 = 98.5; no alerts or warnings
    val rows = for (cur <- Seq(0, 1); i <- 1 to 20)
      yield ("g", cur, 10.0 + (i % 3), 10.0 + (i % 3), 5.0)
    val row = Diagnostics.healthReport(rows.toDF("g", "cur", "a", "p", "u"),
      Seq("g"), col("a"), col("p"), col("u"), col("cur") === 1)
      .collect().head
    assert(row.getAs[Double]("wmape") == 0.0)
    assert(row.getAs[Double]("prediction_stability") > 0.9)
    assert(row.getAs[Double]("calibration_score") == 0.9)
    assert(row.getAs[Double]("concept_drift_score") == 0.0)
    assert(row.getAs[Double]("data_drift_score") == 0.0)
    assert(row.getAs[Int]("n_alerts") == 0)
    assert(row.getAs[Int]("n_warnings") == 0)
    // stability is 1 − cv of the period-3 prediction pattern, not
    // exactly 1 — recompute the composite from the emitted parts
    val expected = 100.0 * 0.4 +
      (row.getAs[Double]("prediction_stability") + 1.0) * 50 * 0.2 +
      0.9 * 100 * 0.15 + 100.0 * 0.25
    assert(math.abs(row.getAs[Double]("health_score") - expected) < 1e-9)
  }

  test("healthReport: degradation, drift and high error all alert") {
    // reference slice: small error (wmape ~9.5%); current: shifted
    // target (KS D = 1 both channels) and wmape ~36% → degradation
    // > 0.2 (×0.8 penalty), drift alert, high-error alert
    val ref = (1 to 20).map(i => ("g", 0, i.toDouble, i - 1.0, 100.0))
    val cur = (1 to 20).map(i => ("g", 1, i + 100.0, i + 60.0, 100.0))
    val row = Diagnostics.healthReport((ref ++ cur).toDF("g", "cur", "a", "p", "u"),
      Seq("g"), col("a"), col("p"), col("u"), col("cur") === 1)
      .collect().head
    assert(row.getAs[Double]("concept_drift_score") == 1.0)
    assert(row.getAs[Double]("data_drift_score") == 1.0)
    assert(row.getAs[Double]("wmape") > 30)
    assert(row.getAs[Double]("degradation") > 0.2)
    assert(row.getAs[Int]("alert_degradation") == 1)
    assert(row.getAs[Int]("alert_drift") == 1)
    assert(row.getAs[Int]("alert_high_error") == 1)
    assert(row.getAs[Int]("n_alerts") >= 3)
    // the ×0.8 penalty applies to the rounded raw composite
    val raw = row.getAs[Double]("business_impact_score") * 0.25 +
      (100.0 - row.getAs[Double]("wmape")) * 0.4 +
      (row.getAs[Double]("prediction_stability") + 1.0) * 50 * 0.2 +
      row.getAs[Double]("calibration_score") * 100 * 0.15 - 2.0 * 50 * 0.1
    assert(row.getAs[Double]("health_score") <= raw)
  }

  test("importanceStability: identity vector is perfectly stable") {
    val df = Seq(("f1", 0.5, 0.5), ("f2", 0.3, 0.3), ("f3", 0.2, 0.2))
      .toDF("f", "b", "c")
    val row = Diagnostics.importanceStability(df, Nil, col("f"), col("b"),
      col("c")).collect().head
    assert(row.getAs[Long]("n_features") == 3L)
    assert(row.getAs[Double]("mean_change") == 0.0)
    assert(row.getAs[Double]("rank_corr") == 1.0)
    assert(row.getAs[Double]("stability_score") == 1.0)
    assert(row.getAs[Int]("stable") == 1)
  }

  test("importanceStability: reversed ranks keep |rho|=1, changes count") {
    // the reference takes |spearman| (model_diagnostics.py:492-497) —
    // a full reversal stays rank-correlated; stability drops only via
    // mean_change = (0.3 + 0 + 0.3)/3 = 0.2 → score 0.8 > 0.7 → stable
    val df = Seq(("f1", 0.5, 0.2), ("f2", 0.3, 0.3), ("f3", 0.2, 0.5))
      .toDF("f", "b", "c")
    val row = Diagnostics.importanceStability(df, Nil, col("f"), col("b"),
      col("c")).collect().head
    assert(row.getAs[Double]("mean_change") == 0.2)
    assert(row.getAs[Double]("max_change") == 0.3)
    assert(row.getAs[Double]("rank_corr") == 1.0)
    assert(row.getAs[Double]("stability_score") == 0.8)
    assert(row.getAs[Int]("stable") == 1)
    // tie on change 0.3 between f1 and f3 → struct max picks name max
    assert(row.getAs[String]("top_changed_feature") == "f3")
    assert(row.getAs[Double]("top_change") == 0.3)
  }

  test("scenarioWeights: inverse-WMAPE weights match hand arithmetic") {
    // model m1: |a−p| = 1 per row over a = 10 → wmape 0.1;
    // m2: |a−p| = 3 → 0.3. raw = 10 vs 10/3; weights 0.75 / 0.25
    val rows = for (m <- Seq(("m1", 9.0), ("m2", 13.0)); i <- 1 to 10)
      yield ("s", m._1, 10.0, m._2)
    val byModel = Ensembles.scenarioWeights(rows.toDF("sc", "model", "a", "p"),
      Seq("sc"), col("model"), col("a"), col("p"))
      .select("model", "wmape", "weight").as[(String, Double, Double)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(byModel("m1")._1 == 0.1 && byModel("m2")._1 == 0.3)
    assert(math.abs(byModel("m1")._2 - 0.75) < 1e-6)
    assert(math.abs(byModel("m2")._2 - 0.25) < 1e-6)
  }

  test("weightedBlend: blend equals the hand-weighted average") {
    val scored = Seq(("s", 1, "m1", 10.0), ("s", 1, "m2", 20.0))
      .toDF("sc", "obs", "model", "p")
    val weights = Seq(("s", "m1", 0.75), ("s", "m2", 0.25))
      .toDF("sc", "model", "weight")
    val out = Ensembles.weightedBlend(scored, weights, Seq("sc"), Seq("obs"),
      col("model"), col("p")).collect().head
    assert(out.getAs[Double]("ensemble_pred") == 12.5)
    assert(out.getAs[Long]("n_models") == 2L)
  }

  test("weightedBlend: renormalizes over the models present per row") {
    // obs 2 only has m2 → blend = m2's prediction exactly
    val scored = Seq(("s", 1, "m1", 10.0), ("s", 1, "m2", 20.0),
      ("s", 2, "m2", 7.0)).toDF("sc", "obs", "model", "p")
    val weights = Seq(("s", "m1", 0.6), ("s", "m2", 0.4))
      .toDF("sc", "model", "weight")
    val out = Ensembles.weightedBlend(scored, weights, Seq("sc"), Seq("obs"),
      col("model"), col("p"))
      .select("obs", "ensemble_pred").as[(Int, Double)].collect().toMap
    assert(out(2) == 7.0)
    assert(out(1) == 14.0)
  }

  test("importanceScoresSliced: the fused single-scan scores equal the two " +
    "filtered-scan importanceScores exactly (q270's cold-path fusion)") {
    import graft.operators.FeatureQuality
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val feats = Seq("l_discount", "l_tax", "l_extendedprice", "l_linenumber")
    val cut = col("l_shipdate") < lit("1996-01-01").cast("date")
    def ref(f: org.apache.spark.sql.DataFrame) = FeatureQuality
      .importanceScores(f, feats, "l_quantity")
      .select("feature", "score").as[(String, Double)].collect().toMap
    val (refIn, refOut) = (ref(li.filter(cut)), ref(li.filter(!cut)))
    val fused = FeatureQuality
      .importanceScoresSliced(li, cut, feats, "l_quantity")
      .select("feature", "score_in", "score_out")
      .as[(String, Double, Double)].collect()
    assert(fused.length == feats.size)
    fused.foreach { case (f, sIn, sOut) =>
      // bit-identical, not approximately: same contributing rows in the
      // same partition order through the same aggregate merge tree
      assert(sIn == refIn(f), s"$f score_in $sIn != filtered ${refIn(f)}")
      assert(sOut == refOut(f), s"$f score_out $sOut != filtered ${refOut(f)}")
    }
    // a NULL slice value lands on neither side (filter semantics)
    val withNull = li.withColumn("__sl",
      when(col("l_linenumber") === 1, lit(null).cast("boolean")).otherwise(cut))
    val fusedN = FeatureQuality
      .importanceScoresSliced(withNull, col("__sl"), feats, "l_quantity")
      .select("feature", "score_in", "score_out")
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val refInN = ref(withNull.filter(col("__sl")))
    val refOutN = ref(withNull.filter(!col("__sl")))
    feats.foreach { f =>
      assert(fusedN(f)._1 == refInN(f) && fusedN(f)._2 == refOutN(f))
    }
  }
}
