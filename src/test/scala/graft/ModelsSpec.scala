package graft

import org.apache.spark.sql.functions._
import graft.model.Models
import graft.operators.FeatureQuality

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("GBT baseline fits and predicts on a learnable relationship") {
    val train = (1 to 200).map(i => (i.toDouble, i * 2.0 + 3))
      .toDF("x", "y")
    val model = Models.fitGbt(train, Seq("x"), "y", maxIter = 5, maxDepth = 3)
    val preds = Models.predictGbt(model, train, Seq("x"))
    val wmape = preds.agg(
      graft.metrics.Metrics.wmape(col("y"), col("prediction"))).as[Double].head()
    assert(wmape < 10.0, s"wmape $wmape")
  }

  test("WMAPE-objective GBT fits conditional medians and beats squared loss on WMAPE") {
    // Per x-bucket: labels {1,1,1,12} — the WMAPE/L1 optimum is the
    // median (1), the L2 optimum is the mean (3.75). Σ|resid|: median
    // predictor 11 vs mean predictor 16.5 per bucket, so the absolute-
    // loss model must come out ahead on WMAPE.
    val train = (0 until 50).flatMap { b =>
      Seq.fill(3)((b.toDouble, 1.0)) :+ ((b.toDouble, 12.0))
    }.toDF("x", "y")
    def wmapeOf(m: org.apache.spark.ml.regression.GBTRegressionModel): Double =
      Models.predictGbt(m, train, Seq("x"))
        .agg(graft.metrics.Metrics.wmape(col("y"), col("prediction")))
        .as[Double].head()
    val wAbs = wmapeOf(Models.fitGbtWmape(train, Seq("x"), "y", maxIter = 10, maxDepth = 3))
    val wSq = wmapeOf(Models.fitGbt(train, Seq("x"), "y", maxIter = 10, maxDepth = 3))
    assert(wAbs < wSq, s"absolute-loss wmape $wAbs should beat squared $wSq")
  }

  test("hurdle forecast = P(nonzero) x mean(nonzero)") {
    val df = Seq(("a", 0.0), ("a", 0.0), ("a", 6.0), ("a", 10.0)).toDF("k", "v")
    val r = Models.hurdleForecast(df, Seq(col("k")), col("v"), Seq("k")).head()
    assert(r.getAs[Double]("p_nonzero") == 0.5)
    assert(r.getAs[Double]("nz_mean") == 8.0)
    assert(r.getAs[Double]("hurdle_forecast") == 4.0)
  }

  test("fitted hurdle conditions on features and beats the aggregate hurdle") {
    // Demand is feature-driven: probability of a sale AND its size both
    // grow with x. The aggregate hurdle emits ONE number per key, so it
    // cannot track x; the fitted classifier x regressor can.
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val x = (i % 100).toDouble / 100.0
      val sold = rng.nextDouble() < x
      val y = if (sold) 10.0 * x + rng.nextDouble() else 0.0
      ("k", x, y, i)
    }
    val df = rows.toDF("k", "x", "y", "i")
    val train = df.filter(col("i") <= 300)
    val test = df.filter(col("i") > 300)

    val fitted = Models.fitHurdle(train, Seq("x"), "y", maxIter = 10, maxDepth = 3)
    val scored = fitted.transform(test)
    val aggScored = test.join(
      broadcast(Models.hurdleForecast(train, Seq(col("k")), col("y"), Seq("k"))
        .select("k", "hurdle_forecast")), Seq("k"))

    val fittedMae = scored.agg(graft.metrics.Metrics.mae(col("y"), col("hurdle_fitted")))
      .as[Double].head()
    val aggMae = aggScored.agg(graft.metrics.Metrics.mae(col("y"), col("hurdle_forecast")))
      .as[Double].head()
    assert(fittedMae < aggMae,
      s"fitted hurdle MAE $fittedMae should beat aggregate hurdle MAE $aggMae")
    // sanity: probabilities are probabilities
    val p = Models.fitHurdle(train, Seq("x"), "y", maxIter = 5, maxDepth = 2)
      .classifier
    assert(p.numClasses == 2)
  }

  test("learned stacker recovers blend weights and beats every single base model") {
    // Truth is a fixed linear blend of two base predictors with noise;
    // the meta-fit happens on a LATER slice than the base "training"
    // (walk-forward discipline), scoring on the final holdout.
    val rng = new scala.util.Random(11)
    val rows = (1 to 600).map { i =>
      val p1 = rng.nextDouble() * 100
      val p2 = rng.nextDouble() * 100
      val y = 0.3 * p1 + 0.7 * p2 + rng.nextGaussian() * 0.5
      (i, p1, p2, y)
    }
    val df = rows.toDF("i", "p1", "p2", "y")
    val metaTrain = df.filter(col("i") <= 400)
    val holdout = df.filter(col("i") > 400)

    val stack = Models.fitStacker(metaTrain, Seq("p1", "p2"), "y")
    val w = stack.weights
    assert(math.abs(w("p1") - 0.3) < 0.05, s"w(p1)=${w("p1")}")
    assert(math.abs(w("p2") - 0.7) < 0.05, s"w(p2)=${w("p2")}")

    val scored = stack.transform(holdout)
    def wm(pred: String) = scored.agg(
      graft.metrics.Metrics.wmape(col("y"), col(pred))).as[Double].head()
    val stacked = wm("stacked")
    assert(stacked <= wm("p1") && stacked <= wm("p2"),
      s"stacked $stacked vs singles ${wm("p1")}, ${wm("p2")}")
  }

  test("blendSearch finds the WMAPE-optimal convex weights on the simplex grid") {
    // y == p2 exactly: the optimal corner is (0, 1); a coarse grid must
    // land there and report ~0 WMAPE.
    val df = (1 to 50).map { i => (i * 1.0 + 100, i * 3.0, i * 3.0) }
      .toDF("p1", "p2", "y")
    val (w, score) = Models.blendSearch(df, Seq("p1", "p2"), "y", step = 0.25)
    assert(w.toMap == Map("p1" -> 0.0, "p2" -> 1.0), w.toString)
    assert(score < 1e-6, s"score $score")
    // corners include the singles, so the search can never be worse
    // than the best single on its fit window
    val single = df.agg(graft.metrics.Metrics.wmape(col("y"), col("p1")))
      .as[Double].head()
    assert(score <= single)
  }

  test("hierarchical fallback: fine -> coarse -> global") {
    val stats = Seq(("p1", "s1", 10.0), ("p1", "s2", 20.0), ("p2", "s1", 50.0))
      .toDF("p", "s", "v")
    val apply = Seq(("p1", "s1"), ("p1", "s9"), ("p9", "s9")).toDF("p", "s")
    val out = Models.hierarchicalFallback(apply, stats, Seq("p", "s"), Seq("p"), col("v"))
      .select("p", "s", "fallback_forecast").as[(String, String, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(out(("p1", "s1")) == 10.0)           // fine hit
    assert(out(("p1", "s9")) == 15.0)           // coarse: mean of p1
    assert(math.abs(out(("p9", "s9")) - 80.0 / 3) < 1e-9) // global
  }

  test("KMeans clusters separable data") {
    val df = (1 to 30).map(i => (if (i % 2 == 0) 0.0 else 100.0) + i * 0.01)
      .map(x => Tuple1(x)).toDF("x")
    val out = Models.fitKMeans(df, Seq("x"), 2)
    assert(out.select("cluster").distinct().count() == 2)
  }

  test("ensemble meta-features and blend") {
    val df = Seq((10.0, 20.0, 30.0)).toDF("p1", "p2", "p3")
    val meta = Models.ensembleMetaFeatures(df, Seq("p1", "p2", "p3")).head()
    assert(meta.getAs[Double]("ens_mean") == 20.0)
    assert(meta.getAs[Double]("ens_range") == 20.0)
    assert(meta.getAs[Double]("ens_max_disagreement") == 20.0)
    val blended = Models.blend(df, Seq("p1" -> 1.0, "p2" -> 1.0)).head()
      .getAs[Double]("blended")
    assert(blended == 15.0) // normalized weights .5/.5
  }

  test("KPI ladder") {
    val df = Seq(5.0, 25.0, 50.0).toDF("m")
    val out = df.select(Models.kpiStatus(col("m")).as("s")).as[String].collect()
    assert(out.toSeq == Seq("OK", "WARN", "CRIT"))
  }

  test("feature quality scan flags constants and selectTopK keeps essentials") {
    val df = (1 to 50).map(i => (i.toDouble, 1.0, i * 3.0, i % 7 * 1.0))
      .toDF("target", "const", "good", "noise")
    val scan = FeatureQuality.qualityScan(df, Seq("const", "good"))
      .select("feature", "is_constant").as[(String, Int)].collect().toMap
    assert(scan("const") == 1 && scan("good") == 0)
    val kept = FeatureQuality.selectTopK(df, Seq("const", "good", "noise"), "target",
      k = 1, essentials = Seq("target"))
    assert(kept.columns.contains("target"))
    assert(kept.columns.contains("good")) // highest |corr| with target
  }
}
