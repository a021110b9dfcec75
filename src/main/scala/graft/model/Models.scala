package graft.model

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.regression.{GBTRegressor, GBTRegressionModel, LinearRegression, LinearRegressionModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML-layer boundary operators M7-M9, M11-M12 (SURVEY §2.9). The engine
  * scope is the data-processing side: feature assembly, model
  * composition, ensemble meta-features and blending. Fitting delegates
  * to Spark MLlib (GBTRegressor replaces the reference's LightGBM —
  * SURVEY's accepted divergence; WMAPE stays the selection metric).
  */
object Models {

  /** M9 — GBT regression baseline: assemble features → fit. */
  def fitGbt(train: DataFrame, features: Seq[String], target: String,
             maxIter: Int = 20, maxDepth: Int = 5, seed: Long = 42L): GBTRegressionModel = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .setHandleInvalid("keep")
      .transform(train)
    new GBTRegressor()
      .setFeaturesCol("__features").setLabelCol(target)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assembled)
  }

  /** M9 (WMAPE-objective leg) — the reference trains LightGBM with a
    * custom WMAPE objective whose gradient is sign(resid)/Σ|y| and a
    * constant hessian (src/models/lightgbm_master.py:43-97). Σ|y| is a
    * constant over the training set, so that gradient is exactly the
    * L1 (absolute-loss) gradient uniformly scaled — the same
    * minimizer and the same tree-split ordering. MLlib's GBTRegressor
    * exposes that objective as lossType="absolute", which closes the
    * previously-documented divergence without custom loss plumbing:
    * WMAPE-optimal boosting fits conditional medians, not means.
    */
  def fitGbtWmape(train: DataFrame, features: Seq[String], target: String,
                  maxIter: Int = 20, maxDepth: Int = 5, seed: Long = 42L): GBTRegressionModel = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .setHandleInvalid("keep")
      .transform(train)
    new GBTRegressor()
      .setFeaturesCol("__features").setLabelCol(target)
      .setLossType("absolute")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assembled)
  }

  def predictGbt(model: GBTRegressionModel, df: DataFrame, features: Seq[String],
                 outCol: String = "prediction"): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .setHandleInvalid("keep")
      .transform(df)
    model.setPredictionCol(outCol).transform(assembled).drop("__features")
  }

  /** M7 — statistical hurdle forecast: P(demand > 0) × E[demand | > 0]
    * per key, broadcast back. The aggregate version of the reference's
    * classifier × conditional-regressor composition
    * (intermittent_demand.py:177-375) — same semantics at the key
    * grain, no iterative fit. */
  def hurdleForecast(df: DataFrame, key: Seq[Column], value: Column,
                     outNames: Seq[String]): DataFrame =
    df.groupBy(key: _*)
      .agg(
        avg(when(value > 0, 1.0).otherwise(0.0)).as("p_nonzero"),
        avg(when(value > 0, value)).as("nz_mean"),
        count(lit(1)).as("n_obs"))
      .withColumn("hurdle_forecast",
        col("p_nonzero") * coalesce(col("nz_mean"), lit(0.0)))

  /** M7 (fitted leg) — the reference's actual hurdle composition: a
    * LogisticRegression classifier for P(y > 0 | x) × a regressor fit on
    * the NONZERO rows only for E[y | y > 0, x]; the forecast is the
    * product (reference: src/models/intermittent_demand.py:177-375).
    * Unlike the aggregate `hurdleForecast` (one number per key), both
    * legs condition on the feature vector, so the forecast varies
    * within a key. Fitting is two MLlib passes; scoring is two
    * transforms — no extra shuffle beyond MLlib's own. */
  final case class HurdleModel(classifier: LogisticRegressionModel,
                               regressor: GBTRegressionModel,
                               features: Seq[String]) {
    /** Score: P(y>0) from the classifier's probability vector ×
      * conditional size from the regressor. */
    def transform(df: DataFrame, outCol: String = "hurdle_fitted"): DataFrame = {
      val assembled = new VectorAssembler()
        .setInputCols(features.toArray).setOutputCol("__features")
        .setHandleInvalid("keep")
        .transform(df)
      val withP = classifier.setProbabilityCol("__prob")
        .setPredictionCol("__clf_pred").setRawPredictionCol("__raw")
        .transform(assembled)
        .withColumn("__p_nonzero", vector_to_array(col("__prob")).getItem(1))
        .drop("__prob", "__clf_pred", "__raw")
      regressor.setPredictionCol("__nz_pred").transform(withP)
        .withColumn(outCol, col("__p_nonzero") * greatest(col("__nz_pred"), lit(0.0)))
        .drop("__features", "__p_nonzero", "__nz_pred")
    }
  }

  /** Fit the two hurdle legs. The classifier sees every row (label =
    * y > 0); the regressor sees only rows with y > 0 — the conditional
    * distribution, exactly the reference's split. */
  def fitHurdle(train: DataFrame, features: Seq[String], target: String,
                maxIter: Int = 20, maxDepth: Int = 5, seed: Long = 42L): HurdleModel = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .setHandleInvalid("keep")
      .transform(train)
      .withColumn("__nonzero", (col(target) > 0).cast("double"))
    val clf = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__nonzero")
      .setMaxIter(50)
      .fit(assembled)
    val reg = new GBTRegressor()
      .setFeaturesCol("__features").setLabelCol(target)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assembled.filter(col(target) > 0))
    HurdleModel(clf, reg, features)
  }

  /** M8 — hierarchical cold-start fallback: per-pair mean, falling back
    * to the item mean, then the global mean (cold_start_solutions.py:
    * 472-488 cube-style fallback averages). All levels are broadcast
    * dim-sized aggs; the fact is never reshuffled. */
  def hierarchicalFallback(df: DataFrame, statsFrom: DataFrame,
                           fineKey: Seq[String], coarseKey: Seq[String],
                           value: Column): DataFrame = {
    val fine = statsFrom.groupBy(fineKey.map(col): _*).agg(avg(value).as("__fine"))
    val coarse = statsFrom.groupBy(coarseKey.map(col): _*).agg(avg(value).as("__coarse"))
    val global = statsFrom.agg(avg(value).as("__global"))
    df.join(broadcast(fine), fineKey, "left")
      .join(broadcast(coarse), coarseKey, "left")
      .join(broadcast(global))
      .withColumn("fallback_forecast",
        coalesce(col("__fine"), col("__coarse"), col("__global")))
      .drop("__fine", "__coarse", "__global")
  }

  /** M8 (clustering leg) — KMeans over assembled feature columns. */
  def fitKMeans(df: DataFrame, features: Seq[String], k: Int, seed: Long = 42L): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("__features")
      .setHandleInvalid("skip")
      .transform(df)
    new KMeans().setK(k).setSeed(seed).setFeaturesCol("__features")
      .setPredictionCol("cluster")
      .fit(assembled).transform(assembled).drop("__features")
  }

  /** M11 — ensemble meta-features over K prediction columns: per-row
    * mean/std/min/max/range and max pairwise absolute disagreement
    * (advanced_ensemble.py:121-204) — pure array expressions. */
  def ensembleMetaFeatures(df: DataFrame, predCols: Seq[String]): DataFrame = {
    val arr = array(predCols.map(col): _*)
    val n = predCols.size
    val mean = aggregate(arr, lit(0.0), (acc, x) => acc + x) / lit(n)
    val pairs = for {
      (a, i) <- predCols.zipWithIndex
      b <- predCols.drop(i + 1)
    } yield abs(col(a) - col(b))
    df.withColumn("ens_mean", mean)
      .withColumn("ens_min", array_min(arr))
      .withColumn("ens_max", array_max(arr))
      .withColumn("ens_range", array_max(arr) - array_min(arr))
      .withColumn("ens_std",
        sqrt(aggregate(arr, lit(0.0), (acc, x) => acc + (x - mean) * (x - mean)) / lit(n)))
      .withColumn("ens_max_disagreement",
        if (pairs.isEmpty) lit(0.0) else greatest(pairs.head +: pairs.tail: _*))
  }

  /** M12 — weighted blend of prediction columns (the stacking layer's
    * deterministic half; learned meta-weights would come from a fit on
    * the meta-features). Weights are normalized to sum 1. */
  def blend(df: DataFrame, weighted: Seq[(String, Double)], outCol: String = "blended"): DataFrame = {
    val total = weighted.map(_._2).sum
    val expr = weighted.map { case (c, w) => col(c) * lit(w / total) }.reduce(_ + _)
    df.withColumn(outCol, expr)
  }

  /** M12 (learned leg) — stacking meta-model: fit linear meta-weights
    * on the base models' predictions (optionally + ensemble
    * meta-features) against the actual, on a held-out fold the base
    * models did NOT train on (walk-forward, so the meta-fit never sees
    * leaked residuals). The reference's dynamic-weighting ensemble
    * (advanced_ensemble.py:204-660) reduced to its data-engine core:
    * assemble → one MLlib linear fit → a scoring transform. */
  final case class StackModel(lr: LinearRegressionModel, inputCols: Seq[String]) {
    /** Learned weight per input column (plus intercept) — the
      * interpretable summary the reference logs per ensemble round. */
    def weights: Map[String, Double] =
      inputCols.zip(lr.coefficients.toArray).toMap + ("__intercept" -> lr.intercept)

    def transform(df: DataFrame, outCol: String = "stacked"): DataFrame = {
      val assembled = new VectorAssembler()
        .setInputCols(inputCols.toArray).setOutputCol("__meta_features")
        .setHandleInvalid("keep")
        .transform(df)
      lr.setPredictionCol(outCol).transform(assembled).drop("__meta_features")
    }
  }

  /** Fit the stacking meta-model on a meta-fold: `metaTrain` must be a
    * slice where base predictions exist and the target is known, and
    * that postdates every base model's training window. L2
    * regularization keeps near-collinear base predictions (ensembles
    * correlate!) from exploding the weights. */
  def fitStacker(metaTrain: DataFrame, predCols: Seq[String], target: String,
                 regParam: Double = 1e-4): StackModel = {
    val assembled = new VectorAssembler()
      .setInputCols(predCols.toArray).setOutputCol("__meta_features")
      .setHandleInvalid("keep")
      .transform(metaTrain)
    val lr = new LinearRegression()
      .setFeaturesCol("__meta_features").setLabelCol(target)
      .setRegParam(regParam).setElasticNetParam(0.0)
      .fit(assembled)
    StackModel(lr, predCols)
  }

  /** M12 (searched leg) — WMAPE-optimal convex blend: enumerate weight
    * vectors on a simplex grid (weights ≥ 0, Σ = 1) and score EVERY
    * candidate in ONE distributed pass — each candidate is a single
    * aggregate expression, so a 15-candidate search costs one scan.
    * This optimizes the business metric directly (the reference's
    * dynamic weighting, advanced_ensemble.py:204-660, tunes on WMAPE,
    * not MSE), and convexity keeps the blend robust to level shift
    * between the validation window and serving — unlike unconstrained
    * OLS stacking, it can never do worse on its fit window than the
    * best single model (the corners of the simplex ARE the singles).
    * Returns (weights per column, fit-window WMAPE). */
  def blendSearch(df: DataFrame, predCols: Seq[String], target: String,
                  step: Double = 0.25): (Seq[(String, Double)], Double) = {
    require(predCols.nonEmpty && step > 0 && step <= 1.0)
    val parts = math.round(1.0 / step).toInt
    def simplex(k: Int, remaining: Int): Seq[Seq[Int]] =
      if (k == 1) Seq(Seq(remaining))
      else (0 to remaining).flatMap(i => simplex(k - 1, remaining - i).map(i +: _))
    val grids = simplex(predCols.size, parts).map(_.map(_.toDouble / parts))
    val aggs = grids.zipWithIndex.map { case (w, i) =>
      val blended = predCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }.reduce(_ + _)
      graft.metrics.Metrics.wmape(col(target), blended).as(s"__w$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val scores = grids.indices.map(i => row.getDouble(i))
    val best = scores.indices.minBy(scores)
    (predCols.zip(grids(best)), scores(best))
  }

  /** M16 — KPI threshold ladder: metric value → OK / WARN / CRIT
    * (reference: src/validation/kpi_system.py:28-300; WMAPE 20/30). */
  def kpiStatus(metric: Column, warn: Double = 20.0, crit: Double = 30.0): Column =
    when(metric >= crit, "CRIT").when(metric >= warn, "WARN").otherwise("OK")
}
