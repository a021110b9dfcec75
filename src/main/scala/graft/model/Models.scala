package graft.model

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressor, GBTRegressionModel}
import org.apache.spark.ml.classification.LogisticRegression
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

  /** M16 — KPI threshold ladder: metric value → OK / WARN / CRIT
    * (reference: src/validation/kpi_system.py:28-300; WMAPE 20/30). */
  def kpiStatus(metric: Column, warn: Double = 20.0, crit: Double = 30.0): Column =
    when(metric >= crit, "CRIT").when(metric >= warn, "WARN").otherwise("OK")
}
