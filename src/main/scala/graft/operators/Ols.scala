package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
