package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Split-conformal prediction intervals: per calibration group, the
  * α-quantile of absolute residuals becomes a symmetric interval
  * half-width around every prediction — distribution-free coverage
  * ≥ α under exchangeability, the standard way to put honest bands on
  * the reference's point forecasts (reference evaluates WMAPE point
  * accuracy only; intervals are the deployment-side companion).
  *
  * Scale shape: one key-partitioned aggregate computes the per-group
  * quantile (exact `percentile` or t-digest `percentile_approx` per
  * the engine-wide [[Funcs.ExactPercentilesConf]] — group sizes are
  * unbounded, so the 100 TB setting flips to the sketch), then the
  * tiny (group, width) table joins back broadcast.
  */
object Conformal {

  /** @param groupCols calibration grain (e.g. supplier): residuals pool
    *                  within a group; quantile per group.
    * @return input rows (pred non-null) + `conf_width`, `lo`, `hi`. */
  def splitConformal(df: DataFrame, groupCols: Seq[String], actual: Column,
                     pred: Column, alpha: Double = 0.9,
                     exact: Option[Boolean] = None): DataFrame = {
    val scored = df.filter(pred.isNotNull)
      .withColumn("__pred", pred).withColumn("__resid", abs(actual - pred))
    val widths = scored.groupBy(groupCols.map(col): _*)
      .agg(Funcs.pct(col("__resid"), alpha, exact).as("conf_width"))
    scored.join(broadcast(widths), groupCols)
      .withColumn("lo", col("__pred") - col("conf_width"))
      .withColumn("hi", col("__pred") + col("conf_width"))
      .drop("__resid")
  }
}
