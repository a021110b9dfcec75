package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}

/** Entry points for graft's plan-level (optimizer-rule) machinery.
  *
  * Two ways to get the [[RangeJoinRewrite]] band-join binning:
  *
  *  - [[rewriteRangeJoin]] — scoped: rewrite ONE DataFrame's plan with
  *    an explicit bin size. Deterministic, no session state touched;
  *    the rewrite runs BEFORE the normal optimizer, so pushdown /
  *    pruning apply to the rewritten form. This is what library code
  *    should call.
  *  - [[install]] + `spark.conf.set("spark.graft.rangeJoin.binSize",
  *    <width>)` — session-wide: every naive band join in every query
  *    is rewritten at optimization time. The cluster-deployment path
  *    (equivalently `spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftPlans {

  /** Idempotently add the conf-gated rewrite to `spark`'s optimizer.
    * A no-op for every plan until `spark.graft.rangeJoin.binSize` is
    * set > 0. */
  def install(spark: SparkSession): Unit =
    GraftSqlBridge.addOptimizerRule(spark, ConfRangeJoinRewrite)

  /** Apply the band-join binning to this one plan with an explicit
    * `binSize` (pick it near the median interval width). Joins the
    * rule guards against (equi-keyed, broadcast-hinted, non-inner,
    * non-numeric) pass through unchanged; intervals spanning more than
    * `maxBinsPerInterval` bins stay on the naive plan in a fallback
    * union branch (see [[RangeJoinRewrite]]). */
  def rewriteRangeJoin(df: DataFrame, binSize: Double,
      maxBinsPerInterval: Long = RangeJoinRewrite.DefaultMaxBinsPerInterval): DataFrame =
    GraftSqlBridge.ofRows(df.sparkSession,
      RangeJoinRewrite(binSize, maxBinsPerInterval)(df.queryExecution.analyzed))
}
