package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Weighted order statistics — the weighted median (lower weighted
  * median: the smallest value whose cumulative weight reaches half the
  * total), the volume-weighted companion to the exact/t-digest
  * percentile family: "the price at which half the QUANTITY trades"
  * rather than "the median row". The reference aggregates the same
  * weighted views of price (src/features/behavioral_features_engine.py
  * weighted price aggregations).
  *
  * Determinism: weights must be integer-valued or pre-rounded (the
  * cumulative sum is order-dependent otherwise) and `tie` must
  * complete a total order within the group; both engines then walk an
  * identical prefix and pick the identical row.
  *
  * Scale shape: one ordered window for the running weight + one
  * group-key pick window reusing the same partitioning — two
  * group-keyed exchanges, no collect, no global sort.
  */
object WeightedStats {

  /** @return one row per group: weighted_median, total_weight, n_rows.
    * Delegates to [[weightedQuantiles]] at q = 0.5: `cw ≥ 0.5·tw` is an
    * exact IEEE power-of-two scaling, so it is bit-identical to the
    * classic `2·cw ≥ tw` form (property-tested in R7OpsBatch2Spec). */
  def weightedMedian(df: DataFrame, groupCols: Seq[String], value: Column,
                     weight: Column, tie: Seq[Column]): DataFrame =
    weightedQuantiles(df, groupCols, value, weight, tie, qs = Seq(0.5))
      .withColumnRenamed("weighted_quantile", "weighted_median")
      .drop("q")

  /** Generalized weighted quantiles: for each q in `qs` (0 < q < 1),
    * the smallest value whose cumulative weight reaches q·total — the
    * same lower-pick convention as [[weightedMedian]], which this
    * reproduces exactly at q = 0.5 (0.5·tw is an exact IEEE scaling,
    * so `cw ≥ 0.5·tw` ⟺ `2·cw ≥ tw`; property-tested).
    *
    * One row per (group, q). The cumulative-weight walk is computed
    * ONCE and shared across all requested quantiles via a literal-array
    * explode — adding quantiles costs no extra exchange; the only
    * windows are the same two group-keyed ones the median uses. */
  def weightedQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                        weight: Column, tie: Seq[Column],
                        qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q < 1),
      "quantiles must lie strictly inside (0, 1)")
    val keys = groupCols.map(col)
    val ord = Window.partitionBy(keys: _*).orderBy(value +: tie: _*)
    val cum = df
      .withColumn("__w", weight)
      .withColumn("__cw", sum(col("__w")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tw", sum(col("__w")).over(Window.partitionBy(keys: _*)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keys: _*)))
    // "__q" while working (an unprefixed "q" would shadow a same-named
    // input column referenced by value/weight/tie), aliased at output
    val pick = Window.partitionBy(keys :+ col("__q"): _*).orderBy(value +: tie: _*)
    cum.withColumn("__q", explode(array(qs.map(lit): _*)))
      .filter(col("__cw") >= col("__q") * col("__tw"))
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(keys ++ Seq(col("__q").as("q"), value.as("weighted_quantile"),
        Funcs.r(col("__tw")).as("total_weight"), col("__n").as("n_rows")): _*)
  }
}
