package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the points not dominated by any other
  * point, maximizing both dimensions — (x₁,y₁) dominates (x₂,y₂) when
  * x₁ ≥ x₂ ∧ y₁ ≥ y₂ with at least one strict. The standard
  * multi-objective shortlist query (e.g. parts maximizing volume AND
  * revenue).
  *
  * Scale shape: the naive formulation is an all-pairs dominance
  * anti-join (quadratic). This one collapses to the distinct-x grain
  * first (per x only the max-y point can survive — one partial-agg
  * hash aggregate over the fact), then a single running-max window over
  * distinct x values. That window is an inherent global sort of the
  * frontier's domain — O(|distinct x|) rows, range-sorted by Spark, not
  * O(rows); for a 100 TB fact with a bounded measure domain this is
  * thousands of rows, not billions.
  */
object Pareto {

  /** @return the frontier as (x, y) rows, x descending ⇒ y ascending. */
  def frontier2d(df: DataFrame, x: Column, y: Column): DataFrame = {
    val best = df.select(x.as("x"), y.as("y"))
      .groupBy(col("x")).agg(max(col("y")).as("y"))
    val prior = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    best.withColumn("__pm", max(col("y")).over(prior))
      .filter(col("__pm").isNull || col("y") > col("__pm"))
      .select(col("x"), col("y"))
  }

  /** Gini concentration coefficient per group over a non-negative
    * distribution (customer spend, item volume) — the inequality
    * summary next to HHI/top-N-share in the reference's concentration
    * features. Rank formulation over ascending values:
    * `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` (0 = equal, →1 = one unit
    * holds everything).
    *
    * Determinism: pass a PRE-ROUNDED value (float sums are
    * partial-agg-order dependent) and a tiebreaker completing a total
    * order, so both engines assign identical ranks.
    *
    * Scale shape: one ordered window + one aggregate, both on the
    * group key — two group-keyed exchanges at the distribution grain
    * (usually an upstream per-entity rollup, dimension-sized). */
  def gini(df: DataFrame, groupCols: Seq[String], value: Column,
           tie: Seq[Column]): DataFrame = {
    val keys = groupCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(value +: tie: _*)
    df.withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        graft.functions.Funcs.r(sum(value)).as("total"),
        sum(col("__i") * value).as("__ix"))
      .select(keys ++ Seq(col("n"), col("total"),
        graft.functions.Funcs.r(
          (lit(2.0) * col("__ix") - (col("n") + lit(1)) * col("total")) /
            (col("n") * col("total"))).as("gini")): _*)
  }
}
