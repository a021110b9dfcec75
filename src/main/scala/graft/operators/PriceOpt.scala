package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Constant-elasticity price optimization — fit `ln q = a + e·ln p`
  * per product from observed (price, quantity) pairs, then apply the
  * Lerner rule: for elastic demand (e < −1) the revenue-optimal price
  * over marginal cost c is `p* = c·e/(1+e)`. The optimization-side
  * companion to the elasticity classifier (A21/q18) and the
  * reference's price features (src/features/business_features_engine
  * .py:530 margin/turnover approximations).
  *
  * Determinism: the log transforms integerize to micro-units per row
  * (ln is libm; micro-longs make every downstream sum exact in any
  * partial-aggregation order — the q239 recipe), the OLS solves from
  * those exact sums, and the slope rounds BEFORE the elastic/inelastic
  * gate so the branch cannot flip cross-engine. One map-side-combined
  * aggregate per product plus a broadcast-friendly cost join upstream.
  * Products without price variation return a NULL elasticity and keep
  * their cost-based floor untouched.
  *
  * Overflow posture (100 TB): per-row products x·y of micro-lns reach
  * ~1e15 — safe in a long — but their per-key SUM grows ~1e15·rows and
  * would silently wrap BIGINT past ~1e4 rows/key, so the four sufficient
  * sums accumulate as decimal(38,0): exact, order-independent, and good
  * to ~1e22 rows/key before the 38-digit ceiling. The determinant
  * n·Sxx − Sx² stays inside decimal(38,0) up to ~1e9 rows/key at
  * micro-ln magnitudes (|x| ≤ ~3e7); past that Spark yields NULL rather
  * than a wrong sign. The oracle's HUGEINT sums match exactly.
  */
object PriceOpt {

  private def lnMicro(c: Column): Column =
    graft.expr.RoundHalfUpExpr.column(log(c) * 1e6).cast("long")

  /** @param price unit price column (> 0), @param qty demand (> 0),
    * @param cost per-row marginal cost (constant within a key).
    * @return per key: n, elasticity, cost, p_star (NULL when demand is
    *         inelastic or degenerate). */
  def optimalPrice(df: DataFrame, keys: Seq[String], price: Column,
                   qty: Column, cost: Column): DataFrame = {
    val pre = df.filter(price > 0 && qty > 0)
      .select(keys.map(col) ++ Seq(lnMicro(price).as("__x"),
        lnMicro(qty).as("__y"), cost.as("__c")): _*)
    val dec = "decimal(38,0)"
    val sums = pre.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), max(col("__c")).as("cost"),
        sum(col("__x").cast(dec)).as("__sx"), sum(col("__y").cast(dec)).as("__sy"),
        sum((col("__x").cast(dec) * col("__y"))).as("__sxy"),
        sum((col("__x").cast(dec) * col("__x"))).as("__sxx"))
    val det = col("n").cast(dec) * col("__sxx") - col("__sx") * col("__sx")
    val num = col("n").cast(dec) * col("__sxy") - col("__sx") * col("__sy")
    sums
      .withColumn("elasticity",
        when(det > 0, r(num.cast("double") / det.cast("double"))))
      .select(keys.map(col) ++ Seq(col("n"), col("elasticity"), col("cost"),
        when(col("elasticity") < -1,
          r(col("cost") * col("elasticity") / (lit(1.0) + col("elasticity"))))
          .as("p_star")): _*)
  }
}
