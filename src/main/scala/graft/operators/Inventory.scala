package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Inventory-planning aggregates — the order-policy numbers the
  * reference's constraint manager consumes (src/models/
  * business_rules.py:71-120 applies MOQ/capacity to predictions; this
  * computes the upstream policy): per series, demand mean/volatility
  * over the history and the standard normal-approximation safety
  * stock `z·σ·√L` with the order-up-to level `μ·L + z·σ·√L` for a
  * review period of `leadPeriods`.
  *
  * Determinism: σ comes from exact sufficient sums (integer-valued
  * demand) and rounds BEFORE the policy arithmetic; `z` and `√L` are
  * driver-side literals embedded identically in both engines (the
  * literal-constant recipe). One map-side-combined aggregate per
  * series — no windows, no joins.
  */
object Inventory {

  /** @param z service-level z-score (e.g. 1.645 for 95%). */
  def safetyStock(df: DataFrame, keys: Seq[String], value: String,
                  z: Double, leadPeriods: Int): DataFrame = {
    require(leadPeriods >= 1, "lead time must be at least one period")
    val sqrtL = math.sqrt(leadPeriods.toDouble)
    val v = col(value)
    val agg = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(v).as("__s"), sum(v * v).as("__ss"))
      .withColumn("mu", r(col("__s") / col("n")))
      .withColumn("sigma", when(col("n") > 1,
        r(sqrt((col("__ss") - col("__s") * col("__s") / col("n"))
          / (col("n") - lit(1))))).otherwise(lit(0.0)))
    agg.select(keys.map(col) ++ Seq(col("n"), col("mu"), col("sigma"),
      r(lit(z) * col("sigma") * lit(sqrtL)).as("safety_stock"),
      r(col("mu") * lit(leadPeriods.toDouble) +
        lit(z) * col("sigma") * lit(sqrtL)).as("order_up_to")): _*)
  }
}
