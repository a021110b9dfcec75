package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** ABC/XYZ inventory classification — the canonical retail assortment
  * segmentation the reference's business layer sorts SKUs into
  * (volume-tier + dominance queries are its neighbors; SURVEY A12/A11):
  *  - ABC: Pareto classes by cumulative revenue share (A ≤ 80%,
  *    B ≤ 95%, C rest), ordered revenue-desc with an id tie-break;
  *  - XYZ: demand-stability classes by the coefficient of variation of
  *    per-period demand (X < 0.5, Y < 1.0, Z rest — the usual cutoffs).
  *
  * Scale shape: one aggregate collapses (key, period) demand to the key
  * grain with exact integer sufficient sums (n, Σq, Σq²); the
  * cumulative-share window runs on the KEY grain (assortment size, not
  * fact size). Both classed quantities are rounded to 4 decimals
  * BEFORE the threshold comparison so class boundaries cannot flip on
  * summation-order ulps.
  */
object Abc {

  /** @param perPeriod one row per (key, period) with demand + revenue. */
  def abcXyz(perPeriod: DataFrame, keyCol: String, qty: Column,
             revenue: Column): DataFrame = {
    val perKey = perPeriod.groupBy(col(keyCol)).agg(
      sum(revenue).as("rev"),
      count(lit(1)).cast("double").as("__n"),
      sum(qty).as("__sq"), sum(qty * qty).as("__sqq"))
    val byRev = Window.orderBy(col("rev").desc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cv = when(col("__n") > 1 && col("__sq") > 0,
      sqrt((col("__n") * col("__sqq") - col("__sq") * col("__sq")) /
        (col("__n") * (col("__n") - 1))) / (col("__sq") / col("__n")))
    perKey
      .withColumn("cum_share", Funcs.r(sum(col("rev")).over(byRev) / sum(col("rev")).over(total)))
      .withColumn("abc_class", when(col("cum_share") <= 0.8, "A")
        .when(col("cum_share") <= 0.95, "B").otherwise("C"))
      .withColumn("cv", Funcs.r(cv))
      .withColumn("xyz_class", when(col("cv").isNull, "Z")
        .when(col("cv") < 0.5, "X").when(col("cv") < 1.0, "Y").otherwise("Z"))
      .select(col(keyCol), Funcs.r(col("rev")).as("rev"), col("cum_share"),
        col("abc_class"), col("cv"), col("xyz_class"))
  }
}
