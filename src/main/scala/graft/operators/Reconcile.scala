package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Hierarchical forecast reconciliation: make child-level and
  * parent-level forecasts coherent (children sum to parents) — the
  * standard closing step of a hierarchical retail forecast (reference
  * forecasts per (PDV, SKU) under category/store hierarchies;
  * submission-level coherence is the same problem).
  *
  * Two classical methods, both single-pass:
  *  - bottom-up: parent forecast := Σ child forecasts (one partial-agg
  *    hash aggregate on the parent key);
  *  - proportional top-down: child forecast := parent forecast ×
  *    historical child share (shares from one aggregate over actuals;
  *    the parent-total join rides broadcast — parent grain ≪ fact).
  */
object Reconcile {

  /** Parent forecasts from child forecasts (bottom-up coherence). */
  def bottomUp(childFc: DataFrame, parentCol: String, fc: Column): DataFrame =
    childFc.groupBy(col(parentCol)).agg(sum(fc).as("fc_parent"))

  /** Historical proportions: per (parent, child), the child's share of
    * the parent's actual total. Shares sum to 1 within each parent by
    * construction. */
  def shares(actuals: DataFrame, parentCol: String, childCol: String,
             measure: Column): DataFrame = {
    val child = actuals.groupBy(col(parentCol), col(childCol))
      .agg(sum(measure).as("__c"))
    val parent = child.groupBy(col(parentCol)).agg(sum(col("__c")).as("__p"))
    child.join(broadcast(parent), parentCol)
      .select(col(parentCol), col(childCol), (col("__c") / col("__p")).as("share"))
  }

  /** Disaggregate a parent-level forecast to children by historical
    * share. `parentFc` carries (parentCol, fcCol). */
  def topDown(parentFc: DataFrame, shareTable: DataFrame, parentCol: String,
              fcCol: String): DataFrame =
    shareTable.join(broadcast(parentFc), parentCol)
      .withColumn("fc_child", col(fcCol) * col("share"))

  /** One-call proportional top-down against a parent forecast derived
    * from actuals: parent total × `growth`, split by historical share.
    * Output is rounded for oracle-stable comparison. */
  def topDownFromActuals(actuals: DataFrame, parentCol: String, childCol: String,
                         measure: Column, growth: Double): DataFrame = {
    val s = shares(actuals, parentCol, childCol, measure)
    val pfc = actuals.groupBy(col(parentCol))
      .agg((sum(measure) * lit(growth)).as("fc_parent"))
    topDown(pfc, s, parentCol, "fc_parent")
      .select(col(parentCol), col(childCol), Funcs.r(col("share")).as("share"),
        Funcs.r(col("fc_child")).as("fc_child"))
  }
}
