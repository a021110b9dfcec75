package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into two `private[sql]` seams graft's plan-level
  * machinery needs (the standard technique for libraries shipping
  * Catalyst rules — same-package access, no reflection):
  *
  *  - building a `DataFrame` from a rewritten `LogicalPlan`
  *    (`Dataset.ofRows`), for per-plan scoped rule application;
  *  - appending to a session's experimental optimizer rules, for
  *    session-wide conf-gated installation.
  *
  * Everything else in graft stays on the public DataFrame/Catalyst
  * API; keep this file to these two hooks.
  */
object GraftSqlBridge {

  /** Wrap an analyzed/rewritten logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently append `rule` to the session's user-provided
    * optimizer batch (runs to fixed point after the main optimizer). */
  def addOptimizerRule(spark: SparkSession, rule: Rule[LogicalPlan]): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }

  /** Idempotently append a planner strategy (tried before the built-in
    * strategies), so custom logical nodes reach their physical form. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
