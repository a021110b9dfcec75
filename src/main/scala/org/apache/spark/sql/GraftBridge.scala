package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the private[sql] Expression↔Column conversions so graft
  * can register native Catalyst expressions (Spark 4 wraps Column
  * around ColumnNode; these are the sanctioned internal converters). */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
