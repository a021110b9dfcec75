package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M17 — submission format validator
  * (reference: scripts/submissions/validate_submission.py:63-266):
  * schema, week ∈ [1,5], non-negative integer quantities, no nulls, no
  * duplicate (week, store, product) keys, plus distribution stats.
  * ONE aggregation pass over the submission frame produces the report;
  * `isValid` reduces it to a boolean.
  */
object SubmissionValidator {

  val RequiredColumns: Seq[String] = Seq("semana", "pdv", "produto", "quantidade")

  /** Violation-count report as a 1-row DataFrame. */
  def report(df: DataFrame, week: Column = col("semana"), store: Column = col("pdv"),
             product: Column = col("produto"), qty: Column = col("quantidade")): DataFrame = {
    val dupes = df.groupBy(week.as("w"), store.as("s"), product.as("p"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("dup_rows"))
    df.agg(
      count(lit(1)).as("total_rows"),
      sum(when(week.isNull || store.isNull || product.isNull || qty.isNull, 1L)
        .otherwise(0L)).as("null_rows"),
      sum(when(week < 1 || week > 5, 1L).otherwise(0L)).as("bad_week_rows"),
      sum(when(qty < 0, 1L).otherwise(0L)).as("negative_qty_rows"),
      sum(when(qty =!= qty.cast("long"), 1L).otherwise(0L)).as("non_integer_rows"),
      countDistinct(week).as("n_weeks"),
      countDistinct(store).as("n_stores"),
      countDistinct(product).as("n_products"),
      min(qty).as("qty_min"), max(qty).as("qty_max"),
      avg(qty).as("qty_mean"))
      .crossJoin(broadcast(dupes))
  }

  /** Hard gate: schema present and every violation count zero. */
  def isValid(df: DataFrame): Boolean = {
    if (!RequiredColumns.forall(df.columns.contains)) return false
    val r = report(df).select("null_rows", "bad_week_rows", "negative_qty_rows",
      "non_integer_rows", "dup_rows").head()
    (0 until r.length).forall(i => r.getLong(i) == 0L)
  }
}
