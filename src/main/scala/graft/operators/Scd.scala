package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) interval construction from a
  * change log: collapse consecutive rows with identical attribute values
  * into validity intervals [effective_from, effective_to), the canonical
  * "latest attribute as of time T" structure a feature store joins
  * against (pairs with [[AsOfJoin]] for point-in-time-correct training
  * data — the leakage-free lookup the reference's validation split
  * protocol demands, reference: src/validation/temporal_validation.py).
  *
  * Scale shape (100 TB): ONE shuffle on the entity key; every window and
  * the segment groupBy reuse that same partitioning (key-prefixed keys),
  * so Catalyst plans a single exchange. Per-entity history is the only
  * sequential dimension — bounded per key, unbounded across keys.
  */
object Scd {

  /** Build SCD2 intervals. `orderCols` must be a deterministic total
    * order within each key (include a tiebreaker id). Each output row is
    * one constant-attribute run: key, attrs, effective_from (first order
    * value of the run), effective_to (start of the next run, NULL for the
    * current run), version (1-based run index), is_current. */
  def scd2(df: DataFrame, keyCols: Seq[String], orderCol: String,
           tieCol: String, attrCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(col(orderCol), col(tieCol))

    // change flag: first row of a key, or any attribute differing from
    // the previous row (null-safe) — cumulative sum numbers the runs
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val seg = df
      .withColumn("__chg", when(lag(col(tieCol), 1).over(w).isNull, 1)
        .otherwise(when(changed, 1).otherwise(0)))
      .withColumn("__seg", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // one row per run; attrs are constant within a run by construction
    val aggs = attrCols.map(a => first(col(a)).as(a)) :+
      min(col(orderCol)).as("effective_from")
    val runs = seg.groupBy((key :+ col("__seg")): _*)
      .agg(aggs.head, aggs.tail: _*)

    val wSeg = Window.partitionBy(key: _*).orderBy(col("__seg"))
    runs
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wSeg))
      .withColumn("version", col("__seg").cast("long"))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__seg")
  }
}
