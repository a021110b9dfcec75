package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2-style history compression: collapse consecutive observations of
  * the same attribute value (per key, in event order) into validity
  * ranges — the slowly-changing-dimension shape every warehouse merge
  * needs when ingesting snapshot feeds at scale.
  *
  * Gaps-and-islands on value CHANGE (the general form of W17's
  * zero-streaks, which islands on a fixed predicate): a change flag via
  * lag, a running change count as the island id, then one aggregate per
  * (key, island). Two windows and the aggregate all share the SAME
  * (key)-partitioned exchange, so the fact moves once.
  */
object Scd {

  /** @param ord   event-order column (unique per key for determinism).
    * @param attrs the tracked attribute columns; a range closes when ANY
    *              of them changes.
    * @return one row per (key, run): attrs + valid_from / valid_to
    *         (valid_to is the NEXT range's start — null for the current
    *         range, the half-open [from, to) convention) + n_obs. */
  def compressHistory(df: DataFrame, keyCols: Seq[String], ord: Column,
                      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty)
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(ord.asc)
    val changed = attrs.map(a =>
      !(col(a) <=> lag(col(a), 1).over(w))).reduce(_ || _)
    val runs = df
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val aggCols = attrs.map(a => first(col(a)).as(a)) ++
      Seq(min(ord).as("valid_from"), count(lit(1)).as("n_obs"))
    val ranges = runs.groupBy(key :+ col("__grp"): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val rw = Window.partitionBy(key: _*).orderBy(col("valid_from").asc)
    ranges
      .withColumn("valid_to", lead(col("valid_from"), 1).over(rw))
      .drop("__grp")
  }
}
