package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Offline changepoint detection — the binary-segmentation primitive
  * behind the reference's automatic trend-changepoint handling
  * (src/models/prophet_seasonal.py:383-385 lets Prophet place up to 25
  * changepoints; src/models/arima_temporal.py differences for
  * stationarity around the same breaks): for each series, the single
  * split minimizing total within-segment squared error. One pass of
  * binary segmentation is the exact building block PELT/BinSeg iterate;
  * emitting the best split plus its gain lets a caller recurse on the
  * halves or gate on `gain` (a changepoint "exists" when the SSE drop
  * clears a penalty).
  *
  * Fully relational: per-series prefix sums of `v` and `v²` via one
  * ordered window, candidate cost from the closed form
  * `SSE(a..b) = Σv² − (Σv)²/n`, argmin via `row_number`. ONE shuffle on
  * the series key; the pick window reuses the same partitioning (no
  * second exchange). No collect, no iteration — scales as a single
  * window stage at any series count.
  *
  * Determinism: integer-valued measures make the prefix sums exact; the
  * candidate cost is [[r]]-rounded BEFORE the argmin ordering and ties
  * break on the earliest position, so both engines pick the same split
  * even when two candidates round equal.
  */
object Changepoint {

  /** Best single split per series. Input must be one row per
    * (keys, order) point. Returns one row per series with ≥2 points:
    * split position (last point of the left segment), both segment
    * means, the no-split SSE, the best split SSE, and the gain. */
  def bestSplit(df: DataFrame, keys: Seq[String], order: Column,
                value: String): DataFrame = {
    val keyCols = keys.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val v = col(value)
    val cand = df
      .withColumn("__i", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(order)))
      .withColumn("__cs", sum(v).over(wCum))
      .withColumn("__css", sum(v * v).over(wCum))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(v).over(wAll))
      .withColumn("__ss", sum(v * v).over(wAll))
      .filter(col("__i") < col("__n"))
      .withColumn("__sse_l",
        col("__css") - col("__cs") * col("__cs") / col("__i"))
      .withColumn("__sse_r",
        (col("__ss") - col("__css")) -
          (col("__s") - col("__cs")) * (col("__s") - col("__cs"))
            / (col("__n") - col("__i")))
      .withColumn("__cost", r(col("__sse_l") + col("__sse_r")))
    val pick = Window.partitionBy(keyCols: _*)
      .orderBy(col("__cost"), col("__i"))
    cand
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(keyCols ++ Seq(
        order.as("cp_at"),
        col("__i").cast("long").as("n_left"),
        col("__n").as("n_points"),
        r(col("__cs") / col("__i")).as("mean_left"),
        r((col("__s") - col("__cs")) / (col("__n") - col("__i")))
          .as("mean_right"),
        r(col("__ss") - col("__s") * col("__s") / col("__n"))
          .as("sse_total"),
        col("__cost").as("sse_split"),
        r((col("__ss") - col("__s") * col("__s") / col("__n")) -
          col("__cost")).as("gain")): _*)
  }
}
