package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** The M-competition baseline forecast suite — naive (last value),
  * seasonal naive (same phase one period back), drift (last value plus
  * the average historical increment), and the in-sample mean — h steps
  * ahead per series, side by side. Every serious forecast evaluation
  * anchors on these (a model that cannot beat snaive/drift is noise;
  * the reference falls back to exactly these — category/regional/global
  * mean predictions in src/models/cold_start_solutions.py:473-484, a
  * fixed-parameter model in src/models/arima_temporal.py:333-336), and
  * MASE (q210) scales by exactly the naive error this suite produces.
  *
  * Fully relational: one ordered window indexes each series, one
  * aggregate collapses it to (first, last, mean, n), the h steps
  * explode map-side, and the seasonal lookup is ONE keyed join back to
  * the indexed frame (left — series shorter than the period fall back
  * to naive). Two series-key shuffles plus a dimension-sized join; no
  * recursion, no state.
  */
object Baselines {

  /** @return one row per (series, step 1..h):
    *         naive_fc, snaive_fc, drift_fc, mean_fc. */
  def forecasts(df: DataFrame, keys: Seq[String], ord: Column, value: String,
                h: Int, period: Int): DataFrame = {
    require(h >= 1 && period >= 1, "h and period must be positive")
    val keyCols = keys.map(col)
    val v = col(value)
    // the indexed series feeds BOTH the per-series collapse and the
    // seasonal-lookup join — persist spill-to-disk for the reuse (one
    // upstream scan), release once the (series × h) result is pinned
    val idx = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(ord)).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCols: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = idx.groupBy(keyCols: _*)
      .agg(max(col("__n")).as("__n"),
        max(when(col("__rn") === 1, v)).as("__first"),
        max(when(col("__rn") === col("__n"), v)).as("__last"),
        r(avg(v)).as("mean_fc"))
    val steps = per
      .withColumn("step", explode(array((1 to h).map(lit(_)): _*)))
      .withColumn("__target",
        col("__n") - period + (col("step") - 1) % period + 1)
    val hist = idx.select(keyCols ++
      Seq(col("__rn").as("__target"), v.as("__sv")): _*)
    val out = steps
      .join(hist, keys :+ "__target", "left")
      .select(keyCols ++ Seq(col("step"),
        col("__last").as("naive_fc"),
        coalesce(col("__sv"), col("__last")).as("snaive_fc"),
        when(col("__n") > 1,
          r(col("__last") + col("step") * (col("__last") - col("__first"))
            / (col("__n") - lit(1))))
          .otherwise(col("__last")).as("drift_fc"),
        col("mean_fc")): _*)
      .localCheckpoint(true)
    idx.unpersist(blocking = false)
    out
  }

  /** Seasonal naive with a PER-SERIES period — the composition of
    * [[graft.operators.Decompose.dominantPeriod]] with the snaive
    * baseline: each series wraps at its own detected period instead of
    * one hardcoded seasonality. `periods` carries one row per series
    * (`keys` + `periodCol`); series missing from it drop (inner join —
    * detection ran on the same spine). Same two-shuffle shape as
    * [[forecasts]] plus one keyed join against the (dimension-sized)
    * period table.
    *
    * @return (keys, step 1..h, period, snaive_fc) */
  def seasonalNaiveAdaptive(df: DataFrame, keys: Seq[String], ord: Column,
                            value: String, periods: DataFrame,
                            periodCol: String, h: Int): DataFrame = {
    require(h >= 1, "h must be positive")
    val keyCols = keys.map(col)
    val v = col(value)
    val idx = df
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(ord)).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(keyCols: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = idx.groupBy(keyCols: _*)
      .agg(max(col("__n")).as("__n"),
        max(when(col("__rn") === col("__n"), v)).as("__last"))
    val steps = per
      .join(periods.select(keyCols :+ col(periodCol).as("period"): _*),
        keys)
      .withColumn("step", explode(array((1 to h).map(lit(_)): _*)))
      .withColumn("__target",
        col("__n") - col("period") + (col("step") - 1) % col("period") + 1)
    val hist = idx.select(keyCols ++
      Seq(col("__rn").as("__target"), v.as("__sv")): _*)
    val out = steps
      .join(hist, keys :+ "__target", "left")
      .select(keyCols ++ Seq(col("step"), col("period"),
        coalesce(col("__sv"), col("__last")).as("snaive_fc")): _*)
      .localCheckpoint(true)
    idx.unpersist(blocking = false)
    out
  }
}
