package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Per-segment isotonic calibration (reference:
  * src/models/model_calibration.py IsotonicCalibrator — sklearn
  * IsotonicRegression): fit a monotone non-decreasing map from
  * prediction to observed outcome, the standard remedy for a model
  * that ranks well but is systematically mis-scaled.
  *
  * Instead of the sequential pool-adjacent-violators stack (driver
  * loop, un-oracle-able), the fit is computed on prediction-quantile
  * bins via the minimax characterization of isotonic regression:
  *
  *   fit_i = max_{j≤i} min_{k≥i} mean(y over bins j..k)
  *
  * which equals the PAV solution exactly on the binned data. Interval
  * means come from per-segment prefix sums, the max-min collapses via
  * one window + one aggregate over the B² bin pairs — all pure
  * relational ops, so the whole fit is one declarative plan with a
  * line-for-line SQL oracle (q215).
  *
  * Scale shape: everything shuffles on the segment key; the pair
  * blow-up is B² per segment (B = nBins, a constant ≤ ~64), never
  * data-sized. The ntile binning sorts each segment inside one
  * partition — segment cardinality should grow with the data (store /
  * product-family grain, the q111/q199 note); for a handful of global
  * segments over a 100 TB fact, pre-aggregate to (segment, pred)
  * grain first and pass the aggregate.
  */
object Isotonic {

  /** Calibration map at (segment, bin) grain: bin bounds, size, raw
    * bin mean, and the monotone `iso_fit`. `pred` must be
    * deterministic cross-engine (round a computed prediction with
    * [[graft.functions.Funcs.r]] first); `tieBreak` must totally
    * order rows within equal `pred` so the binning is reproducible. */
  def calibrationMap(df: DataFrame, segCols: Seq[String], pred: Column,
                     actual: Column, tieBreak: Seq[Column],
                     nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "need at least one bin")
    val seg = segCols.map(col)
    val bw = Window.partitionBy(seg: _*)
      .orderBy(pred.asc +: tieBreak.map(_.asc): _*)
    val binned = df
      .withColumn("__bin", ntile(nBins).over(bw).cast("long"))
      .withColumn("__p", pred.cast("double"))
      .withColumn("__a", actual.cast("double"))
    val binAgg = binned.groupBy(seg :+ col("__bin"): _*)
      .agg(count(lit(1)).cast("double").as("__n"),
        r(sum(col("__a"))).as("__sy"),
        min(col("__p")).as("pred_lo"),
        max(col("__p")).as("pred_hi"),
        r(avg(col("__a"))).as("bin_mean"))
    val pw = Window.partitionBy(seg: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = binAgg
      .withColumn("__cn", sum(col("__n")).over(pw))
      .withColumn("__cy", sum(col("__sy")).over(pw))
    val jSide = pre.select(seg ++ Seq(col("__bin").as("__j"),
      (col("__cn") - col("__n")).as("__pn"),
      (col("__cy") - col("__sy")).as("__py")): _*)
    val kSide = pre.select(seg ++ Seq(col("__bin").as("__k"),
      col("__cn").as("__cnk"), col("__cy").as("__cyk")): _*)
    val pairs = jSide.join(kSide, segCols).filter(col("__j") <= col("__k"))
      .withColumn("__mean",
        (col("__cyk") - col("__py")) / (col("__cnk") - col("__pn")))
    // rmin(j,k) = min over k'≥k of mean(j..k'): right-to-left running min
    val rw = Window.partitionBy(seg :+ col("__j"): _*).orderBy(col("__k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = pairs.withColumn("__rmin", min(col("__mean")).over(rw))
      // every pair row with k=i has j≤i, so max over the group IS max_{j≤i}
      .groupBy(seg :+ col("__k").as("__bin"): _*)
      .agg(r(max(col("__rmin"))).as("iso_fit"))
    binAgg.join(fit, segCols :+ "__bin")
      .select(seg ++ Seq(col("__bin").as("bin"), col("pred_lo"), col("pred_hi"),
        col("__n").cast("long").as("n_rows"), col("bin_mean"),
        col("iso_fit")): _*)
  }
}
