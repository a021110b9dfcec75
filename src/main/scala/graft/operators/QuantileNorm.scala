package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Quantile normalization: map each group's value distribution onto a
  * reference distribution — the i-th ranked value of a group (of size
  * n_g) is replaced by the reference value at interpolated position
  * i·(n_ref−1)/(n_g−1). The standard batch-effect correction (making
  * every store's price/demand distribution comparable before pooled
  * model fitting).
  *
  * Scale shape: group ranks come from a window partitioned by the
  * group key; the reference is indexed once by a global sort and
  * joined twice on INTEGER rank keys (floor/ceil of the interpolated
  * position). The reference joins carry NO broadcast hint — the
  * optimizer broadcasts a small reference on its own size estimate and
  * falls back to a shuffle join when it doesn't fit, instead of an
  * executor-OOM forced broadcast. At 100 TB do not pass the raw fact:
  * [[sketchReference]] collapses any population to a bounded
  * equi-quantile grid, making the global reference sort O(nPoints).
  */
object QuantileNorm {

  /** Bounded reference for [[normalize]] at scale: the population's
    * t-digest quantile grid (nPoints values, one distributed agg) —
    * feed this, not the raw fact, as `reference` when the population
    * is fact-sized. */
  def sketchReference(population: DataFrame, value: Column,
                      nPoints: Int = 1001): DataFrame = {
    require(nPoints >= 2, "need at least 2 grid points")
    val qs = array((0 until nPoints).map(i =>
      lit(i.toDouble / (nPoints - 1))): _*)
    population
      .agg(percentile_approx(value.cast("double"), qs, lit(10000)).as("__qs"))
      .select(explode(col("__qs")).as("ref_value"))
  }

  /** @param target    rows to normalize; all columns pass through.
    * @param reference one value per row — the target distribution.
    * @return target + `outCol` (reference-distribution value at the
    *         row's within-group quantile). */
  def normalize(target: DataFrame, reference: DataFrame, refValue: Column,
                groupCols: Seq[String], value: Column, tieBreak: Seq[Column],
                outCol: String = "normalized"): DataFrame = {
    val ref = reference.select(refValue.cast("double").as("__rv"))
    val nRef = ref.count()
    require(nRef > 0, "empty reference")
    val refIdx = ref
      .withColumn("__ri", row_number().over(Window.orderBy(col("__rv"))).cast("long") - 1)
    val gw = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(value.asc +: tieBreak.map(_.asc): _*)
    val withPos = target
      .withColumn("__rt", row_number().over(gw).cast("long") - 1)
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .withColumn("__pos", when(col("__ng") === 1, lit(0.0))
        .otherwise(col("__rt") * lit((nRef - 1).toDouble) / (col("__ng") - 1)))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    withPos
      .join(refIdx.select(col("__ri").as("__lo"), col("__rv").as("__vlo")), "__lo")
      .join(refIdx.select(col("__ri").as("__hi"), col("__rv").as("__vhi")), "__hi")
      .withColumn(outCol, Funcs.r(col("__vlo")
        + (col("__pos") - col("__lo")) * (col("__vhi") - col("__vlo"))))
      .drop("__rt", "__ng", "__pos", "__lo", "__hi", "__vlo", "__vhi")
  }
}
