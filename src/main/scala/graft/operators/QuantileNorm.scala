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
  * group key; the reference is ranked WITHOUT a single-partition sort —
  * range-partition on the value, rank within each range partition, and
  * add the cumulative row count of the preceding partitions (a window
  * over the ≤-numShufflePartitions-row partition-count aggregate). The
  * reference row count feeds in as a 1-row aggregate cross join, so
  * building the plan triggers no driver-side action. The rank-lookup
  * joins carry NO broadcast hint — the optimizer broadcasts a small
  * reference on its own size estimate and falls back to a shuffle join
  * when it doesn't fit. A fact-sized reference therefore degrades to
  * two shuffle joins on integer rank keys, never an executor-OOM
  * broadcast or a one-partition global sort. [[sketchReference]]
  * remains the cheaper option when an approximate grid is acceptable.
  */
object QuantileNorm {

  /** Bounded reference for [[normalize]] at scale: the population's
    * t-digest quantile grid (nPoints values, one distributed agg) —
    * feed this, not the raw fact, as `reference` when an approximate
    * grid is acceptable. */
  def sketchReference(population: DataFrame, value: Column,
                      nPoints: Int = 1001): DataFrame = {
    require(nPoints >= 2, "need at least 2 grid points")
    val qs = array((0 until nPoints).map(i =>
      lit(i.toDouble / (nPoints - 1))): _*)
    population
      .agg(percentile_approx(value.cast("double"), qs, lit(10000)).as("__qs"))
      .select(explode(col("__qs")).as("ref_value"))
  }

  /** Distributed dense 0-based rank of `__rv`: range-partition, rank
    * per partition, offset by preceding partitions' row counts. Ties
    * rank arbitrarily but map to equal values, so the rank→value lookup
    * is deterministic. Also returns the total count as a 1-row frame.
    * No single-partition sort, no driver action. */
  private def rankedByValue(ref: DataFrame): (DataFrame, DataFrame) = {
    val nPart = math.max(1,
      ref.sparkSession.sessionState.conf.numShufflePartitions)
    val parts = ref.repartitionByRange(nPart, col("__rv"))
      .withColumn("__pid", spark_partition_id())
    // partition-count grain is ≤ nPart rows — the un-partitioned window
    // below is bounded by the shuffle-partition setting, not the data
    val offs = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__pc"))
      .withColumn("__off", coalesce(sum(col("__pc")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val total = offs.agg(coalesce(sum(col("__pc")), lit(0L)).as("__nref"))
    val ranked = parts
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(col("__rv"))).cast("long"))
      .join(offs.select(col("__pid"), col("__off")), "__pid")
      .select((col("__off") + col("__rn") - 1).as("__ri"), col("__rv"))
    (ranked, total)
  }

  /** @param target    rows to normalize; all columns pass through.
    * @param reference one value per row — the target distribution
    *                 (must be non-empty; an empty reference yields an
    *                 empty result via the inner rank-lookup joins).
    * @return target + `outCol` (reference-distribution value at the
    *         row's within-group quantile). */
  def normalize(target: DataFrame, reference: DataFrame, refValue: Column,
                groupCols: Seq[String], value: Column, tieBreak: Seq[Column],
                outCol: String = "normalized"): DataFrame = {
    val ref = reference.select(refValue.cast("double").as("__rv"))
    val (refIdx, total) = rankedByValue(ref)
    val gw = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(value.asc +: tieBreak.map(_.asc): _*)
    val withPos = target
      .crossJoin(broadcast(total))
      .withColumn("__rt", row_number().over(gw).cast("long") - 1)
      .withColumn("__ng", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .withColumn("__pos", when(col("__ng") === 1, lit(0.0))
        .otherwise(col("__rt") * (col("__nref") - 1).cast("double") / (col("__ng") - 1)))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    withPos
      .join(refIdx.select(col("__ri").as("__lo"), col("__rv").as("__vlo")), "__lo")
      .join(refIdx.select(col("__ri").as("__hi"), col("__rv").as("__vhi")), "__hi")
      .withColumn(outCol, Funcs.r(col("__vlo")
        + (col("__pos") - col("__lo")) * (col("__vhi") - col("__vlo"))))
      .drop("__rt", "__ng", "__pos", "__lo", "__hi", "__vlo", "__vhi", "__nref")
  }
}
