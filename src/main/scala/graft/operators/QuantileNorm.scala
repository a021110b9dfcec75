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
  * group key; the reference is indexed once by a global sort (the
  * reference should be a bounded sample / distinct-value table — at
  * 100 TB feed a fixed-size quantile sketch of the population as
  * `reference`, not the raw fact) and joined twice on INTEGER rank
  * keys (floor/ceil of the interpolated position) — equi-joins,
  * broadcast when the reference is small.
  */
object QuantileNorm {

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
      .join(broadcast(refIdx.select(col("__ri").as("__lo"), col("__rv").as("__vlo"))), "__lo")
      .join(broadcast(refIdx.select(col("__ri").as("__hi"), col("__rv").as("__vhi"))), "__hi")
      .withColumn(outCol, Funcs.r(col("__vlo")
        + (col("__pos") - col("__lo")) * (col("__vhi") - col("__vlo"))))
      .drop("__rt", "__ng", "__pos", "__lo", "__hi", "__vlo", "__vhi")
  }
}
