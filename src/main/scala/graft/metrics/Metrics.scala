package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.Eps

/** Forecast-error metric family as reusable aggregate `Column`
  * expressions — one distributed agg, no UDAF needed
  * (reference: src/evaluation/metrics.py:12-217, SURVEY §2.4 A31-A34).
  *
  * All are plain expression aggregates → map-side partial aggregation,
  * single shuffle, whole-stage codegen. At 100 TB these reduce to one
  * pass over the scored table.
  */
object Metrics {

  /** WMAPE = Σ|a−p| / Σ|a| × 100 (reference: src/evaluation/metrics.py:12-57). */
  def wmape(actual: Column, pred: Column): Column =
    sum(abs(actual - pred)) / (sum(abs(actual)) + lit(Eps)) * lit(100.0)

  /** Volume-weighted WMAPE (reference: src/evaluation/metrics.py:159-180). */
  def weightedWmape(actual: Column, pred: Column, w: Column): Column =
    sum(abs(actual - pred) * w) / (sum(abs(actual) * w) + lit(Eps)) * lit(100.0)

  /** MAPE with ε-guard (reference: src/evaluation/metrics.py:59-77). */
  def mape(actual: Column, pred: Column): Column =
    avg(abs(actual - pred) / (abs(actual) + lit(Eps))) * lit(100.0)

  /** Symmetric MAPE (reference: src/evaluation/metrics.py:79-97). */
  def smape(actual: Column, pred: Column): Column =
    avg(abs(actual - pred) / ((abs(actual) + abs(pred)) / 2 + lit(Eps))) * lit(100.0)

  def mae(actual: Column, pred: Column): Column = avg(abs(actual - pred))

  def rmse(actual: Column, pred: Column): Column = sqrt(avg(pow(actual - pred, 2)))

  /** Mean signed error (bias) (reference: src/evaluation/metrics.py:99-126). */
  def bias(actual: Column, pred: Column): Column = avg(pred - actual)

  /** Per-group WMAPE table (reference `wmape_by_group`,
    * src/evaluation/metrics.py:128-157): one shuffle on the group key.
    */
  def wmapeByGroup(df: DataFrame, groupCols: Seq[String], actual: Column, pred: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(wmape(actual, pred).as("wmape"), count(lit(1)).as("n_rows"))

  /** MASE — mean absolute scaled error (the M-competition standard):
    * MAE of the forecast scaled by the in-sample one-step naive MAE, so
    * errors are comparable across series of different magnitude and a
    * value > 1 reads as "worse than the naive carry-forward". One
    * series-ordered window for the naive differences + one group
    * aggregate — both on the same key exchange.
    */
  def maseByGroup(df: DataFrame, groupCols: Seq[String], actual: Column,
                  pred: Column, ord: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Funcs.r
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord: _*)
    df.withColumn("__naive_err", abs(actual - lag(actual, 1).over(w)))
      .groupBy(groupCols.map(col): _*)
      .agg(avg(abs(actual - pred)).as("__mae"),
        avg(col("__naive_err")).as("__naive_mae"),
        count(lit(1)).as("n_rows"))
      .withColumn("mase", r(col("__mae") / (col("__naive_mae") + lit(Eps))))
      .select(groupCols.map(col) ++
        Seq(r(col("__mae")).as("mae"), r(col("__naive_mae")).as("naive_mae"),
          col("mase"), col("n_rows")): _*)
  }

  /** M15 — multi-dimensional error decomposition in ONE pass: the
    * reference runs a separate pandas groupby per dimension
    * (src/evaluation/error_analysis.py:89-610, analyze_temporal_patterns
    * :238-313); here every slice dimension becomes one GROUPING SETS
    * entry so the scored fact is scanned and shuffled once, then the
    * grouped rows melt to a tall (slice_type, slice_value) report.
    * `grouping()` (not null-ness) identifies each row's dimension, so
    * genuinely-null slice values stay unambiguous. Slice values are
    * stringified so heterogeneous dimensions (month number, volume
    * tier letter) stack in one frame.
    */
  def errorSlices(df: DataFrame, actual: Column, pred: Column,
                  slices: Seq[(String, Column)]): DataFrame = {
    import graft.functions.Funcs.r
    val names = slices.map(_._1)
    val pre = df.select(
      slices.map { case (n, c) => c.cast("string").as(n) } ++
        Seq(actual.as("__a"), pred.as("__p")): _*)
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      r(wmape(col("__a"), col("__p"))).as("wmape"),
      r(bias(col("__a"), col("__p"))).as("bias"),
      r(mae(col("__a"), col("__p"))).as("mae"),
      r(rmse(col("__a"), col("__p"))).as("rmse")) ++
      names.map(n => grouping(col(n)).as("__g_" + n))
    val grouped = pre
      .groupingSets(names.map(n => Seq(col(n))), names.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val sliceType = names.foldLeft(lit(null).cast("string")) { (acc, n) =>
      when(col("__g_" + n) === 0, lit(n)).otherwise(acc)
    }
    val sliceValue = names.foldLeft(lit(null).cast("string")) { (acc, n) =>
      when(col("__g_" + n) === 0, col(n)).otherwise(acc)
    }
    grouped.select(sliceType.as("slice_type"), sliceValue.as("slice_value"),
      col("n_rows"), col("wmape"), col("bias"), col("mae"), col("rmse"))
  }

  /** M15 (interaction leg) — cross-dimensional WMAPE matrix
    * (reference error_analysis.py:199-237 _cross_dimensional_analysis):
    * the (dim1 × dim2) WMAPE pivot plus the reference's best/worst
    * combination lists, emitted as rank columns (best_rank/worst_rank
    * 1..cells, deterministic dim tiebreak) so the top-5 lists are a
    * filter away and the full matrix stays in one frame. One
    * hash-aggregate to the cell grain + rank windows over the cells.
    * WMAPE from exact micro-int sums of 4dp-rounded inputs. */
  def crossDimensionalWmape(df: DataFrame, dim1: Column, dim2: Column,
                            actual: Column, pred: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Funcs.{microSum, r}
    val g = df.select(dim1.cast("string").as("dim1"),
      dim2.cast("string").as("dim2"),
      r(actual).as("__a"), r(pred).as("__p"))
      .groupBy(col("dim1"), col("dim2"))
      .agg(count(lit(1)).as("n_rows"),
        microSum(abs(col("__a") - col("__p"))).as("__sad"),
        microSum(abs(col("__a"))).as("__saa"))
      .withColumn("wmape",
        r(col("__sad") / (col("__saa") + lit(Eps)) * lit(100.0)))
    val wBest = Window.partitionBy(lit(0))
      .orderBy(col("wmape").asc, col("dim1").asc, col("dim2").asc)
    val wWorst = Window.partitionBy(lit(0))
      .orderBy(col("wmape").desc, col("dim1").asc, col("dim2").asc)
    g.withColumn("best_rank",
      org.apache.spark.sql.functions.row_number().over(wBest).cast("long"))
      .withColumn("worst_rank",
        org.apache.spark.sql.functions.row_number().over(wWorst).cast("long"))
      .select(col("dim1"), col("dim2"), col("n_rows"), col("wmape"),
        col("best_rank"), col("worst_rank"))
  }

  /** All headline metrics in one pass. */
  def scorecard(df: DataFrame, actual: Column, pred: Column): DataFrame =
    df.agg(
      wmape(actual, pred).as("wmape"),
      mape(actual, pred).as("mape"),
      smape(actual, pred).as("smape"),
      mae(actual, pred).as("mae"),
      rmse(actual, pred).as("rmse"),
      bias(actual, pred).as("bias"),
      count(lit(1)).as("n_rows"))
}
