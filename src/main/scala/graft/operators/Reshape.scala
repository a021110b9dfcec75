package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Wide↔long reshaping and generic column profiling — the pandas
  * `melt`/`describe` side of the reference's reshaping surface (J7
  * pivot covers long→wide; this is the inverse, plus the data-quality
  * profile `validators.py` prints per column).
  *
  * Scale shape: `melt` is a narrow per-row explode (rows × |cols|, no
  * shuffle); `profile` is ONE hash aggregate computing every column's
  * sufficient statistics in a single pass over the fact, exploded to
  * one output row per column afterwards (driver never sees data).
  */
object Reshape {

  /** Long-format view of `valueCols`: one (id..., metric, value) row
    * per input row per value column (pandas `melt`; Spark's native
    * unpivot). Values are cast to double — the unified melt type. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           metricCol: String = "metric", valueCol: String = "value"): DataFrame =
    df.select(idCols.map(col) ++ valueCols.map(c => col(c).cast("double").as(c)): _*)
      .unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
        metricCol, valueCol)

  /** Per-column profile: nulls, distincts, min/max/mean/sample-std —
    * one aggregate pass for ALL columns, one output row per column.
    * Mean/std come from explicit (n, Σv, Σv²) sums (engine-portable). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(count(v).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__d_$c"),
        min(v).as(s"__min_$c"), max(v).as(s"__max_$c"),
        sum(v).as(s"__s_$c"), sum(v * v).as(s"__ss_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val (n, s, ss) = (col(s"__n_$c"), col(s"__s_$c"), col(s"__ss_$c"))
      struct(lit(c).as("col_name"), n.as("n"), col(s"__nulls_$c").as("n_nulls"),
        col(s"__d_$c").as("n_distinct"), col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"), Funcs.r(s / n).as("mean"),
        Funcs.r(when(n > 1, sqrt((ss - s * s / n) / (n - 1)))).as("std"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
