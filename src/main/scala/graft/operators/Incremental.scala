package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a materialized additive
  * aggregate current by merging a delta batch instead of recomputing —
  * the lakehouse pattern for the weekly-grain tables every downstream
  * operator here consumes (merge(agg(old), agg(new)) ≡ agg(old ∪ new)
  * for sum/count; q193 hash-proves that equivalence against a
  * full-recompute oracle).
  *
  * Scale shape: the delta is aggregated alone (small), then one
  * key-partitioned merge aggregate over base ∪ delta-agg — the base
  * never rescans its source, and with both sides bucketed by the key
  * the merge is exchange-free.
  */
object Incremental {

  /** Merge two frames of the same additive-aggregate schema: per key,
    * sums of the measure columns. */
  def mergeAdditive(base: DataFrame, deltaAgg: DataFrame, keyCols: Seq[String],
                    measureCols: Seq[String]): DataFrame =
    base.unionByName(deltaAgg)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(measureCols.head)).as(measureCols.head),
        measureCols.tail.map(c => sum(col(c)).as(c)): _*)
}
