package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count maintenance via HLL sketches (Apache
  * DataSketches, Spark-native `hll_sketch_agg`/`hll_union_agg`) — the
  * NON-additive companion to [[Incremental.mergeAdditive]]: sums and
  * counts merge by addition, but `count(distinct)` does not, so an
  * incremental weekly/daily rollup that needs distinct customers /
  * parts / sessions per key must either rescan history or keep a
  * mergeable sketch column. This operator keeps the sketch column.
  *
  * The pattern at 100 TB: materialize one sketch per (key, period) —
  * a map-side-combinable aggregate whose state is a few KB per group
  * regardless of cardinality — then answer any distinct-over-range
  * question by merging the period sketches, never rescanning the fact.
  * HLL merge is associative and commutative over the register LOGIC,
  * but DataSketches promotes small sketches between sparse and dense
  * representations at different points along different merge paths, so
  * merge-then-estimate and estimate-of-recompute agree to within the
  * representation boundary (sub-1% on small counts), not bit-exactly —
  * both sit inside the sketch's own ~1.04/√2^lgK error band vs the
  * TRUE distinct, which is the contract `SketchSpec` pins (merge-path
  * agreement ≤1%, true-distinct error ≤5% at lgK=12).
  *
  * Registered as rows-only (q265): sketch binaries and their estimates
  * are engine-specific (DuckDB's HLL is a different implementation),
  * while the exact-distinct twin is plain `count(distinct)` (A3/q09).
  */
object SketchRollup {

  /** One HLL sketch per (keys..., period) over `value`'s distincts —
    * the mergeable building block. lgK=12 ≈ 1.6% relative std error,
    * 4 KB max register state per group. */
  def sketchTable(df: DataFrame, keyCols: Seq[String], periodCol: Column,
                  value: Column, lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col) :+ periodCol.as("period"): _*)
      .agg(hll_sketch_agg(value, lit(lgK)).as("dv_sketch"))

  /** Merge each key's period sketches and estimate the distinct count
    * over the whole covered range — no fact rescan. */
  def distinctOverRange(sketches: DataFrame, keyCols: Seq[String]): DataFrame =
    sketches.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("dv_sketch")))
        .as("approx_distinct"))

  /** Incremental maintenance: fold a delta batch's sketches into the
    * materialized sketch table — union ≡ recompute, by HLL merge
    * semantics (the q193 equivalence, for the non-additive case). */
  def mergeSketches(base: DataFrame, delta: DataFrame,
                    keyCols: Seq[String]): DataFrame =
    base.unionByName(delta)
      .groupBy(keyCols.map(col) :+ col("period"): _*)
      .agg(hll_union_agg(col("dv_sketch")).as("dv_sketch"))

  /** Portable KMV (k-minimum-values) distinct sketch — the
    * fully-oracle-comparable twin of the HLL pair above (Bar-Yossef et
    * al. 2002): hash each value with the portable Lehmer permutation
    * ([[graft.functions.PortableHash.lehmer]] — pure 64-bit arithmetic,
    * bit-identical in any engine) and keep the k smallest DISTINCT
    * hashes per (keys..., period). Two properties HLL lacks here:
    * the state is portable (a sorted BIGINT array, no engine-private
    * registers), and the merge is EXACTLY associative — the global k
    * minima of a union are each inside their part's k minima, so
    * merge-then-estimate equals estimate-of-recompute bit for bit
    * (SketchSpec pins both). Estimator: exact |state| below k (the
    * sketch IS the distinct set there), else (k−1)·M/h₍ₖ₎.
    * Same 100 TB shape as the HLL path: map-side-combinable aggregate,
    * O(k) state per group, range queries merge period sketches without
    * a fact rescan. */
  def kmvSketchTable(df: DataFrame, keyCols: Seq[String], periodCol: Column,
                     value: Column, k: Int = 32): DataFrame =
    df.select(keyCols.map(col) :+ periodCol.as("period") :+
        graft.functions.PortableHash.lehmer(value).as("__h"): _*)
      .groupBy(keyCols.map(col) :+ col("period"): _*)
      // bounded native aggregate — NOT collect_set+slice, whose buffer
      // is the group's FULL distinct set; this one's state is ≤ k longs
      // per group at every point (map side, shuffle, reduce side)
      .agg(graft.expr.MinKDistinctExpr.column(col("__h"), k).as("kmv"))

  /** Merge each key's period KMV sketches and estimate the distinct
    * count over the whole range. Output: keys..., n_kept, est_distinct. */
  def kmvDistinctOverRange(sketches: DataFrame, keyCols: Seq[String],
                           k: Int = 32): DataFrame = {
    import graft.functions.Funcs.r
    val m = graft.functions.PortableHash.M31
    sketches.select(keyCols.map(col) :+ explode(col("kmv")).as("__h"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(graft.expr.MinKDistinctExpr.column(col("__h"), k).as("merged"))
      .select(keyCols.map(col) :+
        size(col("merged")).cast("long").as("n_kept") :+
        r(when(size(col("merged")) < k, size(col("merged")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(m.toDouble) /
            element_at(col("merged"), k).cast("double")))
          .as("est_distinct"): _*)
  }
}
