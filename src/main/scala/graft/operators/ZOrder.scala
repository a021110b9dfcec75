package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities — the multi-dimensional data-layout
  * optimization for scan pruning at scale: sorting/range-partitioning a
  * 100 TB table by the interleaved bits of two filter columns keeps
  * rows close in BOTH dimensions inside each file, so per-file min/max
  * statistics prune scans for predicates on EITHER column (the
  * technique behind Delta/Iceberg `ZORDER BY`; lexicographic sort only
  * ever serves the leading column).
  *
  * The z-value is a pure integer bit-interleave — Σ_j ((x≫j)&1)·2^{2j}
  * + ((y≫j)&1)·2^{2j+1} — built as a static fold of codegen'd shift/
  * mask terms, so any engine reproduces it exactly (q294's oracle
  * replays it with division/modulo arithmetic). Inputs must be
  * non-negative and < 2^bits.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns (x gets the
    * even bit positions, y the odd). `bits` per dimension, ≤ 31. */
  def zValue(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, j) =>
      acc +
        shiftright(xl, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
        shiftright(yl, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }
  }

  /** Cluster-quality profile: bucket rows by the top bits of their
    * z-value (each bucket ≈ one file after a z-sorted write) and emit
    * each bucket's bounding box over both dimensions plus row count —
    * the min/max statistics a scan would prune on. `bucketShift`: how
    * many low z-bits fold into a bucket (bucket = z ≫ bucketShift). */
  def zProfile(df: DataFrame, x: Column, y: Column, bits: Int = 21,
               bucketShift: Int = 30): DataFrame =
    df.select(zValue(x, y, bits).as("__z"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .groupBy(shiftright(col("__z"), bucketShift).as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))

  /** Range-partition and sort by z-value — the write-side layout step
    * (call before a partitioned parquet write so file-level min/max
    * stats become selective on both dimensions). */
  def zOrderBy(df: DataFrame, x: Column, y: Column, numPartitions: Int,
               bits: Int = 21): DataFrame = {
    val withZ = df.withColumn("__z", zValue(x, y, bits))
    withZ.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
