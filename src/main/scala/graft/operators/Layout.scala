package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys.
  *
  * At 100 TB the cheapest query is the one whose files you never open.
  * Min/max footer stats prune parquet row-groups only when the data is
  * clustered on the filtered column; for workloads filtering on SEVERAL
  * columns (store AND product AND week — the reference's slicing idiom,
  * e.g. src/utils/data_loader.py partition slicing), a linear sort on one
  * column destroys locality on the others. A Z-order (Morton) key
  * interleaves the bits of all filter columns so a range partition on the
  * single z value keeps rows close in EVERY dimension — each dimension's
  * value range inside one file shrinks to ~2^(bits/n) of the domain, so
  * footer pruning works for any of the n columns. This is the layout
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Everything here is plain codegen'd column arithmetic — no UDF, no
  * shuffle beyond the final range partition, scales linearly.
  */
object Layout {

  /** Morton/Z-value: round-robin interleave of the low `bits` bits of
    * each column (column 0 owns the most-significant lane). Inputs are
    * taken mod 2^bits — callers normalize (e.g. rank-bucket) first if
    * domains are wider. n·bits must be ≤ 63 (long result). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && n * bits <= 63, s"zValue: $n cols × $bits bits exceeds a long")
    val masked = cols.map(c => pmod(c.cast("long"), lit(1L << bits)))
    // Bit j of column k lands at position j*n + (n-1-k); lanes are
    // disjoint so + is |, and + folds better in codegen.
    val terms = for { j <- 0 until bits; k <- 0 until n } yield
      shiftleft(shiftright(masked(k), j).bitwiseAND(lit(1L)), j * n + (n - 1 - k))
    terms.reduce(_ + _)
  }

  /** Rewrite `df` into a z-clustered layout: range-partition on the
    * interleaved key (so each output file owns a compact z-range =
    * a compact hyper-rectangle of the key space), sort within partitions
    * so row-group stats are tight. `numPartitions` ≈ target file count —
    * at 100 TB pick data_size / ~1 GB. */
  def zorderLayout(df: DataFrame, keyCols: Seq[String], bits: Int,
                   numPartitions: Int): DataFrame = {
    val z = zValue(keyCols.map(col), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
