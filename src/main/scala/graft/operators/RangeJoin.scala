package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — match fact rows whose value falls in a
  * dimension row's [lo, hi) interval. Spark has no native range-join
  * strategy: the naive non-equi join plans as a nested loop, quadratic
  * in the worst case.
  *
  * Two shapes, picked by the caller per interval-table size:
  *
  *  - [[broadcastRange]]: intervals small (tier tables, band lookups) —
  *    a broadcast nested-loop is CORRECT at any fact scale because the
  *    loop is per-fact-row over a tiny in-memory table.
  *
  *  - [[bandedRange]]: intervals too large to broadcast — the bucketed
  *    equi-join: each interval explodes into the integer buckets of
  *    width `bucketWidth` it covers, the fact bucketizes its value, and
  *    a plain shuffled equi-join on the bucket + an exact refine filter
  *    recovers the range semantics. Cost is linear in (facts +
  *    intervals × avg buckets per interval); pick `bucketWidth` near
  *    the median interval width so most intervals cover ≤ 2 buckets.
  */
object RangeJoin {

  /** Broadcast the interval table; exact non-equi condition, inclusive
    * lo, exclusive hi. */
  def broadcastRange(fact: DataFrame, value: Column, intervals: DataFrame,
                     lo: Column, hi: Column): DataFrame =
    fact.join(broadcast(intervals), value >= lo && value < hi)

  /** Bucketed equi-join range join for large interval tables. Interval
    * columns are referenced by NAME (the explode rebuilds the frame). */
  def bandedRange(fact: DataFrame, value: Column, intervals: DataFrame,
                  loCol: String, hiCol: String, bucketWidth: Double): DataFrame = {
    val banded = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive, so an interval ending exactly on a bucket
        // boundary does not REACH into the next bucket — but the end
        // bucket is floor(hi/w) unconditionally, never floor((hi-ε)/w):
        // a subtracted epsilon silently DROPS the last bucket when hi
        // sits within ε above a boundary (losing matches confined to
        // that sliver) and is a ulp-absorbed no-op for |hi| ≳ 2³⁰
        // (epoch-millis). The possible extra boundary bucket is
        // harmless — each fact row carries exactly ONE bucket and the
        // exact range predicate refines the candidates.
        floor(col(hiCol) / bucketWidth).cast("long"))))
    fact.withColumn("__bucket", floor(value / bucketWidth).cast("long"))
      .join(banded, "__bucket")
      .filter(value >= col(loCol) && value < col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval OVERLAP join — the third non-equi join form
    * (point-in-interval above, as-of in [[AsOfJoin]]): match row pairs
    * whose half-open intervals [lo, hi) intersect, i.e.
    * `l.lo < r.hi AND r.lo < l.hi`. Spark plans the naive form as a
    * nested loop; here BOTH sides explode into the integer buckets of
    * width `bucketWidth` they cover and join as a plain shuffled
    * equi-join on the bucket, refined by the exact predicate.
    *
    * Duplicate elimination is FREE (no distinct): a pair overlapping
    * across several shared buckets is emitted only from the FIRST
    * shared bucket — the bucket where the later-starting interval
    * begins, `greatest(floor(l.lo/w), floor(r.lo/w))` — which every
    * overlapping pair shares by construction. One equi-join, no
    * post-shuffle dedup exchange.
    *
    * Contract: half-open non-empty intervals (rows with lo ≥ hi or a
    * NULL bound match nothing and are filtered before the explode —
    * also what keeps `sequence` ascending); column names must be
    * disjoint across the two frames. Cost is linear in rows × avg
    * buckets per interval: pick `bucketWidth` near the median interval
    * width, and pre-split open-ended sentinel intervals exactly as
    * documented for [[bandedRange]] / the binning rewrite rule. */
  def overlapJoin(left: DataFrame, loL: String, hiL: String,
                  right: DataFrame, loR: String, hiR: String,
                  bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = left.columns.toSeq.intersect(right.columns.toSeq)
    require(clash.isEmpty,
      s"column name(s) $clash appear on both sides — rename before the overlap join")
    // End bucket is floor(hi/w) unconditionally (no exclusive-hi
    // epsilon): subtracting ε drops the last bucket when hi lies
    // within ε above a boundary — a wrong-result sliver — and is a
    // ulp no-op at epoch-millis magnitudes. The extra boundary bucket
    // an on-boundary hi produces cannot double-emit a pair: emission
    // is pinned to the single first-shared bucket below, and the
    // exact overlap predicate refines away non-matches.
    def bucketed(df: DataFrame, lo: String, hi: String, b: String) =
      df.filter(col(lo) < col(hi)).withColumn(b,
        explode(sequence(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    val lb = bucketed(left, loL, hiL, "__bl")
    val rb = bucketed(right, loR, hiR, "__br")
    lb.join(rb, col("__bl") === col("__br") &&
        col(loL) < col(hiR) && col(loR) < col(hiL) &&
        col("__bl") === greatest(
          floor(col(loL) / bucketWidth).cast("long"),
          floor(col(loR) / bucketWidth).cast("long")))
      .drop("__bl", "__br")
  }
}
