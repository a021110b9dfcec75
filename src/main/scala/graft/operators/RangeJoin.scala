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
        // hi is exclusive: an interval ending exactly on a bucket
        // boundary does not reach into the next bucket
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    fact.withColumn("__bucket", floor(value / bucketWidth).cast("long"))
      .join(banded, "__bucket")
      .filter(value >= col(loCol) && value < col(hiCol))
      .drop("__bucket")
  }
}
