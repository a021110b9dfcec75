package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities (SURVEY §4 / the 100 TB posture):
  * salting for hot keys when the build side is too large to broadcast,
  * and bucketed-table writes for exchange-free co-located joins.
  */
object Skew {

  /** Salted equi-join for a skewed probe side against a non-broadcastable
    * build side: the probe key gains a deterministic salt in [0, n)
    * derived from row-identifying columns, and the build side is
    * replicated n ways (explode of a literal range) so every salted key
    * finds its partner. Hot probe keys spread over n reducers instead of
    * one. Semantics = plain inner equi-join; cost = n× build-side
    * replication (choose n ≈ skew factor, not number of rows).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String, buildKey: String,
                 saltBuckets: Int, probeSaltSource: Seq[Column]): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(abs(hash(probeSaltSource: _*)), lit(saltBuckets)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
      salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Write a bucketed+sorted table for exchange-free joins: two tables
    * bucketed the same way on the join key join WITHOUT a shuffle
    * (SortMergeJoin reads co-located buckets). Requires saveAsTable
    * (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Key-skew diagnostics — the measurement side of the mitigation
    * toolkit above: one row summarizing how lopsided a prospective
    * join/aggregation key is (hot-key factor `max/mean` directly sizes
    * the [[saltedJoin]] salt count; the p99/CV locate whether skew is
    * one hot key or a heavy tail). Two aggregates: fact → key counts
    * (map-side combined), counts → 1-row summary. No windows, no sort.
    */
  def keySkewReport(df: DataFrame, keys: Seq[String],
                    exact: Option[Boolean] = None): DataFrame = {
    import graft.functions.Funcs
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("__c")).as("total_rows"),
      max(col("__c")).as("max_cnt"),
      Funcs.r(avg(col("__c"))).as("mean_cnt"),
      Funcs.r(Funcs.pct(col("__c"), 0.99, exact)).as("p99_cnt"),
      Funcs.r(max(col("__c")) / avg(col("__c"))).as("skew_factor"),
      Funcs.r(stddev_samp(col("__c")) / avg(col("__c"))).as("cv"))
  }
}
