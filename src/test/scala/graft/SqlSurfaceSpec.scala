package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The spark.sql(...) surface: tables registered as views are queryable
  * with plain ANSI SQL side-by-side with the DataFrame operators, and
  * the two agree. Also demonstrates AQE skew-join handling kicking in
  * on a forcibly skewed shuffle join. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("SQL over registered views matches the DataFrame weekly aggregate") {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    val sqlRes = spark.sql("""
      SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS week_start,
             l_partkey, l_suppkey, sum(l_quantity) AS qty_sum, count(*) AS n_rows
      FROM lineitem_v GROUP BY 1, 2, 3""")
    val dfRes = graft.etl.Enrichment.weeklyAggregate(
      Tables.lineitem(spark, dir), col("l_shipdate"),
      Seq(col("l_partkey"), col("l_suppkey")), col("l_quantity"))
    assert(sqlRes.exceptAll(dfRes).count() == 0)
    assert(dfRes.exceptAll(sqlRes).count() == 0)
  }

  test("AQE splits a skewed shuffle join at runtime") {
    val prev = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.coalescePartitions.enabled" ->
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled"))
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 95% of left rows on one key; right side small but not broadcast
      val left = ((1 to 40000).map(i => (1L, s"payload_$i")) ++
        (1 to 2000).map(i => ((i % 50).toLong + 2, s"p_$i"))).toDF("k", "v")
      val right = (1L to 60L).map(k => (k, s"attr_$k")).toDF("k", "attr")
      val joined = left.join(right, "k")
      // execute THIS QueryExecution so the adaptive plan re-optimizes;
      // a write/count would spawn a fresh one and leave this unfinalized
      val qe = joined.queryExecution
      qe.executedPlan.executeCollect()
      val plan = qe.executedPlan.toString
      assert(plan.contains("AQEShuffleRead skewed"), s"no skew split recorded:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
