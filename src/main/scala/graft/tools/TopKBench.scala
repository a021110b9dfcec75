package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Micro-benchmark: per-group top-k via the native bounded-heap
  * aggregate (`graft.expr.TopKExpr`) vs the window `row_number`
  * formulation — both over (supplier → top-3 order values) on the
  * given SF dir. Not part of the driver contract
  * (`sbt "runMain graft.tools.TopKBench /root/testdata/sf0.1"`).
  *
  * Why the heap wins at scale: the window formulation shuffles and
  * SORTS every group's full contents (O(n log n) rows through the
  * exchange); the aggregate ships ≤ k doubles per group per map
  * partition (partial aggregation) and merges k-element heaps.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-topk-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, dir).select("l_suppkey", "l_extendedprice")

    def heap(): DataFrame = li.groupBy(col("l_suppkey"))
      .agg(graft.expr.TopKExpr.column(col("l_extendedprice"), 3).as("t"))
    def window(): DataFrame = {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc)
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .groupBy(col("l_suppkey")).agg(collect_list(col("l_extendedprice")).as("t"))
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then best-of-3
    time(heap); time(window)
    val h = (1 to 3).map(_ => time(heap)).min
    val w = (1 to 3).map(_ => time(window)).min
    println(f"[topk-bench] sf=$dir heap=$h%.3fs window=$w%.3fs speedup=${w / h}%.2fx")
    spark.stop()
  }
}
