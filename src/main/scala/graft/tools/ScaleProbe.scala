package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 10× scale probe for the pipeline spine (VERDICT r10 #8):
  * synthesizes an sf1-equivalent fact table by unioning ten key-shifted
  * copies of the sf0.1 lineitem (order keys disjoint per copy; part and
  * supplier keys shifted so the SERIES COUNT scales 10× with unchanged
  * per-series depth — the shape a real 10× data volume has), then times
  * the same three-query spine Bench uses (weekly aggregate → rolling
  * stats → scorecard) and prints rows/s for both scales.
  *
  * This is a PERFORMANCE probe only — correctness inputs stay the
  * driver-provided parquet; the scaled copy lives under target/ and is
  * derived, never hand-synthesized distributions.
  *
  * Usage: runMain graft.tools.ScaleProbe [srcSfDir] [workDir]
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "target/scaleprobe_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val scaled = (0 until 10).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(k * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * 1000000L))
    }.reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(s"$work/lineitem.parquet")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val spine = Seq("q22_weekly_aggregate", "q40_rolling_stats", "q37_scorecard")

    def timeSpine(dir: String): (Long, Double) = {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet").count()
      // warm once (codegen/JIT), then measure
      spine.foreach(q => run(graft.SparkEntry.queries(q)(spark, dir)))
      val t0 = System.nanoTime()
      spine.foreach(q => run(graft.SparkEntry.queries(q)(spark, dir)))
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val (rows01, sec01) = timeSpine(src)
    val (rows1, sec1) = timeSpine(work)

    // text leg: the winnowing fingerprint pass (per-doc O(len) codegen'd
    // expression, shuffle-free) over a 10x corpus — doc ids shifted and
    // a per-copy salt prefixed so the fingerprint sets stay distinct
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until 10).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 1000000000L))
        .withColumn("text", concat(lit(s"c$k "), col("text")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    def timeWinnow(dir: String): Double = {
      def w() = run(graft.text.TextAnalysis.winnow(
        spark.read.parquet(s"$dir/documents.parquet"),
        col("doc_id"), col("text")))
      w() // warm
      val t0 = System.nanoTime(); w(); (System.nanoTime() - t0) / 1e9
    }
    val (tw01, tw1) = (timeWinnow(src), timeWinnow(work))
    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    println(f"""{"probe":"scale10x","sf01_rows":$rows01,"sf01_sec":$sec01%.3f,"sf01_rows_per_sec":${rows01 / sec01}%.0f,"sf1_rows":$rows1,"sf1_sec":$sec1%.3f,"sf1_rows_per_sec":${rows1 / sec1}%.0f,"walltime_ratio":${sec1 / sec01}%.2f,"winnow_sec_1x":$tw01%.3f,"winnow_sec_10x":$tw1%.3f,"winnow_ratio":${tw1 / tw01}%.2f,"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
