package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 100× scale probe for the pipeline spine (VERDICT r12 ask
  * #7): synthesizes a 60M-row fact table — one hundred key-shifted
  * copies of the sf0.1 lineitem, series count ×100 with unchanged
  * per-series depth, the shape real 100× volume has — and times the
  * spine queries INDIVIDUALLY at both scales, so a wall (shuffle,
  * sort, spill) is attributable to its stage rather than hidden in a
  * three-query total. The first probe on this box where the shuffled
  * window frame (60M rows through one series exchange) materially
  * exceeds executor memory per core and spill behavior matters.
  *
  * Fan-out is one codegen'd explode over a single scan (not 100
  * unions), written once under workDir; performance probe only —
  * correctness inputs stay the driver-provided parquet.
  *
  * Usage: runMain graft.tools.ScaleProbe100 [srcSfDir] [workDir]
  */
object ScaleProbe100 {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "target/scaleprobe_sf10"
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

    val outPath = s"$work/lineitem.parquet"
    if (!new java.io.File(outPath).exists()) {
      spark.read.parquet(s"$src/lineitem.parquet")
        .withColumn("__k", explode(sequence(lit(0L), lit(99L))))
        .withColumn("l_orderkey", col("l_orderkey") + col("__k") * lit(1000000000L))
        .withColumn("l_partkey", col("l_partkey") + col("__k") * lit(10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + col("__k") * lit(1000000L))
        .drop("__k")
        .repartition(256)
        .write.mode("overwrite").parquet(outPath)
    }

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val spine = Seq("q22_weekly_aggregate", "q40_rolling_stats", "q37_scorecard")

    def timeSpine(dir: String): (Long, Map[String, Double]) = {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet").count()
      spine.foreach(q => run(graft.SparkEntry.queries(q)(spark, dir))) // warm
      val times = spine.map { q =>
        val t0 = System.nanoTime()
        run(graft.SparkEntry.queries(q)(spark, dir))
        q -> (System.nanoTime() - t0) / 1e9
      }.toMap
      (rows, times)
    }

    val (rows1, t1) = timeSpine(src)
    val (rows100, t100) = timeSpine(work)
    val (s1, s100) = (t1.values.sum, t100.values.sum)

    // native as-of leg: attach each line's latest supplier weekly state
    // as of its ship date — the AsOfJoinExec merge with the fact as the
    // 60M-row probe side (exchange-bound shape; per-key state is O(1))
    def timeAsOf(dir: String): Double = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val weekly = graft.etl.Enrichment.weeklyAggregate(li,
        org.apache.spark.sql.functions.col("l_shipdate"),
        Seq(org.apache.spark.sql.functions.col("l_suppkey")),
        org.apache.spark.sql.functions.col("l_quantity"))
      val left = li.select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_suppkey"),
        org.apache.spark.sql.functions.col("l_shipdate").cast("date").as("ship_date"))
      def go() = run(graft.operators.AsOfJoin.asOfNative(
        left, weekly, Seq("l_suppkey"), "ship_date", "week_start", Seq("qty_sum")))
      go() // warm
      val t0 = System.nanoTime(); go(); (System.nanoTime() - t0) / 1e9
    }
    val (a1, a100) = (timeAsOf(src), timeAsOf(work))
    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    val per = spine.map(q =>
      f""""$q":{"sec_1x":${t1(q)}%.3f,"sec_100x":${t100(q)}%.3f,"ratio":${t100(q) / t1(q)}%.1f}""")
      .mkString("{", ",", "}")
    println(f"""{"probe":"scale100x","rows_1x":$rows1,"rows_100x":$rows100,"sec_1x":$s1%.3f,"sec_100x":$s100%.3f,"walltime_ratio":${s100 / s1}%.1f,"rows_per_sec_100x":${rows100 / s100}%.0f,"stages":$per,"asof_sec_1x":$a1%.3f,"asof_sec_100x":$a100%.3f,"asof_ratio":${a100 / a1}%.1f,"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
