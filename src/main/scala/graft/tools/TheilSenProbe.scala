package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-series probe for the sampled Theil–Sen (r14 verdict ask #6's
  * measurement leg): the exact operator is O(n²) pairs PER SERIES, so
  * its wall is set by series LENGTH; [[graft.operators.Ols.theilSenSampled]]
  * draws s index pairs and joins by rank — O(n + s). This probe builds
  * a planted-trend table of `series × points` (default 20 × 5000:
  * 12.5M pairs per series, 250M total for exact vs 200 per series
  * sampled), times both, and checks the sampled slopes against the
  * planted truth. Performance probe only — synthetic frame, no files.
  *
  * Usage: runMain graft.tools.TheilSenProbe [series] [points] [s]
  */
object TheilSenProbe {

  def main(args: Array[String]): Unit = {
    val nSeries = if (args.length > 0) args(0).toInt else 20
    val nPoints = if (args.length > 1) args(1).toInt else 5000
    val s = if (args.length > 2) args(2).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // planted trend: slope = 2 + k/10 per series, bounded wiggle,
    // occasional spikes (the estimator's reason to exist)
    val df = spark.range(nSeries.toLong * nPoints)
      .withColumn("k", (col("id") / nPoints).cast("long"))
      .withColumn("t", (col("id") % nPoints).cast("double"))
      .withColumn("y",
        (lit(2.0) + col("k").cast("double") / 10) * col("t") +
          sin(col("t") * 1.7) * 5 +
          when(pmod(col("id"), lit(997)) === 0, lit(5000.0)).otherwise(lit(0.0)))
      .select(col("k"), col("t"), col("y"))
    df.write.format("noop").mode("overwrite").save() // materialize gen cost

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    import graft.operators.Ols
    // warm both paths on a slice small enough for exact
    val warm = df.filter(col("k") === 0 && col("t") < 200)
    run(Ols.theilSen(warm, Seq("k"), col("t"), col("y")))
    run(Ols.theilSenSampled(warm, Seq("k"), col("t"), col("y"), s))

    val sampledSec = timed(run(
      Ols.theilSenSampled(df, Seq("k"), col("t"), col("y"), s)))
    val exactSec = timed(run(Ols.theilSen(df, Seq("k"), col("t"), col("y"))))

    // estimator check: sampled slope vs planted truth per series
    val worst = Ols.theilSenSampled(df, Seq("k"), col("t"), col("y"), s)
      .withColumn("__truth", lit(2.0) + col("k").cast("double") / 10)
      .select(max(abs(col("ts_slope") - col("__truth"))).as("m"))
      .head().getDouble(0)

    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }
    println(
      f"""{"probe":"theil_sen_sampled","series":$nSeries,"points":$nPoints,"s":$s,
         |"exact_pairs":${nSeries.toLong * nPoints * (nPoints - 1) / 2},
         |"sampled_pairs":${nSeries.toLong * s},
         |"exact_sec":$exactSec%.1f,"sampled_sec":$sampledSec%.1f,
         |"speedup":${exactSec / sampledSec}%.1f,
         |"worst_abs_slope_err":$worst%.4f,"loadavg":"$loadavg"}"""
        .stripMargin.replace("\n", ""))
    spark.stop()
  }
}
