package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-series probe for Assoc.kendallTauSampled vs the exact kendall
  * (r15 verdict ask #4's "Done" evidence, mirroring TheilSenProbe):
  * the exact operator's pair self-join is O(n²) per group, so group
  * SIZE is its quadratic axis; the sampled twin draws s pairs per group
  * — O(n + s) — and should run FLAT in wall as n grows.
  *
  * Usage: runMain graft.tools.KendallProbe [nGroups] [nPoints] [s]
  */
object KendallProbe {

  def main(args: Array[String]): Unit = {
    val nGroups = if (args.length > 0) args(0).toInt else 20
    val nPoints = if (args.length > 1) args(1).toInt else 5000
    val s = if (args.length > 2) args(2).toInt else 300
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // planted monotone association with ties on both axes (the tie
    // tables must stay exercised) and dissenting wiggle
    val df = spark.range(nGroups.toLong * nPoints)
      .withColumn("k", (col("id") / nPoints).cast("long"))
      .withColumn("x", floor((col("id") % nPoints) / 3).cast("double"))
      .withColumn("y",
        floor((col("id") % nPoints).cast("double") / 5) +
          when(pmod(col("id"), lit(7)) === 0, lit(-50.0)).otherwise(lit(0.0)))
      .select(col("k"), col("x"), col("y"))
    df.write.format("noop").mode("overwrite").save()

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    import graft.operators.Assoc
    val warm = df.filter(col("k") === 0 && col("x") < 70)
    run(Assoc.kendall(warm, Seq("k"), col("x"), col("y")))
    run(Assoc.kendallTauSampled(warm, Seq("k"), col("x"), col("y"), s))

    val sampledSec = timed(run(
      Assoc.kendallTauSampled(df, Seq("k"), col("x"), col("y"), s)))
    val exactSec = timed(run(
      Assoc.kendall(df, Seq("k"), col("x"), col("y"))))
    println(f"KENDALLPROBE groups=$nGroups points=$nPoints s=$s " +
      f"exact=$exactSec%.2f s sampled=$sampledSec%.2f s")
    spark.stop()
  }
}
