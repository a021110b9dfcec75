package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch marginal-cost probe for q262: time QuantileReg.fit at
  * iters = 1/2/4/8 so the per-IRLS-round overhead is measured.
  * Usage: runMain graft.tools.QrProbe <sfDir> */
object QrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // r18: both execution shapes in one JVM — single-pass (HOF fold,
    // one job) vs the r17 per-round-checkpoint iterative form
    for (single <- Seq("false", "true"); it <- Seq(1, 2, 4, 8)) {
      spark.conf.set(graft.operators.QuantileReg.SinglePassConf, single)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.QuantileReg.fit(li, Seq("l_returnflag"),
          col("l_discount"), col("l_quantity"), iters = it)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QRPROBE single=$single iters=$it ${ts.map(t => f"$t%.2f").mkString(" ")} min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
