package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Scratch A/B for the q270 fusion: times the pre-r14 two-filtered-scan
  * construction against the fused single-scan importanceScoresSliced
  * path in ONE JVM, alternating order across rounds so codegen/JIT
  * warmup doesn't bias either side. Usage: runMain graft.tools.Q270Ab
  * <sfDir> [rounds=3]. Prints per-pass seconds for each variant. */
object Q270Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val feats = Seq("l_discount", "l_tax", "l_extendedprice", "l_linenumber")
    def liDf = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cut = col("l_shipdate") < lit("1996-01-01").cast("date")

    def oldPath(): DataFrame = {
      def imp(f: DataFrame) = graft.operators.FeatureQuality
        .importanceScores(f, feats, "l_quantity")
        .select(col("feature"), r(col("score")).as("score"))
      val joined = imp(liDf.filter(cut))
        .withColumnRenamed("score", "base_imp")
        .join(imp(liDf.filter(!cut)).withColumnRenamed("score", "cur_imp"),
          "feature")
      graft.metrics.Diagnostics.importanceStability(joined, Nil,
        col("feature"), col("base_imp"), col("cur_imp"))
    }
    def newPath(): DataFrame = {
      val joined = graft.operators.FeatureQuality
        .importanceScoresSliced(liDf, cut, feats, "l_quantity")
        .select(col("feature"), r(col("score_in")).as("base_imp"),
          r(col("score_out")).as("cur_imp"))
      graft.metrics.Diagnostics.importanceStability(joined, Nil,
        col("feature"), col("base_imp"), col("cur_imp"))
    }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val oldT = collection.mutable.ArrayBuffer[Double]()
    val newT = collection.mutable.ArrayBuffer[Double]()
    // optional third arg flips who pays the fresh-JVM warmup
    val newFirst = args.length > 2 && args(2) == "newfirst"
    (1 to rounds).foreach { i =>
      val oldLeads = (i % 2 == 1) != newFirst
      if (oldLeads) { oldT += time(oldPath); newT += time(newPath) }
      else { newT += time(newPath); oldT += time(oldPath) }
    }
    def fmt(ts: Seq[Double]) = ts.map(t => f"$t%.2f").mkString(" ")
    def scans(df: DataFrame) =
      "lineitem\\.parquet".r.findAllIn(df.queryExecution.executedPlan.toString).length
    println(f"Q270AB old ${fmt(oldT.toSeq)} min=${oldT.min}%.2f scans=${scans(oldPath())}")
    println(f"Q270AB new ${fmt(newT.toSeq)} min=${newT.min}%.2f scans=${scans(newPath())}")
    spark.stop()
  }
}
