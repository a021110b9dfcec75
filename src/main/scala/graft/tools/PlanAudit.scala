package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries so the
  * shuffle/broadcast/pushdown shape can be audited by eye (and greps). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q22_weekly_aggregate", "q23_enrich_join", "q40_rolling_stats",
        "q41_rolling_slope", "q21_cooccurrence", "q68_ann_brute", "q69_ann_lsh")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
