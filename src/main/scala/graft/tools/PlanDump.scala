package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan auditor: print the formatted physical plan of named
  * registered queries at an sfDir (the `.explain("formatted")` loop the
  * per-operator plan audits use, without spinning a REPL).
  * Usage: runMain graft.tools.PlanDump <sfDir> <q> [q...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
