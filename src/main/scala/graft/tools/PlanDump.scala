package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch plan auditor: print the formatted physical plan of named
  * registered queries at an sfDir (the `.explain("formatted")` loop the
  * per-operator plan audits use, without spinning a REPL).
  * Usage: runMain graft.tools.PlanDump <sfDir> [--conf k=v ...] <q> [q...] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (confArgs, names) = args.drop(1).toSeq.partition(_.startsWith("--conf="))
    val confs = confArgs.map(_.stripPrefix("--conf=").split("=", 2))
      .map(kv => kv(0) -> kv(1))
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
