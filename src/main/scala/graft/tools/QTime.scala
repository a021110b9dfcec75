package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch single-query timer: N warm passes of named queries at an
  * sfDir, printing per-pass wall seconds (the Bench loop without the
  * full headline). Usage: runMain graft.tools.QTime <sfDir> <q> [q...] */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (confArgs, names) = args.drop(1).toSeq.partition(_.startsWith("--conf="))
    val confs = confArgs.map(_.stripPrefix("--conf=").split("=", 2))
      .map(kv => kv(0) -> kv(1))
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite")
          .format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n ${times.map(t => f"$t%.2f").mkString(" ")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
