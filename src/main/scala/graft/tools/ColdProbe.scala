package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-pass JIT/codegen probe (r15 verdict ask #2): measures how much
  * of a query's first-pass penalty a small-SF warmup absorbs. Each JVM
  * invocation is cold (fresh classloader, empty codegen cache), so run
  * the two arms as separate invocations:
  *
  *   runMain graft.tools.ColdProbe -                    <sfDir> <q...>   # arm A: no warmup
  *   runMain graft.tools.ColdProbe /root/testdata/sf0.001 <sfDir> <q...> # arm B: warmed
  *
  * Prints COLDPROBE <q> warm=<sec|-> pass1 pass2 pass3. Spark's codegen
  * cache keys on generated source (data paths live in scan nodes, not
  * the generated code), so a same-shape warmup at sf0.001 should
  * compile the identical classes the sf0.1 pass needs — this probe
  * verifies that claim with numbers instead of assuming it.
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val warmDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).write.mode("overwrite")
        .format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val w = if (warmDir == "-") -1.0 else run(n, warmDir)
      val times = (1 to 3).map(_ => run(n, sfDir))
      val ws = if (w < 0) "-" else f"$w%.2f"
      println(f"COLDPROBE $n warm=$ws ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
