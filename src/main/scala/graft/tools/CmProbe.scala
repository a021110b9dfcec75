package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for q302 (count-min frequency): time the
  * sketch BUILD, the period MERGE, and the full estimate pipeline in
  * isolation (noop sink, warm best-of-3) so the dominant stage is
  * measured, not guessed (guide §1.1/§1.4).
  * Usage: runMain graft.tools.CmProbe <sfDir> */
object CmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.SketchRollup

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CMPROBE $name%-18s ${ts.map(x => f"$x%.2f").mkString(" ")} min=${ts.min}%.2f")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t("fact_scan")(li.select(col("l_returnflag"), col("l_shipdate"), col("l_partkey")))
    def monthly = SketchRollup.cmSketchTable(li, Seq("l_returnflag"),
      date_format(col("l_shipdate"), "yyyy-MM"), col("l_partkey"), 3, 512)
    t("sketch_build")(monthly)
    def cands = li.filter(col("l_partkey") < 40)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
    t("cands")(cands)
    t("full_q302")(SketchRollup.cmEstimate(monthly, Seq("l_returnflag"),
      cands, "l_partkey", 3, 512))
    spark.stop()
  }
}
