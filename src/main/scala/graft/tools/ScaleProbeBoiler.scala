package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale probe for the corpus-frequency boilerplate scrub (q312's
  * production hashed-key path) — the fifth document-path leg, riding
  * the same derived 100× table [[ScaleProbeDocs]] builds (every token
  * copy-tagged, so spans are DISJOINT across copies and each copy
  * carries the 1× census structure exactly). That gives the probe an
  * exact invariant to check alongside the wall ratio: the distinct
  * boilerplate-span count at 100× must be EXACTLY 100× the 1× count
  * (df is per-copy), and the dropped-occurrence count likewise — any
  * deviation means cross-copy span collisions, i.e. a broken census.
  * The work itself is the linear-scaling case: one span explode, one
  * map-side-combined distinct+count census, one equi join, one
  * document-grain reassembly exchange.
  *
  * Usage: runMain graft.tools.ScaleProbeBoiler [srcSfDir] [workDir]
  * (run ScaleProbeDocs first, or let this probe build the table).
  */
object ScaleProbeBoiler {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "target/scaleprobe_docs"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docsPath = s"$work/documents.parquet"
    if (!new java.io.File(docsPath).exists()) {
      spark.read.parquet(s"$src/documents.parquet")
        .withColumn("__k", explode(sequence(lit(0), lit(99))))
        .withColumn("doc_id",
          col("doc_id") + col("__k").cast("long") * lit(1000000000L))
        .withColumn("text", regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("c"), col("__k"), lit("$1"))))
        .drop("__k")
        .repartition(64)
        .write.mode("overwrite").parquet(docsPath)
    }

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // (wall of the full scrub, dropped-span occurrences, distinct
    // boilerplate spans) — one warm pass, one timed pass, two cheap aggs
    def leg(df: DataFrame): (Double, Long, Long) = {
      def run = graft.text.Boilerplate.scrub(df, "doc_id", "text",
        w = 3, maxDocFreq = 5)
      run.count() // warm
      val (_, sec) = timed(run.count())
      val dropped = run.agg(sum(col("n_dropped"))).head().getLong(0)
      val boilerSpans = graft.text.Boilerplate.census(df, "doc_id", "text", 3)
        .filter(col("span_df") >= 5).count()
      (sec, dropped, boilerSpans)
    }

    val docs1 = spark.read.parquet(s"$src/documents.parquet")
    val docs100 = spark.read.parquet(docsPath)
    val (s1, d1, b1) = leg(docs1)
    val (s100, d100, b100) = leg(docs100)

    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }

    println(f"""{"probe":"scale100x_boilerplate","sec_1x":$s1%.2f,"sec_100x":$s100%.2f,"wall_ratio":${s100 / s1}%.1f,"dropped_1x":$d1,"dropped_100x":$d100,"boiler_spans_1x":$b1,"boiler_spans_100x":$b100,"exact_100x_invariant":${b100 == 100 * b1 && d100 == 100 * d1},"loadavg":"$loadavg"}""")
    spark.stop()
  }
}
