package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 verdict ask #4 — the 10× scale stress sweep as MEASUREMENT, not
  * assertion: synthesize a ~6M-row 10× copy of sf0.1 (ten key-shifted
  * copies of lineitem/orders/documents — order/part/supplier/customer/
  * doc keys disjoint per copy so SERIES/ENTITY counts scale 10× with
  * unchanged per-entity depth, the shape a real 10× volume has; dim
  * tables copied unscaled), then time the TOP-10 most expensive
  * headline rows plus the Bench spine at both scales and print the
  * wall-clock ratios. ≤ ~10× wall at 10× rows = linear; the table goes
  * to BENCH_NOTES with explanations where it isn't.
  *
  * Scaled-copy caveats, stated up front: document text is salted with
  * the copy index (" cK" suffix) so the 10× corpus does not consist of
  * exact duplicates (which would make dedup-family rows artificially
  * easy after stage 1); q283's final all-pairs scoring tail is the
  * DOCUMENTED demo quadratic (users × items both scale 10× → 100×
  * pairs) whose production path is the ANN handoff, so its ratio is
  * reported but judged against that note.
  *
  * Usage: runMain graft.tools.ScaleProbe10x [srcSfDir] [workDir]
  */
object ScaleProbe10x {

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "target/scaleprobe10x"
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

    // ---- synthesize the 10x directory ----
    def tenWay(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until 10).map { k =>
        shifts.foldLeft(df) { case (d, (c, unit)) =>
          d.withColumn(c, col(c) + lit(k * unit)) }
      }.reduce(_ unionByName _)

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    tenWay(li, Map("l_orderkey" -> 1000000000L, "l_partkey" -> 10000000L,
      "l_suppkey" -> 1000000L))
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    tenWay(ord, Map("o_orderkey" -> 1000000000L, "o_custkey" -> 10000000L))
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until 10).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * 100000000L))
        .withColumn("text", concat(col("text"), lit(s" c$k")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$work/documents.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "events", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$work/$t.parquet")

    // ---- the top-10 headline rows (r16 officials, most expensive),
    // plus any extra query names passed as args(2..) — used to extend
    // the evidence to new rows without re-probing the standing ten ----
    val probes = Seq(
      "q110_feature_store", "q283_als_portable", "q288_quality_classifier",
      "q138_curate", "q318_theil_sen", "q21_cooccurrence",
      "q285_kmv_distinct", "q272_validation", "q312_boilerplate", "q147_bpe") ++
      args.drop(2).toSeq
    val spine = Seq("q22_weekly_aggregate", "q40_rolling_stats", "q37_scorecard")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // codegen/JIT warmup at the smallest SF so both timed scales are warm
    (probes ++ spine).foreach { q =>
      try run(graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    def time(q: String, dir: String): Double = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        run(graft.SparkEntry.queries(q)(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    val rows01 = spark.read.parquet(s"$src/lineitem.parquet").count()
    val rows10 = spark.read.parquet(s"$work/lineitem.parquet").count()
    println(f"fact rows: sf0.1 = $rows01, 10x = $rows10")
    println(f"${"query"}%-28s ${"sf0.1_s"}%9s ${"x10_s"}%9s ${"ratio"}%7s")
    probes.foreach { q =>
      val a = time(q, src)
      val b = time(q, work)
      println(f"$q%-28s $a%9.2f $b%9.2f ${b / a}%7.2f")
    }
    val sT0 = System.nanoTime()
    spine.foreach(q => run(graft.SparkEntry.queries(q)(spark, src)))
    val sA = (System.nanoTime() - sT0) / 1e9
    val sT1 = System.nanoTime()
    spine.foreach(q => run(graft.SparkEntry.queries(q)(spark, work)))
    val sB = (System.nanoTime() - sT1) / 1e9
    println(f"spine (3-query)              $sA%9.2f $sB%9.2f ${sB / sA}%7.2f")
    println(f"spine rows/s: sf0.1 = ${rows01 / sA}%.0f, 10x = ${rows10 / sB}%.0f")
    spark.stop()
  }
}
