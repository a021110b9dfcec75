package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for the ARMA/CSS board (q249/q251/q253/
  * q254/q255): time the weekly aggregate, the mu-join-centered frame,
  * and each full fit in isolation (noop sink, warm best-of-3) so the
  * dominant stage is measured, not guessed (guide §1.1/§1.4).
  * Usage: runMain graft.tools.ArProbe <sfDir> */
object ArProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ARPROBE $name%-18s ${ts.map(x => f"$x%.2f").mkString(" ")} min=${ts.min}%.2f")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def weekly = graft.etl.Enrichment.weeklyAggregate(li, col("l_shipdate"),
      Seq(col("l_partkey"), col("l_suppkey")), col("l_quantity"))
    t("weekly_agg")(weekly)
    def mu = weekly.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(graft.functions.Funcs.microMean(col("qty_sum")).as("__mu"))
    t("mu_agg")(mu)
    t("centered_join")(weekly.join(mu, Seq("l_partkey", "l_suppkey"))
      .withColumn("__xc", col("qty_sum").cast("double") - col("__mu")))
    t("full_q253")(graft.seq.SequentialKernels.fitMa1(weekly,
      Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum"))
    t("full_q255")(graft.seq.SequentialKernels.fitArma11(weekly,
      Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum"))
    t("full_q249")(graft.seq.Ar.forecastIntegrated(weekly,
      Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum", h = 4))
    t("full_q251")(graft.seq.Ar.forecastIntervals(weekly,
      Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum", h = 4))

    // r18 array-vs-fold A/B inside ONE JVM (cross-JVM variance at sf0.1
    // is ±1 s — within-session alternation cancels the drift): the conf
    // is read at plan-build time, so flipping it between builds selects
    // the form. Also the packed-series stage alone, to separate the
    // collect_list aggregate's cost from the fit projection's.
    def packOnly = weekly.filter(col("l_partkey").isNotNull && col("l_suppkey").isNotNull)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(graft.functions.Funcs.microMean(col("qty_sum")).as("__mu"),
        sort_array(collect_list(struct(col("week_start").as("__o0"),
          col("qty_sum").cast("double").as("__v")))).as("__cells"))
    t("pack_only")(packOnly)
    (1 to 2).foreach { round =>
      spark.conf.set(graft.seq.SequentialKernels.ArrayFitsConf, "true")
      t(s"q253_array_r$round")(graft.seq.SequentialKernels.fitMa1(weekly,
        Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum"))
      t(s"q255_array_r$round")(graft.seq.SequentialKernels.fitArma11(weekly,
        Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum"))
      spark.conf.set(graft.seq.SequentialKernels.ArrayFitsConf, "false")
      t(s"q253_fold_r$round")(graft.seq.SequentialKernels.fitMa1(weekly,
        Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum"))
      t(s"q255_fold_r$round")(graft.seq.SequentialKernels.fitArma11(weekly,
        Seq("l_partkey", "l_suppkey"), Seq(col("week_start")), "qty_sum"))
      spark.conf.unset(graft.seq.SequentialKernels.ArrayFitsConf)
    }

    // supplier-grain big-grid fits (the extFitShared members: ARMA(2,1)
    // 36 triples, ARMA(2,2) 108 quads over ~60-week series) — the
    // regime where the interpreted HOF cost could bite
    def weeklySup = graft.etl.Enrichment.weeklyAggregate(li, col("l_shipdate"),
      Seq(col("l_suppkey")), col("l_quantity"))
    (1 to 2).foreach { round =>
      spark.conf.set(graft.seq.SequentialKernels.ArrayFitsConf, "true")
      t(s"a21sup_array_r$round")(graft.seq.SequentialKernels.fitArma21Full(weeklySup,
        Seq("l_suppkey"), Seq(col("week_start")), "qty_sum"))
      t(s"a22sup_array_r$round")(graft.seq.SequentialKernels.fitArma22Full(weeklySup,
        Seq("l_suppkey"), Seq(col("week_start")), "qty_sum"))
      spark.conf.set(graft.seq.SequentialKernels.ArrayFitsConf, "false")
      t(s"a21sup_fold_r$round")(graft.seq.SequentialKernels.fitArma21Full(weeklySup,
        Seq("l_suppkey"), Seq(col("week_start")), "qty_sum"))
      t(s"a22sup_fold_r$round")(graft.seq.SequentialKernels.fitArma22Full(weeklySup,
        Seq("l_suppkey"), Seq(col("week_start")), "qty_sum"))
      spark.conf.unset(graft.seq.SequentialKernels.ArrayFitsConf)
    }
    spark.stop()
  }
}
