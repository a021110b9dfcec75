package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AggFeatures, WindowFeatures, SeriesWindow}

/** Manual end-to-end probe: exercises the operator library through its
  * public API over the driver-provided test parquet. Not part of the
  * driver contract — a human/debug entry point (`sbt "runMain
  * graft.tools.SmokeProbe /root/testdata/sf0.001"`).
  */
object SmokeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .appName("graft-smoke")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.lineitem(spark, dir)

    println("== A7 topNShare (share of supplier volume in its top-5 parts) ==")
    AggFeatures.topNShare(li, Seq(col("l_suppkey")), Seq(col("l_partkey")),
      col("l_quantity"), Seq("l_suppkey"), n = 5)
      .orderBy("l_suppkey").show(5, truncate = false)

    println("== A13 marketShareRank (by part brand, joined) ==")
    val withBrand = li.join(broadcast(Tables.part(spark, dir)),
      li("l_partkey") === col("p_partkey"), "left")
    AggFeatures.marketShareRank(withBrand, Seq(col("p_brand")), col("l_quantity"), Seq("p_brand"))
      .orderBy("rnk").show(5, truncate = false)

    println("== A29 coOccurrence (parts within orders, minSupport=2) ==")
    AggFeatures.coOccurrence(li, Seq("l_orderkey"), "l_partkey", minSupport = 2)
      .orderBy(desc("pair_count"), asc("item_a"), asc("item_b")).show(5, truncate = false)

    println("== A10 hierarchyRollup (brand/type grouping sets) ==")
    AggFeatures.hierarchyRollup(
      withBrand.select(col("p_brand"), col("p_type"), col("l_quantity")),
      Seq("p_brand", "p_type"), "l_quantity")
      .orderBy(asc_nulls_last("p_brand"), asc_nulls_last("p_type")).show(5, truncate = false)

    println("== W7 withRollingSlope / W8 withRollingAutocorr1 (per part-supp series) ==")
    val sw = SeriesWindow(
      Seq(col("l_partkey"), col("l_suppkey")),
      Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
    val slid = WindowFeatures.withRollingSlope(li, "l_quantity", 4, sw, "slope4")
    val auto = WindowFeatures.withRollingAutocorr1(slid, "l_quantity", 8, sw, "ac1")
    auto.select("l_partkey", "l_suppkey", "l_shipdate", "l_quantity", "slope4", "ac1")
      .orderBy("l_partkey", "l_suppkey", "l_shipdate").show(8, truncate = false)

    println("== S7/M17 submission sink round-trip + validator ==")
    import spark.implicits._
    val sub = Seq((1, 10L, 100L, 5L), (2, 10L, 100L, 3L), (5, 11L, 101L, 0L))
      .toDF("semana", "pdv", "produto", "quantidade")
    val subDir = java.nio.file.Files.createTempDirectory("graft_probe").toString + "/sub"
    val back = graft.io.Sinks.csvSubmission(spark, sub, subDir)
    graft.io.SubmissionValidator.report(back).show(truncate = false)
    println(s"isValid=${graft.io.SubmissionValidator.isValid(back)}")

    println("== Streaming windowed counts over the events table (batch parity) ==")
    val ev = Tables.events(spark, dir)
    graft.streaming.EventsStream.windowedCountsBatch(ev, "7 days")
      .orderBy("window_start", "event_type").show(5, truncate = false)

    println("== round-6 ops: monitor run, int8 quantize, k-core, PCA, portable IVF ==")
    graft.app.Jobs.monitorRun(spark, dir).show(20, truncate = false)
    val emb = Tables.embeddings(spark, dir)
    graft.sim.Quantize.int8(emb).show(5, truncate = false)
    val bip = li.select((col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst")).distinct()
    graft.graph.KCore.kCore(bip, "src", "dst", k = 5, iters = 2).show(5, truncate = false)
    graft.sim.Pca.covarianceMatrix(emb).orderBy("i", "j").show(5, truncate = false)
    val probeQs = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    graft.sim.Similarity.ivfPortableTopK(emb, probeQs, k = 3, dim = 64,
      nlist = 4, nprobe = 2, iters = 1).show(6, truncate = false)

    println("== round-7 ops: AR(2), isotonic, Platt, seasonal Theta, plausibility ==")
    val weekly = graft.etl.Enrichment.weeklyAggregate(li, col("l_shipdate"),
      Seq(col("l_partkey"), col("l_suppkey")), col("l_quantity"))
    graft.seq.Ar.fitted(weekly, Seq("l_partkey", "l_suppkey"),
      Seq(col("week_start")), "qty_sum")
      .orderBy("l_partkey", "l_suppkey", "week_start").show(5, truncate = false)
    graft.seq.Ar.forecast(weekly, Seq("l_partkey", "l_suppkey"),
      Seq(col("week_start")), "qty_sum", h = 3)
      .orderBy("l_partkey", "l_suppkey", "step").show(6, truncate = false)
    val scored = li.withColumn("pred", graft.functions.Funcs.r(
      avg(col("l_quantity")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"), col("l_suppkey")))))
    graft.operators.Isotonic.calibrationMap(scored, Seq("l_returnflag"),
      col("pred"), col("l_quantity"),
      Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity")), nBins = 5)
      .orderBy("l_returnflag", "bin").show(6, truncate = false)
    graft.operators.Platt.fit(scored, col("pred"),
      col("l_returnflag") === "R").show(truncate = false)
    graft.seq.Theta.fittedSeasonal(weekly, Seq("l_partkey", "l_suppkey"),
      Seq(col("week_start")), "qty_sum", month(col("week_start")), alpha = 0.3)
      .orderBy("l_partkey", "l_suppkey", "week_start").show(5, truncate = false)

    println("== round-7 batch-2: changepoint, OOF encoding, modularity, dbscan ==")
    graft.operators.Changepoint.bestSplit(weekly,
      Seq("l_partkey", "l_suppkey"), col("week_start"), "qty_sum")
      .orderBy(desc("gain")).show(5, truncate = false)
    graft.operators.Assoc.targetEncodeOof(li, "l_returnflag",
      col("l_orderkey") * 8 + col("l_linenumber"), col("l_quantity") > 25,
      folds = 5, m = 10.0).orderBy("l_returnflag", "fold").show(6, truncate = false)
    val commMap = graft.core.Tables.part(spark, dir)
      .select((col("p_partkey") * 2).as("node"), (col("p_size") % 5).as("community"))
      .unionByName(graft.core.Tables.supplier(spark, dir).select(
        (col("s_suppkey") * 2 + 1).as("node"), (col("s_nationkey") % 5).as("community")))
    graft.graph.Modularity.perCommunity(bip, "src", "dst",
      commMap, "node", "community").orderBy("community").show(truncate = false)
    val geoPts = graft.core.Tables.customer(spark, dir)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("pid"),
        ((col("c_custkey") * 53 % 17000) / 100.0 - 85.0).as("lat"),
        ((col("c_custkey") * 29 % 36000) / 100.0 - 180.0).as("lon"))
    graft.operators.GeoCluster.dbscanClassify(geoPts, col("pid"),
      col("lat"), col("lon"), epsKm = 300.0, minPts = 4)
      .groupBy("cls").agg(count(lit(1)).as("n")).show(truncate = false)

    println("== round-7 batch-3: clustering coeff, nearest-geo, assortativity ==")
    graft.graph.Triangles.clusteringCoefficient(
      graft.graph.Triangles.coOccurrenceEdges(
        li.filter(col("l_partkey") % 100 === 0), "l_partkey", "l_suppkey"))
      .orderBy("node").show(5, truncate = false)
    graft.operators.Geo.nearestWithin(
      geoPts.select(col("pid").as("ck"), col("lat").as("c_la"), col("lon").as("c_lo")),
      geoPts.select(col("pid").as("sk"), col("lat").as("s_la"), col("lon").as("s_lo"))
        .filter(col("sk") % 2 === 0),
      col("ck"), col("c_la"), col("c_lo"), col("s_la"), col("s_lo"),
      maxKm = 2000.0, rightTie = col("sk")).orderBy("ck").show(5, truncate = false)
    graft.graph.Assortativity.degreeAssortativity(bip, "src", "dst")
      .show(truncate = false)

    println("== round-7 batch-4: PMI, dominant period, RFM ==")
    graft.text.Collocations.pmi(graft.core.Tables.documents(spark, dir),
      "text", minCount = 3).orderBy(desc("pmi")).show(5, truncate = false)
    val weeklySup = graft.etl.Enrichment.weeklyAggregate(li, col("l_shipdate"),
      Seq(col("l_suppkey")), col("l_quantity"))
    graft.operators.Decompose.dominantPeriod(weeklySup, Seq("l_suppkey"),
      col("week_start"), "qty_sum", Seq(4, 13, 26))
      .orderBy("l_suppkey").show(5, truncate = false)
    graft.operators.Cohorts.rfm(graft.core.Tables.orders(spark, dir),
      "o_custkey", "o_orderdate", "o_totalprice", asOf = "1998-12-31")
      .groupBy("segment").agg(count(lit(1)).as("n")).show(truncate = false)

    println("== round-7 batch-5: gini, benford, baseline forecasts ==")
    val custSpend = graft.core.Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(graft.functions.Funcs.r(sum(col("o_totalprice"))).as("spend"))
      .join(broadcast(graft.core.Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    graft.operators.Pareto.gini(custSpend, Seq("c_mktsegment"),
      col("spend"), Seq(col("o_custkey"))).orderBy("c_mktsegment")
      .show(truncate = false)
    graft.operators.Benford.firstDigitProfile(li, col("l_extendedprice"))
      .orderBy("digit").show(9, truncate = false)
    graft.seq.Baselines.forecasts(weeklySup, Seq("l_suppkey"),
      col("week_start"), "qty_sum", h = 4, period = 13)
      .orderBy("l_suppkey", "step").show(8, truncate = false)

    graft.seq.Baselines.seasonalNaiveAdaptive(weeklySup, Seq("l_suppkey"),
      col("week_start"), "qty_sum",
      graft.operators.Decompose.dominantPeriod(weeklySup, Seq("l_suppkey"),
        col("week_start"), "qty_sum", Seq(4, 13, 26)),
      "best_period", h = 4).orderBy("l_suppkey", "step").show(4, truncate = false)

    graft.text.Dsir.unigramLogRatioScore(
      graft.core.Tables.documents(spark, dir), "doc_id", "text",
      col("lang") === "en").orderBy(desc("dsir_score")).show(5, truncate = false)
    graft.operators.WeightedStats.weightedMedian(li, Seq("l_returnflag"),
      col("l_extendedprice"), col("l_quantity"),
      Seq(col("l_orderkey"), col("l_linenumber"))).show(truncate = false)

    graft.operators.Inventory.safetyStock(weekly,
      Seq("l_partkey", "l_suppkey"), "qty_sum", z = 1.645, leadPeriods = 2)
      .orderBy(desc("order_up_to")).show(5, truncate = false)
    graft.operators.PriceOpt.optimalPrice(
      li.join(broadcast(graft.core.Tables.part(spark, dir)
        .select(col("p_partkey"),
          graft.functions.Funcs.r(col("p_retailprice") * 0.6).as("cost"))),
        col("l_partkey") === col("p_partkey")),
      Seq("l_partkey"),
      graft.functions.Funcs.r(col("l_extendedprice") / col("l_quantity")),
      col("l_quantity"), col("cost"))
      .orderBy("l_partkey").show(5, truncate = false)

    val firstSplit = graft.operators.Changepoint.bestSplit(weeklySup,
      Seq("l_suppkey"), col("week_start"), "qty_sum")
    graft.operators.Changepoint.bestSplit(
      weeklySup.join(firstSplit.select(col("l_suppkey"), col("cp_at")), Seq("l_suppkey"))
        .withColumn("segment", when(col("week_start") <= col("cp_at"), lit("L"))
          .otherwise(lit("R"))).drop("cp_at"),
      Seq("l_suppkey", "segment"), col("week_start"), "qty_sum")
      .orderBy(desc("gain")).show(4, truncate = false)

    graft.app.Jobs.planInventory(spark, dir)
      .orderBy(desc("order_target")).show(5, truncate = false)

    graft.operators.Assoc.spearman(li, Seq("l_returnflag"),
      col("l_quantity"), col("l_extendedprice")).show(truncate = false)

    graft.etl.Skew.keySkewReport(li, Seq("l_partkey")).show(truncate = false)

    println("== round-9: ARI / MA(1) / intervals / SARI / weighted quantiles ==")
    graft.seq.Ar.forecastIntegrated(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum", h = 3)
      .orderBy("l_suppkey", "step").show(6, truncate = false)
    graft.seq.Ar.forecastIntervals(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum", h = 3)
      .orderBy("l_suppkey", "step").show(6, truncate = false)
    graft.seq.Ar.forecastSeasonalIntegrated(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum", m = 13, h = 4)
      .orderBy("l_suppkey", "step").show(4, truncate = false)
    graft.seq.SequentialKernels.withMa1(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum", theta = 0.4)
      .orderBy("l_suppkey", "week_start")
      .select("l_suppkey", "week_start", "ma1_resid", "ma1_fitted")
      .show(5, truncate = false)
    graft.seq.SequentialKernels.fitMa1(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum")
      .orderBy("l_suppkey").show(5, truncate = false)
    graft.seq.SequentialKernels.fitArma11(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum")
      .orderBy("l_suppkey").show(5, truncate = false)
    graft.seq.Theta.forecast(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum", alpha = 0.3, h = 3)
      .orderBy("l_suppkey", "step").show(6, truncate = false)
    graft.operators.WeightedStats.weightedQuantiles(li, Seq("l_returnflag"),
      col("l_extendedprice"), col("l_quantity"),
      Seq(col("l_orderkey"), col("l_linenumber")), qs = Seq(0.25, 0.5, 0.75))
      .orderBy("l_returnflag", "q").show(9, truncate = false)

    println("== round-10: champion pick, PQ/ADC, HLL rollup, HW forecast ==")
    graft.seq.Champion.championForecast(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum", h = 3, m = 13)
      .orderBy("l_suppkey", "step").show(6, truncate = false)
    val pqCb = graft.sim.Pq.trainCodebooks(emb, dim = 64, m = 4, ksub = 4, iters = 1)
    val pqCodes = graft.sim.Pq.encode(emb, pqCb, dim = 64, m = 4)
    graft.sim.Pq.adcTopK(pqCodes, pqCb, probeQs, k = 3, dim = 64, m = 4)
      .orderBy("query_id", "rank").show(6, truncate = false)
    graft.operators.SketchRollup.distinctOverRange(
      graft.operators.SketchRollup.sketchTable(li, Seq("l_suppkey"),
        to_date(date_trunc("week", col("l_shipdate"))), col("l_partkey")),
      Seq("l_suppkey")).orderBy("l_suppkey").show(5, truncate = false)
    graft.seq.SequentialKernels.holtWintersForecast(weeklySup, Seq("l_suppkey"),
      Seq(col("week_start")), "qty_sum",
      alpha = 0.3, beta = 0.1, gamma = 0.2, m = 4, h = 3)
      .orderBy("l_suppkey", "step").show(6, truncate = false)
    graft.operators.QuantileReg.fit(li, Seq("l_returnflag"),
      col("l_discount"), col("l_quantity")).orderBy("l_returnflag", "tau")
      .show(9, truncate = false)

    println("== round-10b: diagnostics + performance-weighted ensemble ==")
    locally {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("week_start"))
      val scored = weeklySup
        .withColumn("pred", graft.functions.Funcs.r(lag(col("qty_sum"), 1).over(w)))
        .withColumn("unc", graft.functions.Funcs.r(abs(lag(col("qty_sum"), 1).over(w) -
          lag(col("qty_sum"), 2).over(w))))
        .filter(col("unc").isNotNull)
      graft.metrics.Diagnostics.qualityScorecard(scored, Seq("l_suppkey"),
        col("qty_sum"), col("pred"), col("unc"), col("pred"),
        Seq(col("week_start")))
        .orderBy("l_suppkey")
        .select("l_suppkey", "wmape", "accuracy_score", "calibration_score",
          "consistency_score", "overall_quality", "quality_grade")
        .show(5, truncate = false)
      graft.metrics.Diagnostics.driftReport(li.withColumn("pred",
        graft.functions.Funcs.r(avg(col("l_quantity"))
          .over(Window.partitionBy(col("l_partkey"))))),
        Seq("l_returnflag"),
        Seq("target" -> col("l_quantity"), "residual" -> (col("l_quantity") - col("pred"))),
        col("l_shipdate") >= lit("1996-01-01").cast("date"),
        col("l_quantity"), col("pred"))
        .orderBy("l_returnflag", "channel").show(9, truncate = false)
      import spark.implicits._
      val imp = Seq(("l_discount", 0.3, 0.25), ("l_tax", 0.2, 0.3),
        ("l_extendedprice", 0.5, 0.45)).toDF("feature", "base_imp", "cur_imp")
      graft.metrics.Diagnostics.importanceStability(imp, Nil, col("feature"),
        col("base_imp"), col("cur_imp")).show(truncate = false)
      val melted = weeklySup
        .withColumn("naive", graft.functions.Funcs.r(lag(col("qty_sum"), 1).over(w)))
        .filter(col("naive").isNotNull)
        .select(lit("all").as("scenario"), col("qty_sum"),
          lit("naive").as("model"), col("naive").as("pred"))
      val wts = graft.model.Ensembles.scenarioWeights(melted, Seq("scenario"),
        col("model"), col("qty_sum"), col("pred"))
      wts.show(truncate = false)
      graft.model.Ensembles.weightedBlend(melted.withColumn("obs", col("qty_sum")),
        wts, Seq("scenario"), Seq("obs"), col("model"), col("pred"))
        .show(3, truncate = false)
      graft.metrics.Validation.validateModel(scored, Seq("l_suppkey"),
        col("qty_sum"), col("pred"), Seq(col("week_start")))
        .orderBy("l_suppkey", "check_name")
        .select("l_suppkey", "check_name", "n_issues", "result")
        .show(10, truncate = false)
      val board = scored.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_weeks"),
          graft.functions.Funcs.r(sum(abs(col("qty_sum") - col("pred"))) /
            (sum(abs(col("qty_sum"))) + lit(1e-8))).as("score"))
      graft.operators.Leaderboard.positionReport(board, col("l_suppkey"),
        col("score"))
        .orderBy("rank")
        .select("team", "score", "rank", "competitive_zone", "gap_to_next",
          "achievability", "recommended_target")
        .show(5, truncate = false)
      graft.operators.Leaderboard.competitionSummary(board, col("l_suppkey"),
        col("score"), col("n_weeks")).show(truncate = false)
      graft.metrics.BiasAnalysis.systematicBias(
        li.withColumn("pred", graft.functions.Funcs.r(avg(col("l_quantity"))
          .over(Window.partitionBy(col("l_partkey"))))),
        Seq("l_returnflag"),
        Seq("linestatus" -> col("l_linestatus"),
          "month" -> date_format(col("l_shipdate"), "yyyy-MM")),
        col("l_quantity"), col("pred"), trendDim = Some("month"))
        .orderBy("l_returnflag", "section", "dimension", "segment")
        .select("l_returnflag", "section", "dimension", "segment", "mean_bias",
          "sig_flag", "severity")
        .show(8, truncate = false)
      graft.metrics.Diagnostics.healthReport(
        li.withColumn("pred", graft.functions.Funcs.r(avg(col("l_quantity"))
          .over(Window.partitionBy(col("l_partkey"))))).withColumn("unc", lit(5.0)),
        Seq("l_returnflag"), col("l_quantity"), col("pred"), col("unc"),
        col("l_shipdate") >= lit("1996-01-01").cast("date"))
        .orderBy("l_returnflag")
        .select("l_returnflag", "wmape", "prediction_stability", "health_score",
          "n_alerts", "n_warnings")
        .show(truncate = false)
    }

    println("== native as-of join exec (custom LogicalPlan/Strategy/SparkPlan) ==")
    val evAsOf = Tables.events(spark, dir)
    val purch = evAsOf.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clk = evAsOf.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    graft.operators.AsOfJoin.asOfNative(purch, clk, Seq("user_id"), "ts", "ts",
      Seq("click_id")).orderBy("event_id").show(5, truncate = false)

    println("== entry() flagship pipeline (driver smoke contract) ==")
    graft.SparkEntry.entry(spark).show(truncate = false)

    println("SMOKE_OK")
    spark.stop()
  }
}
