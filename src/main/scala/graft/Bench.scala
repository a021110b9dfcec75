package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): times headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are fully materialized through the noop sink (forces every
  * column and operator to execute — `count()` lets Spark skip payload
  * columns). The headline set covers the pipeline spine (weekly grain,
  * enrichment, windows, kernels) plus the expensive distributed ops
  * (co-occurrence, Jaccard dedup, ANN).
  */
object Bench {

  private val headline = Seq(
    "q01_clean_filter", "q09_key_stats", "q14_hierarchy_rollup", "q21_cooccurrence",
    "q22_weekly_aggregate", "q23_enrich_join", "q37_scorecard", "q40_rolling_stats",
    "q41_rolling_slope", "q47_zero_streaks", "q64_ngram_jaccard", "q65_minhash_candidates",
    "q68_ann_brute", "q69_ann_lsh", "q73_ewma", "q77_intermittency", "q79_postprocess_chain",
    "q110_feature_store", "q111_residual_diag", "q116_sessionize", "q117_tfidf",
    "q124_span_dedup", "q126_harmonic_fit", "q130_quality_filter", "q131_source_mix",
    "q136_decompose", "q138_curate",
    "q153_auc", "q161_attribution", "q162_ohlc", "q167_ols2", "q171_rolling_corr",
    "q181_topk",
    "q198_error_slices", "q199_resid_diag_parts", "q200_monitor",
    "q201_quantize_int8", "q203_covariance", "q204_ivf_portable",
    "q194_quantile_norm", "q214_ar2", "q215_isotonic",
    "q225_changepoint", "q228_dbscan", "q229_clustering_coeff",
    "q233_dominant_period", "q239_dsir_score",
    "q249_ari_forecast", "q251_ar_intervals", "q252_weighted_quantiles",
    "q253_ma1_fit", "q254_sari_forecast", "q255_arma_fit",
    "q259_champion", "q260_wmape_calibration", "q261_bootstrap",
    "q262_quantile_reg", "q263_pq_codes", "q264_pq_adc",
    "q265_sketch_distinct", "q266_hw_forecast", "q267_champion_blend",
    "q268_quality_scorecard", "q269_drift_report", "q270_importance_stability",
    "q271_model_weights", "q272_validation", "q273_leaderboard",
    "q274_competition", "q275_health_report", "q276_kneser_ney",
    "q277_ann_recall", "q278_systematic_bias", "q279_volume_patterns",
    "q280_temperature_mix", "q281_cross_dim_wmape",
    "q282_image_decode", "q283_als_portable", "q284_prefixspan_portable",
    "q146_semdedup", "q147_bpe", "q285_kmv_distinct", "q286_order_search",
    "q287_audio_decode", "q288_quality_classifier", "q289_mmr_select",
    "q290_winnow", "q291_ranking_metrics", "q292_winnow_pairs",
    "q293_record_linkage", "q294_zorder", "q295_kanonymity",
    "q296_kanon_suppress", "q297_arima211", "q298_arima021",
    "q299_order_search_ext", "q300_champion_ext", "q301_hist_quantiles",
    "q302_cm_frequency", "q303_range_rewrite", "q304_asof_exec",
    "q305_asof_exec_fwd", "q306_range_rewrite_ts", "q307_arima212",
    "q308_sarima011", "q309_blend_ext", "q310_sarma11", "q311_ma3_probe",
    "q312_boilerplate", "q313_ar5_probe", "q314_acf_pacf",
    "q315_overlap_join", "q316_dp_release", "q317_rrf_fusion",
    "q318_theil_sen", "q319_mann_kendall", "q320_ljung_box",
    "q321_ccf", "q322_kmv_overlap", "q323_jarque_bera", "q324_arch_lm",
    "q325_partialed_rolling", "q326_theil_sen_sampled",
    "q327_mann_kendall_tied", "q328_kendall_tau", "q329_mann_whitney",
    "q330_kruskal_wallis")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // JVM+codegen warmup on the smallest SF so timings measure the
    // query, not classloading (driver runs each round cold).
    try run(SparkEntry.queries("q22_weekly_aggregate")(spark, "/root/testdata/sf0.001"))
    catch { case _: Throwable => () }

    // Fixed CPU calibration (r13 verdict ask #6): a CONSTANT
    // single-thread xorshift loop (~1 s on an idle core) timed
    // immediately before the sweep and embedded in the record, so
    // round-over-round comparisons can normalize by the host's measured
    // per-core throughput instead of re-litigating the 1.3-1.7x
    // host-state band from loadavg alone. The loop is pure register
    // arithmetic — no allocation, no memory traffic — so its time moves
    // only with clock speed / steal time, exactly the signal wanted.
    def xorshiftLoop(n: Long): Long = {
      var x = 0x9E3779B97F4A7C15L; var i = 0L
      while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      x
    }
    val jitWarm = xorshiftLoop(5000000L) // compile the loop before timing
    val calibT0 = System.nanoTime()
    val calibX = xorshiftLoop(600000000L)
    val cpuCalibSec = (System.nanoTime() - calibT0) / 1e9
    if (jitWarm == 42L && calibX == 42L) System.err.println("") // defeat DCE

    // best-of-3: the first pass pays JIT/codegen compilation; later
    // passes measure the query. Keep the minimum — on a shared
    // container single runs vary ±30%+ (r5 flagged 4 phantom 1.6-2×
    // regressions with no code change), and a 3rd sample cuts the
    // odds both measured passes land slow.
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try { run(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
        }
        name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
      }
    }

    // throughput on the spine: rows of the fact table / wall time of the
    // clean->enrich->weekly->window pipeline (BASELINE.md: 110k rows/s)
    val factRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val spineT0 = System.nanoTime()
    run(SparkEntry.queries("q22_weekly_aggregate")(spark, sfDir))
    run(SparkEntry.queries("q40_rolling_stats")(spark, sfDir))
    run(SparkEntry.queries("q37_scorecard")(spark, sfDir))
    val spineSec = (System.nanoTime() - spineT0) / 1e9
    val rowsPerSec = factRows / spineSec

    // host congestion marker: a shared container's load average is the
    // discriminator between code regressions and noisy-neighbor rounds
    // (BENCH_NOTES.md) — carry it inside the metrics line itself
    val loadavg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "unavailable" }

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.filter(_._2 > 0).map(_._2).sum
    // Calib-normalized totals (r14 verdict ask #5): the r14 three-sweep
    // experiment proved wall/calib is stable within ~4% across the
    // 1.28-1.39 host-state band (113.76 @ 1.279, 116.91 @ 1.303,
    // 130.44 @ 1.393 -> 88.9 / 89.7 / 93.6 normalized), so the record
    // carries total/calib and per-query wall/calib — round-over-round
    // comparison becomes a mechanical subtraction instead of a
    // host-state argument. Unit: "calib-seconds" (wall seconds a
    // 1.000-calib core would take).
    val totalNorm = total / cpuCalibSec
    val qsNorm = results.map { case (k, v) =>
      "\"" + k + f"\":${if (v > 0) v / cpuCalibSec else v}%.3f" }
      .mkString("{", ",", "}")
    val fullLine = f"""{"metric":"total_headline","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","fact_rows":$factRows,"spine_sec":$spineSec%.3f,"spine_rows_per_sec":$rowsPerSec%.0f,"loadavg":"$loadavg","cpu_calib_sec":$cpuCalibSec%.3f,"total_normalized":$totalNorm%.3f,"queries_normalized":$qsNorm}"""
    println(fullLine)
    // The driver stores only the LAST 2000 bytes of stdout and parses
    // the JSON line it finds there; the full-name line above is ~2.5 KB
    // so its head falls off the window (r8-r10 all recorded
    // "parsed": null). Persist the full record to a file, then print a
    // compact twin LAST — query keys truncated to their unique qNNN
    // prefix — that fits the tail window whole.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
    catch { case _: Throwable => () }
    val qsShort = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + f"\":$v%.3f" }.mkString("{", ",", "}")
    System.out.flush()
    println(f"""{"metric":"total_headline","value":$total%.3f,"unit":"sec","queries":$qsShort,"sf":"$sfDir","fact_rows":$factRows,"spine_sec":$spineSec%.3f,"spine_rows_per_sec":$rowsPerSec%.0f,"loadavg":"$loadavg","cpu_calib_sec":$cpuCalibSec%.3f,"total_normalized":$totalNorm%.3f}""")
    System.out.flush()
    spark.stop()
  }
}
