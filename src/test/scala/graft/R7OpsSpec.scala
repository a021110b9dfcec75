package graft

import org.apache.spark.sql.functions._
import graft.seq.Ar

/** Round-7 operator contracts: the AR(2) sequential kernel. */
class R7OpsSpec extends SparkSpec {
  import spark.implicits._

  // noise-free AR(2): x_t = 1 + 0.5·x_{t−1} + 0.25·x_{t−2}
  private val arSeries = Seq(4.0, 8.0, 6.0, 6.0, 5.5, 5.25)
  private def arDf = arSeries.zipWithIndex
    .map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")

  test("AR(2): exact coefficient recovery on a noise-free autoregressive series") {
    val out = Ar.fitted(arDf, Seq("k"), Seq(col("t")), "v")
      .orderBy("t").select("ar_c", "ar_phi1", "ar_phi2", "ar_fitted")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    out.foreach { case (c, p1, p2, _) =>
      assert((c, p1, p2) == ((1.0, 0.5, 0.25))) }
    // zero-residual fit: in-sample predictions reproduce the series
    assert(out.map(_._4) ==
      Seq(None, None, Some(6.0), Some(6.0), Some(5.5), Some(5.25)))
  }

  test("AR(2) forecast feeds rounded forecasts back as lags") {
    val out = Ar.forecast(arDf, Seq("k"), Seq(col("t")), "v", h = 4)
      .orderBy("step").select("step", "ar_forecast")
      .as[(Long, Double)].collect().toSeq
    // hand recursion from (x_n, x_{n−1}) = (5.25, 5.5), each step
    // rounded half-up at 4 decimals before feeding forward:
    // f3 = 1 + .5·4.8125 + .25·5 = 4.65625 → 4.6563 (not trunc 4.6562)
    assert(out == Seq((1L, 5.0), (2L, 4.8125), (3L, 4.6563), (4L, 4.5313)))
  }

  test("AR(2) degenerate: collinear lags fall back to the sample-mean forecast") {
    // linear series → l1 = l2 + 1 exactly, singular normal matrix
    val lin = (1 to 6).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val out = Ar.fitted(lin, Seq("k"), Seq(col("t")), "v")
      .orderBy("t").select("ar_c", "ar_phi1", "ar_phi2", "ar_fitted")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    out.foreach { case (c, p1, p2, _) =>
      assert((c, p1, p2) == ((4.5, 0.0, 0.0))) } // mean of regression rows 3..6
    assert(out.map(_._4) ==
      Seq(None, None, Some(4.5), Some(4.5), Some(4.5), Some(4.5)))
    val fc = Ar.forecast(lin, Seq("k"), Seq(col("t")), "v", h = 3)
      .select("ar_forecast").as[Double].collect().toSeq
    assert(fc == Seq(4.5, 4.5, 4.5))
  }

  test("AR intervals: zero in-sample residuals collapse the band onto the forecast") {
    // noise-free AR(2) → fitted ≡ actual → σ² = 0 → lo = f = hi
    val out = Ar.forecastIntervals(arDf, Seq("k"), Seq(col("t")), "v", h = 3)
      .orderBy("step").select("ar_forecast", "ar_lo", "ar_hi")
      .as[(Double, Double, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (f, lo, hi) => assert(lo == f && hi == f) }
  }

  test("AR intervals: mean-fallback band is the hand-computed constant z-band") {
    // linear 1..6 → fallback c = 4.5, φ = 0 → ψ_j = 0 for j ≥ 1, so the
    // band width is constant: residuals over t=3..6 are ±1.5, ±0.5 →
    // σ² = 1.25, half = 1.959964·√1.25 = 2.1913 (4dp)
    val lin = (1 to 6).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val out = Ar.forecastIntervals(lin, Seq("k"), Seq(col("t")), "v", h = 3)
      .orderBy("step").select("ar_forecast", "ar_lo", "ar_hi")
      .as[(Double, Double, Double)].collect().toSeq
    assert(out == Seq((4.5, 2.3087, 6.6913), (4.5, 2.3087, 6.6913),
      (4.5, 2.3087, 6.6913)))
  }

  test("AR intervals: a persistent series widens its band with the horizon") {
    // any ψ_1 ≠ 0 gives Var(2) = σ²(1+ψ_1²) > Var(1): the band must widen
    val noisy = Seq(10.0, 12.0, 11.0, 13.0, 12.0, 14.0, 12.5, 14.5, 13.0, 15.0)
      .zipWithIndex.map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")
    val out = Ar.forecastIntervals(noisy, Seq("k"), Seq(col("t")), "v", h = 4)
      .orderBy("step").select("step", "ar_lo", "ar_hi")
      .as[(Long, Double, Double)].collect().toSeq
    val widths = out.map { case (_, lo, hi) => hi - lo }
    assert(widths.zip(widths.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"band widths should be non-decreasing, got $widths")
    assert(widths.last > widths.head, s"band should widen over the horizon: $widths")
  }

  test("ARI(2,1): constant-increment series integrates to a continued ramp") {
    // y = 5,7,9,...,15: diffs all 2 → collinear diff lags → mean
    // fallback c = 2, φ = 0 → every diff forecast 2 → ŷ = 15 + 2s
    val ramp = (0 to 5).map(i => ("a", i + 1, 5.0 + 2 * i)).toDF("k", "t", "v")
    val out = Ar.forecastIntegrated(ramp, Seq("k"), Seq(col("t")), "v", h = 4)
      .orderBy("step").select("step", "ari_forecast")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 17.0), (2L, 19.0), (3L, 21.0), (4L, 23.0)))
  }

  test("seasonal ARI: periodic pattern plus constant seasonal growth continues exactly") {
    // m=3: y_t = pattern(t mod 3) + 2·(season index) → lag-3 diffs all 2
    // → collinear fallback c = 2, φ = 0 → ŷ_s = y_{n+s−3} + 2
    val pattern = Seq(5.0, 8.0, 11.0)
    val xs = (0 until 12).map(t => pattern(t % 3) + 2.0 * (t / 3))
    val df = xs.zipWithIndex.map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")
    val out = Ar.forecastSeasonalIntegrated(df, Seq("k"), Seq(col("t")), "v",
        m = 3, h = 3)
      .orderBy("step").select("step", "sari_forecast")
      .as[(Long, Double)].collect().toSeq
    // last observed season is 11, 14, 17 → each continues +2
    assert(out == Seq((1L, 13.0), (2L, 16.0), (3L, 19.0)))
  }

  test("ARI(2,1): too few differences yields no forecast rows") {
    // 3 observations → 2 diffs → no l2-complete regression row → no coefs
    val short = Seq(("a", 1, 3.0), ("a", 2, 7.0), ("a", 3, 8.0)).toDF("k", "t", "v")
    assert(Ar.forecastIntegrated(short, Seq("k"), Seq(col("t")), "v", h = 2).count() == 0)
  }

  test("AR(2): series too short to regress gets null coefficients and no forecast rows") {
    val short = Seq(("a", 1, 3.0), ("a", 2, 7.0)).toDF("k", "t", "v")
    val out = Ar.fitted(short, Seq("k"), Seq(col("t")), "v")
      .select("ar_c", "ar_fitted")
      .as[(Option[Double], Option[Double])].collect().toSeq
    assert(out == Seq((None, None), (None, None)))
    assert(Ar.forecast(short, Seq("k"), Seq(col("t")), "v", h = 2).count() == 0)
  }

  test("seasonal Theta reconstructs a pure-seasonal series exactly") {
    // alternating 10/20 with period = parity: deseasonalizing leaves a
    // constant 15, Theta fits it exactly, re-seasonalizing reproduces
    // the input — the q197-style pure-seasonal invariant
    val df = (1 to 6).map(t => ("a", t, t % 2, if (t % 2 == 1) 10.0 else 20.0))
      .toDF("k", "t", "par", "v")
    val out = graft.seq.Theta.fittedSeasonal(df, Seq("k"), Seq(col("t")), "v",
      col("par"), alpha = 0.3)
      .orderBy("t").select("seasonal", "theta_a", "theta_b", "theta_sfitted")
      .as[(Double, Double, Double, Double)].collect().toSeq
    out.zipWithIndex.foreach { case ((s, a, b, f), i) =>
      assert(a == 15.0 && b == 0.0, s"row $i")
      assert(s == (if (i % 2 == 0) -5.0 else 5.0), s"row $i")
      assert(f == (if (i % 2 == 0) 10.0 else 20.0), s"row $i")
    }
  }

  test("isotonic: minimax fit reproduces the textbook PAV pooling") {
    // y = 1, 3, 2, 4 over increasing predictions: PAV pools the 3,2
    // violation into 2.5 — fit (1, 2.5, 2.5, 4)
    val df = Seq(("a", 1.0, 1.0, 1), ("a", 2.0, 3.0, 2),
      ("a", 3.0, 2.0, 3), ("a", 4.0, 4.0, 4)).toDF("seg", "pred", "y", "id")
    val out = graft.operators.Isotonic.calibrationMap(df, Seq("seg"),
      col("pred"), col("y"), Seq(col("id")), nBins = 4)
      .orderBy("bin")
      .select("bin", "n_rows", "bin_mean", "iso_fit")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 1.0, 1.0), (2L, 1L, 3.0, 2.5),
      (3L, 1L, 2.0, 2.5), (4L, 1L, 4.0, 4.0)))
  }

  test("isotonic: fit is monotone per segment and preserves the weighted mean") {
    // deterministic pseudo-noise around an increasing signal, 2 segments
    val rows = for (s <- Seq("a", "b"); i <- 1 to 200) yield {
      val noise = ((i * 2654435761L) % 97).toDouble / 10.0 - 4.8
      (s, i.toDouble, i / 10.0 + noise, i)
    }
    val df = rows.toDF("seg", "pred", "y", "id")
    val m = graft.operators.Isotonic.calibrationMap(df, Seq("seg"),
      col("pred"), col("y"), Seq(col("id")), nBins = 10)
    val bySeg = m.select("seg", "bin", "n_rows", "iso_fit")
      .as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (s, a) => s -> a.sortBy(_._2) }
    bySeg.values.foreach { bins =>
      assert(bins.length == 10)
      bins.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo._4 <= hi._4, s"fit not monotone: $lo -> $hi") }
      // PAV preserves the weighted mean of y within each segment
      val fitTotal = bins.map(b => b._3 * b._4).sum
      val yTotal = rows.filter(_._1 == bins.head._1).map(_._3).sum
      assert(math.abs(fitTotal - yTotal) < 0.05, s"$fitTotal vs $yTotal")
    }
  }

  test("Platt: fit orients with the labels, smooths targets, calibrates monotonically") {
    import graft.operators.Platt
    val rows = Seq((1.0, false), (2.0, false), (2.5, false),
      (3.0, true), (3.5, true), (4.0, true))
    val out = Platt.fit(rows.toDF("f", "y"), col("f"), col("y"), iters = 3)
      .select("platt_a", "platt_b", "n_pos", "n_neg", "t_pos", "t_neg")
      .as[(Double, Double, Long, Long, Double, Double)].head()
    assert(out._3 == 3L && out._4 == 3L)
    // Platt smoothing: t+ = (3+1)/(3+2), t− = 1/(3+2)
    assert(out._5 == 0.8 && out._6 == 0.2)
    // positives concentrate at high scores → positive slope
    assert(out._1 > 0.0, s"a=${out._1}")
    // calibrated probabilities: in (0,1), monotone in the score, and
    // separating the classes on this data
    val probs = Seq(1.0, 2.5, 4.0).toDF("f")
      .select(Platt.calibrate(col("f"), lit(out._1), lit(out._2)).as("p"))
      .as[Double].collect().toSeq
    assert(probs.forall(p => p > 0.0 && p < 1.0))
    assert(probs == probs.sorted)
    assert(probs.head < 0.5 && probs.last > 0.5, probs.toString)
  }

  test("temperature scaling sharpens separable logits; T = 1/beta") {
    import graft.operators.Platt
    val rows = Seq((-1.0, false), (-1.0, false), (1.0, true), (1.0, true))
    val out = Platt.fitTemperature(rows.toDF("z", "y"), col("z"), col("y"))
      .select("temp_beta", "temp_t", "n_pos", "n_neg")
      .as[(Double, Double, Long, Long)].head()
    assert(out._3 == 2L && out._4 == 2L)
    // perfectly separable, hard targets → each Newton step sharpens
    assert(out._1 > 1.0, s"beta=${out._1}")
    assert(out._2 > 0.0 && out._2 < 1.0, s"T=${out._2}")
  }

  test("damped Holt forecast extrapolates the last state with damped trend sums") {
    import graft.seq.SequentialKernels
    val df = Seq(("a", 1, 10.0), ("a", 2, 12.0)).toDF("k", "t", "v")
    // state after obs 2: level 10.6, trend 2 (first difference)
    val out = SequentialKernels.dampedHoltForecast(df, Seq("k"), Seq(col("t")),
      "v", alpha = 0.3, beta = 0.1, phi = 0.9, h = 4)
      .orderBy("step").select("step", "holt_forecast")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 12.4), (2L, 14.02), (3L, 15.478), (4L, 16.7902)))
    // φ = 1 degenerates to plain Holt's linear extrapolation
    val undamped = SequentialKernels.dampedHoltForecast(df, Seq("k"),
      Seq(col("t")), "v", alpha = 0.3, beta = 0.1, phi = 1.0, h = 3)
      .orderBy("step").select("holt_forecast").as[Double].collect().toSeq
    assert(undamped == Seq(12.6, 14.6, 16.6))
    // single-observation series carries no trend → no forecast rows
    val single = Seq(("b", 1, 5.0)).toDF("k", "t", "v")
    assert(SequentialKernels.dampedHoltForecast(single, Seq("k"),
      Seq(col("t")), "v", 0.3, 0.1, 0.9, 2).count() == 0)
  }

  test("geo: haversine matches known distances; band-blocked join equals brute force") {
    import graft.operators.Geo
    // 1° of longitude at the equator ≈ 111.19 km; pole-to-pole via the
    // meridian: 180° ≈ π·R
    val known = Seq((0.0, 0.0, 0.0, 1.0), (90.0, 0.0, -90.0, 0.0))
      .toDF("la1", "lo1", "la2", "lo2")
      .select(graft.functions.Funcs.r(
        Geo.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2"))).as("d"))
      .as[Double].collect().toSeq
    assert(math.abs(known.head - 111.1949) < 0.01, known.toString)
    assert(math.abs(known(1) - math.Pi * Geo.EarthRadiusKm) < 0.01)
    // completeness: blocked join = brute-force filter on pseudo-random
    // points, including pairs that straddle band boundaries
    val left = (1 to 60).map { i =>
      (i.toLong, (i * 37 % 170).toDouble - 85.0, (i * 91 % 360).toDouble - 180.0)
    }.toDF("lid", "llat", "llon")
    val right = (1 to 60).map { i =>
      (i.toLong, (i * 53 % 170).toDouble - 84.7, (i * 29 % 360).toDouble - 179.5)
    }.toDF("rid", "rlat", "rlon")
    val blocked = Geo.withinDistance(left, right, col("llat"), col("llon"),
      col("rlat"), col("rlon"), maxKm = 800.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = left.crossJoin(right)
      .withColumn("d", graft.functions.Funcs.r(
        Geo.haversineKm(col("llat"), col("llon"), col("rlat"), col("rlon"))))
      .filter(col("d") <= 800.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(blocked == brute, s"${blocked.size} vs ${brute.size}")
    assert(brute.nonEmpty)
  }

  test("plausibility: leaky + constant + shifted submission scores risk 1.0, healthy scores 0") {
    import graft.io.SubmissionValidator
    def frames(qty: Seq[Long], actual: Seq[Double], hist: Seq[Double]) = {
      val sub = qty.zipWithIndex.map { case (q, i) => (1, i.toLong, i.toLong, q) }
        .toDF("semana", "pdv", "produto", "quantidade")
      val act = actual.zipWithIndex.map { case (a, i) => (1, i.toLong, i.toLong, a) }
        .toDF("semana", "pdv", "produto", "actual")
      val h = hist.toDF("q")
      SubmissionValidator.plausibilityReport(sub, act, col("actual"), h, col("q"))
        .select("wmape_pct", "leak_risk", "shift_flag", "constant_flag", "risk_score")
        .as[(Double, Double, Long, Long, Double)].head()
    }
    // constant 100s matching actuals ≈ perfectly (wmape 0) with history
    // centered at 10: all three flags fire → 0.6 + 0.3 + 0.1 = 1.0
    val leaky = frames(Seq(100L, 100L, 100L),
      Seq(100.0, 100.0, 100.0), Seq(10.0, 10.0))
    assert(leaky == ((0.0, 1.0, 1L, 1L, 1.0)))
    // varied predictions, honest ~30% wmape, level near history → all clear
    val healthy = frames(Seq(70L, 130L, 160L),
      Seq(100.0, 100.0, 200.0), Seq(115.0, 125.0))
    assert(healthy._2 == 0.0 && healthy._3 == 0L && healthy._4 == 0L
      && healthy._5 == 0.0)
    // near-suspicious band: wmape = 21/300 = 7% ∈ [5,10) → 0.7 leak leg only
    val warm = frames(Seq(100L, 121L, 100L),
      Seq(100.0, 100.0, 100.0), Seq(100.0, 104.0))
    assert(warm._1 == 7.0 && warm._2 == 0.7)
    assert(warm._3 == 0L && warm._4 == 0L && warm._5 == 0.42)
  }
}
