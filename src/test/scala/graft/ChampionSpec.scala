package graft

import org.apache.spark.sql.functions._
import graft.seq.Champion

/** Champion model-selection contracts (the auto-ARIMA pick, reference
  * src/models/arima_temporal.py:277-361): eight series engineered so
  * that EACH family member dominates the AIC scoreboard on exactly one
  * of them, plus shape and partitioning-invariance contracts on the
  * winner's forecast output. */
class ChampionSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double): Double = math.round(x * 1e4) / 1e4

  /** Deterministic 4dp white noise in [−4, 4] (splitmix64-style index
    * hash — no RNG object, so the series, and therefore the champion,
    * is a fixed contract; a low-discrepancy sequence would be
    * AR-predictable and let ar2 steal every series). */
  private def noise(i: Int): Double = {
    var z = (i + 1L) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    r4(((z >>> 11).toDouble / (1L << 53).toDouble - 0.5) * 8.0)
  }

  private val pat = Seq(10.0, 50.0, 20.0, 80.0, 30.0, 90.0, 40.0, 100.0,
    60.0, 110.0, 70.0, 120.0, 130.0)

  /** Self-consistent damped-Holt series: from t = 3 every value IS the
    * member's one-step prediction r4(l_{t−1} + 0.9·b_{t−1}) computed
    * through the same level/trend recursion, so its SSE is exactly 0;
    * ar2/ari also track the underlying 2nd-order recurrence but keep
    * 4dp rounding residue (and pay k = 3 vs 2 even when clamped), so
    * holt_damped wins. Returns (series, final level, final trend). */
  private def holtSelfConsistent(n: Int): (Seq[Double], Double, Double) = {
    val xs = collection.mutable.ArrayBuffer(100.0, 102.0)
    var lvl = 0.3 * 102.0 + 0.7 * 100.0
    var tr = 2.0
    var lastx = 102.0
    (3 to n).foreach { _ =>
      val x = r4(lvl + 0.9 * tr)
      xs += x
      val nl = 0.3 * x + 0.7 * lvl
      tr = 0.1 * (x - lastx) + 0.9 * tr
      lvl = nl
      lastx = x
    }
    (xs.toSeq, lvl, tr)
  }

  private lazy val (holtSeries, holtL, holtB) = holtSelfConsistent(60)

  private def planted: Seq[(String, Int, Double)] = {
    // constant → the mean member (everything ties at SSE 0; the mean's
    // largest n_eff and smallest k win the clamped-AIC comparison)
    val mean = (1 to 20).map(t => ("mean", t, 5.0))
    // period-13 repetition → snaive's lag-13 fit is exact
    val snaive = (1 to 30).map(t => ("snaive", t, pat((t - 1) % 13)))
    // noise-free AR(2) transient: OLS recovers the generator, nothing
    // else (the decay is not collinear in one lag, not a unit root)
    val ar2 = {
      val b = collection.mutable.ArrayBuffer(100.0, 50.0)
      (3 to 40).foreach(t => b += r4(10.0 + 0.3 * b(t - 2) + 0.2 * b(t - 3)))
      b.toSeq.zipWithIndex.map { case (v, i) => ("ar2", i + 1, v) }
    }
    // exact ramp: first differences are constant, the diff-fit is
    // exact; the level fit (ar2) is collinear and falls back
    val ari = (1 to 30).map(t => ("ari", t, 3.0 * t))
    // MA(1) at grid θ = 0.8: the AR(∞) tail (π₃ = 0.512) keeps any
    // 2-lag AR approximation measurably worse than the exact filter;
    // n = 120 so AIC resolves the gap past OLS in-sample overfit
    val ma1 = {
      val es = (0 to 120).map(noise)
      (1 to 120).map(t => ("ma1", t, r4(50.0 + es(t) + 0.8 * es(t - 1))))
    }
    // ARMA(1,1) at the exact grid pair (0.9, 0.4): near-unit-root AR
    // with a real MA part — pure-AR truncations and differencing both
    // lose to the joint filter at n = 150
    val arma = {
      val es = (0 to 150).map(i => noise(i + 77) / 2)
      val b = collection.mutable.ArrayBuffer(50.0)
      (2 to 150).foreach(t =>
        b += r4(50.0 + 0.9 * (b(t - 2) - 50.0) + es(t) + 0.4 * es(t - 1)))
      b.toSeq.zipWithIndex.map { case (v, i) => ("arma11", i + 1, v) }
    }
    // mild trend under heavy white noise: theta's ½·trend + ½·SES
    // damps the noise where differencing (ari) doubles its variance
    // and a level AR pays for the trend
    val theta = (1 to 150).map(t => ("theta", t, r4(0.1 * t + 1.5 * noise(t + 31))))
    val holt = holtSeries.zipWithIndex.map { case (v, i) => ("holt", i + 1, v) }
    mean ++ snaive ++ ar2 ++ ari ++ ma1 ++ arma ++ theta ++ holt
  }

  private lazy val result = Champion.championForecast(
    planted.toDF("k", "t", "v"), Seq("k"), Seq(col("t")), "v", h = 4, m = 13)
    .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
      r.getLong(3), r.getDouble(4)))

  test("each planted series crowns its intended family member") {
    val champs = result.map(r => (r._1, r._2)).distinct.toMap
    assert(champs == Map(
      "mean" -> "mean_naive", "snaive" -> "snaive", "ar2" -> "ar2",
      "ari" -> "ari", "ma1" -> "ma1", "arma11" -> "arma11",
      "theta" -> "theta", "holt" -> "holt_damped"))
  }

  test("one champion and exactly h forecast steps per series") {
    result.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.length == 1)
      assert(rows.map(_._4).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      assert(rows.map(_._3).distinct.length == 1) // one AIC per series
    }
  }

  test("winning members forecast with their own machinery") {
    val by = result.groupBy(_._1).map { case (k, rows) =>
      k -> rows.sortBy(_._4).map(_._5).toSeq
    }
    assert(by("mean") == Seq(5.0, 5.0, 5.0, 5.0))
    // snaive: f_s = x_{n+s−13}; n = 30 → pattern positions 18..21
    assert(by("snaive") == (18 to 21).map(t => pat((t - 1) % 13)))
    // ari on the exact ramp extends it: 3·(30+s)
    assert(by("ari") == Seq(93.0, 96.0, 99.0, 102.0))
    // ar2's transient converged to the fixed point 10/(1−0.3−0.2) = 20
    assert(by("ar2") == Seq(20.0, 20.0, 20.0, 20.0))
    // holt: damped extrapolation from the generator's own final state
    val damps = graft.seq.SequentialKernels.dampSums(0.9, 4)
    val (l, b) = (r4(holtL), r4(holtB))
    assert(by("holt") == damps.map(d => r4(l + b * d)))
  }

  test("champion pick and forecasts are partitioning-invariant") {
    val eight = Champion.championForecast(
      planted.toDF("k", "t", "v").repartition(8), Seq("k"), Seq(col("t")),
      "v", h = 4, m = 13)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(eight.sortBy(r => (r._1, r._4)).toSeq ==
      result.sortBy(r => (r._1, r._4)).toSeq)
  }

  private lazy val blended = Champion.blendForecast(
    planted.toDF("k", "t", "v"), Seq("k"), Seq(col("t")), "v", h = 4, m = 13)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
      r.getLong(3)))

  test("blend shape: h steps per series, every scored member contributes") {
    blended.groupBy(_._1).foreach { case (k, rows) =>
      assert(rows.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L), k)
      // the member count is constant across a series' steps
      assert(rows.map(_._4).distinct.length == 1, k)
      assert(rows.head._4 >= 1, k)
    }
  }

  test("a single-member series blends to exactly that member's forecast") {
    // length-1 series: only the always-eligible mean member scores
    val solo = Champion.blendForecast(
      Seq(("s", 1, 42.0)).toDF("k", "t", "v"), Seq("k"), Seq(col("t")),
      "v", h = 3, m = 13)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(solo == Seq((1L, 42.0, 1L), (2L, 42.0, 1L), (3L, 42.0, 1L)))
  }

  test("a dominant member's blend collapses to the champion forecast") {
    // the planted ari ramp fits exactly (SSE ≈ 0) while every rival
    // carries real error, so Δ-AIC ≫ 0 for the rest: the Akaike
    // weights put ~all mass on the champion
    val champ = result.filter(_._1 == "ari").sortBy(_._4).map(_._5).toSeq
    val blend = blended.filter(_._1 == "ari").sortBy(_._2).map(_._3).toSeq
    champ.zip(blend).foreach { case (c, b) =>
      assert(math.abs(c - b) <= math.max(0.01, 0.001 * math.abs(c)),
        s"champion $c vs blend $b")
    }
  }

  test("blend is partitioning-invariant") {
    val eight = Champion.blendForecast(
      planted.toDF("k", "t", "v").repartition(8), Seq("k"), Seq(col("t")),
      "v", h = 4, m = 13)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(eight.sortBy(r => (r._1, r._2)).toSeq ==
      blended.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("scoreboard: rank-1 row IS the champion, ranks are a permutation") {
    val sb = Champion.scoreboard(planted.toDF("k", "t", "v"), Seq("k"),
      Seq(col("t")), "v", h = 4, m = 13)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(5),
        r.getLong(6)))
    val champs = result.map(r => (r._1, r._2)).distinct.toMap
    val rank1 = sb.filter(_._4 == 1L).map(r => (r._1, r._2)).toMap
    assert(rank1 == champs)
    // ranks within each series are 1..n_members with matching AIC order
    sb.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
      assert(rows.sortBy(_._4).map(_._3).toSeq ==
        rows.map(_._3).sorted.toSeq)
    }
  }
}
