package graft

import org.apache.spark.sql.functions._
import graft.functions.Funcs
import graft.seq.{Ar, SequentialKernels}

/** Round-10 determinism contracts: the micro-int sufficient-sum
  * treatment (unified from Theta) makes the AR fit and the MA/ARMA
  * centering exact for FRACTIONAL-valued series too — the r9 verdict
  * carried integer-only bounds on these kernels as a knife-edge risk.
  */
class R10OpsSpec extends SparkSpec {
  import spark.implicits._

  // noise-free fractional AR(2): x_t = 0.5 + 0.5·x_{t−1} + 0.25·x_{t−2},
  // every value on the 1e-4 grid
  private val frac = Seq(0.4, 0.8, 1.0, 1.2, 1.35, 1.475)
  private def fracDf = frac.zipWithIndex
    .map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")

  test("AR(2) micro-int sums: exact coefficient recovery on a fractional series") {
    val out = Ar.fitted(fracDf, Seq("k"), Seq(col("t")), "v")
      .orderBy("t").select("ar_c", "ar_phi1", "ar_phi2", "ar_fitted")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    out.foreach { case (c, p1, p2, _) =>
      assert((c, p1, p2) == ((0.5, 0.5, 0.25))) }
    assert(out.map(_._4) ==
      Seq(None, None, Some(1.0), Some(1.2), Some(1.35), Some(1.475)))
  }

  test("AR(2) micro-int sums are partition-order invariant on fractional values") {
    // a longer fractional series, summed from 1 partition and from 8:
    // the decimal(38,0) micro accumulation must produce byte-identical
    // coefficients (raw-double sums were partial-agg-order dependent)
    val vals = (1 to 100).map(i => ("a", i, (i * 137 % 995) / 16.0))
    val one = Ar.fitted(vals.toDF("k", "t", "v").coalesce(1),
      Seq("k"), Seq(col("t")), "v")
      .select("ar_c", "ar_phi1", "ar_phi2").distinct()
      .as[(Double, Double, Double)].collect().toSeq
    val eight = Ar.fitted(vals.toDF("k", "t", "v").repartition(8),
      Seq("k"), Seq(col("t")), "v")
      .select("ar_c", "ar_phi1", "ar_phi2").distinct()
      .as[(Double, Double, Double)].collect().toSeq
    assert(one == eight && one.size == 1)
  }

  test("microMean is the exact quantized mean under any partitioning") {
    val vals = (1 to 97).map(i => ("a", (i * 31 % 113) / 8.0))
    val expected = {
      val micros = vals.map { case (_, v) => math.round(v * 1e4) }.sum
      micros.toDouble / 1e4 / vals.size + 0.0
    }
    Seq(1, 7).foreach { parts =>
      val got = vals.toDF("k", "v").repartition(parts).groupBy("k")
        .agg(Funcs.microMean(col("v")).as("m")).select("m")
        .as[Double].collect().head
      assert(got == expected)
    }
  }

  private def r4(x: Double): Double =
    BigDecimal(x * 1e4).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 1e4 + 0.0

  test("ARMA(1,1) forecast on a constant series is the constant") {
    val df = (1 to 5).map(i => ("a", i, 5.0)).toDF("k", "t", "v")
    val out = SequentialKernels.arma11Forecast(df, Seq("k"), Seq(col("t")), "v", h = 4)
      .orderBy("step").select("step", "arma_forecast")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0)))
  }

  test("ARMA(1,1) forecast replays the hand recursion from the fitted state") {
    // planted ARMA(1,1): the grid fit recovers (0.5, 0.4); the forecast
    // must then follow f_1 = r(mu + phi*xc_n + theta*eps_n),
    // f_s = r(mu + phi*(f_{s-1} - mu)) with state from the hand fold
    val innov = Seq(1.29, 1.45, 0.07, -0.76, -1.09, 0.03, -1.02, -1.44, 0.2,
      0.13, 0.55, -0.91, 0.01, -0.06, -1.51, 0.54, 0.32, 2.39, 0.2, -0.14,
      1.23, 0.2, 0.91, -0.37, 0.22, 1.02, 0.7, 0.13, -1.08, 0.45)
    var zp = 0.0; var ep0 = 0.0
    val xs = innov.map { e => val z = 0.5 * zp + e + 0.4 * ep0; zp = z; ep0 = e
      math.round((10.0 + z) * 1e6) / 1e6 }
    val df = xs.zipWithIndex.map { case (v, i) => ("a", i + 1, v) }
      .toDF("k", "t", "v")
    val mu = xs.map(x => math.round(x * 1e4)).sum.toDouble / 1e4 / xs.size + 0.0
    val pairs = for (p <- Seq(-0.5, 0.0, 0.5, 0.9); t <- Seq(-0.4, 0.0, 0.4))
      yield (p, t)
    val folds = pairs.map { case (ph, th) =>
      var xp = Option.empty[Double]; var e = 0.0; var sse = 0.0
      xs.foreach { x =>
        val xc = x - mu
        xp match {
          case None => xp = Some(xc)
          case Some(p) =>
            val ne = xc - ph * p - th * e
            sse += ne * ne; e = ne; xp = Some(xc)
        }
      }
      ((ph, th), sse, e)
    }
    val ((ph, th), _, epsN) = folds.minBy { case ((p, t), s, _) => (s, p, t) }
    val xcN = xs.last - mu
    val f1 = r4(mu + ph * xcN + th * epsN)
    val expected = (2 to 4).scanLeft(f1) { (f, _) => r4(mu + ph * (f - mu)) }
    val got = SequentialKernels.arma11Forecast(df, Seq("k"), Seq(col("t")), "v", h = 4)
      .orderBy("step").select("arma_forecast").as[Double].collect().toSeq
    assert(got == expected)
  }

  test("ARIMA(1,1,1) on a ramp continues the ramp") {
    // linear series → constant first differences → centered diffs all 0,
    // every grid pair fits exactly (ties to the smallest) and each diff
    // forecast is the slope; integration extends the line
    val ramp = (1 to 6).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val out = SequentialKernels.arima111Forecast(ramp, Seq("k"), Seq(col("t")), "v", h = 4)
      .orderBy("step").select("step", "arima_forecast")
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 7.0), (2L, 8.0), (3L, 9.0), (4L, 10.0)))
    // a series too short to difference-and-fit drops
    val short = Seq(("b", 1, 3.0)).toDF("k", "t", "v")
    assert(SequentialKernels.arima111Forecast(short, Seq("k"), Seq(col("t")), "v", h = 2)
      .count() == 0)
  }

  test("fitMa1Full / fitArma11Full expose the winner's forecast state") {
    val df = (1 to 4).map(i => ("a", i, 7.0)).toDF("k", "t", "v")
    val ma = SequentialKernels.fitMa1Full(df, Seq("k"), Seq(col("t")), "v")
      .select("ma1_theta", "ma1_mu", "ma1_eps_last")
      .as[(Double, Double, Double)].head()
    assert(ma == ((-0.8, 7.0, 0.0)))
    val arma = SequentialKernels.fitArma11Full(df, Seq("k"), Seq(col("t")), "v")
      .select("arma_phi", "arma_theta", "arma_mu", "arma_eps_last", "arma_xc_last")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(arma == ((-0.5, -0.4, 7.0, 0.0, 0.0)))
  }

  test("MA(1) centers on the exact micro-int mean for fractional series") {
    val vals = Seq(0.1, 0.3, 0.2, 0.7, 0.45)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i + 1, v) }
      .toDF("k", "t", "v")
    val mu = vals.map(v => math.round(v * 1e4)).sum.toDouble / 1e4 / vals.size + 0.0
    val expected = vals.scanLeft(0.0) { (e, x) => (x - mu) - 0.4 * e }.tail
    val got = SequentialKernels.withMa1(df, Seq("k"), Seq(col("t")), "v", 0.4)
      .orderBy("t").select("ma1_resid").as[Double].collect().toSeq
    assert(got == expected)
  }

  test("Holt-Winters forecast replays the hand state and ring") {
    // m=2, α=β=γ=0.5, series (10, 20):
    //   row1: l=10, b=0, ring [0, 0]
    //   row2: sPrev=ring[1]=0 → l=0.5·20+0.5·10=15, b=0.5·5=2.5,
    //         ring[1]=0.5·(20−15)=2.5
    //   f1 = l + b + ring[(2−1+1)%2=0] = 15 + 2.5 + 0   = 17.5
    //   f2 = l + 2b + ring[1]          = 15 + 5.0 + 2.5 = 22.5
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0)).toDF("k", "t", "v")
    val got = SequentialKernels.holtWintersForecast(df, Seq("k"), Seq(col("t")),
        "v", alpha = 0.5, beta = 0.5, gamma = 0.5, m = 2, h = 2)
      .orderBy("step").select("step", "hw_forecast")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 17.5), (2L, 22.5)))
  }

  test("Holt-Winters forecast of a constant series is the constant, any length") {
    val df = (Seq(("c1", 1, 7.0)) ++
      (1 to 9).map(i => ("c9", i, 7.0))).toDF("k", "t", "v")
    val got = SequentialKernels.holtWintersForecast(df, Seq("k"), Seq(col("t")),
        "v", alpha = 0.3, beta = 0.1, gamma = 0.2, m = 4, h = 4)
      .select("k", "hw_forecast").as[(String, Double)].collect()
    assert(got.length == 8)
    got.foreach { case (k, f) => assert(f == 7.0, s"$k forecast $f") }
  }

  test("Holt-Winters forecast continues a clean seasonal pattern") {
    // strict 4-cycle, long horizon: the learned ring should reproduce
    // the cycle's shape (peaks forecast above troughs)
    val cycle = Seq(10.0, 30.0, 10.0, 30.0, 10.0, 30.0, 10.0, 30.0)
    val df = cycle.zipWithIndex.map { case (v, i) => ("s", i + 1, v) }
      .toDF("k", "t", "v")
    val got = SequentialKernels.holtWintersForecast(df, Seq("k"), Seq(col("t")),
        "v", alpha = 0.3, beta = 0.1, gamma = 0.5, m = 2, h = 2)
      .orderBy("step").select("hw_forecast").as[Double].collect().toSeq
    // last observation was a 30-peak; step 1 is a trough, step 2 a peak
    assert(got(0) < got(1), s"trough ${got(0)} should sit below peak ${got(1)}")
  }
}
