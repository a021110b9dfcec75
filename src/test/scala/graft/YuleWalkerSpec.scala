package graft

import org.apache.spark.sql.functions._
import graft.seq.YuleWalker

class YuleWalkerSpec extends SparkSpec {
  import spark.implicits._

  // deterministic noise: java.util.Random's LCG is specified by its
  // Javadoc, so a fixed seed gives the same stream on every JVM
  private def noiseStream(seed: Long): Iterator[Double] = {
    val rnd = new java.util.Random(seed)
    Iterator.continually(rnd.nextDouble() - 0.5)
  }

  // AR(1) with phi = 0.6 around level 10, 240 points, deterministic
  private val ar1 = {
    var x = 0.0
    val ns = noiseStream(42L)
    (1 to 240).map { t => x = 0.6 * x + ns.next(); (1, t, 10.0 + x) }
  }.toDF("k", "t", "v")

  test("ar5Full: recovers a dominant phi1 on AR(1) data, higher orders small") {
    val f = YuleWalker.ar5Full(ar1, Seq("k"), Seq(col("t")), "v")
      .select("yw_phi1", "yw_phi2", "yw_phi3", "yw_phi4", "yw_phi5", "yw_neff")
      .as[(Double, Double, Double, Double, Double, Double)].head()
    assert(math.abs(f._1 - 0.6) < 0.15, s"phi1 = ${f._1}")
    // PACF property: partial autocorrelations past lag 1 vanish for AR(1)
    assert(math.abs(f._4) < 0.2 && math.abs(f._5) < 0.2)
    assert(f._6 == 235.0) // 240 rows, 5 lost to conditioning
  }

  test("ar5Full: constant series is degenerate — zero phis, mean forecast") {
    val const = (1 to 20).map(t => (1, t, 7.0)).toDF("k", "t", "v")
    val fc = YuleWalker.ar5ForecastFrom(
      YuleWalker.ar5Full(const, Seq("k"), Seq(col("t")), "v"), Seq("k"), h = 4)
      .select("yw_phi1", "yw_phi5", "yw_sse", "forecast")
      .as[(Double, Double, Double, Double)].collect()
    assert(fc.length == 4)
    assert(fc.forall(r => r._1 == 0.0 && r._2 == 0.0 && r._3 == 0.0 && r._4 == 7.0))
  }

  test("ar5Full: series shorter than 8 observations are absent") {
    val short = (1 to 7).map(t => (1, t, t.toDouble)).toDF("k", "t", "v")
    assert(YuleWalker.ar5Full(short, Seq("k"), Seq(col("t")), "v").count() == 0)
  }

  test("ar5ForecastFrom: positive-phi forecast decays toward the mean") {
    val base = YuleWalker.ar5Full(ar1, Seq("k"), Seq(col("t")), "v")
    val fc = YuleWalker.ar5ForecastFrom(base, Seq("k"), h = 4)
      .orderBy("step").select("forecast").as[Double].collect()
    val mu = ar1.agg(avg("v")).as[Double].head()
    assert(fc.length == 4)
    assert(math.abs(fc(3) - mu) <= math.abs(fc(0) - mu) + 1e-9)
  }

  test("acfPacf: AR(1) shape — geometric ACF decay, PACF cuts off after lag 1") {
    val d = YuleWalker.acfPacf(ar1, Seq("k"), Seq(col("t")), "v")
      .select("acf1", "acf2", "pacf1", "pacf2", "pacf3", "pacf4", "pacf5")
      .as[(Double, Double, Double, Double, Double, Double, Double)].head()
    assert(math.abs(d._1 - 0.6) < 0.15, s"acf1 = ${d._1}")
    assert(d._2 < d._1, "ACF must decay for positive-phi AR(1)")
    // pacf1 == acf1 by construction (k1 = c1/c0)
    assert(d._3 == d._1)
    assert(Seq(d._4, d._5, d._6, d._7).forall(v => math.abs(v) < 0.2),
      s"PACF past lag 1 should vanish: $d")
  }

  test("acfPacf: constant series is degenerate — all zeros") {
    val const = (1 to 20).map(t => (1, t, 7.0)).toDF("k", "t", "v")
    val d = YuleWalker.acfPacf(const, Seq("k"), Seq(col("t")), "v")
      .select("acf1", "acf5", "pacf1", "pacf5")
      .as[(Double, Double, Double, Double)].head()
    assert(d == ((0.0, 0.0, 0.0, 0.0)))
  }

  test("ar5Full: multi-series isolation (per-key fits differ)") {
    var y = 0.0
    val ns = noiseStream(7L)
    val ar1neg = (1 to 240).map { t => y = -0.5 * y + ns.next(); (2, t, 10.0 + y) }
    val both = (ar1.as[(Int, Int, Double)].collect().toSeq ++ ar1neg)
      .toDF("k", "t", "v")
    val f = YuleWalker.ar5Full(both, Seq("k"), Seq(col("t")), "v")
      .orderBy("k").select("yw_phi1").as[Double].collect()
    assert(f.length == 2 && f(0) > 0.3 && f(1) < -0.2,
      s"phi1 per series = ${f.toSeq}")
  }
}
