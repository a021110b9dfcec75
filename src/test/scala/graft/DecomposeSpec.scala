package graft

import org.apache.spark.sql.functions._
import graft.operators.Decompose

class DecomposeSpec extends SparkSpec {
  import spark.implicits._

  test("additive: constant series decomposes to trend=y, seasonal=0, residual=0") {
    val df = (1 to 20).map(i => (1, i, 7.0, i % 4)).toDF("k", "t", "y", "p")
    val out = Decompose.additive(df, Seq("k"), col("t"), col("y"), col("p"))
      .select("trend", "seasonal", "residual").as[(Double, Double, Double)].collect()
    out.foreach { case (tr, se, re) =>
      assert(tr == 7.0 && se == 0.0 && re == 0.0)
    }
  }

  test("additive: pure seasonal signal lands in the seasonal component") {
    // y alternates +1/-1 around 10 with period 2; centered MA(5) over an
    // odd window of an alternating series is 10 ± 0.2, so most of the
    // signal must end up in seasonal, residual near zero mid-series
    val df = (0 until 40).map(i => (1, i, 10.0 + (if (i % 2 == 0) 1.0 else -1.0), i % 2))
      .toDF("k", "t", "y", "p")
    val mid = Decompose.additive(df, Seq("k"), col("t"), col("y"), col("p"))
      .filter(col("t") >= 10 && col("t") <= 30)
      .select(avg(abs(col("residual"))), avg(abs(col("seasonal"))))
      .as[(Double, Double)].head()
    assert(mid._1 < 0.1, s"residual ${mid._1}")
    assert(mid._2 > 0.5, s"seasonal ${mid._2}")
  }

  test("psi: same distribution ~ 0, shifted distribution large") {
    val same = (1 to 2000).map(i => (i % 2 == 0, (i % 100).toDouble))
      .toDF("is_ref", "v")
    val psiSame = Decompose.psi(same, col("is_ref"), col("v"))
      .agg(sum(col("psi_contrib"))).as[Double].head()
    assert(math.abs(psiSame) < 0.01, s"psi=$psiSame")

    val shifted = ((1 to 1000).map(i => (true, (i % 100).toDouble)) ++
      (1 to 1000).map(i => (false, (i % 100).toDouble + 50.0)))
      .toDF("is_ref", "v")
    val psiShift = Decompose.psi(shifted, col("is_ref"), col("v"))
      .agg(sum(col("psi_contrib"))).as[Double].head()
    assert(psiShift > 0.25, s"psi=$psiShift") // industry "significant drift" bar
  }

  test("psi: bins partition both populations completely") {
    val df = (1 to 500).map(i => (i % 3 != 0, i.toDouble)).toDF("is_ref", "v")
    val out = Decompose.psi(df, col("is_ref"), col("v"))
      .agg(sum(col("ref_n")), sum(col("cur_n"))).as[(Long, Long)].head()
    assert(out._1 + out._2 == 500L)
  }

  test("strength: pure seasonal signal scores high F_S, noise scores ~0") {
    // 4-period square wave repeated 8 times: after decomposition the
    // residual is tiny relative to the seasonal component
    val wave = (0 until 32).map(i => (1L, i, Seq(10.0, 20.0, 10.0, 20.0)(i % 4) +
      Seq(0.0, 0.1, -0.1, 0.05)(i % 4)))
    val df = wave.toDF("k", "t", "y")
    val dec = Decompose.additive(df, Seq("k"), col("t"), col("y"),
      pmod(col("t"), lit(4)))
    val s = Decompose.strength(dec, Seq("k"), col("y"))
      .select("trend_strength", "seasonal_strength")
      .as[(Option[Double], Option[Double])].head()
    assert(s._2.exists(_ > 0.9), s"seasonal_strength=$s")
  }
}
