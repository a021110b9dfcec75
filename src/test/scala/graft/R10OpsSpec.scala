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
}
