package graft

import org.apache.spark.sql.functions._
import graft.metrics.Eval
import graft.operators.Bootstrap

/** Contracts for the uncertainty-calibration pair (reference
  * model_calibration.py): the WMAPE calibration map must be monotone
  * when the raw uncertainty genuinely orders the error magnitude, and
  * the keyed-replicate bootstrap must behave like a sampling
  * distribution (degenerate on constants, ordered band, deterministic
  * under repartitioning). */
class UncertaintySpec extends SparkSpec {
  import spark.implicits._

  test("wmapeCalibration: monotone uncertainty → monotone map") {
    // |error| grows linearly with the uncertainty: contribution =
    // i·0.01/10, unc = i — every later bin must see strictly larger
    // observed WMAPE and larger mean uncertainty
    val rows = (1 to 100).map(i => ("g", i, 10.0, 10.0 - i * 0.01, i.toDouble))
    val df = rows.toDF("g", "i", "actual", "pred", "unc")
    val out = Eval.wmapeCalibration(df, Seq("g"), col("pred"), col("actual"),
      col("unc"), Seq(col("i")), bins = 10)
      .orderBy("bin")
      .select("bin", "n_rows", "bin_uncertainty", "bin_wmape")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1L to 10L))
    assert(out.forall(_._2 == 10L))
    assert(out.map(_._3) == out.map(_._3).sorted)
    assert(out.map(_._4) == out.map(_._4).sorted)
    assert(out.map(_._4).distinct.size == 10) // strictly increasing
    // bin means are exact: bin b holds i = 10(b−1)+1 .. 10b
    val expectedUnc = (1 to 10).map(b => (10 * (b - 1) + 1 to 10 * b).sum / 10.0)
    assert(out.map(_._3) == expectedUnc)
  }

  test("wmapeCalibration: ties assigned identically via the tie-break") {
    // all-equal uncertainty: bins are decided purely by the tie-break
    // order, so counts stay balanced and the map is flat
    val rows = (1 to 40).map(i => ("g", i, 10.0, 8.0, 1.0))
    val out = Eval.wmapeCalibration(rows.toDF("g", "i", "actual", "pred", "unc"),
      Seq("g"), col("pred"), col("actual"), col("unc"), Seq(col("i")), bins = 10)
      .select("n_rows", "bin_wmape").as[(Long, Double)].collect().toSeq
    assert(out.size == 10 && out.forall(_._1 == 4L))
    assert(out.forall(r => math.abs(r._2 - 0.2) < 1e-9))
  }

  test("bootstrap meanBand: degenerate on a constant series") {
    val df = (1 to 30).map(i => ("a", i, 100.0)).toDF("k", "i", "v")
    val out = Bootstrap.meanBand(df, Seq("k"), col("i"), col("v"))
      .select("n_reps", "boot_mean", "boot_sd", "boot_lo", "boot_hi")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(out.size == 1)
    val (n, m, sd, lo, hi) = out.head
    assert(n >= 2 && n <= 20)
    assert(m == 100.0 && sd == 0.0 && lo == 100.0 && hi == 100.0)
  }

  test("bootstrap meanBand: ordered band around the mean, deterministic") {
    val df = (1 to 60).map(i => ("a", i, (i * 37 % 23).toDouble))
      .toDF("k", "i", "v")
    def run(parts: Int) = Bootstrap.meanBand(df.repartition(parts), Seq("k"),
      col("i"), col("v"))
      .select("n_reps", "boot_mean", "boot_sd", "boot_lo", "boot_hi")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq
    val one = run(1)
    assert(one == run(7))
    val (n, m, sd, lo, hi) = one.head
    assert(n >= 2 && n <= 20)
    assert(lo <= m && m <= hi)
    assert(sd > 0.0)
  }
}
