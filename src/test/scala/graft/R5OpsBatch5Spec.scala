package graft

import org.apache.spark.sql.functions._
import graft.operators.{Abc, Conformal, Reconcile, Uplift}

/** Round-5 batch-5 operators: hierarchical reconciliation, conformal
  * intervals, ABC/XYZ classification, diff-in-differences uplift. */
class R5OpsBatch5Spec extends SparkSpec {
  import spark.implicits._

  // ---------------- Reconcile ----------------

  test("topDownFromActuals: children split parent forecast by share, sum to parent") {
    // supplier 1: parts 10 (30 units) and 11 (10 units) -> shares .75/.25
    val li = Seq((1L, 10L, 30.0), (1L, 11L, 10.0), (2L, 20L, 5.0))
      .toDF("supp", "part", "qty")
    val out = Reconcile.topDownFromActuals(li, "supp", "part", col("qty"), 2.0)
      .orderBy("supp", "part")
      .select("supp", "part", "share", "fc_child")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq((1L, 10L, 0.75, 60.0), (1L, 11L, 0.25, 20.0),
      (2L, 20L, 1.0, 10.0)))
    // coherence: children sum back to parent forecast (40*2, 5*2)
    val sums = Reconcile.topDownFromActuals(li, "supp", "part", col("qty"), 2.0)
      .groupBy("supp").agg(sum("fc_child").as("s")).orderBy("supp")
      .as[(Long, Double)].collect().toSeq
    assert(sums == Seq((1L, 80.0), (2L, 10.0)))
  }

  test("bottomUp aggregates child forecasts coherently") {
    val cf = Seq((1L, 10L, 6.0), (1L, 11L, 4.0), (2L, 20L, 1.0))
      .toDF("supp", "part", "fc")
    val out = Reconcile.bottomUp(cf, "supp", col("fc"))
      .orderBy("supp").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0), (2L, 1.0)))
  }

  // ---------------- Conformal ----------------

  test("splitConformal: width is the residual quantile; bands cover accordingly") {
    // group g: residuals |actual-pred| = 1,2,3,4,10; q(0.5) = 3
    val df = Seq((1L, 11.0, 10.0), (1L, 12.0, 10.0), (1L, 13.0, 10.0),
      (1L, 14.0, 10.0), (1L, 20.0, 10.0))
      .toDF("g", "actual", "pred")
    val out = Conformal.splitConformal(df, Seq("g"), col("actual"), col("pred"),
      alpha = 0.5, exact = Some(true))
      .select("conf_width", "lo", "hi").distinct()
      .as[(Double, Double, Double)].collect().toSeq
    assert(out == Seq((3.0, 7.0, 13.0)))
  }

  test("splitConformal: rows with null predictions are excluded") {
    val df = Seq((1L, 5.0, Some(4.0)), (1L, 9.0, None))
      .toDF("g", "actual", "pred")
    val out = Conformal.splitConformal(df, Seq("g"), col("actual"), col("pred"),
      alpha = 0.9, exact = Some(true))
    assert(out.count() == 1L)
  }

  // ---------------- Abc ----------------

  test("abcXyz: Pareto classes by cumulative revenue, CV stability classes") {
    // weekly rows: part 1 dominates revenue (steady demand), part 2 mid
    // (volatile), part 3 tail
    val weekly = Seq(
      (1L, 1, 10.0, 800.0), (1L, 2, 10.0, 800.0), (1L, 3, 10.0, 800.0),
      (2L, 1, 1.0, 50.0), (2L, 2, 20.0, 50.0), (2L, 3, 3.0, 50.0),
      (3L, 1, 5.0, 10.0), (3L, 2, 5.0, 10.0))
      .toDF("part", "wk", "q", "rev")
    val out = Abc.abcXyz(weekly, "part", col("q"), col("rev"))
      .orderBy("part").select("part", "abc_class", "xyz_class")
      .as[(Long, String, String)].collect().toSeq
    // shares: p1 2400/2570=.9338 -> B? No: cumulative DESC order:
    // p1 .9338 > .8 -> B; p2 (2550/2570=.9922) -> C; p3 1.0 -> C
    // demand CV: p1 constant -> 0 (X); p2 mean 8, sd ~10.44 -> >1 (Z);
    // p3 constant -> X
    assert(out == Seq((1L, "B", "X"), (2L, "C", "Z"), (3L, "C", "X")))
  }

  test("abcXyz: an 80%-dominant head lands in A, single-period demand is Z") {
    val weekly = Seq((1L, 1, 4.0, 80.0), (2L, 1, 1.0, 20.0))
      .toDF("part", "wk", "q", "rev")
    val out = Abc.abcXyz(weekly, "part", col("q"), col("rev"))
      .orderBy("part").select("part", "cum_share", "abc_class", "xyz_class")
      .as[(Long, Double, String, String)].collect().toSeq
    assert(out == Seq((1L, 0.8, "A", "Z"), (2L, 1.0, "C", "Z")))
  }

  // ---------------- Uplift ----------------

  test("diffInDiff: hand-computed four-cell design") {
    // treated: pre mean 10, post mean 15 (delta 5)
    // control: pre mean 8, post mean 9 (delta 1) -> DiD = 4
    val df = Seq(
      (true, false, 10.0), (true, false, 10.0), (true, true, 15.0),
      (false, false, 8.0), (false, true, 9.0), (false, true, 9.0))
      .toDF("t", "p", "v")
    val out = Uplift.diffInDiff(df, col("t"), col("p"), col("v"))
      .select("mean_t_pre", "mean_t_post", "mean_c_pre", "mean_c_post",
        "delta_t", "delta_c", "did")
      .as[(Double, Double, Double, Double, Double, Double, Double)].head()
    assert(out == ((10.0, 15.0, 8.0, 9.0, 5.0, 1.0, 4.0)))
  }
}
