package graft

import org.apache.spark.sql.functions._
import graft.operators.SeriesWindow
import graft.post.PostProcess

class PostProcessSpec extends SparkSpec {
  import spark.implicits._

  test("chain applies steps in order: clip → cap → integerize") {
    val df = Seq(("a", 1, -5.2), ("a", 2, 3.6), ("a", 3, 1000.0)).toDF("k", "t", "v")
    val out = PostProcess.chain(Seq(
      PostProcess.nonNegative("v"),
      PostProcess.hardCap("v", 100.0),
      PostProcess.integerize("v")))(df)
      .orderBy("t").select("v").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 4.0, 100.0))
  }

  test("MOQ rounding: below half-MOQ drops to zero, above rounds up to MOQ") {
    val df = Seq(1.0, 3.0, 7.0).toDF("v")
    val out = PostProcess.moqRound("v", 5.0)(df).orderBy("v").as[Double].collect()
    assert(out.toSeq == Seq(0.0, 5.0, 7.0))
  }

  test("lifecycle dampening scales flagged stages only") {
    val df = Seq(("discontinued", 10.0), ("mature", 10.0)).toDF("stage", "v")
    val out = PostProcess.lifecycleDampen("v", col("stage"),
      Map("discontinued" -> 0.5))(df)
      .orderBy("stage").select("v").as[Double].collect()
    assert(out.toSeq == Seq(5.0, 10.0))
  }

  test("seasonal adjustment multiplies by the bucket factor with fallback 1.0") {
    val df = Seq((1, 10.0), (2, 10.0)).toDF("m", "v")
    val factors = Seq((1, 1.5)).toDF("b", "f")
    val out = PostProcess.seasonalAdjust("v", col("m"), factors)(df)
      .orderBy("m").select("v").as[Double].collect()
    assert(out.toSeq == Seq(15.0, 10.0))
  }

  test("sigma cap leaves single-row frames untouched (null stddev)") {
    val df = Seq(42.0).toDF("v")
    val out = PostProcess.sigmaCap("v", 1.0)(df).as[Double].head()
    assert(out == 42.0)
  }

  test("capacity cap scales over-limit stores proportionally, leaves others alone") {
    val df = Seq(("s1", 60.0), ("s1", 40.0), ("s2", 30.0), ("s3", 10.0))
      .toDF("store", "v")
    val limits = Seq(("s1", 50.0), ("s2", 100.0)).toDF("store", "limit")
    val out = PostProcess.capacityCap("v", Seq("store"), limits)(df)
      .orderBy("store", "v").select("store", "v").as[(String, Double)].collect()
    // s1 total 100 > 50 -> scale by 0.5; s2 under limit; s3 no limit row
    assert(out.toSeq == Seq(("s1", 20.0), ("s1", 30.0), ("s2", 30.0), ("s3", 10.0)))
  }

  test("market share cap scales globally only when the implied share exceeds target") {
    val df = Seq(30.0, 30.0).toDF("v")
    // total 60 over market 100 = 0.6 > target 0.3 -> scale to sum 30
    val capped = PostProcess.marketShareCap("v", 100.0, 0.3)(df)
      .as[Double].collect()
    assert(capped.toSeq == Seq(15.0, 15.0))
    // under target -> untouched
    val ok = PostProcess.marketShareCap("v", 1000.0, 0.3)(df).as[Double].collect()
    assert(ok.toSeq == Seq(30.0, 30.0))
  }
}
