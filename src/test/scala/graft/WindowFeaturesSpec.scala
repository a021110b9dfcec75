package graft

import org.apache.spark.sql.functions._
import graft.operators.{SeriesWindow, WindowFeatures}

class WindowFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val sw = SeriesWindow(Seq(col("k")), Seq(col("t")))

  test("rolling slope over a perfectly linear series equals its gradient") {
    val df = (1 to 6).map(i => ("a", i, 3.0 * i + 5)).toDF("k", "t", "v")
    val out = WindowFeatures.withRollingSlope(df, "v", 4, sw, "s")
      .orderBy("t").select("s").collect()
    assert(out(0).isNullAt(0)) // single point: undefined
    (1 until 6).foreach(i => assert(math.abs(out(i).getDouble(0) - 3.0) < 1e-9))
  }

  test("rolling std is NULL (not NaN) on the first row of each series") {
    val df = Seq(("a", 1, 5.0), ("a", 2, 7.0)).toDF("k", "t", "v")
    val out = df.select(WindowFeatures.rollingStd(col("v"), 4, sw).as("s"))
      .orderBy("s").collect()
    assert(out.exists(_.isNullAt(0)))
    assert(!out.exists(r => !r.isNullAt(0) && r.getDouble(0).isNaN))
  }

  test("zero-streak stats: runs detected with correct lengths") {
    // series: 0 0 1 0 0 0 1 -> runs of 2 and 3
    val vals = Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i, v) }.toDF("k", "t", "v")
    val out = WindowFeatures.zeroStreakStats(df, Seq(col("k")), Seq(col("t")), col("v"),
      Seq("k")).head()
    assert(out.getAs[Long]("max_zero_streak") == 3L)
    assert(out.getAs[Long]("n_zero_streaks") == 2L)
    assert(math.abs(out.getAs[Double]("avg_zero_streak") - 2.5) < 1e-9)
  }

  test("recent-vs-historical flags a declining series") {
    val vals = Seq(100.0, 100.0, 100.0, 100.0, 100.0, 100.0, 10.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i, v) }.toDF("k", "t", "v")
    val out = WindowFeatures.recentVsHistorical(df, Seq(col("k")), Seq(col("t")),
      col("v"), Seq("k")).head()
    assert(out.getAs[Int]("is_declining") == 1)
  }

  test("growth cap limits week-over-week doubling") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 100.0), ("a", 3, 15.0)).toDF("k", "t", "v")
    val out = df.select(WindowFeatures.growthCap(col("v"), 2.0, sw).as("c"))
      .orderBy("c").as[Double].collect().sorted
    assert(out.toSeq == Seq(10.0, 15.0, 20.0)) // 100 capped to 2*10
  }

  test("lifecycle stage ladder") {
    val df = Seq((200L, 10L), (10L, 5L), (100L, 5L), (400L, 5L))
      .toDF("age", "since")
    val out = df.select(WindowFeatures.lifecycleStage(col("age"), col("since")).as("s"))
      .as[String].collect()
    assert(out.toSeq == Seq("mature", "new", "growth", "mature"))
  }
}
