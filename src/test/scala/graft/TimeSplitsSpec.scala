package graft

import java.time.LocalDate
import graft.cv.TimeSplits

class TimeSplitsSpec extends SparkSpec {

  test("walk-forward folds respect horizon, step, embargo and cap") {
    val folds = TimeSplits.walkForward(LocalDate.parse("2022-01-03"),
      LocalDate.parse("2023-06-01"), initialTrainWeeks = 52, horizonWeeks = 4,
      stepWeeks = 1, gapWeeks = 1, maxSplits = 10)
    assert(folds.nonEmpty && folds.length <= 10)
    folds.foreach { f =>
      // embargo: test starts exactly gap after train end
      assert(f.testStart == f.trainEnd.plusWeeks(1))
      assert(f.testEnd == f.testStart.plusWeeks(4))
      assert(f.trainStart == LocalDate.parse("2022-01-03")) // expanding
    }
    // consecutive folds step by exactly one week
    folds.sliding(2).foreach {
      case Seq(a, b) => assert(b.trainEnd == a.trainEnd.plusWeeks(1))
      case _ =>
    }
  }

  test("sliding (non-expanding) folds keep a fixed-width train window") {
    val folds = TimeSplits.walkForward(LocalDate.parse("2022-01-03"),
      LocalDate.parse("2024-06-01"), initialTrainWeeks = 10, horizonWeeks = 2,
      stepWeeks = 4, gapWeeks = 0, expanding = false, maxSplits = 5)
    folds.foreach(f => assert(
      java.time.temporal.ChronoUnit.WEEKS.between(f.trainStart, f.trainEnd) == 10))
  }

  test("blocked folds never let test precede train and honor the purge gap") {
    val folds = TimeSplits.blocked(LocalDate.parse("2022-01-01"),
      LocalDate.parse("2023-12-31"), nBlocks = 4, gapWeeks = 1)
    folds.foreach { f =>
      assert(!f.testStart.isBefore(f.trainEnd.plusWeeks(1)))
    }
  }

  test("per-segment folds derive boundaries from each segment's own date range") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (
      (0 until 200).map(i => ("a", LocalDate.parse("2022-01-03").plusDays(i).toString)) ++
      (0 until 400).map(i => ("b", LocalDate.parse("2023-01-02").plusDays(i).toString))
    ).toDF("seg", "d").withColumn("d", to_date(col("d")))
    val folds = TimeSplits.perSegment(df, col("seg"), col("d"),
      (lo, hi) => TimeSplits.walkForward(lo, hi, initialTrainWeeks = 8,
        horizonWeeks = 2, stepWeeks = 8, gapWeeks = 0, maxSplits = 3))
    val m = folds.toMap
    assert(m.keySet == Set("a", "b"))
    assert(m("a").nonEmpty && m("b").nonEmpty)
    assert(m("a").head.trainStart == LocalDate.parse("2022-01-03"))
    assert(m("b").head.trainStart == LocalDate.parse("2023-01-02"))
    // segment a spans ~28 weeks -> fewer folds than segment b (~57 weeks)
    assert(m("b").length >= m("a").length)
  }

  test("split() materializes leakage-free train/test frames") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (0 until 400).map(i => (LocalDate.parse("2022-01-03").plusDays(i).toString, i))
      .toDF("d", "v").withColumn("d", to_date(col("d")))
    val folds = TimeSplits.walkForward(LocalDate.parse("2022-01-03"),
      LocalDate.parse("2023-02-06"), initialTrainWeeks = 26, horizonWeeks = 4,
      stepWeeks = 4, gapWeeks = 1, maxSplits = 3)
    folds.foreach { f =>
      val (train, test) = TimeSplits.split(df, col("d"), f)
      val maxTrain = train.agg(max("d")).head().getDate(0).toLocalDate
      val minTest = test.agg(min("d")).head().getDate(0).toLocalDate
      // embargo: at least gap-1 week of daylight between train max and test min
      assert(minTest.isAfter(maxTrain.plusDays(6)))
    }
  }
}
