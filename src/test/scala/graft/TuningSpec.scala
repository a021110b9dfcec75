package graft

import org.apache.spark.sql.functions._
import graft.cv.{TimeSplits, Tuning}

class TuningSpec extends SparkSpec {
  import spark.implicits._

  test("grid search over walk-forward folds picks the model class the data needs") {
    // XOR interaction target: additive stumps (maxDepth=1) cannot
    // represent it at any boosting length; depth>=2 trees can. The
    // search must surface that through leak-free fold WMAPEs.
    val rng = new scala.util.Random(5)
    val start = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 420).map { i =>
      val x1 = rng.nextDouble(); val x2 = rng.nextDouble()
      val y = (if ((x1 > 0.5) != (x2 > 0.5)) 100.0 else 10.0) + rng.nextGaussian()
      (java.sql.Date.valueOf(start.plusDays(i / 3)), x1, x2, y)
    }
    val df = rows.toDF("d", "x1", "x2", "y")

    val (lo, hi) = TimeSplits.dateBounds(df, col("d"))
    val folds = TimeSplits.walkForward(lo, hi, initialTrainWeeks = 10,
      horizonWeeks = 2, stepWeeks = 4, gapWeeks = 0, maxSplits = 2)
    assert(folds.size == 2)

    val grid = Seq(Tuning.GbtParams(maxDepth = 1, maxIter = 10),
      Tuning.GbtParams(maxDepth = 4, maxIter = 20))
    val res = Tuning.gridSearchGbt(df, col("d"), Seq("x1", "x2"), "y", grid, folds)

    assert(res.trials.size == 2)
    assert(res.trials == res.trials.sortBy(_.meanWmape), "trials must be ranked best-first")
    assert(res.best.params.maxDepth == 4,
      s"depth-4 should win on XOR; trials=${res.trials}")
    assert(res.best.meanWmape < res.trials.last.meanWmape / 2,
      s"expected a decisive win: ${res.trials.map(_.meanWmape)}")
    assert(res.best.foldWmapes.size == folds.size)

    // the refit winner generalizes to fresh XOR points
    val fresh = Seq((java.sql.Date.valueOf("2024-06-01"), 0.9, 0.1, 100.0),
      (java.sql.Date.valueOf("2024-06-01"), 0.9, 0.9, 10.0))
      .toDF("d", "x1", "x2", "y")
    val scored = graft.model.Models.predictGbt(res.model, fresh, Seq("x1", "x2"))
      .select("prediction").as[Double].collect()
    assert(math.abs(scored(0) - 100.0) < 20 && math.abs(scored(1) - 10.0) < 20,
      scored.toSeq.toString)
  }
}
