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

  // planted fold WMAPEs: A = (0.1, 0.5), B = (0.2, 0.2), C = (0.3, _).
  // Round 0 (first fold, keep 2) ranks A < B < C and drops C; round 1
  // (both folds, keep 1) crowns B (mean 0.2) over A (mean 0.3).
  private def shaScored = Seq(
    ("A", 0, 10.0, 9.0), ("A", 1, 10.0, 5.0),
    ("B", 0, 10.0, 8.0), ("B", 1, 10.0, 8.0),
    ("C", 0, 10.0, 7.0), ("C", 1, 10.0, 10.0))
    .toDF("config", "fold", "y", "pred")

  test("successive halving: early-fold elimination, later-fold champion flip") {
    val out = Tuning.successiveHalving(shaScored, col("config"), col("fold"),
      col("y"), col("pred"), Seq(1 -> 2, 2 -> 1))
      .orderBy("round", "rank")
      .as[(Int, String, Int, Long, Double, Long, Long, Long)].collect()
    // round 0: all three on fold 0 only
    assert(out.take(3).map(r => (r._2, r._5, r._6, r._7)).toSeq ==
      Seq(("A", 0.1, 1L, 1L), ("B", 0.2, 2L, 1L), ("C", 0.3, 3L, 0L)))
    assert(out.take(3).forall(r => r._1 == 0 && r._3 == 1 && r._4 == 1L && r._8 == 0L))
    // round 1: C is GONE; B's two-fold mean beats A's — the flip SHA
    // is built to allow; champion flag only here
    val r1 = out.drop(3)
    assert(r1.map(_._2).toSeq == Seq("B", "A"))
    assert(r1.map(r => (r._5, r._6, r._7, r._8)).toSeq ==
      Seq((0.2, 1L, 1L, 1L), (0.3, 2L, 0L, 0L)))
    assert(r1.forall(r => r._1 == 1 && r._3 == 2 && r._4 == 2L))
  }

  test("single-round bracket reproduces the cvScoreboard ranking") {
    val sha = Tuning.successiveHalving(shaScored, col("config"), col("fold"),
      col("y"), col("pred"), Seq(2 -> 1))
      .select("config", "n_folds", "cv_wmape", "rank").orderBy("rank")
      .as[(String, Long, Double, Long)].collect().toSeq
    val board = Tuning.cvScoreboard(shaScored, col("config"), col("fold"),
      col("y"), col("pred"))
      .select("config", "n_folds", "cv_wmape", "rank").orderBy("rank")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(sha == board)
  }

  test("shaSchedule: geometric budgets, final full-budget round, saturation collapse") {
    assert(Tuning.shaSchedule(4, 3) == Seq((1, 2), (3, 1)))
    assert(Tuning.shaSchedule(8, 10, eta = 2) == Seq((1, 4), (2, 2), (10, 1)))
    // every budget saturates at 1 fold: collapses to one round, keep 1
    assert(Tuning.shaSchedule(4, 1) == Seq((1, 1)))
    assert(Tuning.shaSchedule(1, 5) == Seq((5, 1)))
  }
}
