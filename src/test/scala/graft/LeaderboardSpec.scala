package graft

import org.apache.spark.sql.functions._
import graft.operators.Leaderboard

/** Contracts for the leaderboard analytics (reference
  * leaderboard_analyzer.py) on a hand-built 12-team board with scores
  * 1..12 (lower better) and submissions = rank. */
class LeaderboardSpec extends SparkSpec {
  import spark.implicits._

  private val board = (1 to 12).map(i => (f"t$i%02d", i.toDouble, i))
    .toDF("team", "score", "subs")

  test("positionReport: ranks, zones, gaps and hand-computed targets") {
    val out = Leaderboard.positionReport(board, col("team"), col("score"))
      .collect().map(r0 => r0.getAs[String]("team") -> r0).toMap
    val t1 = out("t01"); val t5 = out("t05"); val t11 = out("t11")
    assert(t1.getAs[Long]("rank") == 1L && t1.getAs[Double]("percentile") == 100.0)
    assert(t1.getAs[String]("competitive_zone") == "leader")
    assert(t5.getAs[String]("competitive_zone") == "contender")
    assert(t11.getAs[String]("competitive_zone") == "bottom")
    assert(t1.getAs[Double]("gap_to_next") == 0.0)
    assert(t5.getAs[Double]("gap_to_next") == 1.0)
    assert(t5.getAs[Double]("gap_to_top") == 4.0)
    // n = 12 < 25 → the reference's top-25 score degenerates to 0,
    // so the gap is the raw score
    assert(t5.getAs[Double]("gap_to_top_3") == 2.0)
    assert(t5.getAs[Double]("gap_to_top_10") == 5.0)
    assert(t5.getAs[Double]("gap_to_top_25") == 5.0)
    assert(t5.getAs[Double]("improve_top_3") == 2.1)
    assert(t5.getAs[Double]("improve_baseline") == 1.0)
    // hand achievability: (0.5833 + 0.7463 + 0.6904)/3 → 0.6733,
    // ladder lands in the >0.4 branch → floor(5·0.8) = 4
    assert(t5.getAs[Double]("achievability") == 0.6733)
    assert(t5.getAs[Long]("recommended_target") == 4L)
    // leader: ach 0.7845 (≤0.8), improve_top_10 9.45 ≥ 5 → floor(0.8)=0
    // clamped to 1
    assert(t1.getAs[Double]("achievability") == 0.7845)
    assert(t1.getAs[Long]("recommended_target") == 1L)
  }

  test("competitionSummary: hand distribution + intensity composite") {
    val row = Leaderboard.competitionSummary(board, col("team"), col("score"),
      col("subs")).collect().head
    assert(row.getAs[Long]("n_teams") == 12L)
    assert(row.getAs[Double]("mean_score") == 6.5)
    assert(row.getAs[Double]("score_range") == 11.0)
    assert(row.getAs[Double]("top_10_range") == 9.0)
    // n < 20 → competitive_density degenerates to 0 (reference)
    assert(row.getAs[Double]("competitive_density") == 0.0)
    assert(row.getAs[Double]("avg_submissions") == 6.5)
    assert(row.getAs[Long]("max_submissions") == 12L)
    // submissions = rank exactly → efficiency corr = 1
    assert(row.getAs[Double]("submission_efficiency") == 1.0)
    // var(top10) = 8.25 → 0.1/8.251 + 6.5/10 = 0.6621
    assert(row.getAs[Double]("competitive_intensity") == 0.6621)
  }

  test("competitionSummary: small boards fall back to intensity 0.5") {
    val small = (1 to 5).map(i => (s"t$i", i.toDouble, 1)).toDF("team", "score", "subs")
    val row = Leaderboard.competitionSummary(small, col("team"), col("score"),
      col("subs")).collect().head
    assert(row.getAs[Double]("competitive_intensity") == 0.5)
    assert(row.getAs[Double]("top_10_range") == 0.0)
  }

  test("positionReport: partitioning invariance") {
    val a = Leaderboard.positionReport(board, col("team"), col("score"))
      .orderBy("team").collect().toSeq
    val b = Leaderboard.positionReport(board.repartition(7), col("team"),
      col("score")).orderBy("team").collect().toSeq
    assert(a == b)
  }
}
