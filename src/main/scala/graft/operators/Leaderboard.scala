package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{microSum, microSumSq, nanToNull, r}

/** Competitive-leaderboard analytics — the engine side of the
  * reference's LeaderboardAnalyzer
  * (src/submissions/leaderboard_analyzer.py). The reference analyzes
  * ONE team's position per call; the engine computes the same analysis
  * for EVERY team in one pass, which is the distributed re-expression
  * of the loop a user would otherwise run per team.
  *
  * Scores follow the competition convention: lower is better (WMAPE).
  *
  * Scale note: a leaderboard is dimension-sized (bounded team count),
  * so the global rank windows here deliberately run single-partition —
  * the same contract as Eval's global score windows. Inputs are rounded
  * to the 4dp grid; std/var factors come from exact micro-int sums;
  * every factor is rounded before it feeds a gate or combination.
  */
object Leaderboard {

  /** Per-team position + gap analysis (analyze_position :121-190 and
    * analyze_gaps :192-231 applied table-wide): rank, percentile,
    * competitive zone (:381-391), gaps to the top / next / top-3/10/25
    * scores (the reference's `leaderboard[min(k-1, n-1)].score if
    * n >= k else 0` convention), buffered improvement targets,
    * the achievability composite (:392-410) and the recommended target
    * position ladder (:412-427).
    */
  def positionReport(df: DataFrame, teamCol: Column, scoreCol: Column,
                     topTier: Int = 3, contenderTier: Int = 10,
                     improvementBuffer: Double = 0.05): DataFrame = {
    val base = df.select(teamCol.as("team"), r(scoreCol).as("score"))
    val wRank = Window.partitionBy(lit(0)).orderBy(col("score"), col("team"))
    val wAll = Window.partitionBy(lit(0))
    def scoreAt(k: Int): Column =
      when(col("total_teams") >= k,
        max(when(col("rank") === k, col("score"))).over(wAll)).otherwise(lit(0.0))
    val ranked = base
      .withColumn("rank", row_number().over(wRank))
      .withColumn("total_teams", count(lit(1)).over(wAll))
      .withColumn("top_score", min(col("score")).over(wAll))
      .withColumn("__prev", lag(col("score"), 1).over(wRank))
      .withColumn("__s3", scoreAt(3))
      .withColumn("__s10", scoreAt(10))
      .withColumn("__s25", scoreAt(25))
      // population std of the top-20 scores (the density factor's
      // input); the micro-int sums ride the SAME global window (the
      // .over must attach to the sum itself, hence the inline form)
      .withColumn("__n20", sum(when(col("rank") <= 20, 1L).otherwise(0L)).over(wAll))
      .withColumn("__s20",
        sum(when(col("rank") <= 20, graft.expr.RoundHalfUpExpr.column(col("score") * lit(1e4))
          .cast("decimal(38,0)"))).over(wAll).cast("double") / lit(1e4))
      .withColumn("__ss20",
        sum(when(col("rank") <= 20, graft.expr.RoundHalfUpExpr.column(col("score") * col("score") * lit(1e8))
          .cast("decimal(38,0)"))).over(wAll).cast("double") / lit(1e8))
    val nD = col("total_teams").cast("double")
    val std20 = sqrt(greatest(col("__ss20") / col("__n20") -
      pow(col("__s20") / col("__n20"), 2), lit(0.0)))
    val g3 = r(abs(col("score") - col("__s3")))
    val g10 = r(abs(col("score") - col("__s10")))
    val g25 = r(abs(col("score") - col("__s25")))
    val buf = lit(1.0) + lit(improvementBuffer)
    val scored = ranked
      .withColumn("percentile",
        r((nD - col("rank") + lit(1)) / nD * lit(100.0)))
      .withColumn("competitive_zone",
        when(col("rank") <= topTier, "leader")
          .when(col("rank") <= contenderTier, "contender")
          .when(col("rank") <= nD * lit(0.5), "middle_pack")
          .otherwise("bottom"))
      .withColumn("gap_to_top", r(abs(col("score") - col("top_score"))))
      .withColumn("gap_to_next",
        r(when(col("rank") > 1, abs(col("score") - col("__prev")))
          .otherwise(lit(0.0))))
      .withColumn("gap_to_top_3", g3)
      .withColumn("gap_to_top_10", g10)
      .withColumn("gap_to_top_25", g25)
      .withColumn("improve_top_3", r(g3 * buf))
      .withColumn("improve_top_10", r(g10 * buf))
      .withColumn("improve_top_25", r(g25 * buf))
      .withColumn("improve_baseline",
        r(greatest(col("score") * lit(0.05), lit(1.0))))
    val avgImp = (col("improve_top_3") + col("improve_top_10") +
      col("improve_top_25") + col("improve_baseline")) / lit(4.0)
    val out = scored
      .withColumn("__posf", r(greatest(lit(0.1), lit(1.0) - col("rank") / nD)))
      .withColumn("__impf", r(greatest(lit(0.1), lit(1.0) / (lit(1.0) + avgImp / lit(10.0)))))
      .withColumn("__densf", r(least(lit(1.0), std20 / lit(5.0))))
      .withColumn("achievability",
        r(least(lit(1.0), (col("__posf") + col("__impf") + col("__densf")) / lit(3.0))))
      // int() truncation for positive ranks = floor (:422-427)
      .withColumn("recommended_target",
        when(col("achievability") > 0.8 && col("improve_top_3") < 3.0,
          least(lit(3L), col("rank") - lit(1L)))
          .when(col("achievability") > 0.6 && col("improve_top_10") < 5.0,
            least(lit(10L), col("rank") - lit(2L)))
          .when(col("achievability") > 0.4,
            greatest(lit(1L), floor(col("rank") * lit(0.8))))
          .otherwise(greatest(lit(1L), floor(col("rank") * lit(0.9)))))
    out.select(col("team"), col("score"), col("rank").cast("long").as("rank"),
      col("total_teams"), col("percentile"), col("competitive_zone"),
      col("gap_to_top"), col("gap_to_next"), col("gap_to_top_3"),
      col("gap_to_top_10"), col("gap_to_top_25"), col("improve_top_3"),
      col("improve_top_10"), col("improve_top_25"), col("improve_baseline"),
      col("achievability"), col("recommended_target"))
  }

  /** One-row competition summary: the score-distribution profile
    * (_analyze_score_distribution :429-439), submission patterns with
    * the rank-vs-submissions correlation (:441-452) and the
    * competitive-intensity composite (:454-468: 0.5 under 10 teams,
    * else min(1, 0.1/(var(top10)+0.001) + avg_submissions(top20)/10)).
    */
  def competitionSummary(df: DataFrame, teamCol: Column, scoreCol: Column,
                         submissionsCol: Column): DataFrame = {
    val base = df.select(teamCol.as("team"), r(scoreCol).as("score"),
      submissionsCol.cast("long").as("submissions"))
    val wRank = Window.partitionBy(lit(0)).orderBy(col("score"), col("team"))
    val ranked = base.withColumn("rank", row_number().over(wRank))
    def topSum(k: Int, c: Column) = microSum(when(col("rank") <= k, c))
    def topSumSq(k: Int, c: Column) = microSumSq(when(col("rank") <= k, c))
    val g = ranked.agg(
      count(lit(1)).as("n_teams"),
      microSum(col("score")).as("__s"),
      microSumSq(col("score")).as("__ss"),
      min(col("score")).as("__mn"), max(col("score")).as("__mx"),
      sum(when(col("rank") <= 10, 1L).otherwise(0L)).as("__n10"),
      min(when(col("rank") <= 10, col("score"))).as("__mn10"),
      max(when(col("rank") <= 10, col("score"))).as("__mx10"),
      topSum(10, col("score")).as("__s10"),
      topSumSq(10, col("score")).as("__ss10"),
      sum(when(col("rank") <= 20, 1L).otherwise(0L)).as("__n20"),
      topSum(20, col("score")).as("__sc20"),
      topSumSq(20, col("score")).as("__ssc20"),
      sum(when(col("rank") <= 20, col("submissions")).otherwise(0L)).as("__sub20"),
      sum(col("submissions")).as("__subs"),
      max(col("submissions")).as("max_submissions"),
      nanToNull(corr(col("rank"), col("submissions"))).as("__eff"))
    val n = col("n_teams").cast("double")
    val var10 = col("__ss10") / col("__n10") - pow(col("__s10") / col("__n10"), 2)
    val avgSub20 = col("__sub20").cast("double") / col("__n20")
    g.select(
      col("n_teams"),
      r(col("__s") / n).as("mean_score"),
      r(sqrt(greatest(col("__ss") / n - pow(col("__s") / n, 2), lit(0.0))))
        .as("std_score"),
      r(col("__mx") - col("__mn")).as("score_range"),
      r(when(col("n_teams") >= 10, col("__mx10") - col("__mn10"))
        .otherwise(lit(0.0))).as("top_10_range"),
      r(when(col("n_teams") >= 20,
        sqrt(greatest(col("__ssc20") / col("__n20") -
          pow(col("__sc20") / col("__n20"), 2), lit(0.0))))
        .otherwise(lit(0.0))).as("competitive_density"),
      r(col("__subs").cast("double") / n).as("avg_submissions"),
      col("max_submissions"),
      r(coalesce(when(col("n_teams") > 1, col("__eff")), lit(0.0)))
        .as("submission_efficiency"),
      r(when(col("n_teams") < 10, lit(0.5))
        .otherwise(least(lit(1.0),
          lit(1.0) / (r(var10, 8) + lit(0.001)) * lit(0.1) + avgSub20 / lit(10.0))))
        .as("competitive_intensity"))
  }
}
