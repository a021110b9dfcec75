package graft

import org.apache.spark.sql.functions._
import graft.metrics.RankingMetrics

class RankingMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Int, Int)], nRel: Seq[(Long, Int)]) =
    RankingMetrics.rankingMetrics(
      rows.toDF("query_id", "rank", "rel"),
      nRel.toDF("query_id", "n_rel"), "query_id", "rank", "rel", 10)
      .select("query_id", "mrr", "ap", "ndcg")
      .as[(Long, Double, Double, Double)].collect().map(t => t._1 -> t).toMap

  test("perfect ranking scores 1.0 on all three metrics") {
    val rows = (1 to 10).map(i => (1L, i, if (i <= 3) 1 else 0))
    val m = run(rows, Seq((1L, 3)))(1L)
    assert(m == ((1L, 1.0, 1.0, 1.0)))
  }

  test("no relevant results scores 0.0 on all three metrics") {
    val rows = (1 to 10).map(i => (1L, i, 0))
    val m = run(rows, Seq((1L, 4)))(1L)
    assert(m == ((1L, 0.0, 0.0, 0.0)))
  }

  test("single relevant at rank 4: mrr = 1/4, ap = 1/4, ndcg = disc(4)") {
    val rows = (1 to 10).map(i => (1L, i, if (i == 4) 1 else 0))
    val m = run(rows, Seq((1L, 1)))(1L)
    assert(m._2 == 0.25 && m._3 == 0.25)
    // IDCG for R=1 is disc(1)=1; DCG = disc(4) = 1/log2(5)
    val expected = math.round(
      RankingMetrics.discountsMicro(10)(3).toDouble /
        RankingMetrics.idcgPrefixMicro(10)(0) * 1e4) / 1e4
    assert(m._4 == expected)
  }

  test("n_rel larger than k caps the IDCG/AP denominators at k") {
    val rows = (1 to 10).map(i => (1L, i, 1)) // all relevant
    val m = run(rows, Seq((1L, 50)))(1L)
    assert(m == ((1L, 1.0, 1.0, 1.0))) // perfect@10 despite 50 total
  }
}
