package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Funcs.r

/** Retrieval-quality metrics for ranked result lists with binary
  * relevance: MRR, AP@k and NDCG@k per query — the standard eval
  * harness for the ANN / BM25 search operators (complements
  * [[graft.sim.Similarity.recallAtK]], which only scores set overlap;
  * these score the ORDER).
  *
  * Exactness: the NDCG log2 discounts are the one place a libm call
  * (log) could diverge across engines, so the discount table
  * 1/log2(i+1), i = 1..k is precomputed ONCE driver-side, quantized to
  * 1e-6 micro-ints, and embedded as literals in both the Spark plan
  * and the oracle SQL (the annLshSql hyperplane-literal recipe) — DCG
  * and IDCG become exact integer sums (IDCG is just a prefix-sum
  * lookup at min(R, k)), AP terms are per-row-rounded micro-ints, and
  * only the final three ratios touch floating point, each a single
  * deterministic division rounded to the 4dp grid.
  *
  * Scale shape: one rank-window pass + one hash aggregate on the
  * (query × k)-bounded result table; the relevant-count table joins on
  * query_id. Nothing driver-side but the k-entry discount literals.
  */
object RankingMetrics {

  /** round(1/log2(i+1)·1e6) for i = 1..k. */
  def discountsMicro(k: Int): Array[Long] =
    (1 to k).map(i => math.round(math.log(2) / math.log(i + 1) * 1e6)).toArray

  /** Prefix sums of [[discountsMicro]] — IDCG@r for binary relevance
    * is the r-th entry. */
  def idcgPrefixMicro(k: Int): Array[Long] =
    discountsMicro(k).scanLeft(0L)(_ + _).tail

  /** Per-query metrics. `ranked`: (queryCol, rankCol 1-based unique per
    * query, relCol 0/1). `nRel`: (queryCol, n_rel) — total relevant in
    * the corpus for the query (IDCG/AP denominators, capped at k).
    * Output: (queryCol, n_rel, mrr, ap, ndcg), all on the 4dp grid,
    * zero (not null) when a query has no relevant results at all. */
  def rankingMetrics(ranked: DataFrame, nRel: DataFrame, queryCol: String,
                     rankCol: String, relCol: String, k: Int): DataFrame = {
    val disc = discountsMicro(k)
    val pre = idcgPrefixMicro(k)
    val w = Window.partitionBy(queryCol).orderBy(rankCol)
    val agg = ranked.filter(col(rankCol) <= k)
      .withColumn("__cum", sum(col(relCol)).over(w))
      .groupBy(col(queryCol))
      .agg(
        sum(col(relCol).cast("long") *
          element_at(lit(disc), col(rankCol).cast("int"))).as("__dcgm"),
        sum(when(col(relCol) === 1,
          graft.expr.RoundHalfUpExpr.column(col("__cum").cast("double") / col(rankCol) * lit(1e6))
            .cast("long")).otherwise(0L)).as("__apm"),
        min(when(col(relCol) === 1, col(rankCol))).as("__minrank"))
    agg.join(nRel, queryCol)
      .withColumn("__idcgm",
        element_at(lit(pre), least(greatest(col("n_rel"), lit(1)), lit(k)).cast("int")))
      .select(col(queryCol), col("n_rel").cast("long").as("n_rel"),
        r(coalesce(lit(1.0) / col("__minrank"), lit(0.0))).as("mrr"),
        r(when(least(col("n_rel"), lit(k)) > 0,
          col("__apm").cast("double") / lit(1e6) / least(col("n_rel"), lit(k)))
          .otherwise(lit(0.0))).as("ap"),
        r(when(col("n_rel") > 0,
          col("__dcgm").cast("double") / col("__idcgm")).otherwise(lit(0.0)))
          .as("ndcg"))
  }
}
