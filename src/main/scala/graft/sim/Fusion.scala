package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
  * the standard way to ensemble heterogeneous retrieval rankings
  * (lexical BM25, dense ANN, metric variants) without score
  * calibration: a candidate's fused score is Σ over rankers of
  * 1/(k0 + rank), so only rank ORDER matters and incomparable raw
  * scores never mix.
  *
  * Determinism: each reciprocal is rounded to the 1e-6 grid (positive
  * values round identically under Spark HALF_UP and DuckDB
  * half-away-from-zero) and accumulates as micro-int decimal(38,0)
  * sums — order-free, engine-exact; final order ties break on the
  * document id.
  *
  * Scale shape: inputs are k-bounded per-query rank tables (|Q|·k
  * rows each — the OUTPUT of the searches, never corpus-sized), so
  * the union + ONE hash-aggregate on (query, doc) + per-query window
  * all run on query-grain data; the expensive part is the upstream
  * searches, not the fusion. */
object Fusion {

  /** Fuse rank tables of shape (queryCol, docCol, rankCol). Output:
    * (query, doc, rrf_score, n_rankers, rank ≤ topK). */
  def rrf(rankings: Seq[DataFrame], k0: Int = 60, topK: Int = 10,
          queryCol: String = "query_id", docCol: String = "neighbor_id",
          rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    val uni = rankings
      .map(_.select(col(queryCol), col(docCol), col(rankCol)))
      .reduce(_ unionByName _)
    uni.groupBy(col(queryCol), col(docCol))
      .agg(
        graft.functions.Funcs.microSumPre(graft.expr.RoundHalfUpExpr.column(
          lit(1e6) / (lit(k0) + col(rankCol))), 1e6).as("rrf_score"),
        count(lit(1)).as("n_rankers"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryCol))
          .orderBy(col("rrf_score").desc, col(docCol).asc)))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col(docCol), col("rrf_score"),
        col("n_rankers"), col("rank").cast("long").as("rank"))
  }
}
