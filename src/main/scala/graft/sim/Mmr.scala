package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Funcs.r

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) diverse
  * subset selection over an embedding column — the "pick k items that
  * are relevant AND not near-duplicates of each other" step of a
  * training-data curation pipeline (diversified sampling, dedup-aware
  * exemplar picking, eval-set construction).
  *
  * Greedy MMR is inherently sequential in k (each pick changes the
  * next round's penalty), so the operator runs k driver-coordinated
  * rounds — but each round is ONE distributed argmax over the
  * candidate table, and the only driver-side state is the k selected
  * (id, vector) pairs. The max-similarity penalty is maintained
  * INCREMENTALLY: after a pick, every candidate's `max_sim` column is
  * updated with a single new cosine against the picked vector
  * (`greatest(prev, cos)`), so round j costs one cosine per candidate,
  * not j — the classic O(k·N) formulation, shuffle-free (the picked
  * vector travels as a broadcast literal).
  *
  * Determinism: relevance and every cosine are rounded to the 4dp grid
  * BEFORE comparison (the q68 ANN convention — rounding absorbs
  * summation-order ulps), the MMR score is an exact half-sum of
  * grid values re-rounded, and ties break on ascending id; the greedy
  * trajectory is therefore engine-exact and q289's oracle unrolls it
  * round for round in DuckDB.
  */
object Mmr {

  /** Select `k` rows greedily maximizing
    * `lambda·rel − (1−lambda)·max_sim(selected)`. `cands` must carry
    * (idCol: long, vecCol: array<double>, relCol: double on the 4dp
    * grid). Returns (rank, id, rel, mmr_score) for the k picks.
    * `lambda` defaults to 1/2 so both halves stay exactly
    * representable on the 0.5e-4 grid. */
  def mmrSelect(cands: DataFrame, idCol: String, vecCol: String,
                relCol: String, k: Int, lambda: Double = 0.5): DataFrame = {
    val spark = cands.sparkSession
    val base = cands.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        col(relCol).as("__rel"))
      .withColumn("__ms", lit(0.0)).cache()
    var cur = base

    val picked = Seq.newBuilder[(Int, Long, Double, Double)]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val scored = cur.withColumn("__mmr",
        r(lit(lambda) * col("__rel") - lit(1.0 - lambda) * col("__ms")))
      val top = scored.orderBy(col("__mmr").desc, col("__id").asc).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (id, rel, mmr) = (row.getLong(0), row.getDouble(2), row.getDouble(4))
        val vec = row.getSeq[Double](1).toArray
        picked += ((round, id, rel, mmr))
        cur = cur.filter(col("__id") =!= id)
          .withColumn("__ms", greatest(col("__ms"),
            r(Similarity.cosine(col("__v"), lit(vec)))))
        // each round chains one filter + one cosine onto the plan; cut
        // the lineage periodically (the Bpe merge-loop pattern) so
        // analysis stays O(k), not O(k²), for large k
        if (round % 8 == 0) cur = cur.localCheckpoint(true)
        round += 1
      }
    }
    base.unpersist()
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("rel", DoubleType, nullable = false),
      StructField("mmr_score", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        picked.result().map(t => Row(t._1, t._2, t._3, t._4)), 1), schema)
  }
}
