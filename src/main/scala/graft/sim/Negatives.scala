package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Negative sampling for contrastive / retrieval training pairs — the
  * two standard flavors:
  *
  *  - RANDOM negatives: deterministic pseudo-random corpus draws per
  *    query (the in-batch-negatives replacement when batches are
  *    assembled offline);
  *  - HARD negatives: nearest neighbors by embedding cosine that are
  *    NOT labeled positives (the DPR/ANCE mining step).
  *
  * Both are deterministic (portable Lehmer hashing / rounded cosine
  * ranking), so sampled training sets are reproducible across engines
  * and runs.
  */
object Negatives {

  /** Deterministic random negatives via BUCKET PROBING — the scale
    * shape: each corpus row lands in `lehmer(id) % buckets`; each query
    * probes `nprobe` pseudo-random buckets (equi-join on the bucket id,
    * NEVER a corpus cross join), candidates are ranked by a per-
    * (query, candidate) hash and the top `k` non-positive ids win.
    * Expected candidate pool per query = |corpus|·nprobe/buckets —
    * tune the ratio so the pool comfortably exceeds `k`. */
  def randomNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                      buckets: Int = 64, nprobe: Int = 8,
                      corpusId: String = "doc_id",
                      queryId: String = "query_id",
                      positiveId: String = "positive_id"): DataFrame = {
    val c = corpus.select(col(corpusId).as("neg_id"),
      (PortableHash.lehmer(col(corpusId)) % buckets).as("__bucket"))
    val q = queries
      .select(col(queryId), col(positiveId),
        explode(array((0 until nprobe).map(i =>
          PortableHash.lehmer(col(queryId) + lit(i * 1000003L)) % buckets): _*))
          .as("__bucket"))
      .distinct() // probe collisions would duplicate candidates
    val score = PortableHash.lehmer(col("neg_id") * lit(1000003L) + col(queryId))
    val w = Window.partitionBy(col(queryId)).orderBy(score.asc, col("neg_id").asc)
    q.join(c, Seq("__bucket"))
      .filter(col("neg_id") =!= col(queryId) && col("neg_id") =!= col(positiveId))
      .select(col(queryId), col("neg_id")).distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hard negatives: top-`k` cosine neighbors of each query vector with
    * the labeled positives (and the query itself) excluded BEFORE
    * ranking. Queries broadcast (queries ≪ corpus); `positives`
    * (query_id, positive_id) anti-joins at candidate grain. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, positives: DataFrame,
                    k: Int,
                    corpusId: String = "vec_id", corpusVec: String = "embedding",
                    queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    // re-alias the positives side: it is often derived from `queries`
    // itself, and shared attribute lineage would make the join keys
    // ambiguous
    val pos = positives.select(col("query_id").as("__pos_q"),
      col("positive_id").as("__pos_id"))
    val cand = corpus.crossJoin(broadcast(queries))
      .filter(col(corpusId) =!= col(queryId))
      .join(pos,
        col(queryId) === col("__pos_q") && col(corpusId) === col("__pos_id"),
        "left_anti")
      .withColumn("cos_sim", graft.functions.Funcs.r(
        Similarity.cosine(col(corpusVec), col(queryVec))))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos_sim").desc, col(corpusId).asc)
    cand.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryId), col(corpusId).as("neg_id"), col("cos_sim"), col("rank"))
  }
}
