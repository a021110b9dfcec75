package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space coarsely with KMeans,
  * then search for near-duplicate pairs ONLY within each cluster —
  * semantically-duplicate pairs land in the same cluster with high
  * probability, so the all-pairs O(n²) cosine collapses to
  * Σ_c |cluster_c|² with the cluster count chosen so each cell is small.
  *
  * Versus the LSH path ([[Similarity.cosineNearDupes]]): LSH recall
  * depends on random hyperplanes and band width; cluster scoping adapts
  * to the actual density of the embedding space (duplicates are *very*
  * close, so they essentially never straddle a KMeans boundary) and the
  * cluster id doubles as a useful corpus-diversity signal.
  *
  * Scale shape (100 TB): KMeans fit is sample-based + iterative on
  * centroids only; assignment is one broadcast transform; the pair join
  * is an equi-join on cell — quadratic only within a cell, so pick
  * `nClusters ≈ n / targetCellSize`. One shuffle on cell, one on id for
  * the keep decision (partial-aggregated min, skew-safe).
  */
object SemDedup {

  /** Per-vector keep/drop decision. A vector is dropped when some
    * SMALLER-id vector in its cluster has cosine ≥ `threshold` with it
    * (deterministic keep-lowest-id rule; `dup_of` is the smallest such
    * witness, NULL for kept rows). */
  def semDedup(emb: DataFrame, nClusters: Int = 16, threshold: Double = 0.95,
               seed: Long = 42L, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val assembled = emb.withColumn("__v",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cell")
      .fit(assembled)
    val assigned = model.transform(assembled)
      .select(col(idCol), col(vecCol), col("cell"))

    val a = assigned.toDF("id_a", "__va", "cell")
    val b = assigned.toDF("id_b", "__vb", "cell")
    val dups = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", Funcs.r(Similarity.cosine(col("__va"), col("__vb"))))
      .filter(col("cos_sim") >= threshold)
      // smallest witness per dropped id — partial-agg min, no window
      .groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("dup_of"))

    assigned.join(dups, Seq(idCol), "left")
      .withColumn("keep", col("dup_of").isNull)
      .select(col(idCol), col("cell").cast("long").as("cell"),
        col("keep"), col("dup_of"))
  }

  /** Fully-oracle-comparable SemDeDup twin: the coarse quantizer is the
    * portable fixed-iteration Lloyd ([[Similarity.lloydCentroids]] —
    * rounded state, lowest-id seeds, deterministic tie-breaks) instead
    * of MLlib KMeans, so the cells — and therefore the whole keep/drop
    * decision — replay exactly in an unrolled-CTE SQL oracle (the q204
    * recipe). Same scale shape as [[semDedup]]: centroid table broadcast,
    * pair search is an equi-join on cell, witness pick is a skew-safe
    * partial-aggregated min. */
  def semDedupPortable(emb: DataFrame, dim: Int = 64, nClusters: Int = 8,
                       threshold: Double = 0.95, iters: Int = 2,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val cent = Similarity.lloydCentroids(emb, dim, nClusters, iters, idCol, vecCol)
      .select(col("cell"), col("centroid").as("__c"))
    val base = emb.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val assigned = Similarity.assignCells(base, cent)
    val a = assigned.select(col("__id").as("id_a"), col("__v").as("__va"), col("cell"))
    val b = assigned.select(col("__id").as("id_b"), col("__v").as("__vb"), col("cell"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", Funcs.r(Similarity.cosine(col("__va"), col("__vb"))))
      .filter(col("cos_sim") >= threshold)
      .groupBy(col("id_b").as(idCol))
      .agg(min(col("id_a")).as("dup_of"))
    assigned.select(col("__id").as(idCol), col("cell"))
      .join(dups, Seq(idCol), "left")
      .withColumn("keep", col("dup_of").isNull)
      .select(col(idCol), col("cell"), col("keep"), col("dup_of"))
  }
}
