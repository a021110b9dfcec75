package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Density-based point classification — the DBSCAN core/border/noise
  * decomposition over coordinate-bearing rows (the clustering side of
  * the reference's store-geography features,
  * src/data/preprocessors.py:306-377). Classification is the exact,
  * deterministic part of DBSCAN: a point is CORE when ≥ `minPts`
  * points (itself included) lie within `epsKm`, BORDER when it is not
  * core but some core point is within `epsKm`, NOISE otherwise. The
  * cluster-labeling epilogue (connected components over core points)
  * is the same iterative CC primitive as [[graft.text.Dedup]]'s
  * transitive clustering and plugs in behind this classifier when
  * labels are needed.
  *
  * Scale shape: neighbor pairs come from [[Geo.withinDistance]]'s
  * latitude-band-blocked equi-join (provably complete candidates,
  * never all-pairs), collapsed to a per-point neighbor count; the
  * border test is a semi-join of the pair list against the core set.
  * Everything keys on the point id — two shuffles at the pair grain,
  * no windows over unpartitioned data, no collect.
  */
object GeoCluster {

  /** Per-point classification. `pts` must carry one row per id.
    * Returns (id, lat, lon as given, n_within_eps, cls). */
  def dbscanClassify(pts: DataFrame, id: Column, lat: Column, lon: Column,
                     epsKm: Double, minPts: Int): DataFrame = {
    require(minPts >= 1, "minPts must be positive")
    val left = pts.select(id.as("pid"), lat.as("p_lat"), lon.as("p_lon"))
    val right = pts.select(id.as("qid"), lat.as("q_lat"), lon.as("q_lon"))
    // neighbor pairs excluding self; the rounded haversine gate makes
    // the ≤ eps decision identical in every engine. The pair list
    // feeds BOTH the count and the near-core semi-join, and at scale
    // it dwarfs the point set — persist spill-to-disk for the reuse
    // (the [[graft.text.Dedup]] signature-table rationale), release
    // after the bounded point-grain result is pinned.
    val pairs = Geo.withinDistance(left, right,
        col("p_lat"), col("p_lon"), col("q_lat"), col("q_lon"), epsKm)
      .filter(col("pid") =!= col("qid"))
      .select(col("pid"), col("qid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = pairs.groupBy(col("pid"))
      .agg((count(lit(1)) + lit(1L)).as("n_within_eps"))
    val classified = left
      .join(counts, Seq("pid"), "left")
      .na.fill(1L, Seq("n_within_eps"))
      .withColumn("is_core", col("n_within_eps") >= minPts)
    val coreIds = classified.filter(col("is_core")).select(col("pid").as("qid"))
    val nearCore = pairs.join(coreIds, Seq("qid"), "left_semi")
      .select(col("pid")).distinct().withColumn("__near_core", lit(true))
    val out = classified
      .join(nearCore, Seq("pid"), "left")
      .select(col("pid"), col("p_lat"), col("p_lon"), col("n_within_eps"),
        when(col("is_core"), lit("core"))
          .when(coalesce(col("__near_core"), lit(false)), lit("border"))
          .otherwise(lit("noise")).as("cls"))
      .localCheckpoint(true) // point grain — lets the pair cache go
    pairs.unpersist(blocking = false)
    out
  }
}
