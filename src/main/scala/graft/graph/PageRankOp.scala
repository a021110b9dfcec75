package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Distributed PageRank in FIXED-POINT integer arithmetic.
  *
  * Floating-point PageRank is not reproducible across engines (or even
  * across partitionings of the same engine): per-node contribution sums
  * commute differently and ulp drift compounds per iteration. This
  * implementation represents ranks as integer `scale`-units
  * (rank_i ≈ rank·1e9) and uses only BIGINT truncating division —
  *   contrib   = rank_i div deg
  *   rank_i'   = (3·scale) div (20·N)  +  (17 · Σ contrib) div 20
  * (damping 0.85 = 17/20, teleport 0.15 = 3/20) — so every engine, every
  * partitioning, and every run computes bit-identical ranks, making a
  * full cross-engine oracle possible for an iterative graph algorithm.
  *
  * Scale shape (100 TB): each iteration is one equi-join of the edge
  * list with the (node, rank) frame plus one key-partitioned
  * partial-aggregated sum — the standard Pregel-as-joins formulation;
  * lineage is truncated every few iterations (`localCheckpoint`) so the
  * plan stays O(1) per iteration. Edges and degrees are cached once.
  *
  * Requirement: every node must have out-degree ≥ 1 (no dangling mass).
  * Symmetrized graphs (add both edge directions) satisfy this by
  * construction.
  */
object PageRankOp {

  /** @return (node, rank_i BIGINT exact fixed-point, rank double ≈ rank_i/scale) */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    val base = (3L * scale) / (20L * n)

    var rank = nodes.withColumn("rank_i", lit(scale / n))
    for (i <- 1 to iters) {
      val contrib = e.join(rank, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"), expr("rank_i div deg").as("c"))
        .groupBy(col("dst").as("__n")).agg(sum("c").as("s"))
      rank = nodes.join(contrib, col("node") === col("__n"), "left")
        .select(col("node"),
          (lit(base) + expr("(17 * coalesce(s, 0)) div 20")).as("rank_i"))
      if (i % 4 == 0) rank = rank.localCheckpoint(true)
    }
    // eager-materialize before releasing iteration caches (same cache
    // hygiene as LabelProp/Triangles — long-lived drivers must not
    // accumulate blocks across repeated invocations)
    val out = rank.select(col("node"), col("rank_i"),
      Funcs.r(col("rank_i") / lit(scale.toDouble)).as("rank"))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
  }

  /** Personalized PageRank: teleport mass returns only to the `seedPred`
    * node set (the "random surfer restarts at MY products" variant —
    * recommendation neighborhoods, seeded influence). Identical
    * fixed-point integer recipe as [[pageRank]] — seeds share the
    * 3/20 teleport mass equally, non-seeds get none — so the same
    * unrolled-CTE oracle covers it (q206). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seedPred: org.apache.spark.sql.Column, iters: Int = 5,
                           scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val nSeeds = nodes.filter(seedPred).count()
    require(nSeeds > 0, "seedPred matches no node")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    val base = (3L * scale) / (20L * nSeeds)

    var rank = nodes.withColumn("rank_i",
      when(seedPred, lit(scale / nSeeds)).otherwise(lit(0L)))
    for (i <- 1 to iters) {
      val contrib = e.join(rank, col("src") === col("node"))
        .join(deg, "src")
        .select(col("dst"), expr("rank_i div deg").as("c"))
        .groupBy(col("dst").as("__n")).agg(sum("c").as("s"))
      rank = nodes.join(contrib, col("node") === col("__n"), "left")
        .select(col("node"),
          (when(seedPred, lit(base)).otherwise(lit(0L))
            + expr("(17 * coalesce(s, 0)) div 20")).as("rank_i"))
      if (i % 4 == 0) rank = rank.localCheckpoint(true)
    }
    val out = rank.select(col("node"), col("rank_i"),
      Funcs.r(col("rank_i") / lit(scale.toDouble)).as("rank"))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
  }
}
