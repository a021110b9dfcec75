package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration k-core peeling: repeatedly remove nodes whose degree
  * in the CURRENT subgraph is < k; what survives `iters` rounds (to a
  * fixed point for graphs whose peeling depth ≤ iters) is the k-core —
  * the standard dense-substructure filter (spam farms, co-purchase
  * cliques, dense doc-link cores) next to triangles/label-prop in the
  * graph family.
  *
  * Like PageRankOp/LabelProp.ccFixed, the fixed iteration count plus
  * pure integer degree arithmetic makes the result bit-identical across
  * engines and partitionings, so an unrolled-CTE oracle covers it.
  *
  * Scale shape per round: one degree aggregate (map-side combinable)
  * and two semi-joins of the edge list against the surviving-node set —
  * all equi-joins keyed on node id; lineage is truncated each round so
  * plan depth stays bounded.
  */
object KCore {

  /** @param edges undirected edges (symmetrized + deduped internally).
    * @return (node, core_deg): nodes surviving `iters` peeling rounds,
    *         with their degree in the surviving subgraph. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            iters: Int = 3): DataFrame = {
    require(k >= 1 && iters >= 1)
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    var e = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    for (_ <- 1 to iters) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k).select(col("src").as("__keep"))
      val pruned = e
        .join(keep, e("src") === keep("__keep"), "left_semi")
        .join(keep.select(col("__keep").as("__keep2")),
          e("dst") === col("__keep2"), "left_semi")
        .localCheckpoint(true)
      e.unpersist(blocking = false)
      e = pruned
    }
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_deg"))
    out
  }
}
