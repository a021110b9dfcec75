package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by fixed-iteration min-label propagation.
  *
  * Each node starts labeled with its own id; every iteration each node
  * takes the min of its label and its neighbors' labels. After k
  * iterations every node holds the min node-id within graph distance k
  * — for components with diameter ≤ k this IS the component id. Pure
  * integer min/join arithmetic → bit-identical across engines and
  * partitionings, so (unlike hash-based or GraphX CC ids) a fixed
  * iteration count admits a full cross-engine oracle. The
  * convergence-checked production variant is `text/Dedup.dedupClusters`
  * (GraphX); this is the deterministic-contract form of the same
  * operator family.
  *
  * Scale shape: per iteration one equi-join edges ⋈ labels + one
  * key-partitioned min aggregate (Pregel-as-joins); lineage truncated
  * every 4 iterations like PageRankOp.
  */
object LabelProp {

  /** @param edges undirected edges (symmetrized internally).
    * @return (node, label) after `iters` min-propagation rounds. */
  def ccFixed(edges: DataFrame, srcCol: String, dstCol: String,
              iters: Int = 5): DataFrame = {
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    val nodes = e.select(col("src").as("node")).distinct().cache()
    var lbl = nodes.withColumn("label", col("node"))
    for (i <- 1 to iters) {
      val nb = e.join(lbl, col("src") === col("node"))
        .groupBy(col("dst").as("__n")).agg(min(col("label")).as("__m"))
      lbl = lbl.join(nb, col("node") === col("__n"), "left")
        .select(col("node"), least(col("label"), coalesce(col("__m"), col("label"))).as("label"))
      if (i % 4 == 0) lbl = lbl.localCheckpoint(true)
    }
    // Eager-checkpoint the result BEFORE releasing the iteration caches
    // (lazy unpersist would recompute e/nodes on first use); without the
    // release, repeated invocations across a long-lived driver accumulate
    // cached blocks for its lifetime.
    val out = lbl.localCheckpoint(true)
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
