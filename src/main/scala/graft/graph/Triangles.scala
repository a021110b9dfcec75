package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list.
  *
  * Uses the degree-ordered orientation (node ordered by (degree, id)):
  * every undirected edge becomes one directed edge from the
  * lower-(degree, id) endpoint, every triangle is counted exactly once,
  * and — the scale point — the wedge join fans out on OUT-degree under
  * this orientation, which is O(sqrt(m)) per node in the worst case
  * instead of O(max degree). A 10M-follower hub node produces no wedge
  * explosion because its edges all point INTO it. The count is
  * orientation-invariant, so a plain id-ordered oracle reproduces it.
  */
object Triangles {

  /** @param edges undirected distinct edges as (u, v) long columns,
    *              u ≠ v, each pair in one orientation.
    * @return single row: n_nodes, n_edges, n_triangles */
  def triangleCount(edges: DataFrame, uCol: String = "u", vCol: String = "v"): DataFrame = {
    val und = edges.select(least(col(uCol), col(vCol)).as("a"),
      greatest(col(uCol), col(vCol)).as("b")).distinct().cache()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient: keep (x, y) where (deg_x, x) < (deg_y, y)
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("x"),
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("y"))
    val e1 = oriented.select(col("x").as("u"), col("y").as("w1"))
    val e2 = oriented.select(col("x").as("w1"), col("y").as("w2"))
    val e3 = oriented.select(col("x").as("u"), col("y").as("w2"))
    val tri = e1.join(e2, "w1").join(e3, Seq("u", "w2"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    // Materialize the 1-row result eagerly, then release the edge cache
    // so repeated invocations don't accumulate blocks for the driver's
    // lifetime.
    val out = stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
      .localCheckpoint(true)
    und.unpersist(blocking = false)
    out
  }

  /** Per-node triangle participation and local clustering coefficient
    * `2·T / (deg·(deg−1))` (0 for degree-<2 nodes). Same degree-ordered
    * orientation as [[triangleCount]] — each triangle materializes
    * exactly once, and the SET of triangles is orientation-invariant,
    * so an id-ordered SQL enumeration reproduces the per-node counts.
    * A materialized triangle credits all three corners via a 3-way
    * explode (map-side; no extra join). The oriented edge list persists
    * spill-to-disk across its three wedge-join roles and is released
    * once the node-grain result is pinned. */
  def clusteringCoefficient(edges: DataFrame, uCol: String = "u",
                            vCol: String = "v"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val und = edges.select(least(col(uCol), col(vCol)).as("a"),
      greatest(col(uCol), col(vCol)).as("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // node grain — read by orientation AND output
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("x"),
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e1 = oriented.select(col("x").as("u"), col("y").as("w1"))
    val e2 = oriented.select(col("x").as("w1"), col("y").as("w2"))
    val e3 = oriented.select(col("x").as("u"), col("y").as("w2"))
    val triNodes = e1.join(e2, "w1").join(e3, Seq("u", "w2"))
      .select(explode(array(col("u"), col("w1"), col("w2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val out = deg.join(triNodes, Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .select(col("node"), col("deg"), col("n_triangles"),
        graft.functions.Funcs.r(when(col("deg") >= 2,
          lit(2.0) * col("n_triangles") / (col("deg") * (col("deg") - lit(1))))
          .otherwise(lit(0.0))).as("clustering_coeff"))
      .localCheckpoint(true)
    oriented.unpersist(blocking = false)
    und.unpersist(blocking = false)
    out
  }

  /** Co-occurrence edge list: distinct item pairs sharing a basket. */
  def coOccurrenceEdges(df: DataFrame, basketCol: String, itemCol: String): DataFrame = {
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    items.join(items.select(col("__b"), col("__i").as("__j")), "__b")
      .filter(col("__i") < col("__j"))
      .select(col("__i").as("u"), col("__j").as("v")).distinct()
  }
}
