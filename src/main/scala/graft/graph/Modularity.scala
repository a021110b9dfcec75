package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Partition-quality scoring for community structure — Newman
  * modularity `Q = Σ_c [ intra_c/m − (deg_c/(2m))² ]` over an
  * undirected edge list and a node→community assignment. The reference
  * clusters products for cold-start transfer
  * (src/models/cold_start_solutions.py:71,120-121 — KMeans product
  * clusters) and needs a quality score for any such partition;
  * modularity is the graph-side analogue, and the objective that
  * Louvain-style refinement would maximize — scoring a FIXED partition
  * is exact relational algebra even though the refinement loop itself
  * is not deterministically oracle-able.
  *
  * Scale shape: two joins of the edge list against the (node,
  * community) map — broadcast when the node map is dimension-sized —
  * then everything collapses to the community grain (≪ edges). Degree
  * sums come from exploding each edge to its two endpoints (map-side,
  * no extra shuffle beyond the community aggregate). The global edge
  * mass joins back as a broadcast 1-row frame. No iteration, no
  * collect.
  *
  * Contract: `edges` is one row per undirected edge (no duplicates, no
  * self-loops — the caller dedups, as the co-purchase builders here
  * do); every endpoint appears in `communities` exactly once.
  */
object Modularity {

  /** Per-community decomposition: intra-edge count, degree mass, and
    * the community's additive contribution to Q (rounded). `Q` itself
    * is `sum(contribution)` — kept at the community grain so the
    * decomposition stays verifiable row-by-row. */
  def perCommunity(edges: DataFrame, src: String, dst: String,
                   communities: DataFrame, node: String,
                   community: String): DataFrame = {
    val comm = communities.select(col(node).as("__node"),
      col(community).as("__comm"))
    val tagged = edges
      .join(comm.withColumnRenamed("__comm", "__cs"),
        col(src) === col("__node"), "inner").drop("__node")
      .join(comm.withColumnRenamed("__comm", "__cd"),
        col(dst) === col("__node"), "inner").drop("__node")
    // ONE pass over the tagged edges: each edge explodes to its two
    // endpoint communities (degree mass), carrying the intra increment
    // on the src half only so an intra edge still counts once. The
    // edge mass m falls out of the community grain (Σdeg/2) via a
    // broadcast 1-row join — the edge list is scanned exactly once.
    val perComm = tagged
      .select(explode(array(
        struct(col("__cs").as("community"),
          when(col("__cs") === col("__cd"), lit(1L)).otherwise(lit(0L))
            .as("__intra")),
        struct(col("__cd").as("community"), lit(0L).as("__intra"))))
        .as("__e"))
      .select(col("__e.community").as("community"), col("__e.__intra").as("__intra"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("deg_sum"), sum(col("__intra")).as("intra_edges"))
      .localCheckpoint(true) // community grain — pins the single edge pass
    val m = perComm.agg((sum(col("deg_sum")) / lit(2)).cast("long").as("__m"))
    perComm
      .crossJoin(broadcast(m))
      .select(col("community"), col("intra_edges"), col("deg_sum"),
        r(col("intra_edges") / col("__m") -
          (col("deg_sum") / (lit(2.0) * col("__m")))
            * (col("deg_sum") / (lit(2.0) * col("__m"))))
          .as("contribution"))
  }
}
