package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Degree assortativity (Newman 2002): the Pearson correlation of
  * endpoint degrees over the symmetrized edge list — do high-degree
  * nodes attach to other hubs (positive) or to leaves (negative)? The
  * structural summary to pair with the reference's product-cluster
  * diagnostics (src/models/cold_start_solutions.py:120-121), applied
  * to the co-purchase graphs the graph family already builds.
  *
  * Fully relational and integer-exact: degrees are counts, the five
  * sufficient sums are sums of bounded integer products (exact in any
  * engine under 2^53), and the correlation is assembled once at the
  * end and rounded — no per-row floating point, no iteration.
  *
  * Scale shape: one shuffle to the node grain for degrees (pinned,
  * it is read twice), two joins to tag each directed edge with its
  * endpoint degrees, one global aggregate. The symmetrized edge list
  * persists spill-to-disk across the degree and tagging passes and is
  * released once the 1-row result is pinned.
  */
object Assortativity {

  /** @return one row: n_directed_edges (2·|E|), assortativity. */
  def degreeAssortativity(edges: DataFrame, src: String, dst: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionByName(edges.select(col(dst).as("a"), col(src).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val sums = sym
      .join(deg.select(col("node").as("a"), col("deg").as("dx")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("dy")), "b")
      .agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    val out = sums.select(col("n").as("n_directed_edges"),
      r((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
        .as("assortativity"))
      .localCheckpoint(true)
    sym.unpersist(blocking = false)
    out
  }
}
