package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** Covariance matrix + PCA over an embedding column.
  *
  * Covariance is the distributed part: one explode → per-vector
  * self-join on the id (co-partitioned equi-join, upper triangle only)
  * → (i, j) aggregate of exact sufficient sums. dim d gives d(d+1)/2
  * output cells regardless of corpus size, and map-side partial
  * aggregation collapses each partition to those cells before the one
  * shuffle — at 100 TB the reduction is ~2k cells for d = 64.
  * Parity discipline: sums are rounded (Funcs.r) BEFORE the covariance
  * formula divides them, so both engines derive from identical inputs.
  *
  * PCA eigen-decomposes the dim×dim matrix on the DRIVER (bounded by
  * d², never by rows — the same bounded-collect pattern as
  * FeatureQuality's ranking) and projects rows through a broadcast
  * literal basis; the projection is a codegen'd dot per component.
  * Eigenvectors have engine-specific sign/ulps → projection is
  * spec-tested (planted-signal recovery), not oracled; the covariance
  * IS oracled (q203).
  */
object Pca {

  /** Upper-triangle covariance cells (i ≤ j): (i, j, n, cov).
    *
    * Pair generation is WITHIN-ROW (explode the vector twice against
    * itself) — no id join, so nothing fact-sized ever shuffles: the
    * d(d+1)/2-per-row pair stream flows straight into map-side partial
    * aggregation and the single exchange carries ~2k cells per
    * partition, not rows. (A join-on-id formulation would shuffle
    * d×N rows — the difference between kilobytes and the corpus.) */
  def covarianceMatrix(df: DataFrame, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val vd = col(vecCol).cast("array<double>")
    df.select(vd.as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
      .filter(col("i") <= col("j"))
      .groupBy(col("i").cast("long").as("i"), col("j").cast("long").as("j"))
      .agg(count(lit(1)).as("n"),
        Funcs.r(sum(col("xi") * col("xj"))).as("__sxy"),
        Funcs.r(sum(col("xi"))).as("__sx"),
        Funcs.r(sum(col("xj"))).as("__sy"))
      .withColumn("cov", Funcs.r(
        (col("__sxy") - col("__sx") * col("__sy") / col("n")) / (col("n") - 1)))
      .select(col("i"), col("j"), col("n"), col("cov"))
  }

  /** Top-k principal axes from the driver-side eigen-decomposition of
    * the covariance matrix. Returns (eigenvalue, eigenvector) pairs,
    * eigenvalue-descending, each vector sign-normalized so its
    * largest-|component| entry is positive (removes the eigen sign
    * ambiguity). */
  def principalAxes(df: DataFrame, dim: Int, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Seq[(Double, Array[Double])] = {
    require(k >= 1 && k <= dim)
    // dim² cells — bounded collect, independent of corpus size
    val cells = covarianceMatrix(df, idCol, vecCol)
      .select(col("i"), col("j"), col("cov"))
      .collect().map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getDouble(2)))
    val m = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    cells.foreach { case ((i, j), c) => m(i, j) = c; m(j, i) = c }
    val es = breeze.linalg.eigSym(m)
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(k)
    order.map { case (ev, idx) =>
      val vec = Array.tabulate(dim)(d => es.eigenvectors(d, idx))
      val pivot = vec.indices.maxBy(d => math.abs(vec(d)))
      val s = if (vec(pivot) < 0) -1.0 else 1.0
      (ev, vec.map(_ * s))
    }
  }

  /** Project rows onto the top-k principal axes: adds pc_1..pc_k
    * columns (centered dot products against the broadcast literal
    * basis). */
  def project(df: DataFrame, dim: Int, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val axes = principalAxes(df, dim, k, idCol, vecCol)
    val meanVec = df.agg(
      array((0 until dim).map(d =>
        avg(col(vecCol).cast("array<double>").getItem(d))): _*).as("__mean"))
      .head().getSeq[Double](0).toArray
    val vd = col(vecCol).cast("array<double>")
    axes.zipWithIndex.foldLeft(df) { case (acc, ((_, axis), c)) =>
      val dotExpr = (0 until dim).map(d =>
        (vd.getItem(d) - lit(meanVec(d))) * lit(axis(d))).reduce(_ + _)
      acc.withColumn(s"pc_${c + 1}", Funcs.r(dotExpr))
    }
  }
}
