package graft

import org.apache.spark.sql.functions._
import graft.sim.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("subvectors splits a vector into m contiguous slices") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f))).toDF("vec_id", "embedding")
    val rows = Pq.subvectors(df, dim = 4, m = 2)
      .orderBy("sub").as[(Long, Int, Array[Double])].collect()
    assert(rows.map(_._2).toSeq == Seq(0, 1))
    assert(rows(0)._3.toSeq == Seq(1.0, 2.0))
    assert(rows(1)._3.toSeq == Seq(3.0, 4.0))
  }

  /** Two clean clusters per subspace: ids 0..3 sit exactly on one of two
    * subspace patterns, so a ksub=2 codebook recovers them exactly. */
  private def twoPattern = Seq(
    (0L, Array(1.0f, 0.0f, 5.0f, 5.0f)),
    (1L, Array(0.0f, 1.0f, 7.0f, 7.0f)),
    (2L, Array(1.0f, 0.0f, 5.0f, 5.0f)),
    (3L, Array(0.0f, 1.0f, 7.0f, 7.0f))).toDF("vec_id", "embedding")

  test("encode recovers planted subspace clusters with zero quantization error") {
    val cb = Pq.trainCodebooks(twoPattern, dim = 4, m = 2, ksub = 2, iters = 2)
    val codes = Pq.encode(twoPattern, cb, dim = 4, m = 2)
      .orderBy("vec_id", "sub")
      .as[(Long, Int, Long, Double)].collect()
    assert(codes.length == 8)
    // identical vectors share identical codes in every subspace
    val bySub = codes.groupBy(_._2)
    bySub.values.foreach { rows =>
      assert(rows.find(_._1 == 0L).get._3 == rows.find(_._1 == 2L).get._3)
      assert(rows.find(_._1 == 1L).get._3 == rows.find(_._1 == 3L).get._3)
      assert(rows.find(_._1 == 0L).get._3 != rows.find(_._1 == 1L).get._3)
    }
    // after convergence each centroid IS the cluster point -> err 0
    // (dist is the rounded expanded form; allow rounding-grid slack)
    codes.foreach { case (_, _, _, err) => assert(math.abs(err) <= 2e-4, s"err $err") }
  }

  /** Deterministic clustered vectors: 3 clusters in 8 dims (the
    * SimilaritySpec fixture). */
  private def clustered = {
    val rnd = new scala.util.Random(7)
    (0 until 90).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 1.0f else 0.0f)
      val noisy = base.map(x => x + rnd.nextFloat() * 0.1f)
      (i.toLong, noisy)
    }.toDF("vec_id", "embedding")
  }

  /** With ksub=4 codebooks over 2-dim subspaces, PQ deliberately
    * quantizes away WITHIN-cluster distinctions (that is the
    * compression), so exact top-5 overlap with cosine brute force is
    * not the semantic contract — candidate PURITY is: every ADC
    * neighbor must come from the query's planted cluster, i.e. the
    * compressed scores still separate the clusters that matter for
    * candidate generation. Implementation exactness is covered by the
    * q263/q264 full oracles. */
  test("ADC top-k keeps every neighbor in the query's planted cluster") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cb = Pq.trainCodebooks(corpus, dim = 8, m = 4, ksub = 4, iters = 2)
    val codes = Pq.encode(corpus, cb, dim = 8, m = 4)
    val adc = Pq.adcTopK(codes, cb, queries, 5, dim = 8, m = 4)
    val rows = adc.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.length == 15)
    rows.foreach { case (q, n) => assert(n % 3 == q % 3, s"query $q got $n") }
  }

  test("IVF-PQ composition prunes to probed cells and stays deterministic") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def run() = Pq.ivfPqTopK(corpus, queries, 5, dim = 8, m = 4, ksub = 4,
        iters = 2, nlist = 6, nprobe = 2)
      .select("query_id", "neighbor_id", "adc_score", "rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4))
    val a = run(); val b = run()
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq, "IVF-PQ result not run-to-run deterministic")
    // cell pruning must not admit cross-cluster neighbors either
    a.foreach { r => assert(r._2 % 3 == r._1 % 3, s"query ${r._1} got ${r._2}") }
  }
}
