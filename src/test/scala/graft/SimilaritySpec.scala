package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(2.0f, 0.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("a"), col("c")).as("ac")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  /** Deterministic clustered vectors: 3 clusters in 8 dims. */
  private def clustered = {
    val rnd = new scala.util.Random(7)
    (0 until 90).map { i =>
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 1.0f else 0.0f)
      val noisy = base.map(x => x + rnd.nextFloat() * 0.1f)
      (i.toLong, noisy)
    }.toDF("vec_id", "embedding")
  }

  test("brute-force top-k returns same-cluster neighbors first") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = Similarity.bruteForceTopK(corpus, queries, 5)
    val rows = top.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.length == 15)
    // every neighbor of query q belongs to q's cluster (q mod 3)
    rows.foreach { case (q, n) => assert(n % 3 == q % 3, s"query $q got $n") }
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(corpus, queries, 5, dim = 8, numPlanes = 16, bands = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF top-k achieves high recall vs brute force and joins on cell ids") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(corpus, queries, 5, nlist = 6, nprobe = 2)
    val ivfSet = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("portable Lloyd IVF: recall vs brute force on clustered data, deterministic cells") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val brute = Similarity.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfPortableTopK(corpus, queries, 5, dim = 8,
      nlist = 6, nprobe = 2, iters = 2)
    val ivfSet = ivf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivfSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
    // fixed seeds + rounded state: a second run is bit-identical
    val again = Similarity.ivfPortableTopK(corpus, queries, 5, dim = 8,
      nlist = 6, nprobe = 2, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(again == ivfSet)
  }

  test("cosine near-dup pairs: high recall vs exact all-pairs, no false positives") {
    // planted near-dups: pairs (i, i+100) share a base vector with tiny noise
    val rnd = new scala.util.Random(11)
    val base = Array.fill(50)(Array.fill(8)(rnd.nextFloat()))
    val vecs = (0 until 50).map(i => (i.toLong, base(i))) ++
      (0 until 50).map(i => (i + 100L, base(i).map(x => x + rnd.nextFloat() * 0.01f)))
    val df = vecs.toDF("vec_id", "embedding")
    val found = graft.sim.Similarity.cosineNearDupes(df, dim = 8, threshold = 0.999,
      numPlanes = 16, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 50).map(i => (i.toLong, i + 100L)).toSet
    val recall = (found & planted).size.toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall")
    // every reported pair really is >= threshold (verify step is exact)
    val exact = Similarity.cosineNearDupes(df, 8, 0.999, numPlanes = 16, bands = 16)
    assert(exact.filter(col("cos_sim") < 0.999).count() == 0)
  }

  test("LSH candidate join is an equi-join, not a cartesian product") {
    val corpus = clustered
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val plan = Similarity.lshTopK(corpus, queries, 5, dim = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("recallAtK: identity result scores 1, disjoint scores 0, partial counts") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val self = Similarity.recallAtK(exact, exact, 3)
      .select("query_id", "recall").as[(Long, Double)].collect().toMap
    assert(self(1L) == 1.0 && self(2L) == 1.0)
    val partial = Seq((1L, 10L, 1L), (1L, 99L, 2L), (2L, 98L, 1L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.recallAtK(partial, exact, 3)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("recall"))).toMap
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    // rank filter: approx ranks beyond k are ignored
    val deep = Seq((1L, 10L, 4L)).toDF("query_id", "neighbor_id", "rank")
    val none = Similarity.recallAtK(deep, exact, 3)
      .select("n_hit").as[Long].collect()
    assert(none.forall(_ == 0L))
  }
}
