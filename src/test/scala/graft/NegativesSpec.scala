package graft

import org.apache.spark.sql.functions._
import graft.sim.Negatives

class NegativesSpec extends SparkSpec {
  import spark.implicits._

  test("random negatives: k per query, never the query or its positive, deterministic") {
    val corpus = (0L until 200L).map(i => Tuple1(i)).toDF("doc_id")
    val queries = Seq((1L, 2L), (5L, 6L), (9L, 10L))
      .toDF("query_id", "positive_id")
    val out = Negatives.randomNegatives(corpus, queries, k = 5)
      .as[(Long, Long, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(1L, 5L, 9L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q got ${rows.length}")
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val positive = queries.filter(col("query_id") === q)
        .select("positive_id").as[Long].head()
      rows.foreach { case (_, neg, _) =>
        assert(neg != q && neg != positive)
      }
    }
    // deterministic across runs
    val again = Negatives.randomNegatives(corpus, queries, k = 5)
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("hard negatives: positives excluded, ranking matches brute force otherwise") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val positives = queries.select(col("query_id"), (col("query_id") + 1).as("positive_id"))
    val hard = Negatives.hardNegatives(emb, queries, positives, k = 10)
      .select("query_id", "neg_id").as[(Long, Long)].collect()
    // the labeled positive never appears
    assert(!hard.exists { case (q, n) => n == q + 1 })
    // every returned id is also in the brute-force top-11 (10 + the
    // possibly-excluded positive)
    val brute = graft.sim.Similarity.bruteForceTopK(emb, queries, 11)
      .select(col("query_id"), col("neighbor_id")).as[(Long, Long)].collect().toSet
    hard.foreach { case (q, n) => assert(brute.contains((q, n)), s"($q,$n)") }
  }
}
