package graft

import org.apache.spark.sql.functions._
import graft.text.{Dedup, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the lowest-id row per identical text") {
    val kept = Dedup.exactDedup(docs, "text", Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("n-gram Jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical → J=1
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("MinHash LSH candidates include every exact-Jaccard pair above threshold") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text", minEstJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cand), s"missed: ${exact -- cand}")
  }

  test("portable MinHash candidates catch identical and near-dup docs") {
    val cand = Dedup.minHashCandidatesPortable(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L))) // identical text → identical signature
    assert(cand.contains((1L, 3L)) || cand.contains((2L, 3L))) // near dup collides on some band
  }

  test("portable SimHash: identical docs at hamming 0; near-dups within threshold") {
    val cand = Dedup.simHashCandidatesPortable(docs, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cand.get((1L, 2L)).contains(0L)) // identical text → hamming 0
    assert(cand.contains((1L, 3L)) || cand.contains((2L, 3L)))
  }

  test("SimHash: identical docs at hamming 0; near-dups close; unrelated far") {
    val cand = Dedup.simHashCandidates(docs, "doc_id", "text", maxHamming = 16)
      .select(col("id_a"), col("id_b"), col("hamming")).as[(Long, Long, Int)]
      .collect().map { case (a, b, h) => (a, b) -> h }.toMap
    assert(cand((1L, 2L)) == 0)
    assert(cand.get((1L, 3L)).forall(_ <= 16))
  }

  test("candidate generation plans contain no cartesian product") {
    val plan = Dedup.minHashCandidates(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val plan2 = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("CartesianProduct"), plan2)
  }

  test("dedup clusters close transitively and keep one representative") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.dedupClusters(pairs)
    val byDoc = clusters.as[(Long, Long)].collect().toMap
    assert(byDoc(1L) == byDoc(2L) && byDoc(2L) == byDoc(3L)) // transitive
    assert(byDoc(10L) == byDoc(11L) && byDoc(10L) != byDoc(1L))
    val docs2 = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id2")
    val kept = Dedup.dropNearDupes(docs2, "doc_id2", clusters)
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 10L, 99L)) // min per cluster + untouched doc
  }

  test("keepBest keeps the highest-quality cluster member, not the min id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = Dedup.dedupClusters(pairs)
    val docs2 = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (10L, 1.0), (11L, 1.0), (99L, 0.5))
      .toDF("doc_id2", "quality")
    val kept = Dedup.keepBest(docs2, "doc_id2", clusters, col("quality"))
      .select("doc_id2").as[Long].collect().sorted
    // cluster {1,2,3}: 2 has top quality; cluster {10,11}: quality tie → lower id
    assert(kept.toSeq == Seq(2L, 10L, 99L), kept.toSeq.toString)
  }

  test("language ID identifies marker-heavy texts and CJK") {
    val samples = Seq(
      (1L, "the cat and the dog in a house"),
      (2L, "der Hund und die Katze ist nicht da"),
      (3L, "el perro y el gato es una mascota"),
      (4L, "le chien et le chat est dans la maison"),
      (5L, "你好世界")
    ).toDF("doc_id", "text")
    val out = samples.select(col("doc_id"), TextAnalysis.languageId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "es"
      && out(4L) == "fr" && out(5L) == "zh")
  }

  test("text stats count words and characters") {
    val row = docs.filter(col("doc_id") === 5)
      .select(TextAnalysis.textStats(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(row.getAs[Long]("n_chars") == 10L)
    assert(row.getAs[Long]("n_words") == 2L)
  }
}
