package graft

import org.apache.spark.sql.functions._
import graft.sim.{SemDedup, Similarity}
import graft.text.Bpe

/** Round-5 batch-1: SemDeDup cluster-scoped dedup and distributed BPE. */
class SemDedupBpeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---------------- SemDedup ----------------

  test("semDedup: planted exact duplicates are dropped, keep-lowest-id") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // plant exact copies of vectors 0..4 under ids 100000+i — exact
    // copies land in the same KMeans cell by definition (cos = 1)
    val base = emb.filter(col("vec_id") < 5)
    val copies = base.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"), col("label"))
    val out = SemDedup.semDedup(emb.unionByName(copies))
    val dropped = out.filter(!col("keep"))
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach { i =>
      assert(dropped.contains(100000L + i), s"copy of $i not dropped")
      assert(dropped(100000L + i) <= i || dropped(100000L + i) < 100000L,
        s"witness for copy of $i is not a smaller id: ${dropped(100000L + i)}")
    }
    // originals with no smaller near-dup stay kept
    val kept = out.filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L))
  }

  test("semDedup recall vs brute force at high threshold") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(300).cache()
    // brute-force ground truth: ids with a smaller-id neighbor ≥ 0.95
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cs", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cs") >= 0.95)
      .select("id_b").distinct().as[Long].collect().toSet
    val got = SemDedup.semDedup(emb, nClusters = 8)
      .filter(!col("keep")).select("vec_id").as[Long].collect().toSet
    // no false drops beyond truth (cluster scoping only MISSES pairs)
    assert(got.subsetOf(truth), s"false drops: ${got.diff(truth)}")
    if (truth.nonEmpty) {
      val recall = got.size.toDouble / truth.size
      assert(recall >= 0.8, s"recall $recall (${got.size}/${truth.size})")
    }
  }

  // ---------------- Bpe ----------------

  /** Independent single-node reference BPE (quadratic, driver-side). */
  private def referenceBpe(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    val wordFreq = corpus.flatMap(_.toLowerCase.trim.split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    var vocab: Map[Vector[String], Long] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[(String, String)]
    var continue = true
    var i = 0
    while (i < numMerges && continue) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(x, y) => pairCounts((x, y)) = pairCounts.getOrElse((x, y), 0L) + f
          case _ =>
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        val (pair, cnt) = pairCounts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head
        if (cnt < 2) continue = false
        else {
          merges += pair
          vocab = vocab.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
                out += (pair._1 + pair._2); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.result(), f)
          }.groupBy(_._1).map { case (s, m) => (s, m.values.sum) }
          i += 1
        }
      }
    }
    merges.result()
  }

  test("learnMerges matches an independent local reference") {
    val corpus = Seq(
      "low lower lowest", "new newer newest", "low low new",
      "wider wide widest", "lower newer")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learnMerges(df, "text", numMerges = 12)
      .map(m => (m.left, m.right))
    val want = referenceBpe(corpus, 12)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("driver-vocab fast path and distributed loop learn identical merges") {
    val corpus = Seq(
      "low lower lowest", "new newer newest", "low low new",
      "wider wide widest", "lower newer", "aaaa aaa aa")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val local = Bpe.learnMerges(df, "text", numMerges = 12)
    // maxDriverVocab = 0 can never hold the vocab -> distributed loop
    val dist = Bpe.learnMerges(df, "text", numMerges = 12, maxDriverVocab = 0)
    assert(local == dist, s"\nlocal: $local\ndist:  $dist")
  }

  test("encode applies merges in rank order; piece concat reconstructs word") {
    val df = Seq((0L, "banana bandana")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(0, "a", "n"), Bpe.Merge(1, "an", "an"))
    // "banana": b a n a n a → pass0 → b an an a → pass1 → b anan a
    val enc = Bpe.encode(df, "doc_id", "text", merges)
    val pieces = enc.select("pieces").as[Seq[String]].head()
    assert(pieces.take(3) == Seq("b", "anan", "a"), pieces.toString)
    assert(pieces.mkString == "bananabandana")
    val (nt, np) = enc.select("n_tokens", "n_pieces").as[(Long, Long)].head()
    assert(nt == 2L && np == pieces.length.toLong)
  }

  test("learn+encode round trip on real docs shrinks piece count") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200).cache()
    val merges = Bpe.learnMerges(docs, "text", numMerges = 16)
    assert(merges.nonEmpty && merges.map(_.rank) == merges.indices)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val (chars, pieces) = enc
      .join(docs, "doc_id")
      .agg(sum(length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))),
        sum(col("n_pieces")))
      .as[(Long, Long)].head()
    assert(pieces < chars, s"merges should compress: $pieces pieces vs $chars chars")
    // every piece sequence reconstructs its source tokens
    val bad = enc.join(docs, "doc_id")
      .filter(concat_ws("", col("pieces")) =!=
        regexp_replace(lower(trim(col("text"))), "\\s+", ""))
      .count()
    assert(bad == 0L)
  }
}
