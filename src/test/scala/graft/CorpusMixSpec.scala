package graft

import org.apache.spark.sql.functions._
import graft.text.{CorpusMix, Decontaminate}

class CorpusMixSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 100 docs in "web", 10 in "books": weights ask for a 50-doc budget
    // split 60/40 → web wants 30/100 (sampled), books wants 20/10 (capped)
    val rows = (0 until 100).map(i => (i.toLong, "web", s"web doc $i")) ++
      (100 until 110).map(i => (i.toLong, "books", s"book doc $i"))
    rows.toDF("doc_id", "source", "text")
  }

  test("mixToTarget: under-supplied source kept whole, big source downsampled") {
    val out = CorpusMix.mixToTarget(corpus, "doc_id", "source",
      Map("web" -> 0.6, "books" -> 0.4), targetFraction = 0.5)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("books") == 10L) // fraction capped at 1 → all kept
    // web target = 0.6·0.5·110 = 33 docs; Lehmer threshold sampling is
    // approximate on 100 keys — accept a generous band
    assert(bySrc("web") >= 20L && bySrc("web") <= 46L, s"web=${bySrc("web")}")
  }

  test("mixToTarget: unlisted sources are dropped; decisions are deterministic") {
    val out = CorpusMix.mixToTarget(corpus, "doc_id", "source",
      Map("books" -> 1.0), targetFraction = 0.1)
    assert(out.filter(col("source") === "web").count() == 0L)
    val a = out.select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusMix.mixToTarget(corpus, "doc_id", "source",
      Map("books" -> 1.0), targetFraction = 0.1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("decontamination flags only docs sharing an n-word shingle with bench") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // contains bench 4-gram
      (11L, "one two three four five six"),
      (12L, "alpha beta gamma other words here")    // only a 3-gram overlap
    ).toDF("doc_id", "text")
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Decontaminate.report(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 1L))
  }

  test("decontamination counts distinct matched shingles") {
    val train = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
    val bench = Seq((1L, "a b c d e")).toDF("doc_id", "text") // shares 2 4-grams
    val out = Decontaminate.report(train, bench, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 2L))
  }

  test("sequence packing: contiguous fill respects id order and budget boundaries") {
    // tokens: 3, 4, 5, 2 with budget 7 → exclusive prefix sums 0,3,7,12
    // → bins 0,0,1,1
    val docs = Seq(
      (1L, "s", "a b c"), (2L, "s", "d e f g"),
      (3L, "s", "h i j k l"), (4L, "s", "m n"),
      (5L, "t", "x y z")) // separate group packs independently from 0
      .toDF("doc_id", "source", "text")
    val a = graft.text.SequencePack.assign(docs, "source", "doc_id", "text", 7)
      .orderBy("source", "doc_id")
      .select("doc_id", "bin").as[(Long, Long)].collect().toSeq
    assert(a == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 0L)))
    val b = graft.text.SequencePack.bins(docs, "source", "doc_id", "text", 7)
      .orderBy("source", "bin")
      .select("source", "bin", "n_docs", "n_tokens")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(b == Seq(("s", 0L, 2L, 7L), ("s", 1L, 2L, 7L), ("t", 0L, 1L, 3L)))
  }

  test("curateCorpus composes filter→dedup→mix→pack with sane invariants") {
    val out = graft.app.Jobs.curateCorpus(spark, "/root/testdata/sf0.001",
      Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.05, "src4" -> 0.05),
      targetFraction = 0.5, budget = 256)
      .select("source", "n_bins", "n_docs", "n_tokens")
      .as[(String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).toSet.subsetOf(Set("src0", "src1", "src2", "src3", "src4")))
    out.foreach { case (src, nBins, nDocs, nTokens) =>
      assert(nBins >= 1 && nDocs >= nBins, s"$src: $nBins bins, $nDocs docs")
      // contiguous fill: every bin except possibly the last is filled past
      // the budget boundary by construction → tokens > (bins-1) * budget
      assert(nTokens > (nBins - 1) * 256, s"$src: $nTokens tokens in $nBins bins")
    }
  }

  test("robust scale: median/IQR within key, outlier-resistant") {
    val df = Seq((1, 1.0), (1, 2.0), (1, 3.0), (1, 4.0), (1, 1000.0))
      .toDF("k", "v")
    val out = graft.etl.Cleaning.robustScale(df, Seq(col("k")), col("v"))
      .orderBy("v").select("robust_z").as[Double].collect()
    // median=3, q1=2, q3=4, iqr=2: z = (v-3)/(2+eps)
    assert(math.abs(out(0) - (-1.0)) < 1e-6) // v=1
    assert(math.abs(out(2) - 0.0) < 1e-6)    // v=3
    assert(out(4) > 400.0)                   // outlier stays an outlier
  }

  test("temperatureWeights: T=1 reproduces proportions, T=2 flattens") {
    // sources A×6, B×3, C×1 → shares 0.6/0.3/0.1
    val docs = ((1 to 6).map(i => (i.toLong, "A")) ++
      (7 to 9).map(i => (i.toLong, "B")) ++ Seq((10L, "C")))
      .toDF("doc_id", "source")
    val t1 = graft.text.CorpusMix.temperatureWeights(docs, "source", 1.0)
      .collect().map(r0 => r0.getAs[String]("source") ->
        (r0.getAs[Double]("raw_share"), r0.getAs[Double]("weight"))).toMap
    assert(t1("A") == ((0.6, 0.6)) && t1("B") == ((0.3, 0.3)) && t1("C") == ((0.1, 0.1)))
    val t2 = graft.text.CorpusMix.temperatureWeights(docs, "source", 2.0)
      .collect().map(r0 => r0.getAs[String]("source") ->
        r0.getAs[Double]("weight")).toMap
    // sqrt-share normalization: the tail is boosted, the head shrinks,
    // mass still sums to 1
    assert(t2("C") > 0.1 && t2("A") < 0.6)
    assert(math.abs(t2.values.sum - 1.0) < 1e-5)
    assert(math.abs(t2("C") - 0.192994) < 1e-4)
    // ordering by size is preserved at any finite temperature
    assert(t2("A") > t2("B") && t2("B") > t2("C"))
  }
}
