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
}
