package graft

import org.apache.spark.sql.functions._
import graft.model.Recommend

/** ALS co-purchase recommendations and PrefixSpan sequence mining. */
class RecommendSpec extends SparkSpec {
  import spark.implicits._

  test("ALS: block preference structure is recovered in top-1 recommendations") {
    // users 1,2 buy item 10 heavily; users 3,4 buy item 20
    val ratings = Seq(
      (1, 10, 9f), (1, 20, 1f), (2, 10, 8f),
      (3, 20, 9f), (4, 20, 8f), (4, 10, 1f))
      .toDF("user", "item", "cnt")
    val model = Recommend.fitAls(ratings, "user", "item", "cnt",
      rank = 2, maxIter = 10)
    val top1 = Recommend.recommendTopK(model, 1, "user", "item")
      .select("user", "item").as[(Int, Int)].collect().toMap
    assert(top1(1) == 10 && top1(2) == 10)
    assert(top1(3) == 20)
  }

  test("PrefixSpan: hand-computed frequent subsequences at min support 0.6") {
    val seqs = Seq(Seq("a", "b", "c"), Seq("a", "b"), Seq("b", "c"))
      .toDF("seq")
    val out = Recommend.sequentialPatterns(seqs, "seq", minSupport = 0.6)
      .as[(String, Long)].collect().toMap
    // support>=2 of 3: a(2) b(3) c(2) a>b(2) b>c(2); NOT a>b>c(1), a>c(1)
    assert(out == Map("a" -> 2L, "b" -> 3L, "c" -> 2L, "a>b" -> 2L, "b>c" -> 2L))
  }

  test("PrefixSpan: subsequences need order, not adjacency") {
    val seqs = Seq(Seq("a", "x", "b"), Seq("a", "y", "b")).toDF("seq")
    val out = Recommend.sequentialPatterns(seqs, "seq", minSupport = 0.9)
      .as[(String, Long)].collect().toMap
    // a>b is frequent even though never adjacent
    assert(out("a>b") == 2L)
    assert(!out.contains("x") && !out.contains("y"))
  }

  test("portable sequential patterns match MLlib PrefixSpan exactly") {
    // events: (user, pos, type) with repeats and non-adjacent patterns
    val ev = Seq(
      (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
      (2, 1, "b"), (2, 2, "b"), (2, 3, "c"),
      (3, 1, "a"), (3, 2, "c"), (3, 3, "c"), (3, 4, "b"),
      (4, 1, "c"), (4, 2, "a"), (4, 3, "b"))
      .toDF("u", "pos", "t")
    val portable = Recommend.sequentialPatternsPortable(ev, "u", "t",
      Seq(col("pos")), minSupport = 0.5, maxLength = 3)
      .as[(String, Long)].collect().toMap
    val seqs = ev.groupBy("u")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("t")))),
        x => x.getField("t")).as("seq"))
    val mllib = Recommend.sequentialPatterns(seqs, "seq",
      minSupport = 0.5, maxLength = 3)
      .as[(String, Long)].collect().toMap
    assert(portable == mllib)
  }

  test("portable ALS recovers block preference structure deterministically") {
    val ratings = Seq(
      (1L, 10L, 9.0), (1L, 20L, 1.0), (2L, 10L, 8.0),
      (3L, 20L, 9.0), (4L, 20L, 8.0), (4L, 10L, 1.0))
      .toDF("user", "item", "cnt")
    val out = Recommend.alsPortable(ratings, "user", "item", "cnt", k = 2)
    val top1 = out.filter(col("rank") === 1)
      .select("user", "item").as[(Long, Long)].collect().toMap
    assert(top1(1L) == 10L && top1(2L) == 10L && top1(3L) == 20L)
    // determinism: a second run produces byte-identical rows
    val r1 = out.collect().toSeq
    val r2 = Recommend.alsPortable(ratings, "user", "item", "cnt", k = 2)
      .collect().toSeq
    assert(r1.toSet == r2.toSet)
  }
}
