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

  test("topk-pairs aggregate matches the rank-window form row for row") {
    import org.apache.spark.sql.expressions.Window
    // 40 groups x 200 candidates with engineered score TIES inside and
    // across 4dp-grid values, so the (score desc, id asc) tiebreak is
    // actually exercised; NaN scores planted to pin the NaN-largest
    // convention shared by Spark's sort and java.lang.Double.compare
    val rows = for (g <- 0L until 40L; i <- 0L until 200L) yield {
      val s = if (i % 37 == 0) Double.NaN else ((i * 7919 + g * 31) % 50) / 10000.0
      (g, i, s)
    }
    val df = rows.toDF("g", "i", "s")
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("i").asc)
    val win = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select(col("g"), col("i"), col("s"), col("rank").cast("long").as("rank"))
      .collect().toSet
    val agg = df.groupBy(col("g"))
      .agg(graft.expr.TopKPairsExpr.column(col("s"), col("i"), 7).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.id").as("i"), col("col.score").as("s"),
        (col("pos") + 1).cast("long").as("rank"))
      .collect().toSet
    // NaN != NaN under ==; compare on a stringized key instead
    def key(s: Set[org.apache.spark.sql.Row]) =
      s.map(r0 => (r0.getLong(0), r0.getLong(1), r0.getDouble(2).toString, r0.getLong(3)))
    assert(key(agg) == key(win))
  }

  test("topk-pairs: groups smaller than k return all rows, in rank order") {
    val df = Seq((1L, 5L, 0.5), (1L, 3L, 0.5), (1L, 9L, 0.9)).toDF("g", "i", "s")
    val out = df.groupBy(col("g"))
      .agg(graft.expr.TopKPairsExpr.column(col("s"), col("i"), 10).as("t"))
      .select(posexplode(col("t")))
      .select(col("pos"), col("col.id"), col("col.score"))
      .as[(Int, Long, Double)].collect().toSeq
    assert(out == Seq((0, 9L, 0.9), (1, 3L, 0.5), (2, 5L, 0.5)))
  }
}
