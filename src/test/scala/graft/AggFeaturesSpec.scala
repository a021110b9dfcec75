package graft

import org.apache.spark.sql.functions._
import graft.operators.AggFeatures

class AggFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("entropy: uniform distribution maximal, concentrated zero") {
    val df = Seq(("u", 1, 10.0), ("u", 2, 10.0), ("c", 1, 10.0), ("c", 1, 10.0))
      .toDF("k", "item", "v")
    val out = AggFeatures.entropy(df, Seq(col("k")), Seq(col("item")), col("v"), Seq("k"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(out("u") - math.log(2)) < 1e-9)
    assert(out("c") == 0.0)
  }

  test("hhi: monopoly = 1, even split = 1/n") {
    val df = Seq(("m", 1, 10.0), ("e", 1, 5.0), ("e", 2, 5.0)).toDF("k", "item", "v")
    val out = AggFeatures.hhi(df, Seq(col("k")), Seq(col("item")), col("v"), Seq("k"))
      .as[(String, Double)].collect().toMap
    assert(out("m") == 1.0)
    assert(math.abs(out("e") - 0.5) < 1e-9)
  }

  test("topNShare: top-1 of an even pair is half") {
    val df = Seq(("k", 1, 5.0), ("k", 2, 5.0)).toDF("k", "item", "v")
    val out = AggFeatures.topNShare(df, Seq(col("k")), Seq(col("item")), col("v"),
      Seq("k"), n = 1).as[(String, Double)].head()
    assert(out._2 == 0.5)
  }

  test("monthlyTrendSlope recovers a linear monthly trend") {
    val rows = for (m <- 1 to 6) yield ("s", s"2024-0$m-15", m * 10.0)
    val df = rows.toDF("k", "d", "v").withColumn("d", to_date(col("d")))
    val slope = AggFeatures.monthlyTrendSlope(df, Seq(col("k")), col("d"), col("v"),
      Seq("k"), epochYear = 2024).select("trend_slope").as[Double].head()
    assert(math.abs(slope - 10.0) < 1e-9)
  }

  test("coOccurrence lift: perfectly co-occurring items have lift n_baskets") {
    // items 1,2 always together in 2 baskets; item 3 alone in 2 others
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 3), (4, 3))
      .toDF("basket", "item")
    val out = AggFeatures.coOccurrence(df, Seq("basket"), "item", minSupport = 2)
      .select("item_a", "item_b", "pair_count", "lift")
      .as[(Int, Int, Long, Double)].collect()
    assert(out.length == 1)
    val (a, b, c, lift) = out.head
    assert((a, b) == (1, 2) && c == 2L)
    // P(ab)=2/4, P(a)=2/4, P(b)=2/4 -> lift = .5/(.25) = 2
    assert(lift == 2.0)
  }

  test("labelEncode assigns dense ids by frequency with -1 OOV") {
    val df = Seq("x", "x", "x", "y", "y", "z").toDF("c")
    val out = AggFeatures.labelEncode(df, "c", minCount = 2)
      .select("c", "c_code").distinct().as[(String, Int)].collect().toMap
    assert(out("x") == 0 && out("y") == 1 && out("z") == -1)
  }

  test("volumeTiers classifies by share thresholds") {
    val df = Seq(("big", 98.0), ("mid", 1.5), ("small", 0.5)).toDF("k", "v")
    val out = AggFeatures.volumeTiers(df, Seq(col("k")), col("v"), Seq("k"),
      hi = 0.5, lo = 0.01).select("k", "tier").as[(String, String)].collect().toMap
    assert(out("big") == "high" && out("mid") == "medium" && out("small") == "low")
  }

  test("sampleRows is deterministic under a fixed seed") {
    val df = (1 to 1000).toDF("v")
    val a = AggFeatures.sampleRows(df, 0.2).count()
    val b = AggFeatures.sampleRows(df, 0.2).count()
    assert(a == b && a > 100 && a < 320)
  }

  test("FP-Growth co-occurrence matches the exact pair self-join at sf0.01, min-support 5") {
    // The >10^9-basket scale path (BENCH_NOTES): FP-Growth must produce
    // the IDENTICAL pair/count/lift table as the exact self-join, on
    // real data (lineitem baskets by order, items by part).
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("item_a").cast("long"), col("item_b").cast("long"),
        col("pair_count").cast("long"), col("n_a").cast("long"), col("n_b").cast("long"),
        round(col("lift") * 1e9).cast("long"))
      .collect().map(_.toSeq).toSet
    val exact = key(AggFeatures.coOccurrence(li, Seq("l_orderkey"), "l_partkey", 5))
    val fp = key(AggFeatures.coOccurrenceFpGrowth(li, Seq("l_orderkey"), "l_partkey", 5))
    assert(exact.nonEmpty, "parity test needs a nonempty pair table")
    assert(fp == exact,
      s"FP-Growth diverges: ${fp.size} vs ${exact.size} rows; " +
        s"onlyFp=${(fp -- exact).take(3)} onlyExact=${(exact -- fp).take(3)}")
  }
}
