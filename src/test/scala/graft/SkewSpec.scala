package graft

import org.apache.spark.sql.functions._
import graft.etl.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    // heavy skew: 90% of probe rows on key 1
    val probe = ((1 to 90).map(i => (1L, i)) ++ (1 to 10).map(i => (2L, i)))
      .toDF("k", "payload")
    val build = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("bk", "attr")
    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "payload", "attr").as[(Long, Int, String)].collect().sorted
    val salted = Skew.saltedJoin(probe, build, "k", "bk", 8,
      probeSaltSource = Seq(col("payload")))
      .select("k", "payload", "attr").as[(Long, Int, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt spreads a hot key over multiple buckets") {
    val probe = (1 to 100).map(i => (1L, i)).toDF("k", "payload")
    val buckets = probe.select(
      pmod(abs(hash(col("payload"))), lit(8)).as("salt"))
      .distinct().count()
    assert(buckets >= 6, s"only $buckets salt buckets used")
  }

  test("salted join spreads the hot key's reducer load; salt sized from keySkewReport") {
    // 95% of probe rows on one key: the end-to-end mitigation demo the
    // q248 diagnostics point at. Plain join → the hot key's output
    // lives in exactly ONE reducer partition; salted join keyed on
    // (k, salt) → it spreads over several.
    val probe = ((1 to 19000).map(i => (1L, i)) ++
      (2 to 20).flatMap(k => (1 to 52).map(i => (k.toLong, i)))).toDF("k", "payload")
    val build = (1 to 20).map(k => (k.toLong, s"attr$k")).toDF("bk", "attr")
    // size the salt count from the measured hot-key factor (max/mean),
    // the scaladoc's "n ≈ skew factor" rule
    val skewFactor = Skew.keySkewReport(probe, Seq("k"))
      .select("skew_factor").as[Double].head()
    val buckets = math.min(32, math.ceil(skewFactor).toInt)
    assert(buckets >= 8, s"planted skew should size a real salt count, got $buckets")
    val conf = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = conf.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      def hotPartitions(df: org.apache.spark.sql.DataFrame): Long = df
        .filter(col("k") === 1L)
        .select(spark_partition_id().as("pid")).distinct().count()
      val plain = probe.join(build, probe("k") === build("bk"))
      val salted = Skew.saltedJoin(probe, build, "k", "bk", buckets,
        probeSaltSource = Seq(col("payload")))
      assert(salted.count() == plain.count())
      assert(hotPartitions(plain) == 1L, "plain join should funnel the hot key to one reducer")
      val spread = hotPartitions(salted)
      assert(spread >= 2L, s"salted join should spread the hot key, got $spread partition(s)")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("co-bucketed tables join without an exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    Skew.writeBucketed(a, "graft_bkt_a", "k", 4)
    Skew.writeBucketed(b, "graft_bkt_b", "k", 4)
    // force a merge join (tiny test tables would otherwise broadcast,
    // which hides the bucket co-location being demonstrated)
    val joined = spark.table("graft_bkt_a").hint("merge")
      .join(spark.table("graft_bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == 1000)
  }
}
