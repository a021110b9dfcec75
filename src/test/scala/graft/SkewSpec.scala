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
