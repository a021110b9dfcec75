package graft

import org.apache.spark.sql.functions._
import graft.operators.{Funnel, RecordLinkage}

/** Round-5 batch-7 operators: typed-imperative top-k aggregate,
  * windowed funnel, Fellegi-Sunter record linkage. */
class R5OpsBatch7Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // ---------------- TopKExpr ----------------

  test("graft_topk: keeps the k largest as a multiset, merges across partitions") {
    val df = Seq((1L, 5.0), (1L, 9.0), (1L, 9.0), (1L, 1.0), (1L, 7.0),
      (2L, 3.0)).toDF("g", "v").repartition(4)
    val out = df.groupBy("g")
      .agg(graft.expr.TopKExpr.column(col("v"), 3).as("t"))
      .orderBy("g").as[(Long, Seq[Double])].collect().toSeq
    // duplicates kept (multiset); short group returns what it has
    assert(out == Seq((1L, Seq(9.0, 9.0, 7.0)), (2L, Seq(3.0))))
  }

  test("graft_topk registers on the SQL surface and casts integer input") {
    GraftFunctions.register(spark)
    Seq((1L, 4L), (1L, 2L), (1L, 8L)).toDF("g", "v").createOrReplaceTempView("tk")
    val r = spark.sql("SELECT graft_topk(v, 2) FROM tk GROUP BY g")
      .as[Seq[Double]].head()
    assert(r == Seq(8.0, 4.0))
  }

  // ---------------- windowFunnel ----------------

  test("windowFunnel: completions outside the window drop; inside count") {
    val ev = Seq(
      // u1 completes within 10 min of the view
      (1L, "view", ts(1)), (1L, "click", ts(3)), (1L, "purchase", ts(8)),
      // u2 clicks in-window but purchases after the window closes
      (2L, "view", ts(1)), (2L, "click", ts(5)), (2L, "purchase", ts(30)),
      // u3 clicks after the window entirely
      (3L, "view", ts(1)), (3L, "click", ts(25)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.windowFunnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), windowSec = 600L)
      .orderBy("step").select("step", "n_users")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L), (1L, 2L), (2L, 1L)))
    // sanity: the unwindowed funnel counts u3's late click and u2's
    // late purchase too
    val unbounded = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("step").select("n_users").as[Long].collect().toSeq
    assert(unbounded == Seq(3L, 3L, 2L))
  }

  // ---------------- RecordLinkage ----------------

  test("linkPairs: agreement weights sum per Fellegi-Sunter; blocking bounds pairs") {
    import RecordLinkage.FieldCmp
    val people = Seq(
      (1L, "blk", "x", 10.0), (2L, "blk", "x", 10.0),   // agree on both fields
      (3L, "blk", "y", 99.0),                           // disagrees with 1&2
      (4L, "other", "x", 10.0))                         // different block
      .toDF("id", "blk", "seg", "bal")
    val fields = Seq(
      FieldCmp(col("seg") === col("b_seg"), 0.9, 0.1),   // w+ = log2(9) = 3.1699
      FieldCmp(col("bal") === col("b_bal"), 0.8, 0.2))   // w+ = log2(4) = 2
    val out = RecordLinkage.linkPairs(people, "id", Seq("blk"), fields, 4.0)
      .as[(Long, Long, Double)].collect().toSeq
    // only (1,2) agrees on both: 3.1699 + 2 = 5.1699 >= 4; cross-block
    // pair (1,4)/(2,4) never materializes
    assert(out == Seq((1L, 2L, 5.1699)))
    val all = RecordLinkage.linkPairs(people, "id", Seq("blk"), fields, -100.0)
    assert(all.count() == 3L) // pairs within 'blk' block only: (1,2),(1,3),(2,3)
  }
}
