package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Cohorts, Funnel}
import graft.functions.PortableHash
import graft.graph.PageRankOp

/** Round-5 batch-2 operators: CDC apply, funnel, cohort retention,
  * weighted sampling, fixed-point PageRank. */
class R5OpsBatch2Spec extends SparkSpec {
  import spark.implicits._

  // ---------------- Cdc ----------------

  test("cdc applyChanges: upsert, delete, insert, untouched, latest-wins") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "a2", 11.0, 100L, "U"), // update
      (1L, "a1", 99.0, 50L, "U"),  // superseded by seq=100
      (2L, "b", 0.0, 10L, "D"),    // delete
      (4L, "d", 40.0, 5L, "I"),    // insert (new key)
      (5L, "e", 50.0, 1L, "D"))    // delete of unknown key -> nothing
      .toDF("k", "name", "bal", "seq", "op")
    val out = Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a2", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  // ---------------- Funnel ----------------

  test("funnel: ordered conversion only; early later-step events don't count") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      // u1 converts all three in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE click -> reaches click, not purchase
      (2L, "view", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(5)),
      // u3: never views -> not in funnel at all
      (3L, "click", ts(1)), (3L, "purchase", ts(2)),
      // u4: views only
      (4L, "view", ts(9)))
      .toDF("user_id", "event_type", "ts")
    val uf = Funnel.userFunnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select(col("user_id"), col("t0").isNotNull, col("t1").isNotNull,
        col("t2").isNotNull)
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(uf == Seq((1L, true, true, true), (2L, true, true, false),
      (4L, true, false, false)))

    val summary = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("step").select("step", "n_users").as[(Long, Long)].collect().toSeq
    assert(summary == Seq((0L, 3L), (1L, 2L), (2L, 1L)))
  }

  test("funnel: simultaneous events count (inclusive >= semantics)") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((1L, "view", t), (1L, "click", t)).toDF("user_id", "event_type", "ts")
    val n = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("view", "click"))
      .filter(col("step") === 1).select("n_users").as[Long].head()
    assert(n == 1L)
  }

  // ---------------- Cohorts ----------------

  test("retention: hand-built two-cohort triangle") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // week of 2024-01-01 (Mon) and week of 2024-01-08
    val ev = Seq(
      (1L, ts(1)), (1L, ts(9)),  // cohort w0, active w0+w1
      (2L, ts(2)),               // cohort w0, active w0 only
      (3L, ts(8)), (3L, ts(15))) // cohort w1, active w1+w2 (k=0,1)
      .toDF("user_id", "ts")
    val out = Cohorts.retention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_k")
      .select(col("cohort_week").cast("string"), col("week_k"),
        col("cohort_size"), col("n_active"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L, 2L), ("2024-01-01", 1L, 2L, 1L),
      ("2024-01-08", 0L, 1L, 1L), ("2024-01-08", 1L, 1L, 1L)))
  }

  // ---------------- weightedSample ----------------

  test("weighted sample: k per group, deterministic, heavier rows oversampled") {
    val df = (0L until 2000L).map { i =>
      // two strata of weights inside one group: 1 vs 20
      (i, if (i % 2 == 0) 1.0 else 20.0, "g")
    }.toDF("id", "w", "g")
    val s1 = PortableHash.weightedSample(df, col("id"), col("w"), 200,
      Seq(col("g")))
    assert(s1.count() == 200)
    val heavy = s1.filter(col("id") % 2 === 1).count()
    assert(heavy > 140, s"heavy rows should dominate the sample, got $heavy/200")
    // deterministic
    val a = s1.select("id").as[Long].collect().sorted.toSeq
    val b = PortableHash.weightedSample(df, col("id"), col("w"), 200, Seq(col("g")))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // global (no groups) path: TakeOrdered, k rows
    val g = PortableHash.weightedSample(df, col("id"), col("w"), 50)
    assert(g.count() == 50)
  }

  // ---------------- PageRankOp ----------------

  test("pagerank: hand-checked star graph — hub outranks leaves; mass conserved-ish") {
    // star: hub 0 <-> leaves 1..4 (symmetrized)
    val edges = (1L to 4L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val pr = PageRankOp.pageRank(edges, "src", "dst", iters = 10)
      .select("node", "rank_i").as[(Long, Long)].collect().toMap
    assert(pr.size == 5)
    // leaves all equal by symmetry
    assert((1L to 4L).map(pr).toSet.size == 1)
    // hub collects all leaf mass (stationary ≈ 0.477 vs 0.131; at 10
    // iterations the bipartite oscillation leaves ≈ 0.421 vs 0.145)
    assert(pr(0L) > 2 * pr(1L).max(1L) && pr(0L) == pr.values.max)
    // total fixed-point mass stays within truncation loss of 1.0
    val total = pr.values.sum
    assert(total > 900000000L && total <= 1000000000L, total.toString)
  }

  test("pagerank matches a driver-side reference on a small random graph") {
    val rnd = new scala.util.Random(7)
    val edges0 = (0 until 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter { case (a, b) => a != b }.distinct
    val sym = (edges0 ++ edges0.map(_.swap)).distinct
    val got = PageRankOp.pageRank(sym.toDF("src", "dst"), "src", "dst", iters = 6)
      .select("node", "rank_i").as[(Long, Long)].collect().toMap

    // independent reference with the same fixed-point arithmetic
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val out = sym.groupBy(_._1).map { case (s, es) => (s, es.map(_._2)) }
    val deg = out.map { case (s, ds) => (s, ds.length.toLong) }
    var rank = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 6) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (s <- nodes; d <- out.getOrElse(s, Seq.empty))
        contrib(d) += rank(s) / deg(s)
      rank = nodes.map(v => v -> (3000000000L / (20L * n) + 17L * contrib(v) / 20L)).toMap
    }
    assert(got == rank)
  }
}
