package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{ConfRangeJoinRewrite, GraftPlans}

/** The band-join binning optimizer rule: exact parity with the naive
  * non-equi join across boundary/NULL/degenerate cases, the
  * nested-loop-free plan shape it exists for, the guards that leave
  * other joins alone, and the conf-gated session-wide path. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Points: NULLs, negatives, exact bin boundaries. */
  private def points = Seq(
    (1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 25.0), (5L, -7.5),
    (6L, 100.0), (7L, 59.999), (8L, -20.0), (9L, 33.3))
    .toDF("id", "v")
    .union(Seq((10L, Option.empty[Double])).toDF("id", "v"))

  /** Intervals: wide/narrow, negative, empty (lo > hi), NULL bounds,
    * zero-width, bin-boundary-aligned. */
  private def intervals = Seq(
    (101L, 0.0, 10.0), (102L, 10.0, 20.0), (103L, -10.0, 0.0),
    (104L, 24.0, 26.0), (105L, 50.0, 40.0), // empty: lo > hi
    (106L, 33.3, 33.3), // zero width
    (107L, -100.0, 200.0), (108L, 59.0, 60.0))
    .toDF("iid", "lo", "hi")
    .union(Seq((109L, Option.empty[Double], Some(10.0)),
      (110L, Some(5.0), Option.empty[Double])).toDF("iid", "lo", "hi"))

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("id", "iid").as[(Long, Long)].collect().toSet

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("parity with the naive join for every strictness mix") {
    val conds = Seq(
      col("v") >= col("lo") && col("v") < col("hi"),
      col("v") > col("lo") && col("v") <= col("hi"),
      col("v") >= col("lo") && col("v") <= col("hi"),
      col("lo") <= col("v") && col("hi") > col("v")) // flipped operands
    for (c <- conds; bin <- Seq(0.7, 10.0, 1000.0)) {
      val naive = points.join(intervals, c)
      val rewritten = GraftPlans.rewriteRangeJoin(naive, bin)
      assert(pairs(rewritten) == pairs(naive), s"cond=$c bin=$bin")
      assert(rewritten.columns.toSeq == naive.columns.toSeq)
    }
  }

  test("parity when the point is on the right side") {
    val c = col("v") >= col("lo") && col("v") < col("hi")
    val naive = intervals.join(points, c)
    assert(pairs(GraftPlans.rewriteRangeJoin(naive, 10.0)) == pairs(naive))
  }

  test("the rewritten plan equi-joins: no nested loop, no cartesian") {
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      val before = naive.queryExecution.executedPlan.toString
      assert(before.contains("CartesianProduct")
        || before.contains("BroadcastNestedLoopJoin"), before)
      // unguarded (maxBins = MaxValue): the pure binned two-table plan,
      // zero nested-loop nodes anywhere
      val pure = GraftPlans.rewriteRangeJoin(naive, 10.0, Long.MaxValue)
        .queryExecution.executedPlan.toString
      assert(!pure.contains("CartesianProduct"), pure)
      assert(!pure.contains("BroadcastNestedLoopJoin"), pure)
      assert(pure.contains("SortMergeJoin") || pure.contains("ShuffledHashJoin"),
        pure)
      // guarded default: the hot path is still the binned equi-join; the
      // ONLY nested-loop node can be the wide-interval fallback branch
      // (empty on healthy data — here the optimizer even proves it empty
      // at compile time over the local relation and collapses the union,
      // leaving the pure binned plan; on file sources AQE folds the
      // empty-side join at runtime instead)
      val after = GraftPlans.rewriteRangeJoin(naive, 10.0)
        .queryExecution.executedPlan.toString
      assert(!after.contains("CartesianProduct"), after)
      assert(after.split("BroadcastNestedLoopJoin").length <= 2, after)
      assert(after.contains("SortMergeJoin") || after.contains("ShuffledHashJoin"),
        after)
    }
  }

  test("sentinel-wide intervals stay exact and never Sequence-explode") {
    // an SCD-style open-ended interval: at binSize 10 the sentinel
    // spans ~2e14 bins — unguarded this throws in Sequence (or, short
    // of that, multiplies the interval side's rows); the guard routes
    // it to the naive branch and keeps every match
    val ivs = intervals.union(
      Seq((111L, Some(15.0), Some(2.0e15))).toDF("iid", "lo", "hi"))
    val naive = points.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
    val expected = pairs(naive)
    assert(expected.exists(_._2 == 111L)) // the sentinel interval matches rows
    val guarded = GraftPlans.rewriteRangeJoin(naive, 10.0)
    assert(pairs(guarded) == expected)
    // a tiny cap forces EVERY interval onto the fallback branch — still exact
    val allWide = GraftPlans.rewriteRangeJoin(naive, 10.0, maxBinsPerInterval = 1L)
    assert(pairs(allWide) == expected)
  }

  test("the wide-fallback broadcast hint is stats-gated: an interval side " +
    "estimated past the threshold stays unhinted (graceful degrade, no " +
    "forced driver materialization)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val ivs = intervals.union(
      Seq((111L, Some(15.0), Some(2.0e15))).toDF("iid", "lo", "hi"))
    val naive = points.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
    def fallbackHints(df: DataFrame) = df.queryExecution.logical.collect {
      case j: LJoin
          if j.getTagValue(graft.plans.RangeJoinRewrite.SkipTag).isDefined =>
        j.hint
    }
    // interval side fits the default threshold: hinted, so AQE folds the
    // usually-empty wide branch at runtime
    val hinted = fallbackHints(GraftPlans.rewriteRangeJoin(naive, 10.0))
    assert(hinted.nonEmpty &&
      hinted.forall(h => h.leftHint.isDefined || h.rightHint.isDefined))
    // estimated past the threshold: unhinted — Spark honors a BROADCAST
    // hint regardless of actual size, and on a real SCD table every
    // current row carries the open-ended sentinel, so the "pathological"
    // subset can be most of the table; unhinted, the planner degrades
    // the way the pre-rewrite naive join would
    withConf("spark.sql.autoBroadcastJoinThreshold", "1") {
      val unhinted = fallbackHints(GraftPlans.rewriteRangeJoin(naive, 10.0))
      assert(unhinted.nonEmpty &&
        unhinted.forall(h => h.leftHint.isEmpty && h.rightHint.isEmpty))
      assert(pairs(GraftPlans.rewriteRangeJoin(naive, 10.0)) == pairs(naive))
    }
  }

  test("fallback idempotence survives tag-dropping plan rebuilds " +
    "(structural guard alongside SkipTag)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Union => LUnion}
    val ivs = intervals.union(
      Seq((111L, Some(15.0), Some(2.0e15))).toDF("iid", "lo", "hi"))
    val naive = points.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
    val once = GraftPlans.rewriteRangeJoin(naive, 10.0).queryExecution.logical
    // simulate an optimizer rule that rebuilds joins via case-class copy
    // (InferFiltersFromConstraints does): tags only survive
    // makeCopy/withNewChildren, so such a rebuild loses SkipTag and the
    // tag alone would let the fixed-point batch rewrite the fallback
    // join AGAIN, nesting one extra union layer per iteration
    once.foreach {
      case j: LJoin => j.unsetTagValue(graft.plans.RangeJoinRewrite.SkipTag)
      case _ => ()
    }
    val rebuilt = once
    assert(rebuilt.collect {
      case j: LJoin
          if j.getTagValue(graft.plans.RangeJoinRewrite.SkipTag).isDefined => j
    }.isEmpty, "the simulated rebuild must actually drop the tag")
    val twice = graft.plans.RangeJoinRewrite(10.0)(rebuilt)
    assert(twice.collect { case u: LUnion => u }.size ==
      once.collect { case u: LUnion => u }.size, twice.toString)
    assert(twice.collect { case j: LJoin => j }.size ==
      once.collect { case j: LJoin => j }.size, twice.toString)
  }

  test("file-source guarded rewrite: exact results, and AQE handles the " +
    "runtime-empty wide branch") {
    // over parquet (not a local relation) the optimizer can't prove the
    // wide branch empty at compile time — the span filter materializes
    // empty at RUNTIME and AQE's empty-relation propagation is what
    // keeps the fallback from rescanning the point side at scale
    val dir = java.nio.file.Files.createTempDirectory("graft_rjr").toString
    points.write.mode("overwrite").parquet(s"$dir/pts")
    intervals.write.mode("overwrite").parquet(s"$dir/ivs")
    val p = spark.read.parquet(s"$dir/pts")
    val iv = spark.read.parquet(s"$dir/ivs")
    val naive = p.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
    val rewritten = GraftPlans.rewriteRangeJoin(naive, 10.0)
    assert(pairs(rewritten) == pairs(naive))
    // execute THIS dataset (pairs() planned its own projection) and
    // read back the adaptive plan: the wide side is the hinted
    // broadcast BUILD side, so its runtime emptiness is a materialized
    // stage AQE's empty-relation propagation folds — the final plan
    // drops the whole fallback branch (and its point-side rescan),
    // leaving only the binned equi-join
    rewritten.collect()
    val post = rewritten.queryExecution.executedPlan.toString
    assert(post.contains("isFinalPlan=true"), post)
    val finalPlan = post.split("== Initial Plan ==").head
    assert(!finalPlan.contains("BroadcastNestedLoopJoin"), post)
    assert(!finalPlan.contains("Union"), post)
    assert(finalPlan.contains("__graft_bin"), post)
  }

  test("timestamp bands: parity + the rewrite fires (SCD/validity-window shape)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val pts = Seq((1L, ts(0)), (2L, ts(3600)), (3L, ts(86400)), (4L, ts(100000)))
      .toDF("id", "t")
    val ivs = Seq((201L, ts(0), ts(3600)), (202L, ts(3600), ts(90000)),
      (203L, ts(50), ts(50))).toDF("iid", "lo", "hi")
    for (bin <- Seq(60.0, 86400.0)) { // minute and day bins, both exact
      val naive = pts.join(ivs, col("t") >= col("lo") && col("t") < col("hi"))
      val rewritten = GraftPlans.rewriteRangeJoin(naive, bin)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(pairs(rewritten) == pairs(naive), s"bin=$bin")
    }
  }

  test("date bands: parity + the rewrite fires (date validity windows)") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val pts = Seq((1L, d("2024-01-01")), (2L, d("2024-02-15")),
      (3L, d("2024-06-30")), (4L, d("2025-01-01"))).toDF("id", "t")
    val ivs = Seq((201L, d("2024-01-01"), d("2024-03-01")),
      (202L, d("2024-03-01"), d("2024-12-31")),
      (203L, d("2024-06-30"), d("2024-06-30"))).toDF("iid", "lo", "hi")
    for (bin <- Seq(86400.0, 30 * 86400.0)) { // day and 30-day bins
      val naive = pts.join(ivs, col("t") >= col("lo") && col("t") < col("hi"))
      val rewritten = GraftPlans.rewriteRangeJoin(naive, bin)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(pairs(rewritten) == pairs(naive), s"bin=$bin")
    }
  }

  test("randomized parity (explicit-seed scalacheck points and intervals)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def gen[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val ptsGen = Gen.listOfN(60, Gen.chooseNum(-1000.0, 1000.0))
    // lo + width: mostly modest (some zero-width), ~1 in 8 a sentinel
    // span (1e9 wide — forces the maxBins fallback branch to carry
    // real rows alongside binned ones in the SAME query)
    val ivGen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(-1000.0, 1000.0),
      Gen.frequency(7 -> Gen.chooseNum(0.0, 400.0), 1 -> Gen.const(1.0e9))))
    for (seed <- 0 until 4; bin <- Seq(3.3, 100.0)) {
      val pts = gen(ptsGen, seed.toLong).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val ivs = gen(ivGen, 500L + seed).zipWithIndex
        .map { case ((lo, wd), i) => (1000L + i, lo, lo + wd) }
        .toDF("iid", "lo", "hi")
      val naive = pts.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
      assert(pairs(GraftPlans.rewriteRangeJoin(naive, bin)) == pairs(naive),
        s"seed=$seed bin=$bin")
    }
  }

  test("guard: a broadcast-hinted band join is left alone") {
    val naive = points.join(broadcast(intervals),
      col("v") >= col("lo") && col("v") < col("hi"))
    val plan = GraftPlans.rewriteRangeJoin(naive, 10.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("guard: an equi-keyed join with a band residual is left alone") {
    val iv2 = intervals.withColumn("pid", col("iid") - 100)
    val naive = points.join(iv2, col("id") === col("pid") && col("v") >= col("lo"))
    // no Generate/bin machinery appears; plan still hash-joins the key
    val plan = GraftPlans.rewriteRangeJoin(naive, 10.0)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_bin"), plan)
  }

  test("guard: non-inner band joins are left alone") {
    val naive = points.join(intervals,
      col("v") >= col("lo") && col("v") < col("hi"), "left")
    val rewritten = GraftPlans.rewriteRangeJoin(naive, 10.0)
    assert(!rewritten.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    assert(rewritten.count() == naive.count())
  }

  test("conf-gated session-wide path: install once, toggle by conf") {
    GraftPlans.install(spark)
    GraftPlans.install(spark) // idempotent
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraOptimizations
    assert(exp.count(_ eq ConfRangeJoinRewrite) == 1)
    val naive = points.join(intervals,
      col("v") >= col("lo") && col("v") < col("hi"))
    withConf(ConfRangeJoinRewrite.BinSizeKey, "10.0") {
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val plan = naive.queryExecution.executedPlan.toString
        // the binned equi-join carries the hot path; the only naive
        // join node left is the span-guarded wide-interval fallback
        // branch (empty here; with broadcast disabled it plans as a
        // cartesian over the empty filtered subset)
        assert(plan.contains("__graft_bin"), plan)
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          plan)
        val naiveNodes = plan.split("BroadcastNestedLoopJoin").length - 1 +
          plan.split("CartesianProduct").length - 1
        assert(naiveNodes <= 1, plan)
        assert(pairs(naive) == pairs(GraftPlans.rewriteRangeJoin(
          points.join(intervals, col("v") >= col("lo") && col("v") < col("hi")),
          10.0)))
      }
    }
    // conf back at default: the installed rule is a no-op again (a FRESH
    // frame — QueryExecution caches the plan optimized under the old conf)
    val off = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .queryExecution.optimizedPlan.toString
    assert(!off.contains("__graft_bin"), off)
  }
}
