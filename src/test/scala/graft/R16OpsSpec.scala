package graft

import org.apache.spark.sql.functions._

import graft.expr.RoundHalfUpExpr
import graft.operators.{Assoc, FeatureStore}
import graft.sim.Similarity

/** Round-16 unit coverage: the fast-round equivalence pin, the r15
  * ADVICE regression cases (rank-test NULL hygiene, LSH sized-width
  * clamp), the sampled Kendall twin, and the skew-proof feature-store
  * entry. */
class R16OpsSpec extends SparkSpec {
  import spark.implicits._

  test("RoundHalfUpExpr is bit-identical to Spark round(x, 0) on adversarial doubles") {
    // the corpus that matters: the JDK-8010430 value (x+0.5 rounds up
    // in floating point — the naive floor(x+0.5) form FAILED here in
    // the r16 RoundCheck probe), exact .5 boundaries both signs, zero
    // signs, 2^52 integral threshold, non-finites, plus random draws
    val rnd = new java.util.Random(7)
    val adversarial = Seq(
      0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5,
      0.49999999999999994, -0.49999999999999994,
      4.503599627370495e15, -4.503599627370495e15, 4.503599627370496e15,
      9.007199254740992e15, Double.MaxValue, Double.MinValue,
      Double.MinPositiveValue, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 123456.99995, -123456.99995,
      123456.99994999999, 1550.0000000000002, 267.49999999999994)
    val boundary = (0 until 20000).flatMap { _ =>
      val m = rnd.nextInt(1 << 30).toDouble
      Seq(m + 0.5, -(m + 0.5), Math.nextDown(m + 0.5), Math.nextUp(m + 0.5))
    }
    val randoms = (0 until 50000).map(_ =>
      java.lang.Double.longBitsToDouble(rnd.nextLong())) ++
      (0 until 50000).map(_ =>
        (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(18)))
    val rows = (adversarial ++ boundary ++ randoms).toDF("x")
      .select(col("x"), round(col("x"), 0).as("spark"),
        RoundHalfUpExpr.column(col("x")).as("fast"))
      .collect()
    rows.foreach { r =>
      val s = java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      val f = java.lang.Double.doubleToRawLongBits(r.getDouble(2))
      assert(s == f, s"mismatch at x=${r.getDouble(0)}: " +
        s"spark=${r.getDouble(1)} fast=${r.getDouble(2)}")
    }
  }

  test("mannWhitneyU drops NULL predicate/value rows before ranking") {
    // r15 ADVICE: NULL rows were ranked into the combined sample but
    // counted in neither n1 nor n2, silently skewing U and sigma
    val clean = Seq[(String, Option[Boolean], Option[Double])](
      ("a", Some(true), Some(5.0)), ("a", Some(true), Some(7.0)),
      ("a", Some(false), Some(1.0)), ("a", Some(false), Some(2.0)),
      ("a", Some(false), Some(3.0))).toDF("g", "f", "v")
    val dirty = clean.unionByName(
      Seq[(String, Option[Boolean], Option[Double])](
        ("a", None, Some(100.0)), ("a", Some(true), None)).toDF("g", "f", "v"))
    val a = Assoc.mannWhitneyU(clean, Seq("g"), col("f"), col("v")).collect()(0)
    val b = Assoc.mannWhitneyU(dirty, Seq("g"), col("f"), col("v")).collect()(0)
    assert(a == b, s"NULL rows changed the statistic: $a vs $b")
    assert(b.getAs[Long]("n1") + b.getAs[Long]("n2") == 5L)
  }

  test("kruskalWallis drops NULL sample/value rows before ranking") {
    val clean = Seq[(String, Option[String], Option[Double])](
      ("a", Some("s1"), Some(5.0)), ("a", Some("s1"), Some(7.0)),
      ("a", Some("s2"), Some(1.0)), ("a", Some("s2"), Some(2.0)),
      ("a", Some("s3"), Some(9.0)), ("a", Some("s3"), Some(4.0)))
      .toDF("g", "s", "v")
    val dirty = clean.unionByName(
      Seq[(String, Option[String], Option[Double])](
        ("a", None, Some(100.0)), ("a", Some("s1"), None)).toDF("g", "s", "v"))
    val a = Assoc.kruskalWallis(clean, Seq("g"), col("s"), col("v")).collect()(0)
    val b = Assoc.kruskalWallis(dirty, Seq("g"), col("s"), col("v")).collect()(0)
    assert(a == b, s"NULL rows changed the statistic: $a vs $b")
    assert(b.getAs[Long]("n_obs") == 6L)
  }

  test("sized LSH width clamps so bands x width never exceeds the 62-plane packing") {
    // r15 ADVICE: at the uncapped width of 30, bands >= 3 exceeded
    // rhpSignatureLong's 62-plane limit and threw at runtime
    for (bands <- 1 to 8; n <- Seq(100L, 1L << 20, 1L << 40)) {
      val w = Similarity.sizedWidthFor(n, bands)
      assert(bands * w <= 62, s"bands=$bands n=$n width=$w")
      assert(w >= 1)
    }
    // the documented raise-bands-for-recall path must construct a
    // legal signature end-to-end
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.fill(8)(((i % 5) + 1).toFloat))).toDF("vec_id", "embedding")
    Similarity.cosineNearDupesSized(vecs, dim = 8, threshold = 0.9,
      bands = 4).collect() // must not throw the signature-width require
  }

  test("kendallTauSampled: exact tie terms, deterministic draws, estimate near exact tau") {
    // one group with a known monotone association + ties on both axes
    val pts = (0 until 400).map { i =>
      ("g", (i / 3).toDouble, (i / 5).toDouble + (if (i % 7 == 0) -20.0 else 0.0))
    }.toDF("g", "x", "y")
    val exact = Assoc.kendall(pts, Seq("g"), col("x"), col("y")).collect()(0)
    val s1 = Assoc.kendallTauSampled(pts, Seq("g"), col("x"), col("y"), 500)
      .collect()(0)
    val s2 = Assoc.kendallTauSampled(pts, Seq("g"), col("x"), col("y"), 500)
      .collect()(0)
    assert(s1 == s2, "Lehmer draws must be deterministic across runs")
    assert(s1.getAs[Long]("s_pairs") == 500L)
    val tauExact = exact.getAs[Double]("tau_b")
    val tauEst = s1.getAs[Double]("tau_b_est")
    assert(math.abs(tauEst - tauExact) < 0.15,
      s"sampled tau $tauEst too far from exact $tauExact")
    // groups with n < 2 are absent, mirroring theilSenSampled
    val tiny = Seq(("solo", 1.0, 2.0)).toDF("g", "x", "y")
    assert(Assoc.kendallTauSampled(tiny, Seq("g"), col("x"), col("y"), 10)
      .count() == 0L)
  }

  test("wilcoxonSignedRank matches hand values, drops zero diffs, handles ties") {
    // d = [+1, +2, -3, +4], no ties: ranks of |d| are 1,2,3,4 ->
    // W+ = 1+2+4 = 7, mu = 5, sig2 = 4*5*9/24 = 7.5, z = 2/sqrt(7.5)
    val pairs = Seq(("g", 2.0, 1.0), ("g", 5.0, 3.0), ("g", 1.0, 4.0),
      ("g", 9.0, 5.0), ("g", 6.0, 6.0) /* d=0, dropped */)
      .toDF("g", "a", "b")
    val r = Assoc.wilcoxonSignedRank(pairs, Seq("g"), col("a"), col("b"))
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("w_plus") == 7.0)
    assert(math.abs(r.getAs[Double]("wsr_z") - 2.0 / math.sqrt(7.5)) < 5e-5)
    assert(math.abs(r.getAs[Double]("rank_biserial") - 0.4) < 5e-5)
    // tied |d|: d = [+1, -1, +2] -> avg ranks 1.5, 1.5, 3; W+ = 4.5;
    // sig2 = 3*4*7/24 - 6/48 = 3.375
    val t = Assoc.wilcoxonSignedRank(
      Seq(("g", 2.0, 1.0), ("g", 1.0, 2.0), ("g", 5.0, 3.0)).toDF("g", "a", "b"),
      Seq("g"), col("a"), col("b")).collect()(0)
    assert(t.getAs[Double]("w_plus") == 4.5)
    assert(math.abs(t.getAs[Double]("wsr_z") - 1.5 / math.sqrt(3.375)) < 5e-5)
  }

  test("friedman matches the textbook statistic and drops incomplete blocks") {
    // k=3, blocks b1 (1,2,3) and b2 ranked (1,2,3) again -> R = (2,4,6)
    // chi2 = 12/(nk(k+1)) * sum R^2 - 3n(k+1) = 28 - 24 = 4; block b3
    // has only 2 of 3 treatments and must be dropped
    val cells = Seq(
      ("g", "b1", "t1", 1.0), ("g", "b1", "t2", 2.0), ("g", "b1", "t3", 3.0),
      ("g", "b2", "t1", 10.0), ("g", "b2", "t2", 20.0), ("g", "b2", "t3", 30.0),
      ("g", "b3", "t1", 5.0), ("g", "b3", "t2", 6.0))
      .toDF("g", "b", "t", "v")
    val r = Assoc.friedman(cells, Seq("g"), col("b"), col("t"), col("v"))
      .collect()(0)
    assert(r.getAs[Long]("k_treatments") == 3L)
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Double]("friedman_chi2") == 4.0)
    // perfectly disagreeing blocks -> R_j all equal -> chi2 = 0
    val flat = Seq(
      ("g", "b1", "t1", 1.0), ("g", "b1", "t2", 2.0), ("g", "b1", "t3", 3.0),
      ("g", "b2", "t1", 3.0), ("g", "b2", "t2", 2.0), ("g", "b2", "t3", 1.0))
      .toDF("g", "b", "t", "v")
    assert(Assoc.friedman(flat, Seq("g"), col("b"), col("t"), col("v"))
      .collect()(0).getAs[Double]("friedman_chi2") == 0.0)
  }

  test("Hodges-Lehmann shift and center match hand enumerations") {
    // xs = [5,7] vs ys = [1,2]: diffs {4,3,6,5} -> median 4.5
    val two = Seq(("g", true, 5.0), ("g", true, 7.0),
      ("g", false, 1.0), ("g", false, 2.0)).toDF("g", "f", "v")
    val sh = Assoc.hodgesLehmannShift(two, Seq("g"), col("f"), col("v"))
      .collect()(0)
    assert(sh.getAs[Long]("n_pairs") == 4L)
    assert(sh.getAs[Double]("hl_shift") == 4.5)
    // xs = [1,3,5]: Walsh averages {1,2,3,3,4,5} -> median 3, 6 pairs
    val one = Seq(("g", 1.0), ("g", 3.0), ("g", 5.0)).toDF("g", "v")
    val ce = Assoc.hodgesLehmannCenter(one, Seq("g"), col("v")).collect()(0)
    assert(ce.getAs[Long]("n_walsh") == 6L)
    assert(ce.getAs[Double]("hl_center") == 3.0)
  }

  test("BH step-up matches the textbook example; normal p bridge is calibrated") {
    import graft.metrics.MultipleTesting
    // p = [.001, .008, .039, .041, .9] at alpha = .05, m = 5:
    // thresholds j*.01 -> ranks 1,2 pass, 3,4 fail individually but the
    // step-up rejects ONLY ranks <= 2; q-values are the tail-min
    // [.005, .02, .05125, .05125, .9]
    val tests = Seq(("t1", 0.001), ("t2", 0.008), ("t3", 0.039),
      ("t4", 0.041), ("t5", 0.9)).toDF("tid", "p")
    val r = MultipleTesting.bhFdr(tests, Nil, Seq("tid"), col("p"),
      alpha = 0.05, tiebreak = col("tid"))
      .orderBy("bh_rank").collect()
    assert(r.map(_.getAs[Int]("reject")).toSeq == Seq(1, 1, 0, 0, 0))
    assert(r.map(_.getAs[Double]("q_value")).toSeq ==
      Seq(0.005, 0.02, 0.0513, 0.0513, 0.9)) // 4dp grid
    assert(r.forall(_.getAs[Long]("m_tests") == 5L))
    // the erf-polynomial p-value at the canonical z's
    val ps = Seq(0.0, 1.96, 2.5758).toDF("z")
      .select(MultipleTesting.normalPTwoSided(col("z")).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(ps(0) - 1.0) < 2e-4)
    assert(math.abs(ps(1) - 0.05) < 2e-4)
    assert(math.abs(ps(2) - 0.01) < 2e-4)
  }

  test("split-conformal qhat is the ceil((n+1)(1-alpha)) order statistic; coverage counts") {
    import graft.metrics.Conformal
    // calib scores 1..10 (pred = 0), alpha = .2 -> k = ceil(11*.8) = 9
    // -> qhat = 9; test |y| = {5, 8.5, 12} -> {5, 8.5} covered
    val rows = (1 to 10).map(i => ("g", i.toDouble, true)) ++
      Seq(("g", 5.0, false), ("g", 8.5, false), ("g", 12.0, false))
    val df = rows.toDF("g", "y", "calib")
    val r = Conformal.splitConformal(df, Seq("g"), col("y"), lit(0.0),
      col("calib"), alpha = 0.2).collect()(0)
    assert(r.getAs[Long]("n_calib") == 10L)
    assert(r.getAs[Long]("k_order") == 9L)
    assert(r.getAs[Double]("qhat") == 9.0)
    assert(r.getAs[Long]("n_test") == 3L && r.getAs[Long]("n_covered") == 2L)
    // alpha below 1/(n+1) clamps k to n (documented caveat)
    val tiny = Conformal.splitConformal(df.filter(col("calib")), Seq("g"),
      col("y"), lit(0.0), lit(true), alpha = 0.01).collect()(0)
    assert(tiny.getAs[Long]("k_order") == 10L)
  }

  test("sixteen-member board: widening never worsens the champion, ma3/ar5 compete") {
    val d = "/root/testdata/sf0.001"
    val ext = SparkEntry.queries("q299_order_search_ext")(spark, d)
      .filter(col("rank") === 1)
      .select(col("l_suppkey"), col("aic").as("aic_ext"))
    val full = SparkEntry.queries("q336_order_search_full")(spark, d)
    val champs = full.filter(col("rank") === 1)
      .select(col("l_suppkey"), col("aic").as("aic_full"))
    // the winner over a SUPERSET of members can only have <= AIC
    val worse = champs.join(ext, "l_suppkey")
      .filter(col("aic_full") > col("aic_ext")).count()
    assert(worse == 0L, s"$worse series got a WORSE champion from widening")
    // both promoted members actually enter scoreboards
    val models = full.select("model").distinct().as[String].collect().toSet
    assert(models.contains("ma3") && models.contains("ar5"),
      s"promoted members missing from the board: $models")
    // ranks are a clean 1..n sequence per series
    val badRank = full.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"),
        countDistinct(col("rank")).as("d"))
      .filter(col("mx") =!= col("n") || col("d") =!= col("n")).count()
    assert(badRank == 0L)
  }

  test("wideFromFact is row-for-row the wide(weeklyAggregate(...)) composition") {
    val fact = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val viaFact = FeatureStore.wideFromFact(fact,
      Seq("l_partkey", "l_suppkey"), col("l_shipdate"), col("l_quantity"))
    val weekly = graft.etl.Enrichment.weeklyAggregate(fact, col("l_shipdate"),
      Seq(col("l_partkey"), col("l_suppkey")), col("l_quantity"))
    val viaWeekly = FeatureStore.wide(weekly,
      Seq("l_partkey", "l_suppkey"), "week_start", "qty_sum")
    assert(viaFact.columns.toSeq == viaWeekly.columns.toSeq)
    assert(viaFact.exceptAll(viaWeekly).isEmpty && viaWeekly.exceptAll(viaFact).isEmpty)
  }

  test("wideFromFact plan partials the fact BEFORE any window (the q325 shape)") {
    val fact = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    // every Window node must have an Aggregate somewhere BELOW it:
    // window functions never see a fact-grain row (optimized logical
    // plan — the physical plan hides under AdaptiveSparkPlanExec
    // before execution)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = FeatureStore.wideFromFact(fact,
      Seq("l_partkey", "l_suppkey"), col("l_shipdate"), col("l_quantity"))
      .queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected window nodes in the wide store plan")
    windows.foreach { w =>
      val hasAggBelow = w.child.collectFirst { case a: Aggregate => a }.nonEmpty
      assert(hasAggBelow, s"window over fact-grain rows:\n$w")
    }
  }
}
