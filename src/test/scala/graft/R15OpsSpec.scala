package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ols, RangeJoin, WindowFeatures}
import graft.sim.Similarity

/** Round-15 unit coverage: the ADVICE regression cases (overlap-join
  * boundary-sliver buckets, Mann–Kendall tied-x variance), the new
  * residual statistics, and the N-aware LSH sizing. */
class R15OpsSpec extends SparkSpec {
  import spark.implicits._

  test("overlapJoin finds matches confined to an epsilon sliver above a bucket boundary") {
    // hi lies 5e-10 above the k*w boundary (w = 1.0, boundary 3.0) —
    // the old floor((hi - 1e-9)/w) end bucket dropped bucket 3, so an
    // overlap confined to [3.0, 3.0000000005) was never emitted
    val l = Seq((1L, 2.5, 3.0 + 5e-10)).toDF("lid", "llo", "lhi")
    val r = Seq((10L, 3.0, 4.0)).toDF("rid", "rlo", "rhi")
    val got = RangeJoin.overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", 1.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
    // epoch-millis magnitudes where 1e-9 was ulp-absorbed: still exact,
    // still duplicate-free across the many shared buckets
    val t0 = 1.7e12
    val lb = Seq((1L, t0, t0 + 3600e3), (2L, t0 + 7200e3, t0 + 9000e3))
      .toDF("lid", "llo", "lhi")
    val rb = Seq((10L, t0 + 1800e3, t0 + 8000e3)).toDF("rid", "rlo", "rhi")
    val out = RangeJoin.overlapJoin(lb, "llo", "lhi", rb, "rlo", "rhi", 900e3)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(out.toSet == Set((1L, 10L), (2L, 10L)) && out.size == 2)
  }

  test("overlapJoin emits exactly one row per pair when hi sits on a bucket boundary") {
    // on-boundary hi now explodes into one extra (empty) bucket — the
    // first-shared-bucket pin must still emit each pair exactly once
    val l = Seq((1L, 0.0, 4.0), (2L, 4.0, 8.0)).toDF("lid", "llo", "lhi")
    val r = Seq((10L, 0.0, 8.0), (11L, 3.0, 4.0)).toDF("rid", "rlo", "rhi")
    val rows = RangeJoin.overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", 2.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(rows.size == rows.toSet.size)
    assert(rows.toSet == Set((1L, 10L), (1L, 11L), (2L, 10L)))
  }

  test("bandedRange matches values in the sliver bucket the old epsilon dropped") {
    val intervals = Seq((0, 6.5, 7.0 + 5e-10)).toDF("tier", "lo", "hi")
    val fact = Seq(7.0, 7.0 + 4e-10, 6.9).toDF("v")
    val got = RangeJoin.bandedRange(fact, col("v"), intervals, "lo", "hi", 1.0)
      .select("v").as[Double].collect().toSet
    assert(got == Set(7.0, 7.0 + 4e-10, 6.9))
  }

  test("mannKendall applies the tied-x correction (Kendall 1975 full variance)") {
    // x = [1,1,2,3], y = [1,2,3,4]: S = 5 over the 5 x-ordered pairs;
    // one tied-x group t=2 -> Var(S) = (4*3*13 - 18)/18 = 138/18
    val df = Seq(("a", 1.0, 1.0), ("a", 1.0, 2.0), ("a", 2.0, 3.0),
      ("a", 3.0, 4.0)).toDF("k", "x", "y")
    val row = Ols.mannKendall(df, Seq("k"), col("x"), col("y")).head()
    assert(row.getAs[Long]("mk_s") == 5L)
    assert(math.abs(row.getAs[Double]("var_s") - 138.0 / 18) < 1e-3)
    assert(math.abs(row.getAs[Double]("mk_z") -
      math.round(4.0 / math.sqrt(138.0 / 18) * 1e4) / 1e4) < 1e-9)
    assert(math.abs(row.getAs[Double]("mk_tau") - 0.8333) < 1e-9)
  }

  test("mannKendall cross terms engage when both coordinates carry ties") {
    // rows (1,1),(1,1),(2,2),(2,2): S = 4; tx3 = ty3 = 4 ->
    // Var(S) = (156-36-36)/18 + 0 + 16/(2*4*3) = 16/3
    val df = Seq(("a", 1.0, 1.0), ("a", 1.0, 1.0), ("a", 2.0, 2.0),
      ("a", 2.0, 2.0)).toDF("k", "x", "y")
    val row = Ols.mannKendall(df, Seq("k"), col("x"), col("y")).head()
    assert(row.getAs[Long]("mk_s") == 4L)
    assert(math.abs(row.getAs[Double]("var_s") - 16.0 / 3) < 1e-3)
    assert(math.abs(row.getAs[Double]("mk_z") -
      math.round(3.0 / math.sqrt(16.0 / 3) * 1e4) / 1e4) < 1e-9)
  }

  test("jarqueBera matches the hand-computed moments (and zeroes degenerate slices)") {
    // resid = [1..5] - 0: centered [-2,-1,0,1,2] -> m2 = 2, m3 = 0,
    // m4 = 6.8 -> skew 0, excess kurt -1.3, JB = 5/6 * 1.69/4
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 7.0), ("b", 7.0)).toDF("k", "y")
    val out = graft.metrics.ResidualDiagnostics
      .jarqueBera(df, Seq("k"), col("y"), lit(0.0))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_obs") == 5L)
    assert(math.abs(a.getAs[Double]("jb_skew")) < 1e-12)
    assert(math.abs(a.getAs[Double]("jb_kurt") - (-1.3)) < 1e-9)
    assert(math.abs(a.getAs[Double]("jb_stat") - 0.3521) < 1e-9)
    val b = out("b") // constant residuals: m2 = 0 gate
    assert(b.getAs[Double]("jb_skew") == 0.0 && b.getAs[Double]("jb_stat") == 0.0)
  }

  test("jarqueBera flags a planted heavy-tailed slice above the near-normal one") {
    val norm = (1 to 400).map(i => ("n", i.toDouble,
      math.sin(i * 2.399) * 2.0)) // bounded, thin-tailed
    val heavy = (1 to 400).map(i => ("h", i.toDouble,
      if (i % 97 == 0) 60.0 else math.sin(i * 2.399) * 0.5)) // rare huge spikes
    val df = (norm ++ heavy).toDF("k", "t", "y")
    val out = graft.metrics.ResidualDiagnostics
      .jarqueBera(df, Seq("k"), col("y"), lit(0.0))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("jb_stat")).toMap
    assert(out("h") > 10 * out("n"), s"heavy=${out("h")} normal=${out("n")}")
  }

  test("archLm matches the hand case and gates short/degenerate slices") {
    // e = [2,0,2,0,2,0] -> sq centered [2,-2,2,-2,2,-2]:
    // r1 = -20/24 = -0.8333, arch_lm1 = 6 * 0.8333^2 = 4.1663
    val df = (1 to 6).map(i => ("a", i, if (i % 2 == 1) 2.0 else 0.0))
      .toDF("k", "t", "y")
    val row = graft.metrics.ResidualDiagnostics
      .archLm(df, Seq("k"), col("y"), lit(0.0), Seq(col("t"))).head()
    assert(row.getAs[Long]("n_obs") == 6L)
    assert(math.abs(row.getAs[Double]("sr_acf1") - (-0.8333)) < 1e-9)
    assert(math.abs(row.getAs[Double]("arch_lm1") - 4.1663) < 1e-9)
    assert(!row.isNullAt(row.fieldIndex("ml_q")))
    // n <= maxLag -> ml_q NULL; constant residuals -> zero statistics
    val shortDf = (1 to 4).map(i => ("a", i, i.toDouble)).toDF("k", "t", "y")
    val s = graft.metrics.ResidualDiagnostics
      .archLm(shortDf, Seq("k"), col("y"), lit(0.0), Seq(col("t"))).head()
    assert(s.isNullAt(s.fieldIndex("ml_q")))
    val constDf = (1 to 8).map(i => ("a", i, 3.0)).toDF("k", "t", "y")
    val c = graft.metrics.ResidualDiagnostics
      .archLm(constDf, Seq("k"), col("y"), lit(0.0), Seq(col("t"))).head()
    assert(c.getAs[Double]("sr_acf1") == 0.0 && c.getAs[Double]("arch_lm1") == 0.0)
  }

  test("archLm detects planted volatility clustering that a homoskedastic twin lacks") {
    // same marginal magnitudes, one series clusters them (ARCH), one
    // alternates them away: LM must separate the two
    val clustered = (1 to 200).map { i =>
      val burst = (i / 20) % 2 == 0 // 20-step volatility regimes
      ("arch", i, (if (burst) 10.0 else 0.5) * (if (i % 2 == 0) 1 else -1))
    }
    val flat = (1 to 200).map { i =>
      // same two magnitudes, scattered by a deterministic avalanche
      // mix so the squared series carries ~zero lag-1 structure
      var h = i.toLong
      h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL
      h = (h ^ (h >>> 33)) * 0xC4CEB9FE1A85EC53L
      val big = (h ^ (h >>> 33)) < 0L
      ("flat", i, (if (big) 10.0 else 0.5) * (if (i % 2 == 0) 1 else -1))
    }
    val df = (clustered ++ flat).toDF("k", "t", "y")
    val out = graft.metrics.ResidualDiagnostics
      .archLm(df, Seq("k"), col("y"), lit(0.0), Seq(col("t")))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("arch_lm1")).toMap
    assert(out("arch") > 5 * math.max(out("flat"), 1.0),
      s"arch=${out("arch")} flat=${out("flat")}")
  }

  test("sizeLshWidth follows ceil(log2 n) between its floor and cap") {
    assert(Similarity.sizeLshWidth(100) == 8)          // floor
    assert(Similarity.sizeLshWidth(256) == 8)          // exact power
    assert(Similarity.sizeLshWidth(257) == 9)
    assert(Similarity.sizeLshWidth(40960) == 16)
    assert(Similarity.sizeLshWidth(200000) == 18)      // the probe scale
    assert(Similarity.sizeLshWidth(1L << 40) == 30)    // cap
    intercept[IllegalArgumentException](Similarity.sizeLshWidth(0))
  }

  test("sized LSH width bounds candidate fan-out where the fixed default goes quadratic") {
    // planted 40960-vector corpus (pseudo-random 16-dim embeddings):
    // the fixed 16-plane default freezes the bucket space at
    // 4 bands x 16 buckets, so fan-out is ~N^2/32; width = log2(N)
    // holds expected occupancy at O(1). Fan-out is measured by the
    // bucket-histogram aggregate (lshBucketFanout) — no join runs.
    val n = 40960L
    val dim = 16
    val corpus = spark.range(1, n + 1).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(1), lit(dim)), j =>
          pmod(xxhash64(col("vec_id") * lit(37) + j), lit(1000)).cast("double")
            / lit(500.0) - lit(1.0)))
    val fixed = Similarity.lshBucketFanout(corpus, dim, numPlanes = 16, bands = 4)
    val width = Similarity.sizeLshWidth(n)
    val sized = Similarity.lshBucketFanout(corpus, dim,
      numPlanes = 2 * width, bands = 2)
    assert(sized <= 10 * n, s"sized fan-out $sized not ~linear in n=$n")
    assert(fixed >= 100 * sized,
      s"fixed fan-out $fixed vs sized $sized — expected a >=100x gap")
  }

  test("cosineNearDupesSized keeps planted near-duplicates at small N (floor width)") {
    // 200 spread vectors + one planted near-identical pair; the sized
    // path must still emit the planted pair through its banding
    val dim = 8
    val base = spark.range(1, 201).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(1), lit(dim)), j =>
          pmod(xxhash64(col("vec_id") * lit(53) + j), lit(1000)).cast("double")
            / lit(500.0) - lit(1.0)))
    val planted = Seq(
      (1001L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      (1002L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.01))
    ).toDF("vec_id", "embedding")
    val df = base.select(col("vec_id"), col("embedding").cast("array<double>"))
      .unionByName(planted.select(col("vec_id"), col("embedding").cast("array<double>")))
    val pairs = Similarity.cosineNearDupesSized(df, dim, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1001L, 1002L)))
  }

  test("lshTopKSized returns ranked neighbors through the sized banding") {
    val dim = 8
    val corpus = spark.range(1, 501).toDF("vec_id")
      .withColumn("embedding",
        transform(sequence(lit(1), lit(dim)), j =>
          pmod(xxhash64(col("vec_id") * lit(71) + j), lit(1000)).cast("double")
            / lit(500.0) - lit(1.0)))
    val queries = corpus.limit(5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val out = Similarity.lshTopKSized(corpus, queries, k = 3, dim = dim)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("rank") <= 3L))
    // self-matches are excluded by construction
    assert(rows.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
  }

  test("partialedRolling equals the raw-row range window at bucket grain (gaps included)") {
    // two series, integer values (exact sums), a calendar GAP in
    // series a (buckets 1,2,5): the range frame must shorten across
    // the gap exactly as the raw-row range window does
    val df = Seq(
      ("a", 1L, 2.0), ("a", 1L, 4.0), ("a", 2L, 6.0), ("a", 5L, 10.0),
      ("b", 1L, 1.0), ("b", 2L, 3.0), ("b", 3L, 5.0), ("b", 4L, 7.0))
      .toDF("k", "b", "v")
    val got = WindowFeatures.partialedRolling(df, Seq(col("k")), col("b"),
      col("v"), nBuckets = 3)
      .orderBy("k", "bucket")
      .as[(String, Long, Double, Long, Double, Double, Double)].collect().toSeq
    // raw-row range window over the SAME frame, evaluated per row and
    // collapsed to bucket grain
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("b")).rangeBetween(-2L, 0L)
    val want = df
      .withColumn("roll_sum", sum(col("v")).over(w))
      .withColumn("roll_cnt", count(col("v")).over(w))
      .withColumn("roll_avg", round(col("roll_sum") / col("roll_cnt"), 4))
      .withColumn("roll_min", min(col("v")).over(w))
      .withColumn("roll_max", max(col("v")).over(w))
      .select(col("k"), col("b").as("bucket"), col("roll_sum"),
        col("roll_cnt"), col("roll_avg"), col("roll_min"), col("roll_max"))
      .distinct().orderBy("k", "bucket")
      .as[(String, Long, Double, Long, Double, Double, Double)].collect().toSeq
    assert(got == want)
    // the gap shortens the frame: bucket 5 of series a sees only itself
    assert(got.find(r => r._1 == "a" && r._2 == 5L).get._3 == 10.0)
  }

  test("partialedRolling absorbs a planted hot key the raw-row window straggles on") {
    // 2M rows, 200 series x ~100 buckets; the skewed twin remaps 25%
    // of all rows onto ONE series. partialedRolling's window depth is
    // bounded by the CALENDAR, so its skewed/balanced wall ratio must
    // stay near 1 while the raw-row window pays the single-task sort
    // of the hot partition (the r14 SkewProbe result, in-suite).
    val n = 2000000L
    def base = spark.range(n)
      .withColumn("b", pmod(xxhash64(col("id") * lit(13)), lit(100)))
      .withColumn("v", pmod(xxhash64(col("id") * lit(29)), lit(50)).cast("double"))
    val balanced = base
      .withColumn("k", pmod(xxhash64(col("id") * lit(7)), lit(200)))
    val skewed = base
      .withColumn("k", when(pmod(xxhash64(col("id") * lit(7)), lit(4)) === 0,
        lit(-1L)).otherwise(pmod(xxhash64(col("id") * lit(7)), lit(200))))
    def timePartialed(df: org.apache.spark.sql.DataFrame): Double = {
      def run() = WindowFeatures.partialedRolling(df, Seq(col("k")), col("b"),
        col("v"), nBuckets = 4).write.format("noop").mode("overwrite").save()
      run() // warm
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
    }
    val tBal = timePartialed(balanced)
    val tSkw = timePartialed(skewed)
    val ratio = tSkw / tBal
    info(f"partialedRolling skewed/balanced wall ratio: $ratio%.2f " +
      f"($tSkw%.2f s vs $tBal%.2f s)")
    assert(ratio < 1.5, f"partialedRolling not skew-immune: ratio $ratio%.2f")
  }

  test("theilSenSampled tracks the exact slope on a planted trend at O(s) pairs") {
    // y = 3.5x + bounded wiggle + 4 planted spikes per series: the
    // sampled median must land on the exact Theil-Sen slope while
    // scoring only s pairs instead of n(n-1)/2
    val n = 300
    val rows = for (k <- Seq("a", "b"); i <- 1 to n) yield {
      val spike = if (i % 75 == 0) 500.0 else 0.0
      (k, i.toDouble, 3.5 * i + math.sin(i * 1.7) * 2.0 + spike)
    }
    val df = rows.toDF("k", "x", "y")
    val exact = Ols.theilSen(df, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("ts_slope"), r.getAs[Long]("n_pairs"))).toMap
    val sampled = Ols.theilSenSampled(df, Seq("k"), col("x"), col("y"),
      pairsPerSeries = 200)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("ts_slope"), r.getAs[Long]("n_pairs"))).toMap
    Seq("a", "b").foreach { k =>
      assert(exact(k)._2 == n.toLong * (n - 1) / 2)   // exact: O(n^2) pairs
      assert(sampled(k)._2 == 200L,                   // sampled: exactly s
        s"series $k scored ${sampled(k)._2} pairs, expected 200")
      assert(math.abs(sampled(k)._1 - exact(k)._1) < 0.05,
        s"series $k sampled ${sampled(k)._1} vs exact ${exact(k)._1}")
    }
    // deterministic draws: a second run is bit-identical
    val again = Ols.theilSenSampled(df, Seq("k"), col("x"), col("y"),
      pairsPerSeries = 200)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("ts_slope"), r.getAs[Long]("n_pairs"))).toMap
    assert(again == sampled)
    // a different seed draws different pairs (tiny drift allowed)
    val reseeded = Ols.theilSenSampled(df, Seq("k"), col("x"), col("y"),
      pairsPerSeries = 200, seed = 7L)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("ts_slope")).toMap
    Seq("a", "b").foreach(k => assert(math.abs(reseeded(k) - exact(k)._1) < 0.05))
  }

  test("Assoc.kendall matches hand-computed tau-b / gamma with ties") {
    // points (1,1),(2,2),(3,3),(4,2): C=4, D=1, one tied-y pair ->
    // tau_b = 3/sqrt(6*5), gamma = 3/5
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 3.0, 3.0),
      ("a", 4.0, 2.0)).toDF("k", "x", "y")
    val row = graft.operators.Assoc.kendall(df, Seq("k"), col("x"), col("y")).head()
    assert(row.getAs[Long]("conc") == 4L && row.getAs[Long]("disc") == 1L)
    assert(math.abs(row.getAs[Double]("tau_b") -
      math.round(3.0 / math.sqrt(30.0) * 1e4) / 1e4) < 1e-9)
    assert(math.abs(row.getAs[Double]("gk_gamma") - 0.6) < 1e-9)
    // perfect concordance -> both 1; all-tied x -> both gated to 0
    val mono = Seq(("m", 1.0, 5.0), ("m", 2.0, 6.0), ("m", 3.0, 9.0))
      .toDF("k", "x", "y")
    val mr = graft.operators.Assoc.kendall(mono, Seq("k"), col("x"), col("y")).head()
    assert(mr.getAs[Double]("tau_b") == 1.0 && mr.getAs[Double]("gk_gamma") == 1.0)
    val flat = Seq(("f", 2.0, 1.0), ("f", 2.0, 3.0), ("f", 2.0, 7.0))
      .toDF("k", "x", "y")
    val fr = graft.operators.Assoc.kendall(flat, Seq("k"), col("x"), col("y")).head()
    assert(fr.getAs[Double]("tau_b") == 0.0 && fr.getAs[Double]("gk_gamma") == 0.0)
  }

  test("Assoc.kendall agrees in sign and monotone order with spearman on shared data") {
    val rows = for (k <- Seq("pos", "neg"); i <- 1 to 40) yield {
      val wiggle = math.sin(i * 2.1) * 3.0
      ("" + k, i.toDouble, if (k == "pos") i + wiggle else -i + wiggle)
    }
    val df = rows.toDF("k", "x", "y")
    val tau = graft.operators.Assoc.kendall(df, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("tau_b")).toMap
    val rho = graft.operators.Assoc.spearman(df, Seq("k"), col("x"), col("y"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("spearman")).toMap
    assert(tau("pos") > 0.5 && rho("pos") > 0.5)
    assert(tau("neg") < -0.5 && rho("neg") < -0.5)
    // tau and rho agree in sign; |tau| <= |rho| on near-monotone data
    assert(math.abs(tau("pos")) <= math.abs(rho("pos")) + 1e-9)
  }

  test("Assoc.mannWhitneyU matches hand-computed U/z/effect, ties included") {
    // sample1 {1,3} vs sample2 {2,4,5}: S1 = 4, U1 = 1, z = -2/sqrt(3)
    val df = Seq(("a", true, 1.0), ("a", true, 3.0), ("a", false, 2.0),
      ("a", false, 4.0), ("a", false, 5.0)).toDF("k", "f", "v")
    val r0 = graft.operators.Assoc
      .mannWhitneyU(df, Seq("k"), col("f"), col("v")).head()
    assert(r0.getAs[Long]("n1") == 2L && r0.getAs[Long]("n2") == 3L)
    assert(r0.getAs[Double]("u1") == 1.0)
    assert(math.abs(r0.getAs[Double]("mw_z") -
      math.round(-2.0 / math.sqrt(3.0) * 1e4) / 1e4) < 1e-9)
    assert(math.abs(r0.getAs[Double]("cles") - 0.1667) < 1e-9)
    // tied case: {1,2} vs {2,3} -> U1 = 0.5, sigma^2 = 1.5
    val t = Seq(("a", true, 1.0), ("a", true, 2.0), ("a", false, 2.0),
      ("a", false, 3.0)).toDF("k", "f", "v")
    val r1 = graft.operators.Assoc
      .mannWhitneyU(t, Seq("k"), col("f"), col("v")).head()
    assert(r1.getAs[Double]("u1") == 0.5)
    assert(math.abs(r1.getAs[Double]("mw_z") -
      math.round(-1.5 / math.sqrt(1.5) * 1e4) / 1e4) < 1e-9)
    // complete separation upward: U1 = n1*n2, effect 1, z > 0
    val s = Seq(("a", true, 10.0), ("a", true, 11.0), ("a", false, 1.0),
      ("a", false, 2.0), ("a", false, 3.0)).toDF("k", "f", "v")
    val r2 = graft.operators.Assoc
      .mannWhitneyU(s, Seq("k"), col("f"), col("v")).head()
    assert(r2.getAs[Double]("u1") == 6.0 && r2.getAs[Double]("cles") == 1.0)
    assert(r2.getAs[Double]("mw_z") > 0)
    // degenerate gates: one-sided and all-tied groups report z = 0
    val d = Seq(("one", true, 5.0), ("one", true, 7.0),
      ("flat", true, 4.0), ("flat", false, 4.0)).toDF("k", "f", "v")
    val dr = graft.operators.Assoc
      .mannWhitneyU(d, Seq("k"), col("f"), col("v"))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(dr("one").getAs[Double]("mw_z") == 0.0 &&
      dr("one").getAs[Double]("cles") == 0.0)
    assert(dr("flat").getAs[Double]("mw_z") == 0.0)
  }

  test("Assoc.kruskalWallis matches hand values and the k=2 z-squared identity") {
    // {1,2} vs {3,4}: H = 12/20*(9/2+49/2) - 15 = 2.4, no ties
    val df = Seq(("a", "A", 1.0), ("a", "A", 2.0), ("a", "B", 3.0),
      ("a", "B", 4.0)).toDF("k", "g", "v")
    val r0 = graft.operators.Assoc
      .kruskalWallis(df, Seq("k"), col("g"), col("v")).head()
    assert(r0.getAs[Long]("k_samples") == 2L && r0.getAs[Long]("n_obs") == 4L)
    assert(math.abs(r0.getAs[Double]("kw_h") - 2.4) < 1e-9)
    // tied case {1,2} vs {2,3}: H = 1.35/0.9 = 1.5 — and for k = 2,
    // H must equal mannWhitneyU's z² (the rank-test identity)
    val t = Seq(("a", "A", 1.0), ("a", "A", 2.0), ("a", "B", 2.0),
      ("a", "B", 3.0)).toDF("k", "g", "v")
    val r1 = graft.operators.Assoc
      .kruskalWallis(t, Seq("k"), col("g"), col("v")).head()
    assert(math.abs(r1.getAs[Double]("kw_h") - 1.5) < 1e-9)
    val z = graft.operators.Assoc
      .mannWhitneyU(t, Seq("k"), col("g") === "A", col("v")).head()
      .getAs[Double]("mw_z")
    assert(math.abs(r1.getAs[Double]("kw_h") - z * z) < 1e-3)
    // all-tied group: correction <= 0 -> gated to 0
    val flat = Seq(("f", "A", 5.0), ("f", "B", 5.0), ("f", "C", 5.0))
      .toDF("k", "g", "v")
    val fr = graft.operators.Assoc
      .kruskalWallis(flat, Seq("k"), col("g"), col("v")).head()
    assert(fr.getAs[Double]("kw_h") == 0.0)
    // a planted shifted segment among equals drives H up
    val rows = for (g <- Seq("s1", "s2", "s3"); i <- 1 to 60) yield {
      val shift = if (g == "s3") 30.0 else 0.0
      ("p", g, i % 17 + shift + math.sin(i * 1.3))
    }
    val pr = graft.operators.Assoc
      .kruskalWallis(rows.toDF("k", "g", "v"), Seq("k"), col("g"), col("v")).head()
    assert(pr.getAs[Double]("kw_h") > 50.0, s"H=${pr.getAs[Double]("kw_h")}")
  }

  test("mannKendall reduces to the tied-y-only form on unique x") {
    // unique x, tied y — the pre-fix shape; values must be unchanged
    val df = Seq(("a", 1.0, 2.0), ("a", 2.0, 2.0), ("a", 3.0, 5.0),
      ("a", 4.0, 7.0)).toDF("k", "x", "y")
    val row = Ols.mannKendall(df, Seq("k"), col("x"), col("y")).head()
    // S = 5 (one tied-y pair scores 0); ty1 = 18 -> Var = 138/18
    assert(row.getAs[Long]("mk_s") == 5L)
    assert(math.abs(row.getAs[Double]("var_s") - 138.0 / 18) < 1e-3)
  }
}
