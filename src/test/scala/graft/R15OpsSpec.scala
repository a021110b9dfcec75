package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ols, RangeJoin}

/** Round-15 unit coverage: the ADVICE regression cases (overlap-join
  * boundary-sliver buckets, Mann–Kendall tied-x variance). */
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
