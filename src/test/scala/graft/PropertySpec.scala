package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.metrics.Eval
import graft.operators.{Pareto, Survival, Uplift}

/** Property-based invariants of the round-5 analytics operators over
  * scalacheck-generated data (explicit seeds — deterministic runs). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val scored: Gen[List[(Double, Boolean)]] = Gen.nonEmptyListOf(
    Gen.zip(Gen.chooseNum(0.0, 1.0).map(x => math.rint(x * 20) / 20.0), Gen.oneOf(true, false)))

  test("AUC complement symmetry: auc(label) + auc(!label) = 1") {
    (0 until 8).foreach { i =>
      val xs = gen(scored, i.toLong)
      // need at least one positive and one negative
      val data = ((0.3, true) :: (0.7, false) :: xs).toDF("s", "y")
      val a = Eval.auc(data, col("s"), col("y")).select("auc").as[Double].head()
      val b = Eval.auc(data, col("s"), !col("y")).select("auc").as[Double].head()
      assert(math.abs(a + b - 1.0) <= 1e-3, s"seed $i: $a + $b") // 1e-4 rounding on each side
    }
  }

  test("AUC invariant under strictly monotone score transforms") {
    (0 until 8).foreach { i =>
      val xs = gen(scored, 100L + i)
      val data = ((0.1, true) :: (0.9, false) :: xs).toDF("s", "y")
      val a = Eval.auc(data, col("s"), col("y")).select("auc").as[Double].head()
      val t = Eval.auc(data, col("s") * 7 + 3, col("y")).select("auc").as[Double].head()
      assert(a == t, s"seed $i")
    }
  }

  test("graft_topk equals sort-desc-take-k of the value multiset") {
    val lists = Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
    (0 until 8).foreach { i =>
      val xs = gen(lists, 200L + i)
      val out = xs.map((1L, _)).toDF("g", "v").repartition(3)
        .groupBy("g").agg(graft.expr.TopKExpr.column(col("v"), 4).as("t"))
        .as[(Long, Seq[Double])].head()._2
      assert(out == xs.sorted.reverse.take(4), s"seed $i")
    }
  }

  test("Gini: in [0,1), invariant to positive scaling") {
    val lists = Gen.listOfN(12, Gen.chooseNum(0.0, 100.0))
    (0 until 6).foreach { i =>
      val xs = gen(lists, 300L + i)
      def g(scale: Double) = Survival.gini(
        xs.zipWithIndex.map { case (v, k) => (k.toLong, v * scale) }.toDF("k", "v"),
        "k", col("v")).select("gini").as[Double].head()
      val g1 = g(1.0)
      assert(g1 >= 0.0 && g1 < 1.0, s"seed $i: $g1")
      assert(math.abs(g1 - g(13.0)) <= 2e-4, s"seed $i") // rounding each side
    }
  }

  test("Kaplan-Meier: survival is non-increasing and within [0,1]") {
    val durs = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(1L, 20L), Gen.oneOf(0, 1)))
    (0 until 6).foreach { i =>
      val xs = (1L, 1) :: gen(durs, 400L + i)
      val s = Survival.kaplanMeier(xs.toDF("t", "e"), col("t"), col("e"))
        .orderBy("t").select("survival").as[Double].collect().toSeq
      assert(s.forall(v => v >= 0.0 && v <= 1.0), s"seed $i")
      assert(s.zip(s.drop(1)).forall { case (a, b) => b <= a + 1e-9 }, s"seed $i")
    }
  }

  test("Pareto frontier: no frontier point is dominated by any input point") {
    val pts = Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0.0, 10.0), Gen.chooseNum(0.0, 10.0)))
    (0 until 6).foreach { i =>
      val xs = gen(pts, 500L + i)
      val f = Pareto.frontier2d(xs.toDF("a", "b"), col("a"), col("b"))
        .as[(Double, Double)].collect().toSeq
      val dominated = f.exists { case (fx, fy) =>
        xs.exists { case (x, y) =>
          x >= fx && y >= fy && (x > fx || y > fy) }
      }
      assert(!dominated, s"seed $i")
    }
  }

  test("diff-in-diff nets out additive time effects") {
    val cells = Gen.listOfN(12,
      Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false), Gen.chooseNum(0.0, 50.0)))
    (0 until 6).foreach { i =>
      val base = (true, true, 1.0) :: (true, false, 1.0) ::
        (false, true, 1.0) :: (false, false, 1.0) :: gen(cells, 600L + i)
      def did(shift: Double) = Uplift.diffInDiff(
        base.map { case (t, p, v) => (t, p, if (p) v + shift else v) }.toDF("t", "p", "v"),
        col("t"), col("p"), col("v")).select("did").as[Double].head()
      // a uniform post-period shift hits both groups -> DiD unchanged
      assert(math.abs(did(0.0) - did(25.0)) <= 2e-4, s"seed $i")
    }
  }

  test("int8 quantization: codes in [-127,127], round-trip error ≤ scale/2") {
    val vecs = Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0))
    (0 until 8).foreach { i =>
      val xs = gen(vecs, 700L + i).take(64).toArray
      val out = graft.sim.Quantize.int8(
        Seq((1L, xs)).toDF("vec_id", "embedding"))
        .select("dim", "q", "scale").as[(Long, Int, Double)].collect()
      assert(out.length == xs.length, s"seed $i")
      out.foreach { case (d, q, s) =>
        assert(q >= -127 && q <= 127, s"seed $i dim $d code $q")
        // symmetric max-abs scheme: |dequantized − original| ≤ scale/2
        // (half-step rounding bound; exact at the boundary)
        assert(math.abs(q * s - xs(d.toInt)) <= s / 2 + 1e-12, s"seed $i dim $d")
      }
      // the max-abs element always quantizes to a full-scale ±127 code
      assert(out.exists { case (_, q, _) => math.abs(q) == 127 }
        || xs.forall(_ == 0.0), s"seed $i")
    }
    // zero vector: all-zero codes, scale 0, exact round-trip
    val z = graft.sim.Quantize.int8(
      Seq((1L, Array(0.0, 0.0, 0.0))).toDF("vec_id", "embedding"))
      .select("q", "scale").as[(Int, Double)].collect()
    assert(z.forall(_ == ((0, 0.0))))
  }

  test("gini: bounded in [0, 1) and invariant under scaling the distribution") {
    val amounts: Gen[List[Double]] = Gen.nonEmptyListOf(
      Gen.chooseNum(1, 400).map(_ / 4.0))
    (0 until 8).foreach { i =>
      val xs = gen(amounts, 300L + i)
      val df = xs.zipWithIndex.map { case (v, id) => ("g", id.toLong, v) }
        .toDF("g", "id", "v")
      val g1 = Pareto.gini(df, Seq("g"), col("v"), Seq(col("id")))
        .select("gini").as[Double].head()
      assert(g1 >= 0.0 && g1 < 1.0, s"seed $i: $g1")
      // Gini is a share-based measure: scaling every amount by a
      // positive constant leaves it unchanged (to output rounding)
      val g2 = Pareto.gini(df, Seq("g"), col("v") * 8, Seq(col("id")))
        .select("gini").as[Double].head()
      assert(math.abs(g1 - g2) <= 2e-4, s"seed $i: $g1 vs $g2")
    }
  }

  test("Akaike blend of a constant series is the constant (convexity fixpoint)") {
    // every family member forecasts a constant series at the constant,
    // so any convex combination of them must return it exactly
    val cases = Gen.zip(Gen.chooseNum(1, 40),
      Gen.chooseNum(0.0, 500.0).map(x => math.rint(x * 1e4) / 1e4))
    (0 until 6).foreach { i =>
      val (n, c) = gen(cases, 500L + i)
      val df = (1 to n).map(t => ("k", t, c)).toDF("k", "t", "v")
      val out = graft.seq.Champion.blendForecast(df, Seq("k"), Seq(col("t")),
        "v", h = 3, m = 13).select("blend_forecast").as[Double].collect()
      assert(out.length == 3, s"seed $i")
      out.foreach(f => assert(f == c, s"seed $i n=$n c=$c got $f"))
    }
  }

  test("Holt-Winters gamma=0 forecast replays the textbook Holt hand recursion") {
    // γ=0 keeps the season ring at its initial zeros, so the HW kernel
    // degenerates to TEXTBOOK Holt (l = αx + (1−α)(l+b); note
    // withHolt is deliberately the reference's EWMA-of-diffs variant,
    // a different recursion) and the forecast to l + s·b
    val series: Gen[List[Double]] = Gen.listOfN(12,
      Gen.chooseNum(0.0, 100.0).map(x => math.rint(x * 1e4) / 1e4))
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    (0 until 6).foreach { i =>
      val xs = gen(series, 600L + i)
      val df = xs.zipWithIndex.map { case (v, t) => ("k", t + 1, v) }
        .toDF("k", "t", "v")
      val hw = graft.seq.SequentialKernels.holtWintersForecast(df, Seq("k"),
        Seq(col("t")), "v", alpha = 0.3, beta = 0.1, gamma = 0.0, m = 4, h = 3)
        .orderBy("step").select("hw_forecast").as[Double].collect().toSeq
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val nl = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (nl - l) + 0.9 * b
        l = nl
      }
      val hand = (1 to 3).map(s => r4(r4(l) + s * r4(b)))
      assert(hw == hand, s"seed $i: $hw vs $hand")
    }
  }

  test("PQ codes are invariant under input partitioning") {
    val vecs: Gen[List[List[Double]]] = Gen.listOfN(30,
      Gen.listOfN(8, Gen.chooseNum(-1.0, 1.0).map(x => math.rint(x * 1e4) / 1e4)))
    (0 until 4).foreach { i =>
      val vs = gen(vecs, 700L + i)
      val df = vs.zipWithIndex.map { case (v, id) =>
        (id.toLong, v.map(_.toFloat).toArray) }.toDF("vec_id", "embedding")
      def codesOf(d: org.apache.spark.sql.DataFrame) = {
        val cb = graft.sim.Pq.trainCodebooks(d, dim = 8, m = 4, ksub = 4, iters = 2)
        graft.sim.Pq.encode(d, cb, dim = 8, m = 4)
          .select("vec_id", "sub", "code").as[(Long, Int, Long)]
          .collect().sortBy(r => (r._1, r._2)).toSeq
      }
      assert(codesOf(df) == codesOf(df.repartition(7)), s"seed $i")
    }
  }

  test("Kneser-Ney: per-context probability mass sums to 1 on random corpora") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, doc))
    (0 until 6).foreach { i =>
      val docs = gen(corpus, 300L + i).zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      // rebuild the model tables and check Σ_w2 P_KN(w2|w1) = 1 per w1
      val bi = graft.text.NgramLm.bigramCounts(df, "text").collect()
        .map(r0 => (r0.getString(0), r0.getString(1)) -> r0.getLong(2)).toMap
      if (bi.nonEmpty) {
        val c1 = bi.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
        val n1f = bi.groupBy(_._1._1).map { case (w, m) => w -> m.size }
        val n1b = bi.groupBy(_._1._2).map { case (w, m) => w -> m.size }
        val t = bi.size.toDouble
        c1.keys.foreach { w1 =>
          val mass = bi.collect { case ((a, b), c) if a == w1 =>
            (c - 0.75) / c1(w1) + 0.75 * n1f(w1) / c1(w1) * (n1b(b) / t)
          }.sum
          // seen-continuation mass + redistributed mass over UNSEEN
          // continuations: summing the interpolation term over all w2
          // (not just seen) gives exactly 1
          val full = bi.collect { case ((a, b), c) if a == w1 =>
            (c - 0.75) / c1(w1) }.sum +
            // valuesIterator, NOT keys.map: a Set would dedup equal counts
            0.75 * n1f(w1) / c1(w1) * n1b.valuesIterator.map(_ / t).sum
          assert(math.abs(full - 1.0) < 1e-9, s"seed $i w1=$w1")
          assert(mass <= 1.0 + 1e-9, s"seed $i w1=$w1 seen-mass $mass")
        }
      }
    }
  }

  test("healthReport: score stays in [0,100] under random error regimes") {
    val err = Gen.chooseNum(-50.0, 50.0).map(x => math.rint(x * 10) / 10.0)
    val series = Gen.listOfN(30, err)
    (0 until 6).foreach { i =>
      val es = gen(series, 400L + i)
      val rows = es.zipWithIndex.flatMap { case (e, j) =>
        Seq(("g", 0, 100.0 + j, 100.0 + j), ("g", 1, 100.0 + j, 100.0 + j - e))
      }
      val row = graft.metrics.Diagnostics.healthReport(
        rows.toDF("g", "cur", "a", "p").withColumn("u", lit(10.0)),
        Seq("g"), col("a"), col("p"), col("u"), col("cur") === 1)
        .collect().head
      val h = row.getAs[Double]("health_score")
      assert(h >= 0.0 && h <= 100.0, s"seed $i: $h")
      assert(row.getAs[Double]("prediction_stability") >= 0.0)
      assert(row.getAs[Double]("prediction_stability") <= 1.0)
    }
  }

  test("leaderboard: percentiles bounded, ranks a permutation, zones partition") {
    val score = Gen.chooseNum(0.0, 10.0).map(x => math.rint(x * 100) / 100.0)
    (0 until 6).foreach { i =>
      val scores = gen(Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n, score)), 500L + i)
      val board = scores.zipWithIndex.map { case (s, j) => (s"t$j", s, j + 1) }
        .toDF("team", "score", "subs")
      val out = graft.operators.Leaderboard.positionReport(board, col("team"),
        col("score")).collect()
      val ranks = out.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to scores.length).toSeq, s"seed $i")
      out.foreach { r0 =>
        val p = r0.getAs[Double]("percentile")
        assert(p > 0 && p <= 100.0, s"seed $i")
        assert(Set("leader", "contender", "middle_pack", "bottom")
          .contains(r0.getAs[String]("competitive_zone")))
        val ach = r0.getAs[Double]("achievability")
        assert(ach >= 0.0 && ach <= 1.0, s"seed $i")
        assert(r0.getAs[Long]("recommended_target") >= 0L)
      }
    }
  }

  test("overlapJoin equals the naive inequality join on random interval sets") {
    val iv: Gen[List[(Double, Double)]] = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0.0, 40.0))
        .map { case (lo, w) => (math.rint(lo * 4) / 4, math.rint((lo + w) * 4) / 4) })
    (0 until 6).foreach { i =>
      val ls = gen(iv, 300L + i).zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val rs = gen(iv, 400L + i).zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val l = ls.toDF("lid", "llo", "lhi")
      val r = rs.toDF("rid", "rlo", "rhi")
      val width = Seq(0.25, 3.0, 17.5)(i % 3)
      val got = graft.operators.RangeJoin
        .overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", width)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = l.crossJoin(r)
        .filter(col("llo") < col("lhi") && col("rlo") < col("rhi") &&
          col("llo") < col("rhi") && col("rlo") < col("lhi"))
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"seed $i width $width") // sorted WITH duplicates:
      // any double emission across shared buckets would break equality
    }
  }

  test("overlapJoin parity survives boundary-exact and epsilon-sliver interval ends") {
    // the r15 ADVICE class: ends exactly ON k*width, within 1e-9 above
    // it, and at epoch-millis magnitudes where a subtracted epsilon is
    // ulp-absorbed — generated deliberately, not left to chance
    val width = 2.5
    def boundaryish: Gen[(Double, Double)] = {
      val k = Gen.chooseNum(-20, 20)
      val jitter = Gen.oneOf(0.0, 5e-10, 1e-9, -5e-10, 0.25, 1.25)
      Gen.zip(k, jitter, Gen.chooseNum(0, 4), Gen.oneOf(0.0, 5e-10, 0.75))
        .map { case (kk, jl, spanK, jh) =>
          val lo = kk * width + jl
          (lo, (kk + spanK) * width + jh) }
    }
    (0 until 4).foreach { i =>
      val ls = gen(Gen.nonEmptyListOf(boundaryish), 500L + i)
        .zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val rs = gen(Gen.nonEmptyListOf(boundaryish), 600L + i)
        .zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val l = ls.toDF("lid", "llo", "lhi")
      val r = rs.toDF("rid", "rlo", "rhi")
      val got = graft.operators.RangeJoin
        .overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", width)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val want = l.crossJoin(r)
        .filter(col("llo") < col("lhi") && col("rlo") < col("rhi") &&
          col("llo") < col("rhi") && col("rlo") < col("lhi"))
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"seed $i")
      // same property at epoch-millis offsets (ulp-absorption regime)
      val base = 1.7e12
      val lb = ls.map { case (j, lo, hi) => (j, base + lo * 1e6, base + hi * 1e6) }
        .toDF("lid", "llo", "lhi")
      val rb = rs.map { case (j, lo, hi) => (j, base + lo * 1e6, base + hi * 1e6) }
        .toDF("rid", "rlo", "rhi")
      val gotB = graft.operators.RangeJoin
        .overlapJoin(lb, "llo", "lhi", rb, "rlo", "rhi", width * 1e6)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      val wantB = lb.crossJoin(rb)
        .filter(col("llo") < col("lhi") && col("rlo") < col("rhi") &&
          col("llo") < col("rhi") && col("rlo") < col("lhi"))
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(gotB == wantB, s"seed $i (epoch-millis)")
    }
  }

  test("boilerplate scrub invariants on random corpora") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc: Gen[String] = Gen.chooseNum(1, 24)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    (0 until 4).foreach { i =>
      val docs = gen(Gen.listOfN(30, doc), 500L + i).zipWithIndex
        .map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val out = graft.text.Boilerplate.scrub(docs, "doc_id", "text", w = 2,
        maxDocFreq = 4)
      // every document comes back exactly once
      assert(out.count() == 30L)
      val rows = out.select("n_spans", "n_dropped", "clean_text")
        .as[(Long, Long, String)].collect()
      rows.foreach { case (n, d, t) =>
        assert(d >= 0 && d <= n)
        // kept spans reassemble exactly: at most one ragged (1-word)
        // span exists per doc, so ceil(tokens/2) IS the kept span count
        val keptSpans = if (t.isEmpty) 0 else t.split(" ").grouped(2).size
        assert(keptSpans == n - d, s"seed $i: $n/$d/$t")
      }
      // a threshold above the doc count is the identity scrub: nothing
      // dropped and every document reconstructs to its original text
      val id = graft.text.Boilerplate.scrub(docs, "doc_id", "text", 2,
        maxDocFreq = 31)
      assert(id.agg(sum(col("n_dropped"))).as[Long].head() == 0L)
      assert(id.join(docs, "doc_id")
        .filter(col("clean_text") =!= col("text")).count() == 0L)
    }
  }

  test("acf/pacf bounds and identities on random series") {
    val series: Gen[List[Double]] = Gen.listOfN(30,
      Gen.chooseNum(-10.0, 10.0).map(x => math.rint(x * 100) / 100))
    (0 until 6).foreach { i =>
      val xs = gen(series, 600L + i)
      val df = xs.zipWithIndex.map { case (v, t) => (1, t, v) }.toDF("k", "t", "v")
      val d = graft.seq.YuleWalker.acfPacf(df, Seq("k"), Seq(col("t")), "v")
        .select("acf1", "acf2", "acf3", "acf4", "acf5",
          "pacf1", "pacf2", "pacf3", "pacf4", "pacf5")
        .as[(Double, Double, Double, Double, Double,
             Double, Double, Double, Double, Double)].head()
      // pacf1 == acf1 always (k1 = c1/c0)
      assert(d._6 == d._1, s"seed $i")
      // biased-estimator autocorrelations live in [-1, 1] (+ 4dp rounding)
      Seq(d._1, d._2, d._3, d._4, d._5).foreach(a =>
        assert(math.abs(a) <= 1.0001, s"seed $i acf $a"))
    }
  }
}
