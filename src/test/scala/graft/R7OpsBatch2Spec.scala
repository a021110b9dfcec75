package graft

import org.apache.spark.sql.functions._
import graft.operators.{Changepoint, GeoCluster, SeriesWindow}
import graft.graph.Modularity

/** Round-7 batch-2 operator contracts: changepoint, out-of-fold target
  * encoding, modularity, DBSCAN classification. */
class R7OpsBatch2Spec extends SparkSpec {
  import spark.implicits._

  test("changepoint: clean step series splits at the step with full gain") {
    val df = Seq(1.0, 1.0, 1.0, 9.0, 9.0, 9.0).zipWithIndex
      .map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")
    val out = Changepoint.bestSplit(df, Seq("k"), col("t"), "v")
      .select("cp_at", "n_left", "mean_left", "mean_right",
        "sse_total", "sse_split", "gain")
      .as[(Int, Long, Double, Double, Double, Double, Double)].head()
    // split after t=3; SSE with no split = Σv² − (Σv)²/n = 246 − 900/6 = 96
    assert(out == ((3, 3L, 1.0, 9.0, 96.0, 0.0, 96.0)))
  }

  test("changepoint: constant series ties break to the earliest position") {
    val df = Seq.fill(5)(4.0).zipWithIndex
      .map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")
    val out = Changepoint.bestSplit(df, Seq("k"), col("t"), "v")
      .select("cp_at", "gain").as[(Int, Double)].head()
    assert(out == ((1, 0.0)))
  }

  test("out-of-fold encoding excludes the row's own fold from its mean") {
    // category "a": rows keyed 1..40, label = 1 for even keys
    val rows = (1L to 40L).map(k => ("a", k, k % 2 == 0))
    val df = rows.toDF("cat", "k", "y")
    val out = graft.operators.Assoc
      .targetEncodeOof(df, "cat", col("k"), col("y"), folds = 4, m = 2.0)
      .select("fold", "n_fold", "enc_oof")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // driver-side twin: same folds, same closed form
    val folds = rows.groupBy { case (_, k, _) =>
      graft.functions.PortableHash.lehmerLong(k) % 4 }
    val n = 40.0
    val pos = rows.count(_._3).toDouble
    val prior = pos / n
    val expected = out.map { case (f, _, _) =>
      val in = folds(f)
      val nf = in.size
      val pf = in.count(_._3)
      (f, nf.toLong,
        math.round((pos - pf + 2.0 * prior) / (n - nf + 2.0) * 1e4) / 1e4)
    }
    assert(out == expected)
    assert(out.map(_._2).sum == 40L)
  }

  // two triangles (1,2,3) and (4,5,6) bridged by edge 3–4
  private def bridgedTriangles = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))

  test("modularity: bridged triangles under the natural partition") {
    val e = bridgedTriangles.toDF("src", "dst")
    val comm = (1L to 6L).map(nd => (nd, if (nd <= 3) "t1" else "t2"))
      .toDF("node", "community")
    val out = Modularity.perCommunity(e, "src", "dst", comm, "node", "community")
      .select("community", "intra_edges", "deg_sum", "contribution")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // m=7; each triangle: intra 3, degree mass 7 → 3/7 − (7/14)² ≈ 0.1786
    assert(out == Seq(("t1", 3L, 7L, 0.1786), ("t2", 3L, 7L, 0.1786)))
  }

  test("modularity: the all-in-one partition scores exactly zero") {
    val e = bridgedTriangles.toDF("src", "dst")
    val comm = (1L to 6L).map((_, "all")).toDF("node", "community")
    val out = Modularity.perCommunity(e, "src", "dst", comm, "node", "community")
      .select("intra_edges", "deg_sum", "contribution")
      .as[(Long, Long, Double)].head()
    assert(out == ((7L, 14L, 0.0)))
  }

  test("clustering coefficient: bridge endpoints dilute, pure triangle corners saturate") {
    val e = bridgedTriangles.toDF("u", "v")
    val out = graft.graph.Triangles.clusteringCoefficient(e)
      .select("node", "deg", "n_triangles", "clustering_coeff")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // bridge endpoints 3 and 4: deg 3, one triangle → 2/(3·2) = 0.3333
    // the other corners: deg 2, one triangle → closed neighborhood, 1.0
    assert(out == Seq((1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.3333), (4L, 3L, 1L, 0.3333),
      (5L, 2L, 1L, 1.0), (6L, 2L, 1L, 1.0)))
  }

  test("clustering coefficient: a star has no triangles anywhere") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val out = graft.graph.Triangles.clusteringCoefficient(e)
      .select("n_triangles", "clustering_coeff")
      .as[(Long, Double)].collect().toSeq
    assert(out.forall(_ == ((0L, 0.0))))
  }

  test("nearest-within: picks the closest in range, breaks exact ties on the id") {
    val cust = Seq((1L, 0.0, 0.0), (2L, 40.0, 40.0)).toDF("ck", "c_la", "c_lo")
    // for customer 1: s10 at ~111km, s20/s21 equidistant at ~222km;
    // customer 2 has nothing within 500km
    val sup = Seq((10L, 1.0, 0.0), (20L, -2.0, 0.0), (21L, 2.0, 0.0))
      .toDF("sk", "s_la", "s_lo")
    val out = graft.operators.Geo.nearestWithin(cust, sup, col("ck"),
        col("c_la"), col("c_lo"), col("s_la"), col("s_lo"),
        maxKm = 500.0, rightTie = col("sk"))
      .select("ck", "sk").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L)))
    val tied = graft.operators.Geo.nearestWithin(
        cust.filter(col("ck") === 1), sup.filter(col("sk") >= 20), col("ck"),
        col("c_la"), col("c_lo"), col("s_la"), col("s_lo"),
        maxKm = 500.0, rightTie = col("sk"))
      .select("ck", "sk").as[(Long, Long)].collect().toSeq
    assert(tied == Seq((1L, 20L)))
  }

  test("assortativity: a star is perfectly disassortative, uniform components correlate fully") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val s = graft.graph.Assortativity.degreeAssortativity(star, "src", "dst")
      .as[(Long, Double)].head()
    assert(s == ((6L, -1.0)))
    // triangle (all deg 2) + detached edge (both deg 1): degree match
    // on every edge → +1
    val mixed = Seq((1L, 2L), (2L, 3L), (1L, 3L), (8L, 9L)).toDF("src", "dst")
    val m = graft.graph.Assortativity.degreeAssortativity(mixed, "src", "dst")
      .as[(Long, Double)].head()
    assert(m == ((8L, 1.0)))
  }

  test("pmi: collocation strength from hand-counted bigram marginals") {
    val docs = Seq((1L, "x y x y")).toDF("doc_id", "text")
    val out = graft.text.Collocations.pmi(docs, "text", minCount = 1)
      .select("w1", "w2", "cnt", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq.sortBy(_._1)
    // bigrams: (x,y)·2, (y,x)·1; N=3; left(x)=2, left(y)=1, right(y)=2,
    // right(x)=1 → pmi(x,y)=ln(2·3/(2·2))=0.4055, pmi(y,x)=ln(3)=1.0986
    assert(out == Seq(("x", "y", 2L, 0.4055), ("y", "x", 1L, 1.0986)))
  }

  test("dominant period: an exact period-3 cycle wins with adjusted R2 = 1") {
    val df = (1 to 12).map(i => ("a", i, Seq(1.0, 2.0, 5.0)((i - 1) % 3)))
      .toDF("k", "t", "v")
    val out = graft.operators.Decompose
      .dominantPeriod(df, Seq("k"), col("t"), "v", Seq(2, 3, 4))
      .select("best_period", "n_points", "r2")
      .as[(Int, Long, Double)].head()
    assert(out == ((3, 12L, 1.0)))
  }

  test("dominant period: a saturated fit (every phase a singleton) scores the -1 sentinel") {
    val df = (1 to 3).map(i => ("a", i, i * 2.0)).toDF("k", "t", "v")
    val out = graft.operators.Decompose
      .dominantPeriod(df, Seq("k"), col("t"), "v", Seq(4))
      .select("best_period", "r2").as[(Int, Double)].head()
    assert(out == ((4, -1.0)))
  }

  test("rfm: quintile scores and the segment ladder on a designed ledger") {
    // customer i places i orders of 10·i each; larger i also more recent
    val rows = for { c <- 1 to 10; j <- 1 to c }
      yield (c.toLong, java.sql.Timestamp.valueOf(
        f"1998-0${(c + 1) / 2}%s-15 00:00:00"), 10.0 * c)
    val df = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.operators.Cohorts.rfm(df, "o_custkey", "o_orderdate",
        "o_totalprice", asOf = "1998-12-31")
      .select("o_custkey", "r_score", "f_score", "m_score", "segment")
      .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._1)
    // 10 customers into 5 tiles → 2 per tile on every axis
    assert(out.map(_._2) == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L))
    assert(out.map(_._3) == out.map(_._2) && out.map(_._4) == out.map(_._2))
    assert(out(9)._5 == "champion" && out(0)._5 == "hibernating")
    assert(out(5)._5 == "loyal")
  }

  test("gini: zero for equal shares, (n-1)/n when one unit holds everything") {
    val eq = Seq.tabulate(4)(i => ("g", i.toLong, 5.0)).toDF("g", "id", "v")
    val g1 = graft.operators.Pareto.gini(eq, Seq("g"), col("v"), Seq(col("id")))
      .select("n", "gini").as[(Long, Double)].head()
    assert(g1 == ((4L, 0.0)))
    val onehot = (Seq.tabulate(3)(i => ("g", i.toLong, 0.0)) :+ (("g", 9L, 10.0)))
      .toDF("g", "id", "v")
    val g2 = graft.operators.Pareto.gini(onehot, Seq("g"), col("v"), Seq(col("id")))
      .select("gini").as[Double].head()
    assert(g2 == 0.75) // (n−1)/n with n = 4
  }

  test("benford: digit extraction from cents strings, non-positives excluded") {
    val df = Seq(1.00, 1.50, 2.00, 9.99, 0.0, -3.0).toDF("amt")
    val out = graft.operators.Benford.firstDigitProfile(df, col("amt"))
      .select("digit", "n", "share", "expected")
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(x => (x._1, x._2, x._3)) ==
      Seq((1L, 2L, 0.5), (2L, 1L, 0.25), (9L, 1L, 0.25)))
    assert(out.head._4 == 0.301) // log10(2)
  }

  test("baseline forecasts: naive, seasonal-naive, drift and mean from a linear ramp") {
    val df = (1 to 10).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val out = graft.seq.Baselines.forecasts(df, Seq("k"), col("t"), "v",
        h = 4, period = 3)
      .select("step", "naive_fc", "snaive_fc", "drift_fc", "mean_fc")
      .as[(Int, Double, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    // drift on a perfect ramp extends the line; snaive wraps phase 8,9,10,8
    assert(out == Seq(
      (1, 10.0, 8.0, 11.0, 5.5), (2, 10.0, 9.0, 12.0, 5.5),
      (3, 10.0, 10.0, 13.0, 5.5), (4, 10.0, 8.0, 14.0, 5.5)))
    // a 2-point series falls back to naive for the missing phase
    val short = Seq(("b", 1, 4.0), ("b", 2, 6.0)).toDF("k", "t", "v")
    val s = graft.seq.Baselines.forecasts(short, Seq("k"), col("t"), "v",
        h = 1, period = 3)
      .select("snaive_fc", "drift_fc").as[(Double, Double)].head()
    assert(s == ((6.0, 8.0)))
  }

  test("adaptive seasonal naive: each series wraps at its own period") {
    val df = ((1 to 10).map(i => ("a", i, i.toDouble)) ++
      (1 to 6).map(i => ("b", i, i * 10.0))).toDF("k", "t", "v")
    val periods = Seq(("a", 2), ("b", 3)).toDF("k", "best_period")
    val out = graft.seq.Baselines.seasonalNaiveAdaptive(df, Seq("k"),
        col("t"), "v", periods, "best_period", h = 2)
      .select("k", "step", "period", "snaive_fc")
      .as[(String, Int, Int, Double)].collect().toSeq.sorted
    assert(out == Seq(("a", 1, 2, 9.0), ("a", 2, 2, 10.0),
      ("b", 1, 3, 40.0), ("b", 2, 3, 50.0)))
    // a series absent from the period table drops (inner semantics)
    val partial = graft.seq.Baselines.seasonalNaiveAdaptive(df, Seq("k"),
        col("t"), "v", periods.filter(col("k") === "a"), "best_period", h = 1)
      .select("k").as[String].collect().toSeq
    assert(partial == Seq("a"))
  }

  test("dsir: target-exclusive tokens score positive, off-target negative") {
    val docs = Seq((1L, "en", "alpha common"), (2L, "en", "alpha common"),
      (3L, "xx", "beta common"), (4L, "xx", "beta common"))
      .toDF("doc_id", "lang", "text")
    val out = graft.text.Dsir.unigramLogRatioScore(docs, "doc_id", "text",
        col("lang") === "en")
      .select("doc_id", "n_tokens", "dsir_score")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._2) == Seq(2L, 2L, 2L, 2L))
    // driver-side mirror of the smoothed log-ratio (k=0.5, V=3, T=8, Tt=4)
    def lr(ct: Int, cc: Int) = math.round(math.log(
      ((ct + 0.5) / (4 + 0.5 * 3)) / ((cc + 0.5) / (8 + 0.5 * 3))) * 1e6)
    def score(l1: Long, l2: Long) =
      math.round((l1 + l2) / 1e6 / 2 * 1e4) / 1e4
    val expTgt = score(lr(2, 2), lr(2, 4))  // alpha + common
    val expOff = score(lr(0, 2), lr(2, 4))  // beta + common
    assert(out.map(_._3) == Seq(expTgt, expTgt, expOff, expOff))
    assert(expTgt > 0 && expOff < 0)
  }

  test("weighted median: weight mass pulls the pick; equal weights give the lower median") {
    val df = Seq(("g", 1L, 1.0, 1.0), ("g", 2L, 2.0, 1.0), ("g", 3L, 3.0, 10.0),
      ("h", 1L, 1.0, 1.0), ("h", 2L, 2.0, 1.0), ("h", 3L, 3.0, 1.0),
      ("h", 4L, 4.0, 1.0)).toDF("g", "id", "v", "w")
    val out = graft.operators.WeightedStats.weightedMedian(df, Seq("g"),
        col("v"), col("w"), Seq(col("id")))
      .select("g", "weighted_median", "total_weight", "n_rows")
      .as[(String, Double, Double, Long)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("g", 3.0, 12.0, 3L), ("h", 2.0, 4.0, 4L)))
  }

  test("weighted quantiles: hand-computed walk, and q=0.5 equals the weighted median") {
    // group g: values 1,2,3,4 with weights 4,2,2,2 (total 10). Lower
    // pick: q=0.25 → cw 4 ≥ 2.5 at v=1; q=0.5 → cw 6 ≥ 5 at v=2;
    // q=0.9 → cw 10 ≥ 9 at v=4
    val df = Seq(("g", 1L, 1.0, 4.0), ("g", 2L, 2.0, 2.0), ("g", 3L, 3.0, 2.0),
      ("g", 4L, 4.0, 2.0)).toDF("g", "id", "v", "w")
    val out = graft.operators.WeightedStats.weightedQuantiles(df, Seq("g"),
        col("v"), col("w"), Seq(col("id")), qs = Seq(0.25, 0.5, 0.9))
      .select("q", "weighted_quantile").as[(Double, Double)].collect().toSeq.sorted
    assert(out == Seq((0.25, 1.0), (0.5, 2.0), (0.9, 4.0)))
    // property: the q=0.5 row reproduces weightedMedian on varied weights
    val rnd = new scala.util.Random(7)
    val big = (1 to 500).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong, rnd.nextInt(50).toDouble,
        (1 + rnd.nextInt(9)).toDouble)).toDF("g", "id", "v", "w")
    val med = graft.operators.WeightedStats.weightedMedian(big, Seq("g"),
        col("v"), col("w"), Seq(col("id")))
      .select("g", "weighted_median").as[(String, Double)].collect().toSeq.sorted
    val q50 = graft.operators.WeightedStats.weightedQuantiles(big, Seq("g"),
        col("v"), col("w"), Seq(col("id")), qs = Seq(0.5))
      .select("g", "weighted_quantile").as[(String, Double)].collect().toSeq.sorted
    assert(q50 == med)
  }

  test("safety stock: hand sums, and a single-point series holds zero buffer") {
    val df = (Seq(("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 14.0), ("b", 1, 7.0)))
      .toDF("k", "t", "v")
    val out = graft.operators.Inventory.safetyStock(df, Seq("k"), "v",
        z = 1.645, leadPeriods = 2)
      .select("k", "n", "mu", "sigma", "safety_stock", "order_up_to")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    // σ([10,12,14]) = 2 → ss = 1.645·2·√2 = 4.6528; OUT = 12·2 + ss
    assert(out == Seq(("a", 3L, 12.0, 2.0, 4.6528, 28.6528),
      ("b", 1L, 7.0, 0.0, 0.0, 14.0)))
  }

  test("price optimization: exact recovery of a planted elasticity and the Lerner price") {
    // q = 16·p^−2 exactly: elasticity −2, cost 3 → p* = 3·(−2)/(1−2) = 6
    val df = Seq(("p", 1.0, 16.0, 3.0), ("p", 2.0, 4.0, 3.0),
      ("p", 4.0, 1.0, 3.0)).toDF("k", "price", "qty", "cost")
    val out = graft.operators.PriceOpt.optimalPrice(df, Seq("k"),
        col("price"), col("qty"), col("cost"))
      .select("n", "elasticity", "p_star")
      .as[(Long, Double, Double)].head()
    assert(out == ((3L, -2.0, 6.0)))
    // constant demand → slope 0 (inelastic) → no recommendation
    val flat = Seq(("f", 1.0, 5.0, 3.0), ("f", 2.0, 5.0, 3.0))
      .toDF("k", "price", "qty", "cost")
    val f = graft.operators.PriceOpt.optimalPrice(flat, Seq("k"),
        col("price"), col("qty"), col("cost"))
      .select("elasticity", "p_star")
      .as[(Option[Double], Option[Double])].head()
    assert(f == ((Some(0.0), None)))
    // a single price point is degenerate → NULL elasticity
    val one = Seq(("o", 2.0, 5.0, 3.0), ("o", 2.0, 7.0, 3.0))
      .toDF("k", "price", "qty", "cost")
    val o = graft.operators.PriceOpt.optimalPrice(one, Seq("k"),
        col("price"), col("qty"), col("cost"))
      .select("elasticity").as[Option[Double]].head()
    assert(o.isEmpty)
  }

  test("ks as a two-sample drift test: disjoint supports hit D=1, identical ones 0") {
    // reference holds {1,2}, current holds {3,4} → ECDFs split fully at 2
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("v", "ref")
    val d = graft.metrics.Eval.ks(df, col("v"), col("ref"))
      .select("ks_score", "ks").as[(Double, Double)].head()
    assert(d == ((2.0, 1.0)))
    val same = Seq((1.0, true), (2.0, true), (1.0, false), (2.0, false))
      .toDF("v", "ref")
    val s = graft.metrics.Eval.ks(same, col("v"), col("ref"))
      .select("ks").as[Double].head()
    assert(s == 0.0)
  }

  test("depth-2 segmentation: three-level staircase resolves both inner splits") {
    // [1,1,1,5,5,5,9,9,9]: the first split ties at cost 24 and breaks
    // to the EARLIEST position (after t=3); the R segment [5,5,5,9,9,9]
    // then splits cleanly at its own step
    val df = Seq(1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 9.0, 9.0, 9.0).zipWithIndex
      .map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")
    val first = graft.operators.Changepoint.bestSplit(df, Seq("k"),
      col("t"), "v")
    assert(first.select("cp_at").as[Int].head() == 3)
    val labeled = df.join(first.select(col("k"), col("cp_at")), Seq("k"))
      .withColumn("segment",
        when(col("t") <= col("cp_at"), lit("L")).otherwise(lit("R")))
      .drop("cp_at")
    val out = graft.operators.Changepoint.bestSplit(labeled,
        Seq("k", "segment"), col("t"), "v")
      .select("segment", "cp_at", "mean_left", "mean_right", "gain")
      .as[(String, Int, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("L", 1, 1.0, 1.0, 0.0), ("R", 6, 5.0, 9.0, 24.0)))
  }

  test("rolling IQR fences: a spike breaches its trailing window, steady points don't") {
    // steady 10s establish tight quartiles (p25=p75=10 → fences collapse
    // to the point), then 100 lands far outside
    val df = (Seq.fill(7)(10.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("a", i + 1, v) }.toDF("k", "t", "v")
    val swT = SeriesWindow(Seq(col("k")), Seq(col("t")))
    val (p25, p75, flag) = graft.operators.WindowFeatures
      .rollingIqrFences(col("v"), 8, 1.5, swT)
    val out = df.select(col("t"), p25.as("p25"), p75.as("p75"),
        flag.as("o")).orderBy("t")
      .as[(Int, Double, Double, Boolean)].collect().toSeq
    assert(out.take(7).forall(r => !r._4))
    val last = out.last
    assert(last._4 && last._2 == 10.0)
  }

  test("inventory plan: lead demand and buffer compose into the order target") {
    // forecasts + safety stock on the same spine, checked against the
    // hand case of each leg: series [10,12,14], period 13 (shorter than
    // the series → snaive falls back to naive 14 on both steps)
    import org.apache.spark.sql.types._
    val weekly = (Seq(("1998-01-05", 10.0), ("1998-01-12", 12.0),
      ("1998-01-19", 14.0))).toDF("ws", "qty_sum")
      .select(col("ws").cast("date").as("week_start"), lit(7L).as("l_suppkey"),
        col("qty_sum"))
    val lead = graft.seq.Baselines.forecasts(weekly, Seq("l_suppkey"),
        col("week_start"), "qty_sum", h = 2, period = 13)
      .agg(graft.functions.Funcs.r(sum(col("snaive_fc"))).as("lead_demand"))
      .as[Double].head()
    assert(lead == 28.0)
    val buf = graft.operators.Inventory.safetyStock(weekly, Seq("l_suppkey"),
        "qty_sum", z = 1.645, leadPeriods = 2)
      .select("safety_stock").as[Double].head()
    assert(buf == 4.6528)
    // the composed job target is exactly their sum
  }

  test("spearman: monotone ±1, and tied values take the scipy fractional ranks") {
    val mono = (1 to 6).map(i => ("g", i.toDouble, math.exp(i.toDouble)))
      .toDF("g", "x", "y")
    val up = graft.operators.Assoc.spearman(mono, Seq("g"), col("x"), col("y"))
      .select("spearman").as[Double].head()
    assert(up == 1.0)
    val down = graft.operators.Assoc.spearman(mono, Seq("g"), col("x"), -col("y"))
      .select("spearman").as[Double].head()
    assert(down == -1.0)
    // x = [1,2,2,3] → fractional ranks [1, 2.5, 2.5, 4]; scipy gives
    // spearmanr = 0.9486832... against y = [1,3,2,4]
    val tied = Seq(("g", 1.0, 1.0), ("g", 2.0, 3.0), ("g", 2.0, 2.0),
      ("g", 3.0, 4.0)).toDF("g", "x", "y")
    val t = graft.operators.Assoc.spearman(tied, Seq("g"), col("x"), col("y"))
      .select("spearman").as[Double].head()
    assert(t == 0.9487)
  }

  test("spearman: exact past the long-sum overflow point (1.4M rows/group)") {
    // sum(rx·ry) ~ 4n³ wraps a BIGINT accumulator past n ≈ 1.3e6; the
    // decimal(38,0) sums must still return exactly +1 for a monotone map
    val n = 1400000
    val big = spark.range(1, n + 1)
      .select(lit("g").as("g"), col("id").cast("double").as("x"),
        (col("id") * 2).cast("double").as("y"))
    val s = graft.operators.Assoc.spearman(big, Seq("g"), col("x"), col("y"))
      .select("spearman").as[Double].head()
    assert(s == 1.0, s"monotone spearman at n=$n must be exactly 1.0, got $s")
  }

  test("price optimization: elasticity survives product-sum magnitudes past BIGINT") {
    // ln(1e12-scale prices) → |x| ~ 2.8e7 micro-units; x·y ~ 7.7e14/row,
    // so 12k rows push Σx·y ~ 9.3e18 past Long.MaxValue — the old long
    // accumulator wrapped silently; decimal sums must recover e = −2
    val rows = 12000
    val df = spark.range(rows)
      .select(lit("k").as("k"),
        (lit(1.0e12) * (lit(1.0) + col("id") / rows)).as("price"),
        lit(3.0).as("cost"))
      .withColumn("qty", lit(1.0e12) * pow(col("price") / 1.0e12, -2.0))
    val out = graft.operators.PriceOpt.optimalPrice(df, Seq("k"),
        col("price"), col("qty"), col("cost"))
      .select("n", "elasticity", "p_star").as[(Long, Double, Double)].head()
    assert(out._1 == rows)
    assert(math.abs(out._2 - -2.0) < 0.01, s"elasticity ${out._2} should be ≈ −2")
    assert(math.abs(out._3 - 6.0) < 0.05, s"Lerner price ${out._3} should be ≈ 6")
  }

  test("key-skew report: a planted hot key drives the factor, p99 and CV") {
    // keys a,b,c get 1 row each, key h gets 97 → counts [1,1,1,97]
    val df = (Seq("a", "b", "c").map((_, 1)) ++ Seq.fill(97)(("h", 1)))
      .toDF("k", "x")
    val out = graft.etl.Skew.keySkewReport(df, Seq("k"), exact = Some(true))
      .select("n_keys", "total_rows", "max_cnt", "mean_cnt", "p99_cnt",
        "skew_factor", "cv")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    // mean 25; p99 interpolates 1 + 0.97·96 = 94.12; σ([1,1,1,97]) = 48
    assert(out == ((4L, 100L, 97L, 25.0, 94.12, 3.88, 1.92)))
  }

  test("dbscan classification: hand-built core / border / noise geometry") {
    // tight 4-clique near the origin (pairwise ≤ ~15.7 km), a satellite
    // within eps of exactly one core point, and a far-away point
    val pts = Seq(
      (1L, 0.0, 0.0), (2L, 0.0, 0.1), (3L, 0.1, 0.0), (4L, 0.1, 0.1),
      (5L, 0.0, 0.27), (6L, 50.0, 50.0)).toDF("id", "lat", "lon")
    val out = GeoCluster.dbscanClassify(pts, col("id"), col("lat"), col("lon"),
        epsKm = 20.0, minPts = 4)
      .select("pid", "n_within_eps", "cls")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(x => x._1 -> x._3) == Seq(1L -> "core", 2L -> "core",
      3L -> "core", 4L -> "core", 5L -> "border", 6L -> "noise"))
    // the satellite sees itself + one clique member; the far point only itself
    assert(out(4)._2 == 2L)
    assert(out(5)._2 == 1L)
  }
}
