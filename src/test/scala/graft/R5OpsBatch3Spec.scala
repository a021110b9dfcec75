package graft

import org.apache.spark.sql.functions._
import graft.metrics.Eval
import graft.operators.{Assoc, Attribution, Bars}
import graft.graph.{LabelProp, Triangles}
import graft.seq.SequentialKernels

/** Round-5 batch-3 operators: model-evaluation metrics (AUC, KS, gains,
  * threshold sweep, calibration), categorical association (chi2, MI,
  * target encoding), event analytics (attribution, OHLC), graph ops
  * (triangles, label-prop CC), and CUSUM change detection. */
class R5OpsBatch3Spec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // ---------------- Eval ----------------

  test("auc: perfect separation = 1.0, reversed = 0.0, ties = 0.5") {
    // scores: positives at 0.9, negatives at 0.1 -> AUC 1
    val perfect = Seq((0.9, true), (0.9, true), (0.1, false), (0.1, false))
      .toDF("score", "label")
    val a1 = Eval.auc(perfect, col("score"), col("label"))
      .select("auc").as[Double].head()
    assert(a1 == 1.0)
    val reversed = Eval.auc(perfect, col("score"), !col("label"))
      .select("auc").as[Double].head()
    assert(reversed == 0.0)
    // all same score -> every pair is a tie -> 0.5
    val tied = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
      .toDF("score", "label")
    val a2 = Eval.auc(tied, col("score"), col("label"))
      .select("auc").as[Double].head()
    assert(a2 == 0.5)
  }

  test("auc: hand-computed mixed case with a tie") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs: (3,2)=1 (3,1)=1 (2,2)=0.5 (2,1)=1 -> U=3.5, AUC=3.5/4
    val df = Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false))
      .toDF("score", "label")
    val a = Eval.auc(df, col("score"), col("label"))
      .select("auc").as[Double].head()
    assert(a == 0.875)
  }

  test("ks: hand-computed two-point distributions") {
    // pos at {1,2}, neg at {3,4}: after score 2, CDF_pos=1, CDF_neg=0 -> KS=1
    val df = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("score", "label")
    val row = Eval.ks(df, col("score"), col("label"))
      .select("ks_score", "ks").as[(Double, Double)].head()
    assert(row == ((2.0, 1.0)))
  }

  test("gains: top bucket captures its share; lift of full set = 1") {
    // 2 pos at 0.9, 2 neg at 0.1: cutoff 0.9 -> capture 1.0, lift 2.0
    val df = Seq((0.9, true), (0.9, true), (0.1, false), (0.1, false))
      .toDF("score", "label")
    val rows = Eval.gains(df, col("score"), col("label"))
      .orderBy(col("score").desc)
      .select("cum_n", "cum_pos", "capture", "lift")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(rows == Seq((2L, 2L, 1.0, 2.0), (4L, 2L, 1.0, 1.0)))
  }

  test("thresholdSweep: degenerate thresholds give total recall / null precision") {
    val df = Seq((0.9, true), (0.1, false)).toDF("score", "label")
    val rows = Eval.thresholdSweep(df, col("score"), col("label"), steps = 1, denom = 1.0)
      .orderBy("threshold")
      .select("threshold", "tp", "fp", "recall")
      .as[(Double, Long, Long, Double)].collect().toSeq
    // t=0: everything predicted positive; t=1: nothing predicted positive
    assert(rows.head == ((0.0, 1L, 1L, 1.0)))
    assert(rows(1)._2 == 0L && rows(1)._3 == 0L)
    val prec1 = Eval.thresholdSweep(df, col("score"), col("label"), 1, 1.0)
      .filter(col("threshold") === 1.0).select("precision")
      .as[Option[Double]].head()
    assert(prec1.isEmpty) // 0/0 -> NULL, not an error or NaN
  }

  test("calibration: bin edges closed at the top, well-calibrated data") {
    val df = Seq((0.05, false), (0.95, true), (1.0, true), (0.15, false))
      .toDF("score", "label")
    val rows = Eval.calibration(df, col("score"), col("label"), bins = 10)
      .orderBy("bin").select("bin", "n", "pos_rate")
      .as[(Long, Long, Double)].collect().toSeq
    // score 1.0 lands in bin 9 (top edge closed), not a phantom bin 10
    assert(rows == Seq((0L, 1L, 0.0), (1L, 1L, 0.0), (9L, 2L, 1.0)))
  }

  // ---------------- Assoc ----------------

  test("chi2: independent 2x2 -> chi2 = 0; dependent -> n * min(r,c)-1 scale") {
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val c0 = Assoc.chi2(indep, "u", "v").select("chi2").as[Double].head()
    assert(c0 == 0.0)
    // perfectly dependent 2x2 (n=4): chi2 = n = 4, V = 1
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "v")
    val row = Assoc.chi2(dep, "u", "v")
      .select("chi2", "cramers_v").as[(Double, Double)].head()
    assert(row == ((4.0, 1.0)))
  }

  test("mutualInfo: independent -> 0; identical columns -> MI = H, NMI = 1") {
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val m0 = Assoc.mutualInfo(indep, "u", "v").select("mi_nats").as[Double].head()
    assert(m0 == 0.0)
    val ident = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b")).toDF("u", "v")
    val r1 = Assoc.mutualInfo(ident, "u", "v")
      .select("mi_nats", "h_x", "nmi").as[(Double, Double, Double)].head()
    assert(r1._1 == r1._2 && r1._3 == 1.0)
    assert(r1._2 == 0.6931) // ln 2 rounded to 4 decimals
  }

  test("targetEncode: shrinks a rare category toward the prior") {
    // global prior = 0.5; category 'rare' has one positive row
    val df = Seq(("com", true), ("com", false), ("com", true), ("com", false),
      ("rare", true)).toDF("cat", "y")
    val enc = Assoc.targetEncode(df, "cat", col("y"), m = 10.0)
      .orderBy("cat").select("cat", "enc").as[(String, Double)].collect().toSeq
    // rare: (1 + 10*0.6)/(1+10) = 7/11 = 0.6364 — between raw 1.0 and prior 0.6
    // com:  (2 + 10*0.6)/(4+10) = 8/14 = 0.5714
    assert(enc == Seq(("com", 0.5714), ("rare", 0.6364)))
  }

  // ---------------- Attribution ----------------

  test("touchAttribution: first/last touch, lookback window, zero-touch kept") {
    val ev = Seq(
      (1L, 10L, "view", ts(1)), (1L, 11L, "click", ts(2)),
      (1L, 12L, "purchase", ts(3)),
      // u2 purchase with NO touches -> kept, n_touches=0
      (2L, 20L, "purchase", ts(1)),
      // u3: touch AFTER purchase doesn't count
      (3L, 30L, "purchase", ts(1)), (3L, 31L, "click", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Attribution.touchAttribution(ev, "user_id", "event_type", "ts",
      "event_id", "purchase", Seq("view", "click"), lookbackDays = 7)
      .orderBy("conversion_id")
      .select("conversion_id", "n_touches", "first_touch_id", "last_touch_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((12L, 2L, Some(10L), Some(11L)),
      (20L, 0L, None, None), (30L, 0L, None, None)))
  }

  test("touchAttribution: simultaneous touch ties break on event id") {
    val ev = Seq(
      (1L, 5L, "view", ts(1)), (1L, 6L, "click", ts(1)),
      (1L, 9L, "purchase", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Attribution.touchAttribution(ev, "user_id", "event_type", "ts",
      "event_id", "purchase", Seq("view", "click"), 7)
      .select("first_touch_id", "last_touch_id")
      .as[(Long, Long)].head()
    assert(out == ((5L, 6L)))
  }

  // ---------------- Bars ----------------

  test("ohlc: open/close by time order, high/low by value, bar bucketing") {
    val ev = Seq(
      ("m", 1L, ts(1), 5.0), ("m", 2L, ts(2), 9.0), ("m", 3L, ts(3), 1.0),
      ("m", 4L, ts(4), 7.0),
      // second key isolated
      ("k", 9L, ts(1), 2.0)).toDF("key", "event_id", "ts", "value")
    val out = Bars.ohlc(ev, "key", "ts", "event_id", "value", "hour")
      .orderBy("key")
      .select("key", "n", "open", "close", "high", "low", "volume")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("k", 1L, 2.0, 2.0, 2.0, 2.0, 2.0),
      ("m", 4L, 5.0, 7.0, 9.0, 1.0, 22.0)))
  }

  // ---------------- Triangles ----------------

  test("triangleCount: K4 has 4 triangles; square has 0; counts invariant") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val r1 = Triangles.triangleCount(k4)
      .select("n_nodes", "n_edges", "n_triangles")
      .as[(Long, Long, Long)].head()
    assert(r1 == ((4L, 6L, 4L)))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    assert(Triangles.triangleCount(square).select("n_triangles").as[Long].head() == 0L)
    // duplicate + reversed edges collapse before counting
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L)).toDF("u", "v")
    val r3 = Triangles.triangleCount(messy)
      .select("n_edges", "n_triangles").as[(Long, Long)].head()
    assert(r3 == ((3L, 1L)))
  }

  test("coOccurrenceEdges: pairs within basket, deduped across baskets") {
    val df = Seq((1L, 10L), (1L, 11L), (1L, 10L), (2L, 10L), (2L, 11L), (2L, 12L))
      .toDF("basket", "item")
    val e = Triangles.coOccurrenceEdges(df, "basket", "item")
      .orderBy("u", "v").as[(Long, Long)].collect().toSeq
    assert(e == Seq((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  // ---------------- LabelProp ----------------

  test("ccFixed: labels converge to component minimum within diameter rounds") {
    // components {1,2,3} (path) and {10,11}
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("s", "t")
    val lbl = LabelProp.ccFixed(e, "s", "t", iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(lbl == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("ccFixed: one round only reaches distance-1 neighbors") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val lbl = LabelProp.ccFixed(e, "s", "t", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // node 4 only sees node 3 after one round
    assert(lbl == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  // ---------------- CUSUM ----------------

  test("withCusum: hand-computed recursion with reset-to-zero and alarm") {
    // deltas: +3, +3, -10, +1  with slack=1:
    // pos: 2, 4, 0, 0 ; neg: 0, 0, 9, 7 ; alarm at h=8 on row 3
    val df = Seq((1L, 1, 3.0), (1L, 2, 3.0), (1L, 3, -10.0), (1L, 4, 1.0))
      .toDF("k", "t", "d")
    val out = SequentialKernels.withCusum(df, Seq("k"), Seq(col("t")), "d",
      slack = 1.0, h = 8.0)
      .orderBy("t").select("cusum_pos", "cusum_neg", "cusum_alarm")
      .as[(Double, Double, Long)].collect().toSeq
    assert(out == Seq((2.0, 0.0, 0L), (4.0, 0.0, 0L), (0.0, 9.0, 1L),
      (0.0, 7.0, 0L)))
  }

  test("withCusum: series are independent across keys") {
    val df = Seq((1L, 1, 100.0), (2L, 1, 0.0)).toDF("k", "t", "d")
    val out = SequentialKernels.withCusum(df, Seq("k"), Seq(col("t")), "d", 1.0, 8.0)
      .orderBy("k").select("cusum_pos").as[Double].collect().toSeq
    assert(out == Seq(99.0, 0.0))
  }
}
