package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.metrics.Metrics

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private val seriesGen = Gen.nonEmptyListOf(Gen.chooseNum(0.0, 1000.0))

  test("WMAPE(a, a) = 0 (scalacheck-generated series)") {
    (0 until 20).foreach { i =>
      val xs = seriesGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val df = xs.toDF("a").withColumn("p", col("a"))
      val w = df.agg(Metrics.wmape(col("a"), col("p"))).as[Double].head()
      assert(math.abs(w) < 1e-9, s"seed $i")
    }
  }

  test("WMAPE is scale invariant (up to epsilon guard)") {
    val xs = Seq(10.0, 20.0, 30.0, 40.0)
    val ps = Seq(12.0, 18.0, 33.0, 39.0)
    def wm(scale: Double) = xs.zip(ps).map { case (a, p) => (a * scale, p * scale) }
      .toDF("a", "p").agg(Metrics.wmape(col("a"), col("p"))).as[Double].head()
    assert(math.abs(wm(1.0) - wm(100.0)) < 1e-6)
  }

  test("volume-weighted recombination of group WMAPEs equals global WMAPE") {
    val df = Seq(("g1", 10.0, 12.0), ("g1", 20.0, 19.0), ("g2", 5.0, 9.0), ("g2", 50.0, 45.0))
      .toDF("g", "a", "p")
    val global = df.agg(Metrics.wmape(col("a"), col("p"))).as[Double].head()
    // Σ_g wmape_g · (Σ|a|_g / Σ|a|)  ==  global (with eps ≈ 0)
    val parts = Metrics.wmapeByGroup(df, Seq("g"), col("a"), col("p"))
      .join(df.groupBy("g").agg(sum(abs(col("a"))).as("va")), "g")
      .select((col("wmape") * col("va")).as("wv"), col("va"))
      .agg(sum(col("wv")) / sum(col("va"))).as[Double].head()
    assert(math.abs(global - parts) < 1e-6)
  }

  test("metric inequalities hold on generated series: rmse >= mae, smape in [0,200]") {
    (0 until 10).foreach { i =>
      val xs = seriesGen.apply(Gen.Parameters.default, Seed(100L + i)).get
      val ps = seriesGen.apply(Gen.Parameters.default, Seed(200L + i)).get
      val n = math.min(xs.length, ps.length)
      if (n > 0) {
        val df = xs.take(n).zip(ps.take(n)).toDF("a", "p")
        val row = Metrics.scorecard(df, col("a"), col("p")).head()
        assert(row.getAs[Double]("rmse") >= row.getAs[Double]("mae") - 1e-9, s"seed $i")
        val sm = row.getAs[Double]("smape")
        assert(sm >= 0 && sm <= 200 + 1e-9, s"seed $i smape=$sm")
      }
    }
  }

  test("weightedWmape with unit weights equals plain wmape") {
    val df = Seq((10.0, 12.0), (20.0, 15.0), (5.0, 9.0)).toDF("a", "p")
    val plain = df.agg(Metrics.wmape(col("a"), col("p"))).as[Double].head()
    val weighted = df.agg(Metrics.weightedWmape(col("a"), col("p"), lit(1.0)))
      .as[Double].head()
    assert(math.abs(plain - weighted) < 1e-9)
  }

  test("scorecard computes all metrics in one pass with expected values") {
    val df = Seq((10.0, 12.0), (20.0, 18.0)).toDF("a", "p")
    val row = Metrics.scorecard(df, col("a"), col("p")).head()
    val wmape = row.getAs[Double]("wmape")
    assert(math.abs(wmape - (4.0 / 30.0 * 100)) < 1e-4)
    assert(row.getAs[Double]("mae") == 2.0)
    assert(math.abs(row.getAs[Double]("rmse") - 2.0) < 1e-9)
    assert(row.getAs[Double]("bias") == 0.0)
    assert(row.getAs[Long]("n_rows") == 2L)
  }

  test("errorSlices: one pass per-dimension slices match separate groupBys") {
    val df = Seq(
      ("jan", "A", 10.0, 12.0), ("jan", "B", 20.0, 15.0),
      ("feb", "A", 5.0, 9.0), ("feb", "C", 50.0, 45.0), ("feb", "C", 8.0, 8.0))
      .toDF("m", "tier", "a", "p")
    val out = Metrics.errorSlices(df, col("a"), col("p"),
      Seq("m" -> col("m"), "tier" -> col("tier")))
    assert(out.columns.toSeq ==
      Seq("slice_type", "slice_value", "n_rows", "wmape", "bias", "mae", "rmse"))
    // one row per distinct value per dimension — no grand-total row
    assert(out.count() == 5)
    val byM = out.filter(col("slice_type") === "m")
      .select("slice_value", "wmape", "n_rows")
      .as[(String, Double, Long)].collect()
      .map { case (k, w, n) => k -> ((w, n)) }.toMap
    val expected = Metrics.wmapeByGroup(df, Seq("m"), col("a"), col("p"))
      .select(col("m"), col("wmape"), col("n_rows"))
      .as[(String, Double, Long)].collect()
    expected.foreach { case (m, w, n) =>
      val (gotW, gotN) = byM(m)
      assert(gotN == n, s"n_rows for $m")
      assert(math.abs(gotW - w) < 1e-4, s"wmape for $m: $gotW vs $w")
    }
  }

  test("MASE: naive forecast scores exactly 1, perfect forecast 0") {
    val df = Seq(("g", 1, 10.0), ("g", 2, 14.0), ("g", 3, 12.0), ("g", 4, 18.0))
      .toDF("g", "t", "a")
    // pred = previous value (the naive forecast itself) → mase ≈ 1.
    // First row has no naive error on either numerator path, so feed
    // pred = lag explicitly and drop the first row for the numerator by
    // letting avg skip its null.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("t")
    val withPred = df.withColumn("p", lag(col("a"), 1).over(w))
      .filter(col("p").isNotNull)
    val row = Metrics.maseByGroup(withPred, Seq("g"), col("a"), col("p"),
      Seq(col("t"))).head()
    // numerator MAE over rows 2-4 = (4+2+6)/3 = 4; naive MAE within the
    // filtered frame = (2+6)/2 = 4 → mase 1
    assert(math.abs(row.getAs[Double]("mase") - 1.0) < 1e-3, row.toString)
    val perfect = Metrics.maseByGroup(df.withColumn("p", col("a")), Seq("g"),
      col("a"), col("p"), Seq(col("t"))).head()
    assert(perfect.getAs[Double]("mase") == 0.0)
  }

  test("errorSlices keeps null slice values attributed to their own dimension") {
    val df = Seq((Option("jan"), "A", 10.0, 12.0), (None, "B", 20.0, 15.0))
      .toDF("m", "tier", "a", "p")
    val out = Metrics.errorSlices(df, col("a"), col("p"),
      Seq("m" -> col("m"), "tier" -> col("tier")))
    val mRows = out.filter(col("slice_type") === "m").count()
    assert(mRows == 2) // "jan" and the genuine null bucket
  }

  test("crossDimensionalWmape: hand matrix with best/worst ranks") {
    // cells: (A,X) 10%, (A,Y) 20%, (B,X) 0%, (B,Y) 50%
    val rows = for {
      (d1, d2, p) <- Seq(("A", "X", 9.0), ("A", "Y", 8.0),
        ("B", "X", 10.0), ("B", "Y", 5.0))
      _ <- 1 to 5
    } yield (d1, d2, 10.0, p)
    val out = Metrics.crossDimensionalWmape(rows.toDF("d1", "d2", "a", "p"),
      col("d1"), col("d2"), col("a"), col("p"))
      .collect().map(r0 => (r0.getAs[String]("dim1"), r0.getAs[String]("dim2")) ->
        (r0.getAs[Double]("wmape"), r0.getAs[Long]("best_rank"),
          r0.getAs[Long]("worst_rank"))).toMap
    assert(out(("B", "X")) == ((0.0, 1L, 4L)))
    assert(out(("A", "X")) == ((10.0, 2L, 3L)))
    assert(out(("A", "Y")) == ((20.0, 3L, 2L)))
    assert(out(("B", "Y")) == ((50.0, 4L, 1L)))
  }
}
