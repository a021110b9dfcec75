package graft

import org.apache.spark.sql.functions._
import graft.metrics.Eval
import graft.operators.{Ols, Pareto, SeriesWindow, WindowFeatures}
import graft.text.{InvertedIndex, Vocab}

/** Round-5 batch-4 operators: Pareto frontier, closed-form 2-feature
  * OLS, Welch A/B test, Zipf fit, inverted index, rolling correlation. */
class R5OpsBatch4Spec extends SparkSpec {
  import spark.implicits._

  // ---------------- Pareto ----------------

  test("frontier2d: dominated points drop, incomparable points stay") {
    val pts = Seq((1.0, 9.0), (5.0, 5.0), (9.0, 1.0), // frontier
      (4.0, 4.0), (1.0, 8.0), (5.0, 1.0))             // dominated
      .toDF("a", "b")
    val f = Pareto.frontier2d(pts, col("a"), col("b"))
      .orderBy("x").as[(Double, Double)].collect().toSeq
    assert(f == Seq((1.0, 9.0), (5.0, 5.0), (9.0, 1.0)))
  }

  test("frontier2d: equal-x keeps only max-y; equal-y keeps only max-x") {
    val pts = Seq((3.0, 7.0), (3.0, 2.0), (1.0, 7.0), (2.0, 1.0)).toDF("a", "b")
    val f = Pareto.frontier2d(pts, col("a"), col("b"))
      .orderBy("x").as[(Double, Double)].collect().toSeq
    // (3,2) dominated by (3,7); (1,7) dominated by (3,7); (2,1) dominated
    assert(f == Seq((3.0, 7.0)))
  }

  // ---------------- Ols ----------------

  test("fit2 recovers exact planted coefficients y = 2 + 3*x1 - x2") {
    val rows = for (x1 <- 1 to 6; x2 <- 0 to 2)
      yield (1L, x1.toDouble, x2.toDouble, 2.0 + 3.0 * x1 - x2)
    val out = Ols.fit2(rows.toDF("g", "x1", "x2", "y"), Seq("g"),
      col("x1"), col("x2"), col("y"))
      .select("b0", "b1", "b2").as[(Double, Double, Double)].head()
    assert(out == ((2.0, 3.0, -1.0)))
  }

  test("fit2: singular design (constant regressor) yields NULL, not garbage") {
    val rows = Seq((1L, 1.0, 5.0, 3.0), (1L, 2.0, 5.0, 4.0), (1L, 3.0, 5.0, 5.0))
    val out = Ols.fit2(rows.toDF("g", "x1", "x2", "y"), Seq("g"),
      col("x1"), col("x2"), col("y"))
      .select("b1").as[Option[Double]].head()
    assert(out.isEmpty)
  }

  // ---------------- abTest ----------------

  test("abTest: hand-computed Welch t on two small samples") {
    // A = {1,2,3}: mean 2, var 1; B = {5,7}: mean 6, var 2
    // se2 = 1/3 + 2/2 = 4/3; t = -4/sqrt(4/3) = -3.4641
    // df = (4/3)^2 / ((1/3)^2/2 + 1^2/1) = (16/9)/(19/18) = 32/19 = 1.6842
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0))
      .toDF("v", "m")
    val out = Eval.abTest(df, col("v"), col("m"), "a", "b")
      .select("n_a", "n_b", "mean_a", "mean_b", "diff", "t_stat", "df_welch")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
    assert(out == ((3L, 2L, 2.0, 6.0, -4.0, -3.4641, 1.6842)))
  }

  // ---------------- Vocab.zipfFit ----------------

  test("zipfFit: exact power law freq = 1000/rank gives slope -1, r2 = 1") {
    // tokens t1..t5 with frequencies 600,300,200,150,120 = 600/rank
    val docs = (1 to 5).flatMap { r =>
      val n = 600 / r
      Seq.fill(n)(s"t$r")
    }.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Vocab.zipfFit(docs, "text", 5)
      .select("n_terms", "slope", "r2").as[(Long, Double, Double)].head()
    assert(out == ((5L, -1.0, 1.0)))
  }

  // ---------------- InvertedIndex ----------------

  test("invertedIndex: df counts all docs, postings sorted numerically and capped") {
    val docs = Seq((10L, "apple banana"), (2L, "apple"), (1L, "apple apple"))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.build(docs, "doc_id", "text", maxPostings = 2)
      .orderBy("token").as[(String, Long, String)].collect().toSeq
    // apple: df=3 (repeat within doc counted once), postings capped at 2,
    // sorted numerically (1,2 — not "1","10")
    assert(idx == Seq(("apple", 3L, "1,2"), ("banana", 1L, "10")))
  }

  // ---------------- rollingCorr ----------------

  test("rollingCorr: +1 on co-monotone, -1 on anti-monotone, NULL on constant") {
    val sw = SeriesWindow(Seq(col("g")), Seq(col("t")))
    val df = Seq((1L, 1, 1.0, 2.0, 5.0, 7.0), (1L, 2, 2.0, 4.0, 3.0, 7.0),
      (1L, 3, 3.0, 6.0, 1.0, 7.0))
      .toDF("g", "t", "x", "ypos", "yneg", "ycst")
    val out = df.select(
      WindowFeatures.rollingCorr(col("x"), col("ypos"), 3, sw).as("cp"),
      WindowFeatures.rollingCorr(col("x"), col("yneg"), 3, sw).as("cn"),
      WindowFeatures.rollingCorr(col("x"), col("ycst"), 3, sw).as("cc"))
      .orderBy(col("cp")).collect().last
    assert(out.getDouble(0) == 1.0 && out.getDouble(1) == -1.0 && out.isNullAt(2))
  }
}
