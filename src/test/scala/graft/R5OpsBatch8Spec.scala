package graft

import org.apache.spark.sql.functions._
import graft.operators.Survival

/** Round-5 batch-8 operators: Kaplan-Meier survival and Gini. */
class R5OpsBatch8Spec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: product-limit with censoring and a terminal S=0") {
    // durations: 1 event, 2 censored, two events at 3 (everyone left)
    val df = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1)).toDF("t", "e")
    val out = Survival.kaplanMeier(df, col("t"), col("e"))
      .orderBy("t").select("t", "n_risk", "n_events", "survival")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // t=1: 4 at risk, S=3/4; censor at 2 shrinks the risk set silently;
    // t=3: 2 at risk, both convert -> S=0 via the ln(0) guard
    assert(out == Seq((1L, 4L, 1L, 0.75), (3L, 2L, 2L, 0.0)))
  }

  test("kaplanMeier: no censoring reduces to the empirical survivor") {
    val df = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1)).toDF("t", "e")
    val out = Survival.kaplanMeier(df, col("t"), col("e"))
      .orderBy("t").select("survival").as[Double].collect().toSeq
    assert(out == Seq(0.75, 0.5, 0.25, 0.0))
  }

  test("gini: 0 for perfect equality, (n-1)/n for total concentration") {
    val eq = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0)).toDF("k", "v")
    assert(Survival.gini(eq, "k", col("v")).select("gini").as[Double].head() == 0.0)
    val conc = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 10.0)).toDF("k", "v")
    assert(Survival.gini(conc, "k", col("v")).select("gini").as[Double].head() == 0.75)
  }

  test("holt-winters: hand recursion with an m=2 seasonal ring") {
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 30.0), (1L, 4, 40.0))
      .toDF("k", "t", "x")
    val out = graft.seq.SequentialKernels.withHoltWinters(df, Seq("k"),
      Seq(col("t")), "x", alpha = 0.5, beta = 0.5, gamma = 0.5, m = 2)
      .orderBy("t").select("hw_level", "hw_trend", "hw_seasonal")
      .as[(Double, Double, Double)].collect().toSeq
    // dyadic-rational recursion — exact doubles, no tolerance needed
    assert(out == Seq((10.0, 0.0, 0.0), (15.0, 2.5, 2.5),
      (23.75, 5.625, 3.125), (33.4375, 7.65625, 4.53125)))
  }

  test("ruleReport: NULL predicate counts as a violation; one row per rule") {
    val df = Seq(Some(5.0), Some(-1.0), None).toDF("v")
    val out = graft.etl.Cleaning.ruleReport(df, Seq(
      "positive" -> (col("v") > 0), "present" -> col("v").isNotNull))
      .orderBy("rule")
      .select("rule", "n_rows", "n_violations", "violation_rate")
      .as[(String, Long, Long, Double)].collect().toSeq
    // positive: -1 fails, NULL is unknown -> violation too
    assert(out == Seq(("positive", 3L, 2L, 0.6667), ("present", 3L, 1L, 0.3333)))
  }

  test("quantileNormalize: interpolated mapping onto the reference; identity on self") {
    val target = Seq((1L, 1.0, 1L), (1L, 2.0, 2L), (1L, 3.0, 3L)).toDF("g", "v", "id")
    val ref = Seq(10.0, 20.0, 30.0, 40.0).toDF("rv")
    val out = graft.operators.QuantileNorm.normalize(target, ref, col("rv"),
      Seq("g"), col("v"), Seq(col("id")))
      .orderBy("v").select("normalized").as[Double].collect().toSeq
    // group positions 0, 1.5, 3 over a 4-point reference -> 10, 25, 40
    assert(out == Seq(10.0, 25.0, 40.0))
    val self = graft.operators.QuantileNorm.normalize(target, target, col("v"),
      Seq("g"), col("v"), Seq(col("id")))
      .orderBy("v").select("normalized").as[Double].collect().toSeq
    assert(self == Seq(1.0, 2.0, 3.0))
  }

  test("quantileNormalize: sketchReference bounds the reference and preserves the mapping") {
    val pop = (0 until 5000).map(i => i.toDouble).toDF("rv")
    val grid = graft.operators.QuantileNorm.sketchReference(pop, col("rv"), nPoints = 101)
    val vals = grid.select(col("ref_value")).as[Double].collect().toSeq
    assert(vals.size == 101)
    assert(vals == vals.sorted)
    assert(vals.head == 0.0 && vals.last == 4999.0) // grid spans the population
    // normalizing onto the bounded grid ≈ normalizing onto the raw
    // population (uniform population → near-identity mapping)
    val target = Seq((1L, 100.0, 1L), (1L, 2500.0, 2L), (1L, 4900.0, 3L)).toDF("g", "v", "id")
    val out = graft.operators.QuantileNorm.normalize(target, grid, col("ref_value"),
      Seq("g"), col("v"), Seq(col("id")))
      .orderBy("v").select("normalized").as[Double].collect().toSeq
    out.zip(Seq(0.0, 2499.5, 4999.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 60.0, s"$got vs $want") // within ~1 grid cell
    }
  }

  test("mergeAdditive: split-aggregate-merge equals direct aggregation") {
    val rows = (1 to 40).map(i => (i % 5L, (i % 7).toDouble, i))
    val full = rows.toDF("k", "v", "i").groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val a = rows.filter(_._3 <= 20).map(r => (r._1, r._2)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val b = rows.filter(_._3 > 20).map(r => (r._1, r._2)).toDF("k", "v")
      .groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val merged = graft.operators.Incremental.mergeAdditive(a, b, Seq("k"), Seq("sv", "n"))
    val d1 = full.orderBy("k").as[(Long, Double, Long)].collect().toSeq
    val d2 = merged.orderBy("k").as[(Long, Double, Long)].collect().toSeq
    assert(d1 == d2)
  }
}
