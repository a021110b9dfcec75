package graft

import org.apache.spark.sql.functions._
import graft.operators.SketchRollup

class SketchSpec extends SparkSpec {
  import spark.implicits._

  /** 3 keys × 10 periods; values overlap across periods so the range
    * distinct is far below the sum of period distincts (the case where
    * additive merge would be WRONG and sketches are needed). */
  private def ledger = (0 until 3).flatMap { k =>
    (0 until 10).flatMap { p =>
      (0 until 200).map(i => (k.toLong, p.toLong, (k * 1000 + (i * 7 + p * 13) % 400).toLong))
    }
  }.toDF("k", "period", "customer")

  test("merged period sketches agree with a direct range sketch within 1%") {
    val df = ledger
    val daily = SketchRollup.sketchTable(df, Seq("k"), col("period"), col("customer"))
    val merged = SketchRollup.distinctOverRange(daily, Seq("k"))
      .as[(Long, Double)].collect().toMap
    val direct = df.groupBy("k")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("customer"), lit(12)))
        .as("d"))
      .as[(Long, Double)].collect().toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (k, est) =>
      // DataSketches promotes sparse->dense at different points along
      // different merge paths, so agreement is near, not bit-exact
      val rel = math.abs(est - direct(k)) / direct(k)
      assert(rel <= 0.01, s"key $k merged=$est direct=${direct(k)}")
    }
  }

  test("estimate lands within the lgK=12 error band of the true distinct") {
    val df = ledger
    val daily = SketchRollup.sketchTable(df, Seq("k"), col("period"), col("customer"))
    val est = SketchRollup.distinctOverRange(daily, Seq("k"))
      .as[(Long, Double)].collect().toMap
    val exact = df.groupBy("k").agg(countDistinct(col("customer")).as("d"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      val rel = math.abs(est(k) - ex) / ex.toDouble
      assert(rel <= 0.05, s"key $k est=${est(k)} exact=$ex rel=$rel")
    }
  }

  test("incremental sketch merge is equivalent to full recompute") {
    val df = ledger
    val base = SketchRollup.sketchTable(df.filter(col("period") < 7),
      Seq("k"), col("period"), col("customer"))
    val delta = SketchRollup.sketchTable(df.filter(col("period") >= 7),
      Seq("k"), col("period"), col("customer"))
    val maintained = SketchRollup.distinctOverRange(
      SketchRollup.mergeSketches(base, delta, Seq("k")), Seq("k"))
      .as[(Long, Double)].collect().toMap
    val recomputed = SketchRollup.distinctOverRange(
      SketchRollup.sketchTable(df, Seq("k"), col("period"), col("customer")),
      Seq("k")).as[(Long, Double)].collect().toMap
    assert(maintained.keySet == recomputed.keySet)
    maintained.foreach { case (k, est) =>
      val rel = math.abs(est - recomputed(k)) / recomputed(k)
      assert(rel <= 0.01, s"key $k maintained=$est recomputed=${recomputed(k)}")
    }
  }

  test("bounded min-k-distinct aggregate equals the composed collect_set form") {
    val df = ledger
    val bounded = df
      .select(col("k"), graft.functions.PortableHash.lehmer(col("customer")).as("h"))
      .groupBy("k")
      .agg(graft.expr.MinKDistinctExpr.column(col("h"), 32).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    val composed = df
      .select(col("k"), graft.functions.PortableHash.lehmer(col("customer")).as("h"))
      .groupBy("k")
      .agg(slice(array_sort(collect_set(col("h"))), 1, 32).as("v"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(bounded == composed)
  }

  test("KMV merge-then-estimate equals estimate-of-recompute EXACTLY") {
    // the KMV advantage over HLL: the global k minima each survive
    // per-part truncation, so the merge is exactly associative
    val df = ledger
    val byPeriod = SketchRollup.kmvSketchTable(df, Seq("k"), col("period"),
      col("customer"))
    val merged = SketchRollup.kmvDistinctOverRange(byPeriod, Seq("k"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val direct = SketchRollup.kmvDistinctOverRange(
      SketchRollup.kmvSketchTable(df, Seq("k"), lit(0L), col("customer")),
      Seq("k"))
      .as[(Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(merged == direct)
  }

  test("KMV estimate: exact below k, inside a loose band above k") {
    val small = (0 until 10).map(i => (1L, 0L, i.toLong)).toDF("k", "period", "customer")
    val sEst = SketchRollup.kmvDistinctOverRange(
      SketchRollup.kmvSketchTable(small, Seq("k"), col("period"), col("customer")),
      Seq("k")).as[(Long, Long, Double)].collect().head
    assert(sEst._2 == 10L && sEst._3 == 10.0) // below k: the sketch IS the set
    val big = ledger
    val est = SketchRollup.kmvDistinctOverRange(
      SketchRollup.kmvSketchTable(big, Seq("k"), col("period"), col("customer")),
      Seq("k")).as[(Long, Long, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    val exact = big.groupBy("k").agg(countDistinct(col("customer")).as("d"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, ex) =>
      // k=32 → relative std error ~1/√(k−2) ≈ 18%; pin a 3σ-ish band
      val rel = math.abs(est(k) - ex) / ex.toDouble
      assert(rel <= 0.55, s"key $k est=${est(k)} exact=$ex rel=$rel")
    }
  }
}
