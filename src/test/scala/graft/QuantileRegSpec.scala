package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileReg

/** IRLS pinball quantile-regression contracts. */
class QuantileRegSpec extends SparkSpec {
  import spark.implicits._

  private def r4(x: Double): Double = math.round(x * 1e4) / 1e4

  private def white(i: Int): Double = {
    var z = (i + 1L) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    r4((z >>> 11).toDouble / (1L << 53).toDouble) // [0, 1)
  }

  test("exact line: every quantile recovers it with zero pinball") {
    val rows = (1 to 200).map(i => ("g", i / 100.0, 3.0 + 2.0 * (i / 100.0)))
    val out = QuantileReg.fit(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y"))
      .select("tau", "qr_a", "qr_b", "pinball")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(out.size == 3)
    out.foreach { case (_, a, b, loss) =>
      assert(math.abs(a - 3.0) < 1e-3 && math.abs(b - 2.0) < 1e-3)
      assert(loss < 1e-3)
    }
  }

  test("flat feature: intercept lands near the marginal quantile") {
    // y uniform on [0, 100); x degenerate → b = 0 fallback, the
    // asymmetric reweighting walks a toward the τ-quantile. The walk
    // contracts slowly for extreme quantiles (a known IRLS property),
    // so this convergence demonstration runs 20 rounds
    val rows = (0 until 400).map(i => ("g", 1.0, r4(white(i) * 100.0)))
    val out = QuantileReg.fit(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y"), iters = 20)
      .select("tau", "qr_a", "qr_b")
      .as[(Double, Double, Double)].collect().toSeq
    out.foreach { case (tau, a, b) =>
      assert(b == 0.0)
      assert(math.abs(a - tau * 100.0) < 8.0, s"tau=$tau a=$a")
    }
  }

  test("heteroskedastic fan: upper-quantile slope exceeds lower") {
    // spread grows with x → the τ = 0.75 line must tilt above the
    // τ = 0.25 line
    val rows = (0 until 500).map { i =>
      val x = (i % 100) / 10.0
      ("g", x, r4(2.0 * x + x * (white(i) - 0.5) * 4.0))
    }
    val by = QuantileReg.fit(rows.toDF("g", "x", "y"), Seq("g"),
      col("x"), col("y"))
      .select("tau", "qr_b").as[(Double, Double)].collect().toMap
    assert(by(0.75) > by(0.5) && by(0.5) > by(0.25))
  }

  test("fit is partitioning-invariant") {
    val rows = (0 until 300).map(i => ("g", (i % 50) / 5.0,
      r4(1.0 + 0.5 * ((i % 50) / 5.0) + white(i + 9))))
    def run(parts: Int) = QuantileReg.fit(
      rows.toDF("g", "x", "y").repartition(parts), Seq("g"),
      col("x"), col("y"))
      .select("tau", "qr_a", "qr_b", "pinball")
      .as[(Double, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(run(1) == run(8))
  }

  test("single-pass and iterative forms are bit-identical (r18 one-job rewrite)") {
    // multi-group heteroskedastic frame + a degenerate (no-x-variance)
    // group + repeated cells (multiplicity path) — every branch of the
    // solve is exercised; the two execution shapes must agree on every
    // byte of every output row (same quantization, same decimal sums)
    val rows = (0 until 600).map { i =>
      val g = s"g${i % 3}"
      val x = if (i % 3 == 2) 1.0 else (i % 25) / 5.0 // g2 degenerate
      (g, x, r4(1.0 + 0.7 * x + x * (white(i) - 0.5) * 3.0))
    }
    val df = rows.toDF("g", "x", "y")
    def run() = QuantileReg.fit(df, Seq("g"), col("x"), col("y"))
      .orderBy("g", "tau")
      .select("g", "tau", "qr_a", "qr_b", "pinball")
      .collect().map(_.toSeq).toSeq
    val single = run() // default: single-pass
    val prev = spark.conf.getOption(QuantileReg.SinglePassConf)
    spark.conf.set(QuantileReg.SinglePassConf, "false")
    val iterative = try run() finally prev match {
      case Some(v) => spark.conf.set(QuantileReg.SinglePassConf, v)
      case None    => spark.conf.unset(QuantileReg.SinglePassConf)
    }
    assert(single == iterative)
    // degenerate group really took the b = 0 fallback in both shapes
    assert(single.filter(_.head == "g2").forall(r => r(3) == 0.0))
  }
}
