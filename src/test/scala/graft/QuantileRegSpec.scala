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
}
