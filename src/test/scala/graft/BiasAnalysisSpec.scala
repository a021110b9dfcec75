package graft

import org.apache.spark.sql.functions._
import graft.metrics.BiasAnalysis

/** Contracts for the systematic-bias detector (reference
  * error_analysis.py:467-610) on a planted staircase: errors 1,2,3,4
  * by month (5 rows each), flag A = months 1-2, B = months 3-4. */
class BiasAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private val rows = for (m <- 1 to 4; i <- 1 to 5) yield
    ("g", if (m <= 2) "A" else "B", f"2022-$m%02d", 10.0, 10.0 - m)
  private def report() = BiasAnalysis.systematicBias(
    rows.toDF("g", "flag", "month", "a", "p"), Seq("g"),
    Seq("flag" -> col("flag"), "month" -> col("month")),
    col("a"), col("p"), trendDim = Some("month"))

  test("overall: hand bias stats, tests and ladders") {
    val o = report().filter(col("section") === "overall").collect().head
    assert(o.getAs[Long]("n_rows") == 20L)
    assert(o.getAs[Double]("mean_bias") == 2.5)
    assert(o.getAs[Double]("median_bias") == 2.5)
    assert(o.getAs[Double]("bias_pct") == 25.0)
    assert(o.getAs[Double]("pct_over") == 0.0)
    assert(o.getAs[Double]("pct_under") == 100.0)
    // all errors positive → R+ takes the whole rank mass → W = 0
    assert(o.getAs[Double]("wilcoxon_w") == 0.0)
    // t = 2.5/(1.1471/√20), rounded pipeline value
    assert(math.abs(o.getAs[Double]("t_stat") - 9.7473) < 0.01)
    assert(o.getAs[String]("severity") == "High")
    assert(o.getAs[String]("direction") == "Underestimate")
    assert(o.getAs[Int]("sig_flag") == 1)
  }

  test("dimension rows: per-segment gate and max-bias marker") {
    val d = report().filter(col("section") === "dimension" &&
      col("dimension") === "flag").collect()
      .map(r0 => r0.getAs[String]("segment") -> r0).toMap
    assert(d("A").getAs[Double]("mean_bias") == 1.5)
    assert(d("B").getAs[Double]("mean_bias") == 3.5)
    // |mean| > 2·std/√n holds for both planted segments
    assert(d("A").getAs[Int]("sig_flag") == 1)
    assert(d("B").getAs[Int]("sig_flag") == 1)
    assert(d("A").getAs[Int]("is_max_segment") == 0)
    assert(d("B").getAs[Int]("is_max_segment") == 1)
    val months = report().filter(col("section") === "dimension" &&
      col("dimension") === "month").orderBy("segment")
      .select("segment", "mean_bias").as[(String, Double)].collect()
    assert(months.map(_._2).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("trend row: exact staircase regression") {
    val t = report().filter(col("section") === "trend").collect().head
    assert(t.getAs[Long]("n_rows") == 4L)
    assert(t.getAs[Double]("trend_slope") == 1.0)
    assert(t.getAs[Double]("trend_r2") == 1.0)
  }

  test("degenerate: constant zero error yields Low severity, no tests fire") {
    val clean = (1 to 20).map(i => ("g", "A", "2022-01", 10.0, 10.0))
    val o = BiasAnalysis.systematicBias(clean.toDF("g", "flag", "month", "a", "p"),
      Seq("g"), Seq("flag" -> col("flag")), col("a"), col("p"))
      .filter(col("section") === "overall").collect().head
    assert(o.getAs[Double]("mean_bias") == 0.0)
    assert(o.getAs[String]("severity") == "Low")
    assert(o.getAs[Int]("sig_flag") == 0)
    // zero errors all drop from the signed-rank sample → null W
    assert(o.isNullAt(o.fieldIndex("wilcoxon_w")))
    // std = 0 → t suppressed
    assert(o.isNullAt(o.fieldIndex("t_stat")))
  }
}
