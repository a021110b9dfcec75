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

  test("volumePatterns: hand-computed segment profiles and summary") {
    // a = 1..30: quantile cuts at 10.57/20.43 → Small 1-10 (e=0.5),
    // Medium 11-20 (e=1), Large 21-30 (e=5). WMAPEs: 9.0909 / 6.4516 /
    // 19.6078 → best Medium, worst Large, range 13.1562 → significant;
    // Large > 1.2×Small → large_struggles
    val rows = (1 to 30).map { a =>
      val e = if (a <= 10) 0.5 else if (a <= 20) 1.0 else 5.0
      ("g", a.toDouble, a - e)
    }
    val out = BiasAnalysis.volumePatterns(rows.toDF("g", "a", "p"), Seq("g"),
      col("a"), col("p")).collect()
      .map(r0 => r0.getAs[String]("volume_segment") -> r0).toMap
    assert(out.keySet == Set("Small", "Medium", "Large"))
    val s = out("Small"); val m = out("Medium"); val l = out("Large")
    assert(s.getAs[Long]("n_rows") == 10L && s.getAs[Double]("volume_max") == 10.0)
    assert(s.getAs[Double]("wmape") == 9.0909)
    assert(m.getAs[Double]("wmape") == 6.4516)
    assert(l.getAs[Double]("wmape") == 19.6078)
    assert(s.getAs[Double]("bias") == 0.5)
    assert(l.getAs[Double]("underestimate_pct") == 100.0)
    Seq(s, m, l).foreach { r0 =>
      assert(r0.getAs[String]("best_segment") == "Medium")
      assert(r0.getAs[String]("worst_segment") == "Large")
      assert(r0.getAs[Double]("wmape_range") == 13.1562)
      assert(r0.getAs[Int]("sig_volume_diff") == 1)
      assert(r0.getAs[Int]("small_struggles") == 0)
      assert(r0.getAs[Int]("large_struggles") == 1)
    }
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

  test("degenerate: all-zero errors with EMPTY groupCols keep the overall row") {
    // empty groupCols takes the crossJoin(wilcox) branch; with every
    // error zero the signed-rank sample is empty, but the global
    // aggregate still emits its one row (SQL global-agg semantics), so
    // the overall row must survive with a NULL W — regression pin for
    // the r10 review finding
    val clean = (1 to 20).map(i => ("A", "2022-01", 10.0, 10.0))
    val out = BiasAnalysis.systematicBias(clean.toDF("flag", "month", "a", "p"),
      Seq.empty, Seq("flag" -> col("flag")), col("a"), col("p"))
      .filter(col("section") === "overall").collect()
    assert(out.length == 1)
    val o = out.head
    assert(o.getAs[Double]("mean_bias") == 0.0)
    assert(o.isNullAt(o.fieldIndex("wilcoxon_w")))
  }
}
