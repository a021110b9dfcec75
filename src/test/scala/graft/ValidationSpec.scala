package graft

import org.apache.spark.sql.functions._
import graft.metrics.Validation

/** Contracts for the validation check suite (reference
  * model_validator.py): each check's PASSED/WARNING/FAILED ladder on
  * planted inputs, the reference's degenerate-kurtosis convention, and
  * the business/data-quality issue counters. */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Int, Double, Double)]) =
    Validation.validateModel(rows.toDF("g", "t", "a", "p"), Seq("g"),
      col("a"), col("p"), Seq(col("t")))
      .collect().map(r0 => r0.getAs[String]("check_name") -> r0).toMap

  test("clean predictions pass every check") {
    // 40 rows, tiny period-4 error pattern (wmape 2%, balanced signs →
    // bias 0, lag-1 autocorr ≈ −0.026 under the 0.3 gate), positive preds
    val rows = (1 to 40).map(i =>
      ("g", i, 100.0, 100.0 + (if ((i / 2) % 2 == 0) 2.0 else -2.0)))
    val out = run(rows)
    assert(out.size == 5)
    Seq("accuracy_check", "bias_check", "residual_analysis",
      "business_rules", "data_quality").foreach { c =>
      assert(out(c).getAs[String]("result") == "PASSED", c)
      assert(out(c).getAs[Int]("n_issues") == 0, c)
    }
    assert(out("accuracy_check").getAs[Double]("wmape") == 0.02)
    assert(out("bias_check").getAs[Double]("bias") == 0.0)
  }

  test("accuracy ladder: marginal WMAPE warns, poor fails") {
    // wmape 0.22 ∈ (0.20, 0.24] → WARNING
    val warn = run((1 to 40).map(i => ("g", i, 100.0,
      100.0 + (if (i % 2 == 0) 22.0 else -22.0))))
    assert(warn("accuracy_check").getAs[String]("result") == "WARNING")
    // wmape 0.5 → FAILED
    val fail = run((1 to 40).map(i => ("g", i, 100.0,
      100.0 + (if (i % 2 == 0) 50.0 else -50.0))))
    assert(fail("accuracy_check").getAs[String]("result") == "FAILED")
  }

  test("bias ladder: one-sided error trips the 10% and 15% gates") {
    // all predictions 12% high → bias 0.12 → WARNING
    val warn = run((1 to 40).map(i => ("g", i, 100.0, 112.0)))
    assert(warn("bias_check").getAs[Double]("bias") == 0.12)
    assert(warn("bias_check").getAs[String]("result") == "WARNING")
    // 20% high → FAILED
    val fail = run((1 to 40).map(i => ("g", i, 100.0, 120.0)))
    assert(fail("bias_check").getAs[String]("result") == "FAILED")
  }

  test("residual analysis: a planted outlier burst drives kurtosis") {
    // one huge residual among near-zeros → heavy tails (kurtosis ≫ 7)
    // and strong skew → two issues → FAILED
    val rows = (1 to 40).map(i => ("g", i, 100.0,
      if (i == 20) 500.0 else 100.0 + (i % 3) * 0.01))
    val out = run(rows)
    val rr = out("residual_analysis")
    assert(math.abs(rr.getAs[Double]("kurtosis")) > 7)
    assert(math.abs(rr.getAs[Double]("skewness")) > 2)
    assert(rr.getAs[Int]("n_issues") >= 2)
    assert(rr.getAs[String]("result") == "FAILED")
  }

  test("constant residuals: reference degenerate conventions") {
    // identical rows → zero residual variance → skew 0, the reference's
    // kurtosis-3.0 convention, autocorr degenerate → no issues
    val out = run((1 to 40).map(i => ("g", i, 100.0, 90.0)))
    val rr = out("residual_analysis")
    assert(rr.getAs[Double]("skewness") == 0.0)
    assert(rr.getAs[Double]("kurtosis") == 3.0)
    assert(rr.getAs[String]("result") == "PASSED")
  }

  test("business rules: negative and extreme predictions count") {
    // 2 negative predictions + >1% of rows beyond 3·q99 → 2 issues →
    // WARNING (the reference's ≤2 branch)
    val rows = (1 to 100).map { i =>
      val p = if (i <= 2) -5.0 else if (i <= 5) 1000.0 else 100.0
      ("g", i, 100.0, p)
    }
    val out = run(rows)
    val br = out("business_rules")
    assert(br.getAs[Long]("n_negative") == 2L)
    assert(br.getAs[Long]("n_extreme") == 3L)
    assert(br.getAs[Int]("n_issues") == 2)
    assert(br.getAs[String]("result") == "WARNING")
  }

  test("data quality: short series and constant predictions warn/fail") {
    // 10 rows (< 30) with constant predictions → 2 issues → FAILED
    val out = run((1 to 10).map(i => ("g", i, 100.0 + i, 50.0)))
    val dq = out("data_quality")
    assert(dq.getAs[Int]("n_issues") == 2)
    assert(dq.getAs[String]("result") == "FAILED")
    // 10 varying-prediction rows → only the size issue → WARNING
    val out2 = run((1 to 10).map(i => ("g", i, 100.0 + i, 50.0 + i)))
    assert(out2("data_quality").getAs[Int]("n_issues") == 1)
    assert(out2("data_quality").getAs[String]("result") == "WARNING")
  }
}
