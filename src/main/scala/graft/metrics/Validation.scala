package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Funcs.{Eps, microSum, microSumProd, microSumSq, nanToNull, pct, r}

/** Model-validation check suite — the engine side of the reference's
  * ModelValidator framework (src/validation/model_validator.py): five
  * named checks per group, each with the reference's PASSED / WARNING /
  * FAILED ladder:
  *
  *   accuracy_check    WMAPE ≤ 0.20 ∧ MAPE ≤ 0.25 → PASSED;
  *                     WMAPE ≤ 0.24 → WARNING; else FAILED (:143-183)
  *   bias_check        |mean((p−a)/a)| ≤ 0.10 / ≤ 0.15 / else (:191-232)
  *   residual_analysis skew/kurtosis/lag-1 autocorr issues
  *                     0 → P, 1 → W, ≥2 → F (:240-297)
  *   business_rules    negative predictions; predictions > 3·q99(actual)
  *                     above 1% of rows; 0 → P, ≤2 → W, else F (:330-391)
  *   data_quality      missing actuals/predictions, n < 30, near-constant
  *                     predictions; 0 → P, 1 → W, ≥2 → F (:409-476)
  *
  * Engine-scope notes: the metadata-driven sub-checks (forecast-horizon
  * bound, expected-seasonality probe) live on driver-side metadata in
  * the reference and are excluded; the CV validator maps to the
  * existing TimeSplits + champion backtest machinery. The reference's
  * degenerate kurtosis returns 3.0 (not 0 excess — model_validator.py:
  * 309-317); replicated faithfully. DELIBERATE DIVERGENCE on the
  * accuracy/bias thresholds: the reference's wmape()/mape() return
  * PERCENTS (0-100) yet its AccuracyValidator compares them to
  * 0.20/0.25/0.10 — so its accuracy and bias checks effectively always
  * FAIL on any real series. This engine reads the thresholds on the
  * fraction scale they evidently intend (wmape ≤ 0.20 = 20%), so
  * PASSED/WARNING/FAILED outcomes intentionally differ from literal
  * reference behavior where the reference's unit bug bites.
  *
  * Determinism: inputs rounded to the 4dp grid; every mean is a ratio
  * of micro-int decimal(38,0) sums; residual power sums quantize r³/r⁴
  * to the 1e-12 grid (identical quantization both engines — exact for
  * |resid| into the thousands, order-independent always); skew /
  * kurtosis / autocorr / bias are rounded BEFORE their threshold
  * compares; q99 is the exact percentile rounded before the 3× gate.
  *
  * Execution shape: ONE window pass over (group, ord) for the lagged
  * residual + whole-partition q99, then ONE hash-aggregate on the same
  * group key computing every sufficient statistic; the five check rows
  * explode from the single wide row — no per-check passes.
  */
object Validation {

  private def microSumP(c: Column, scale: Double): Column =
    sum(graft.expr.RoundHalfUpExpr.column(c * lit(scale)).cast("decimal(38,0)")).cast("double") / lit(scale)

  def validateModel(df: DataFrame, groupCols: Seq[String], actual: Column,
                    pred: Column, ord: Seq[Column],
                    exactPercentile: Option[Boolean] = None): DataFrame = {
    val keys = groupCols.map(col)
    val base = df.select(keys ++ Seq(r(actual).as("__a"), r(pred).as("__p")) ++
      ord.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
      .withColumn("__r", r(col("__a") - col("__p")))
    val w = Window.partitionBy(keys: _*)
      .orderBy(ord.indices.map(i => col(s"__o$i")): _*)
    val wAll = Window.partitionBy(keys: _*)
    val lagged = base
      .withColumn("__rprev", lag(col("__r"), 1).over(w))
      .withColumn("__q99", r(pct(col("__a"), 0.99, exactPercentile).over(wAll)))
    val g = lagged.groupBy(keys: _*).agg(
      count(lit(1)).as("n"),
      // accuracy
      microSum(abs(col("__a") - col("__p"))).as("__sad"),
      microSum(abs(col("__a"))).as("__saa"),
      microSum(r(abs(col("__a") - col("__p")) / (abs(col("__a")) + lit(Eps))))
        .as("__mapesum"),
      // bias over a ≠ 0 (numpy's raw division emits inf on zeros and the
      // reference suppresses the warning; the engine's defined domain is
      // the nonzero-actual rows)
      sum(when(col("__a") =!= 0, 1L).otherwise(0L)).as("__nb"),
      microSum(when(col("__a") =!= 0,
        r((col("__p") - col("__a")) / col("__a"))).otherwise(lit(null)))
        .as("__biassum"),
      // residual power sums
      microSum(col("__r")).as("__s1"),
      microSumSq(col("__r")).as("__s2"),
      microSumP(col("__r") * col("__r") * col("__r"), 1e12).as("__s3"),
      microSumP(col("__r") * col("__r") * col("__r") * col("__r"), 1e12).as("__s4"),
      // lag-1 pairs
      sum(when(col("__rprev").isNotNull, 1L).otherwise(0L)).as("__np"),
      microSum(when(col("__rprev").isNotNull, col("__r")).otherwise(lit(null)))
        .as("__spx"),
      microSum(col("__rprev")).as("__spy"),
      // lag-1 cross product via the shared guarded pairwise-product sum
      // (Funcs.microSumProd — one bound constant, one guard; the r17
      // ADVICE flagged this site as a third inline copy of the 2^62
      // bound). Value-identical to the inline form it replaces: a NULL
      // __rprev nulls the product, which the sum skips exactly like the
      // explicit isNotNull gate did, and the quantization expressions
      // are verbatim. The guard bound differs only in tightness
      // (global max|l1|·count(prod) vs the row-filtered maxima), never
      // in the admitted value.
      microSumProd(col("__r"), 1e4, col("__rprev"), 1e4).as("__spxy"),
      microSumSq(when(col("__rprev").isNotNull, col("__r")).otherwise(lit(null)))
        .as("__spxx"),
      microSumSq(col("__rprev")).as("__spyy"),
      // business rules
      sum(when(col("__p") < 0, 1L).otherwise(0L)).as("__nneg"),
      sum(when(col("__p") > lit(3.0) * col("__q99"), 1L).otherwise(0L))
        .as("__next"),
      // data quality
      sum(when(col("__a").isNull, 1L).otherwise(0L)).as("__missa"),
      sum(when(col("__p").isNull, 1L).otherwise(0L)).as("__missp"),
      microSum(col("__p")).as("__sp"),
      microSumSq(col("__p")).as("__spp"))
    val n = col("n").cast("double")
    // accuracy (fractions, the validator's convention)
    val wmapeC = r(col("__sad") / (col("__saa") + lit(Eps)))
    val mapeC = r(col("__mapesum") / n)
    // bias
    val biasC = r(when(col("__nb") > 0, col("__biassum") / col("__nb")))
    // residual central moments from raw power sums
    val mu = col("__s1") / n
    val m2 = (col("__s2") - lit(2.0) * mu * col("__s1") + n * mu * mu) / n
    val m3 = (col("__s3") - lit(3.0) * mu * col("__s2") +
      lit(3.0) * mu * mu * col("__s1") - n * mu * mu * mu) / n
    val m4 = (col("__s4") - lit(4.0) * mu * col("__s3") +
      lit(6.0) * mu * mu * col("__s2") -
      lit(4.0) * mu * mu * mu * col("__s1") + n * mu * mu * mu * mu) / n
    val sdPop = sqrt(greatest(m2, lit(0.0)))
    val skewC = r(when(col("n") < 3 || sdPop <= 0, lit(0.0))
      .otherwise(m3 / (sdPop * sdPop * sdPop)))
    val kurtC = r(when(col("n") < 4 || sdPop <= 0, lit(3.0))
      .otherwise(m4 / (m2 * m2) - lit(3.0)))
    val acNum = col("__np") * col("__spxy") - col("__spx") * col("__spy")
    val acDen = sqrt(col("__np") * col("__spxx") - col("__spx") * col("__spx")) *
      sqrt(col("__np") * col("__spyy") - col("__spy") * col("__spy"))
    val acC = r(when(col("__np") < 2, lit(0.0))
      .otherwise(nanToNull(acNum / acDen)))
    // predictions-constant gate on the exact population variance
    val predVar = col("__spp") / n - pow(col("__sp") / n, 2)
    val scored = g
      .withColumn("__wmape", wmapeC).withColumn("__mape", mapeC)
      .withColumn("__bias", biasC)
      .withColumn("__skew", skewC).withColumn("__kurt", kurtC)
      .withColumn("__ac", acC)
      .withColumn("__resissues",
        when(abs(col("__skew")) > 2, 1).otherwise(0) +
          when(abs(col("__kurt")) > 7, 1).otherwise(0) +
          when(abs(col("__ac")) > 0.3, 1).otherwise(0))
      .withColumn("__bizissues",
        when(col("__nneg") > 0, 1).otherwise(0) +
          when(col("__next") > n * lit(0.01), 1).otherwise(0))
      .withColumn("__dqissues",
        when(col("__missa") > 0, 1).otherwise(0) +
          when(col("__missp") > 0, 1).otherwise(0) +
          when(col("n") < 30, 1).otherwise(0) +
          when(sqrt(greatest(predVar, lit(0.0))) < lit(1e-6), 1).otherwise(0))
    def nullD = lit(null).cast("double")
    def nullL = lit(null).cast("long")
    def check(name: String, category: String, cols: Map[String, Column],
              issues: Column, result: Column) = struct(
      lit(name).as("check_name"), lit(category).as("category"),
      cols.getOrElse("wmape", nullD).as("wmape"),
      cols.getOrElse("mape", nullD).as("mape"),
      cols.getOrElse("bias", nullD).as("bias"),
      cols.getOrElse("skewness", nullD).as("skewness"),
      cols.getOrElse("kurtosis", nullD).as("kurtosis"),
      cols.getOrElse("autocorr_lag1", nullD).as("autocorr_lag1"),
      cols.getOrElse("n_negative", nullL).as("n_negative"),
      cols.getOrElse("n_extreme", nullL).as("n_extreme"),
      cols.getOrElse("n_missing", nullL).as("n_missing"),
      issues.cast("int").as("n_issues"), result.as("result"))
    val checks = array(
      check("accuracy_check", "statistical",
        Map("wmape" -> col("__wmape"), "mape" -> col("__mape")),
        when(col("__wmape") <= 0.2 && col("__mape") <= 0.25, 0).otherwise(1),
        when(col("__wmape") <= 0.2 && col("__mape") <= 0.25, "PASSED")
          .when(col("__wmape") <= lit(0.2) * lit(1.2), "WARNING")
          .otherwise("FAILED")),
      check("bias_check", "statistical", Map("bias" -> col("__bias")),
        when(abs(col("__bias")) <= 0.1, 0).otherwise(1),
        when(abs(col("__bias")) <= 0.1, "PASSED")
          .when(abs(col("__bias")) <= lit(0.1) * lit(1.5), "WARNING")
          .otherwise("FAILED")),
      check("residual_analysis", "statistical",
        Map("skewness" -> col("__skew"), "kurtosis" -> col("__kurt"),
          "autocorr_lag1" -> col("__ac")),
        col("__resissues"),
        when(col("__resissues") === 0, "PASSED")
          .when(col("__resissues") <= 1, "WARNING").otherwise("FAILED")),
      check("business_rules", "business",
        Map("n_negative" -> col("__nneg"), "n_extreme" -> col("__next")),
        col("__bizissues"),
        when(col("__bizissues") === 0, "PASSED")
          .when(col("__bizissues") <= 2, "WARNING").otherwise("FAILED")),
      check("data_quality", "data_quality",
        Map("n_missing" -> (col("__missa") + col("__missp"))),
        col("__dqissues"),
        when(col("__dqissues") === 0, "PASSED")
          .when(col("__dqissues") <= 1, "WARNING").otherwise("FAILED")))
    scored.select(keys ++ Seq(col("n").cast("long").as("n_rows"),
      explode(checks).as("__c")): _*)
      .select(keys ++ Seq(col("n_rows")) :+ col("__c.*"): _*)
  }
}
