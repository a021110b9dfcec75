package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Funcs.r

/** Benford first-digit profile — the classic bulk-amount fraud /
  * data-fabrication screen (the data-quality family's statistical
  * cousin to the rule report): naturally-occurring monetary amounts
  * follow `P(d) = log10(1 + 1/d)`; a profile that deviates flags
  * synthetic or manipulated figures. Emits one row per leading digit
  * with the observed share, the Benford expectation, and the χ²
  * contribution (`n_total·(obs−exp)²/exp` — sum the column for the
  * test statistic).
  *
  * The leading digit comes from the DECIMAL STRING of the integerized
  * amount (value·10^scale rounded to a long, first character) — not
  * from `floor(log10 x)`, whose libm rounding can misbin exact powers
  * of ten differently per engine. Integer-to-string is engine-stable,
  * codegen'd, and shuffle-free; the profile is one 9-row aggregate.
  */
object Benford {

  /** @param scale decimal places to integerize first (2 for currency).
    *              Non-positive amounts are excluded (Benford is
    *              defined on positive magnitudes). */
  def firstDigitProfile(df: DataFrame, value: Column, scale: Int = 2): DataFrame = {
    val cents = graft.expr.RoundHalfUpExpr.column(value * math.pow(10, scale)).cast("long")
    // ≤9-row grain; checkpointing pins it so the total and the output
    // both read it — ONE scan of the fact
    val digits = df.select(cents.as("__c")).filter(col("__c") > 0)
      .select(substring(col("__c").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val total = digits.agg(sum(col("n")).as("__t"))
    digits.crossJoin(broadcast(total))
      .withColumn("share", col("n") / col("__t"))
      .withColumn("expected", log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      .select(col("digit"), col("n"), r(col("share")).as("share"),
        r(col("expected")).as("expected"),
        r(col("__t") * (col("share") - col("expected")) *
          (col("share") - col("expected")) / col("expected")).as("chi2_contrib"))
  }
}
