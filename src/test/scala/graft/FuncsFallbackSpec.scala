package graft

import org.apache.spark.sql.functions._
import graft.functions.Funcs

/** r17 verdict asks #7/#8: (a) the guarded exact-long sums and the
  * decimal(38,0) twins they replaced must agree bit-for-bit on every
  * in-bound input INCLUDING the pathological non-finite edge
  * (NaN/±Inf → NULL-skip under both accumulators — before r18 an ±Inf
  * saturated the long cast and raise_error'd where decimal silently
  * skipped), and (b) `spark.graft.exactLongSums=false` must route every
  * micro-sum entry point back through the decimal twins so a magnitude
  * regime past the 2^62 group bound has a one-conf recovery instead of
  * a code edit (the exactPercentiles pattern). */
class FuncsFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private val adversarial = Seq(
    ("a", 1.2345), ("a", -2.5), ("a", Double.NaN),
    ("a", Double.PositiveInfinity), ("a", Double.NegativeInfinity),
    ("b", 0.0), ("b", -0.00005), ("b", 1234.5678),
    ("c", Double.NaN), ("c", Double.PositiveInfinity))

  private def sums(df: org.apache.spark.sql.DataFrame) = df
    .groupBy($"k")
    .agg(Funcs.microSum($"v").as("s"), Funcs.microMean($"v").as("m"),
      Funcs.microSumSq($"v").as("sq"),
      Funcs.microSumScaled($"v", 1e6).as("ss"),
      Funcs.microSumProd($"v", 1e4, $"v" * 2, 1e4).as("sp"),
      Funcs.microSumPre(
        graft.expr.RoundHalfUpExpr.column($"v" * lit(1e4)), 1e4).as("pre"))
    .orderBy($"k")
    .collect().map(r => r.toSeq.map(x => Option(x))).toSeq

  test("guarded-long and decimal twins agree on the NaN/±Inf adversarial frame") {
    val df = adversarial.toDF("k", "v")
    val fast = sums(df) // default: exact longs
    val slow = withConf(Funcs.ExactLongSumsConf, "false")(sums(df))
    assert(fast == slow)
    // and the non-finite rows are SKIPPED, not raised: group c is all
    // non-finite, so every statistic is NULL (mean divides a NULL sum)
    val cRow = fast.last
    assert(cRow.drop(1).forall(_.isEmpty), s"expected all-NULL stats for group c, got $cRow")
    // group a sums only its finite values: 1.2345 - 2.5 = -1.2655
    val aRow = fast.head
    assert(aRow(1).contains(-1.2655))
  }

  test("in-bound grid data is bit-identical across the conf (window twin included)") {
    val df = Seq(("x", 1, 10.5), ("x", 2, -3.25), ("x", 3, 0.0002),
      ("y", 1, 99999.9999), ("y", 2, 0.0001)).toDF("k", "i", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"k")
    def all(df: org.apache.spark.sql.DataFrame) = {
      val q = graft.expr.RoundHalfUpExpr.column($"v" * lit(1e4)).cast("long")
      df.withColumn("ws", Funcs.guardedLongSumOver(q, 1e4, w, "spec"))
        .groupBy($"k")
        .agg(Funcs.microSum($"v").as("s"), Funcs.microSumSq($"v").as("sq"),
          max($"ws").as("ws"))
        .orderBy($"k").collect().map(_.toSeq).toSeq
    }
    val fast = all(df)
    val slow = withConf(Funcs.ExactLongSumsConf, "false")(all(df))
    assert(fast == slow)
    assert(fast.head(1) == 7.2502) // 10.5 - 3.25 + 0.0002, exactly
  }

  test("decimal fallback admits a regime the long guard raises on") {
    // n·max|v| ≥ 2^62: two rows at 4.6e14 on the 1e-4 grid → micro-ints
    // at 4.6e18, pairwise sum crosses 2^62. The guarded path must raise
    // loudly; the conf fallback must return the exact decimal sum.
    val df = Seq(("g", 4.6e14), ("g", 4.6e14)).toDF("k", "v")
    // the conf is read when the aggregation COLUMN is built (driver-side
    // plan construction), not at execution — rebuild inside the toggle
    def agg = df.groupBy($"k").agg(Funcs.microSum($"v").as("s"))
    val e = intercept[Exception](agg.collect())
    assert(e.getMessage != null || e.getCause != null) // raise_error surfaced
    val slow = withConf(Funcs.ExactLongSumsConf, "false")(
      agg.collect().head.getDouble(1))
    assert(slow == 9.2e14)
  }
}
