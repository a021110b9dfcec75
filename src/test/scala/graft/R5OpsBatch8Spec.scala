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
}
