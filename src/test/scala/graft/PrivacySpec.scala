package graft

import org.apache.spark.sql.functions._
import graft.etl.Privacy

/** Hand-computed contracts for the k-anonymity governance operators. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // QI = (city, age band); sensitive = diagnosis.
  // class (A,1): 3 rows, 2 diagnoses; class (B,1): 1 row; class (B,2): 2 rows, 1 diagnosis
  private val rows = Seq(
    (1L, "A", 1, "flu"), (2L, "A", 1, "flu"), (3L, "A", 1, "cold"),
    (4L, "B", 1, "flu"),
    (5L, "B", 2, "cold"), (6L, "B", 2, "cold"))
  private def df = rows.toDF("id", "city", "band", "diag")
  private val qi = Seq("city" -> col("city"), "band" -> col("band"))

  test("profile: class sizes, l-diversity, risk and gate flags by hand") {
    val p = Privacy.kAnonymityProfile(df, qi, col("diag"), k = 2, l = 2)
      .orderBy("city", "band")
      .select("city", "band", "class_size", "l_distinct",
        "prosecutor_risk", "below_k", "below_l")
      .as[(String, Int, Long, Long, Double, Boolean, Boolean)].collect().toSeq
    assert(p == Seq(
      ("A", 1, 3L, 2L, 0.3333, false, false),
      ("B", 1, 1L, 1L, 1.0, true, true),
      ("B", 2, 2L, 1L, 0.5, false, true)))
  }

  test("summary: release-gate scorecard aggregates the profile exactly") {
    val s = Privacy.kAnonymitySummary(df, qi, col("diag"), k = 2, l = 2)
      .select("n_classes", "n_rows", "classes_below_k", "rows_below_k",
        "pct_rows_below_k", "classes_below_l", "min_class_size",
        "max_prosecutor_risk")
      .as[(Long, Long, Long, Long, Double, Long, Long, Double)].collect().head
    assert(s == ((3L, 6L, 1L, 1L, 16.6667, 2L, 1L, 1.0)))
  }

  test("suppression drops exactly the below-k classes and keeps null QIs null-safely") {
    val withNull = df.union(Seq((7L, null.asInstanceOf[String], 9, "flu"),
      (8L, null.asInstanceOf[String], 9, "cold")).toDF("id", "city", "band", "diag"))
    val kept = Privacy.suppressBelowK(withNull,
      Seq("c" -> col("city"), "b" -> col("band")), k = 2)
      .select("id").as[Long].collect().toSet
    // class (B,1) is singleton -> id 4 suppressed; the null-city class
    // has 2 members and survives the null-safe join
    assert(kept == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L))
  }

  test("dpRelease: deterministic, keyed, bounded noise; no true values leak") {
    val df = (1 to 300).map(i => (s"g${i % 7}", 1.0 + (i % 5))).toDF("grp", "v")
    def rel = Privacy.dpRelease(df, Seq(("grp", col("grp"))), col("v"),
      eps = 1.0, sensitivity = 5.0)
    val a = rel.orderBy("grp").collect()
    val b = rel.orderBy("grp").collect()
    assert(a.toSeq == b.toSeq) // same key + seed -> same draw, every run
    assert(rel.columns.toSeq == Seq("grp", "dp_count", "dp_sum"))
    val truth = df.groupBy("grp")
      .agg(count(lit(1)).cast("double").as("n"), sum(col("v")).as("s"))
      .orderBy("grp").collect()
    // Laplace(b=1) deviate magnitude is at most ln(M31) ~ 21.5; b=5 scales it
    a.zip(truth).foreach { case (r, t) =>
      assert(r.getString(0) == t.getString(0))
      assert(math.abs(r.getDouble(1) - t.getDouble(1)) < 25.0)
      assert(math.abs(r.getDouble(2) - t.getDouble(2)) < 125.0)
      // noise is real: exact-true releases would defeat the mechanism
      assert(r.getDouble(1) != t.getDouble(1))
    }
    // distinct groups draw distinct noise (keyed, not shared)
    val noises = a.zip(truth).map { case (r, t) => r.getDouble(1) - t.getDouble(1) }
    assert(noises.distinct.length > 1)
  }

  test("dpRelease: a changed seed changes the draw") {
    val df = (1 to 50).map(i => (s"g${i % 3}", 1.0)).toDF("grp", "v")
    val s1 = Privacy.dpRelease(df, Seq(("grp", col("grp"))), col("v"))
      .orderBy("grp").collect().map(_.getDouble(1)).toSeq
    val s2 = Privacy.dpRelease(df, Seq(("grp", col("grp"))), col("v"), seed = 7L)
      .orderBy("grp").collect().map(_.getDouble(1)).toSeq
    assert(s1 != s2)
  }
}
