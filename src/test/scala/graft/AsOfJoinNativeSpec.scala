package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** The native as-of join physical operator
  * ([[graft.plans.AsOfJoinExec]]): row-for-row parity with the
  * union-and-carry form across directions/strictness/tolerance, the
  * SQL NULL semantics it adds, edge cases (ties, dry sides, multiple
  * keys), and the merge-join plan shape it exists for. */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  /** purchases: multiple per user, exact-tie times, a user with no
    * clicks, times before any click. */
  private def purchases = Seq(
    (1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 10L, ts(200)),
    (4L, 20L, ts(50)), (5L, 20L, ts(500)),
    (6L, 30L, ts(300)), // user 30 has no clicks
    (7L, 10L, ts(99))   // before user 10's first click
    ).toDF("event_id", "user_id", "pts")

  /** clicks: tie with a purchase at ts=100/200, dense run for user 20. */
  private def clicks = Seq(
    (101L, 10L, ts(100), 1.5), (102L, 10L, ts(150), 2.5),
    (103L, 10L, ts(200), 3.5), (104L, 10L, ts(250), 4.5),
    (105L, 20L, ts(100), 5.5), (106L, 20L, ts(400), 6.5),
    (107L, 20L, ts(450), 7.5), (108L, 40L, ts(10), 8.5) // user only on right
    ).toDF("click_id", "user_id", "cts", "v")

  private def run(native: Boolean, inclusive: Boolean, forward: Boolean,
                  tol: Option[Double] = None): DataFrame = {
    val f = if (native) AsOfJoin.asOfNative _ else AsOfJoin.asOf _
    f(purchases, clicks, Seq("user_id"), "pts", "cts", Seq("click_id", "v"),
      inclusive, forward, tol.map(lit(_)))
  }

  private def rows(df: DataFrame): Set[(Long, Option[Long], Option[Double])] =
    df.select(col("event_id"), col("asof_click_id"), col("asof_v"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

  test("parity with the compositional form: all strictness/direction mixes") {
    for (inc <- Seq(true, false); fwd <- Seq(true, false)) {
      val (n, c) = (run(native = true, inc, fwd), run(native = false, inc, fwd))
      assert(n.columns.toSeq == c.columns.toSeq, s"inc=$inc fwd=$fwd")
      assert(rows(n) == rows(c), s"inc=$inc fwd=$fwd")
    }
  }

  test("parity under tolerance (micros-exact bound, payload nulled out)") {
    for (fwd <- Seq(true, false); tol <- Seq(50.0, 149.0, 150.0))
      assert(rows(run(native = true, inclusive = true, fwd, Some(tol))) ==
        rows(run(native = false, inclusive = true, fwd, Some(tol))),
        s"fwd=$fwd tol=$tol")
  }

  test("backward inclusive picks the exact-tie row; strict picks the prior one") {
    val inc = rows(run(native = true, inclusive = true, forward = false))
    assert(inc.contains((1L, Some(101L), Some(1.5)))) // tie at ts=100 matches
    assert(inc.contains((2L, Some(103L), Some(3.5))))
    assert(inc.contains((6L, None, None)))            // user 30: no clicks
    assert(inc.contains((7L, None, None)))            // before first click
    val strict = rows(run(native = true, inclusive = false, forward = false))
    assert(strict.contains((1L, None, None)))          // tie excluded
    assert(strict.contains((2L, Some(102L), Some(2.5)))) // falls back to ts=150
  }

  test("forward finds the next click; right-only keys never surface") {
    val fwd = rows(run(native = true, inclusive = true, forward = true))
    assert(fwd.contains((4L, Some(105L), Some(5.5)))) // user 20: next at ts=100
    assert(fwd.contains((5L, None, None)))            // nothing after ts=500
    assert(fwd.size == purchases.count())             // left-outer: one row per left
  }

  test("SQL NULL semantics: null keys and null times never match") {
    val l = Seq((1L, Option(10L), Option(ts(100))),
      (2L, Option.empty[Long], Option(ts(100))),
      (3L, Option(10L), Option.empty[Timestamp])).toDF("event_id", "user_id", "pts")
    val r = Seq((Option(10L), Option(ts(50)), 1.0),
      (Option(10L), Option.empty[Timestamp], 99.0), // null time: skipped
      (Option.empty[Long], Option(ts(60)), 98.0))   // null key: skipped
      .toDF("user_id", "cts", "v")
    val out = AsOfJoin.asOfNative(l, r, Seq("user_id"), "pts", "cts", Seq("v"))
      .select(col("event_id"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toSet
    assert(out == Set((1L, Some(1.0)), (2L, None), (3L, None)))
  }

  test("multiple equi keys") {
    val l = Seq((1L, "a", 1L, 100L), (2L, "a", 2L, 100L), (3L, "b", 1L, 100L))
      .toDF("id", "k1", "k2", "t")
    val r = Seq(("a", 1L, 90L, 1.0), ("a", 2L, 95L, 2.0), ("b", 2L, 80L, 3.0))
      .toDF("k1", "k2", "t", "v")
    val out = AsOfJoin.asOfNative(l, r, Seq("k1", "k2"), "t", "t", Seq("v"))
      .select(col("id"), col("asof_v")).as[(Long, Option[Double])].collect().toSet
    assert(out == Set((1L, Some(1.0)), (2L, Some(2.0)), (3L, None)))
  }

  test("empty right side: all-null payload, one row per left row") {
    val out = AsOfJoin.asOfNative(purchases, clicks.filter(lit(false)),
      Seq("user_id"), "pts", "cts", Seq("click_id", "v"))
    assert(out.count() == purchases.count())
    assert(out.filter(col("asof_t").isNotNull).count() == 0)
  }

  test("numeric (non-timestamp) time columns work") {
    val l = Seq((1L, 10L, 5.5), (2L, 10L, 9.0)).toDF("id", "k", "t")
    val r = Seq((10L, 5.0, 1.0), (10L, 8.5, 2.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asOfNative(l, r, Seq("k"), "t", "t", Seq("v"))
      .select(col("id"), col("asof_v")).as[(Long, Option[Double])].collect().toSet
    assert(out == Set((1L, Some(1.0)), (2L, Some(2.0))))
  }

  test("plan shape: merge pass over two narrow sorts, no nested loop") {
    val plan = run(native = true, inclusive = true, forward = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan) // the union-form's operator is gone
    // each side sorted (keys, time) — two Sort nodes feed the exec
    assert("(?s)Sort .*AsOfJoin|AsOfJoin.*Sort ".r.findFirstIn(plan).isDefined, plan)
  }

  test("randomized parity with the compositional form (explicit-seed scalacheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def gen[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // few keys → dense per-key series; right times deduped per key so
    // the matched row is unique and both forms must agree exactly
    val leftGen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(0L, 500L)))
    val rightGen = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(1L, 6L), Gen.chooseNum(0L, 500L),
        Gen.chooseNum(-100.0, 100.0)))
    for (seed <- 0 until 6; inc <- Seq(true, false); fwd <- Seq(true, false)) {
      val lRows = gen(leftGen, seed.toLong).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
      val rRows = gen(rightGen, 1000L + seed)
        .groupBy(r => (r._1, r._2)).map(_._2.head) // unique (key, time)
        .zipWithIndex.map { case ((k, t, v), i) => (2000L + i, k, ts(t), v) }.toSeq
      val l = lRows.toDF("event_id", "user_id", "pts").repartition(5)
      val r = rRows.toDF("click_id", "user_id", "cts", "v").repartition(3)
      val n = AsOfJoin.asOfNative(l, r, Seq("user_id"), "pts", "cts",
        Seq("click_id", "v"), inc, fwd, None)
      val c = AsOfJoin.asOf(l, r, Seq("user_id"), "pts", "cts",
        Seq("click_id", "v"), inc, fwd, None)
      assert(rows(n) == rows(c), s"seed=$seed inc=$inc fwd=$fwd")
    }
  }

  test("skewed hot key: one key holding most right rows stays linear and exact") {
    // skew lands in ONE partition's merge pass — O(1) state, a linear
    // scan, never a pair blow-up; the match for each left row is the
    // greatest click time <= purchase time, verifiable in closed form
    val hotClicks = (0 until 20000).map(i => (3000L + i, 1L, ts(2L * i), i * 1.0))
    val coldClicks = Seq((90001L, 2L, ts(500), -1.0))
    val r = (hotClicks ++ coldClicks).toDF("click_id", "user_id", "cts", "v")
    val l = (0 until 50).map(i => (i.toLong, 1L, ts(1000L * i + 1)))
      .toDF("event_id", "user_id", "pts")
    val out = AsOfJoin.asOfNative(l, r, Seq("user_id"), "pts", "cts", Seq("click_id"))
      .select(col("event_id"), col("asof_click_id"))
      .as[(Long, Option[Long])].collect().toMap
    (0 until 50).foreach { i =>
      // greatest 2k <= 1000i + 1 → k = min((1000i + 1) / 2, 19999)
      val k = math.min((1000L * i + 1) / 2, 19999L)
      assert(out(i.toLong) == Some(3000L + k), s"i=$i")
    }
  }

  test("strategy registration is idempotent") {
    AsOfJoin.asOfNative(purchases, clicks, Seq("user_id"), "pts", "cts", Seq("v"))
    val n = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraStrategies
      .count(_ eq graft.plans.AsOfJoinStrategy)
    assert(n == 1)
  }

  test("double equi keys: -0.0 matches 0.0 and NaN matches NaN (SQL " +
    "equality via NormalizeFloatingNumbers on the custom node's keys)") {
    // built-in joins normalize float keys through the
    // NormalizeFloatingNumbers rule; that rule only matches built-in
    // nodes, so the strategy normalizes the custom node's keys itself
    val l = Seq((1L, -0.0, 10L), (2L, Double.NaN, 10L))
      .toDF("event_id", "fkey", "t")
    val r = Seq((0.0, 5L, 1.5), (Double.NaN, 5L, 2.5))
      .toDF("fkey", "t", "v")
    val out = AsOfJoin.asOfNative(l, r, Seq("fkey"), "t", "t", Seq("v"))
      .select(col("event_id"), col("asof_v"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(1.5), "-0.0 left key must match the 0.0 right key")
    assert(out(2L) == Some(2.5), "NaN left key must match the NaN right key")
  }

  test("reserved output names collide loudly, not silently") {
    val badLeft = purchases.withColumn("asof_v", lit(1))
    val eNative = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(badLeft, clicks, Seq("user_id"), "pts", "cts", Seq("v"))
    }
    assert(eNative.getMessage.contains("asof_v"))
    val eUnion = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(badLeft, clicks, Seq("user_id"), "pts", "cts", Seq("v"))
    }
    assert(eUnion.getMessage.contains("asof_v"))
    // a payload named "t" would render to asof_t, colliding with the
    // matched-time alias — rejected up front
    val eDup = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(purchases, clicks.withColumnRenamed("v", "t"),
        Seq("user_id"), "pts", "cts", Seq("t"))
    }
    assert(eDup.getMessage.contains("asof_t"))
  }
}
