package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinRewrite

/** The SQL surface of the native as-of join: the `graft_asof`
  * ON-clause marker + [[graft.plans.AsOfJoinRewrite]] — pure-SQL users
  * reach [[graft.plans.AsOfJoinExec]] without the Scala DSL (r12
  * verdict ask #6). Round-trips against asOfNative, both join types,
  * both directions/strictness, and the guards that refuse ambiguous
  * shapes. */
class AsOfSqlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private lazy val installed: Unit = {
    AsOfJoinRewrite.installSql(spark)
    Seq((1L, 10L, ts(100)), (2L, 10L, ts(200)), (3L, 10L, ts(200)),
      (4L, 20L, ts(50)), (5L, 20L, ts(500)), (6L, 30L, ts(300)),
      (7L, 10L, ts(99)))
      .toDF("event_id", "user_id", "pts").createOrReplaceTempView("asof_l")
    Seq((101L, 10L, ts(100), 1.5), (102L, 10L, ts(150), 2.5),
      (103L, 10L, ts(200), 3.5), (104L, 10L, ts(250), 4.5),
      (105L, 20L, ts(100), 5.5), (106L, 20L, ts(400), 6.5),
      (107L, 20L, ts(450), 7.5), (108L, 40L, ts(10), 8.5))
      .toDF("click_id", "user_id", "cts", "v").createOrReplaceTempView("asof_r")
  }

  private def dslRows(inclusive: Boolean, forward: Boolean) =
    AsOfJoin.asOfNative(spark.table("asof_l"), spark.table("asof_r"),
      Seq("user_id"), "pts", "cts", Seq("click_id", "v"), inclusive, forward)
      .select(col("event_id"), col("asof_click_id"), col("asof_v"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

  test("LEFT JOIN ... ON key = key AND graft_asof(lt, rt) round-trips " +
    "the DSL across strictness/direction, through AsOfJoinExec") {
    installed
    for (inc <- Seq(true, false); fwd <- Seq(true, false)) {
      val sql = spark.sql(
        s"""SELECT l.event_id, r.click_id AS asof_click_id, r.v AS asof_v
           FROM asof_l l LEFT JOIN asof_r r
             ON l.user_id = r.user_id AND graft_asof(l.pts, r.cts, $inc, $fwd)""")
      assert(sql.queryExecution.executedPlan.toString.contains("AsOfJoin"),
        s"inc=$inc fwd=$fwd must plan through AsOfJoinExec")
      val got = sql.as[(Long, Option[Long], Option[Double])].collect().toSet
      assert(got == dslRows(inc, fwd), s"inc=$inc fwd=$fwd")
    }
  }

  test("INNER JOIN keeps matched rows only (exact post-filter on the " +
    "matched right time)") {
    installed
    val sql = spark.sql(
      """SELECT l.event_id, r.click_id AS asof_click_id, r.v AS asof_v
         FROM asof_l l JOIN asof_r r
           ON l.user_id = r.user_id AND graft_asof(l.pts, r.cts)""")
    assert(sql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = sql.as[(Long, Long, Double)].collect().toSet
    val expected = dslRows(inclusive = true, forward = false)
      .collect { case (id, Some(c), Some(v)) => (id, c, v) }
    assert(got == expected)
  }

  test("INNER JOIN post-filter survives non-nullable time columns " +
    "(NullPropagation must not fold it away)") {
    installed
    // primitive toDF columns are NON-nullable; the rewrite's IsNotNull
    // post-filter must be built against the as-of node's nullable
    // output, or NullPropagation folds it to TRUE in the same
    // fixed-point batch and INNER silently degrades to LEFT
    Seq((1L, 10L, 100L), (2L, 20L, 100L), (3L, 10L, 40L))
      .toDF("event_id", "user_id", "pts").createOrReplaceTempView("asof_lnn")
    Seq((101L, 10L, 50L, 1.5))
      .toDF("click_id", "user_id", "cts", "v").createOrReplaceTempView("asof_rnn")
    val sql = spark.sql(
      """SELECT l.event_id, r.v AS asof_v FROM asof_lnn l JOIN asof_rnn r
         ON l.user_id = r.user_id AND graft_asof(l.pts, r.cts)""")
    assert(sql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    // event 2's key has no right rows and event 3 precedes every right
    // row — inner semantics must drop BOTH
    assert(sql.as[(Long, Double)].collect().toSet == Set((1L, 1.5)))
  }

  test("time args written in either order orient themselves") {
    installed
    val a = spark.sql(
      """SELECT l.event_id, r.v AS asof_v FROM asof_l l LEFT JOIN asof_r r
         ON l.user_id = r.user_id AND graft_asof(l.pts, r.cts)""")
    val b = spark.sql(
      """SELECT l.event_id, r.v AS asof_v FROM asof_l l LEFT JOIN asof_r r
         ON l.user_id = r.user_id AND graft_asof(r.cts, l.pts)""")
    assert(a.collect().toSet == b.collect().toSet)
    assert(b.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("guards: shapes the rule refuses fail loudly instead of silently " +
    "rewriting") {
    installed
    // no equi key — not rewritable, and the unevaluable marker then
    // fails the naive plan with a clear error
    val noKey = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_l l LEFT JOIN asof_r r
           ON graft_asof(l.pts, r.cts)""").collect()
    }
    assert(noKey.getMessage.toLowerCase.contains("graft_asof")
      || noKey.getMessage.contains("Unevaluable")
      || noKey.getMessage.contains("cannot evaluate"), noKey.getMessage)
    // marker nested under OR stays unrewritten too
    val nested = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_l l LEFT JOIN asof_r r
           ON l.user_id = r.user_id
             AND (graft_asof(l.pts, r.cts) OR l.event_id = 1)""").collect()
    }
    assert(nested.getMessage.toLowerCase.contains("graft_asof")
      || nested.getMessage.contains("Unevaluable")
      || nested.getMessage.contains("cannot evaluate"), nested.getMessage)
    // non-literal inclusive flag is rejected at the function builder
    val badFlag = intercept[Exception] {
      spark.sql(
        """SELECT * FROM asof_l l LEFT JOIN asof_r r
           ON l.user_id = r.user_id
             AND graft_asof(l.pts, r.cts, l.event_id = 1)""").collect()
    }
    assert(badFlag.getMessage.contains("boolean literal"), badFlag.getMessage)
  }

  test("the static-conf injection surface carries the rewrite and the marker") {
    val (rules, strategies, fns) =
      org.apache.spark.sql.GraftSqlBridge.probeExtensions(spark,
        new GraftExtensions()(_))
    assert(rules.contains(AsOfJoinRewrite))
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
    assert(fns.contains("graft_asof"))
  }
}
