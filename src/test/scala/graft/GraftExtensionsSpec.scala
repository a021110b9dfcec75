package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** The cluster-deployment surface of `spark.sql.extensions=
  * graft.GraftExtensions`. The conf is STATIC — it only takes effect
  * when the SparkContext itself is built with it — so this suite
  * probes exactly what the extension injects at session construction
  * (via the bridge) and pins that the live-session seams install the
  * SAME rule and strategy objects, whose behaviors the
  * RangeJoinRewriteSpec / AsOfJoinNativeSpec suites drive end to end. */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val probe =
    GraftSqlBridge.probeExtensions(spark, new GraftExtensions()(_))

  test("injects exactly the conf-gated band-join rewrite and the as-of " +
    "SQL-marker rewrite") {
    val (rules, _, _) = probe
    assert(rules == Seq(graft.plans.ConfRangeJoinRewrite,
      graft.plans.AsOfJoinRewrite), rules)
  }

  test("injects exactly the as-of planner strategy") {
    val (_, strategies, _) = probe
    assert(strategies == Seq(graft.plans.AsOfJoinStrategy), strategies)
  }

  test("registers every GraftFunctions descriptor (and nothing else)") {
    val (_, _, names) = probe
    assert(names.toSet == GraftFunctions.descriptors.map(_._1.funcName).toSet,
      names)
    assert(names.contains("graft_dot") && names.contains("graft_topk"), names)
  }

  test("the live-session seams install the same objects the conf would") {
    graft.plans.GraftPlans.install(spark)
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    assert(cs.experimental.extraOptimizations
      .exists(_ eq graft.plans.ConfRangeJoinRewrite))
    // asOfNative registers the strategy on first use
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 90L, 1.5)).toDF("k", "t", "v")
    graft.operators.AsOfJoin.asOfNative(l, r, Seq("k"), "t", "t", Seq("v")).count()
    assert(cs.experimental.extraStrategies
      .exists(_ eq graft.plans.AsOfJoinStrategy))
  }
}
