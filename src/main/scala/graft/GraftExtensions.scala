package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{DotProduct, MinHashSigExpr, NfcNormalizeExpr, PolyFingerprintExpr, TopKExpr, TopKPairsExpr}
import org.apache.spark.sql.catalyst.expressions.Literal

/** Session extension registering graft's native Catalyst expressions as
  * SQL-visible functions, its optimizer rules and its planner
  * strategies. Activate cluster-wide with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — a STATIC conf,
  * applied only when the SparkContext is built with it. On an already
  * running session use the live seams instead: [[GraftFunctions
  * .register]], [[graft.plans.GraftPlans.install]] and
  * [[graft.operators.AsOfJoin.asOfNative]] (which self-registers its
  * strategy) — the same objects, verified by `GraftExtensionsSpec`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    // band-join binning, conf-gated (spark.graft.rangeJoin.binSize > 0)
    ext.injectOptimizerRule(_ => graft.plans.ConfRangeJoinRewrite)
    // SQL-surface as-of join: the graft_asof ON-clause marker rewrites
    // the surrounding equi-join into the native as-of node
    ext.injectOptimizerRule(_ => graft.plans.AsOfJoinRewrite)
    // planner strategy for the native as-of join physical operator
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
        DotProduct(children.head, children(1))
      }),
      (
        FunctionIdentifier("graft_poly_fingerprint"),
        new ExpressionInfo(classOf[PolyFingerprintExpr].getName, "graft_poly_fingerprint"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            "graft_poly_fingerprint(text, shingleWidth) takes 2 arguments")
          PolyFingerprintExpr(children.head, intLit(children(1), "shingleWidth"))
        }),
      (
        FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
        (children: Seq[Expression]) => {
          require(children.length == 3,
            "graft_minhash_sig(text, gram, numHashes) takes 3 arguments")
          MinHashSigExpr(children.head,
            intLit(children(1), "gram"), intLit(children(2), "numHashes"))
        }),
      (
        FunctionIdentifier("graft_nfc"),
        new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
        (children: Seq[Expression]) => {
          require(children.length == 1, "graft_nfc(text) takes 1 argument")
          NfcNormalizeExpr(children.head)
        }),
      (
        FunctionIdentifier("graft_topk"),
        new ExpressionInfo(classOf[TopKExpr].getName, "graft_topk"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "graft_topk(value, k) takes 2 arguments")
          TopKExpr(children.head, intLit(children(1), "k")).toAggregateExpression()
        }),
      (
        FunctionIdentifier("graft_topk_pairs"),
        new ExpressionInfo(classOf[TopKPairsExpr].getName, "graft_topk_pairs"),
        (children: Seq[Expression]) => {
          require(children.length == 3,
            "graft_topk_pairs(score, id, k) takes 3 arguments")
          TopKPairsExpr(children.head, children(1), intLit(children(2), "k"))
            .toAggregateExpression()
        }),
      (
        FunctionIdentifier("graft_asof"),
        new ExpressionInfo(classOf[graft.plans.AsOfMarker].getName, "graft_asof"),
        graft.plans.AsOfMarker.build _))

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
