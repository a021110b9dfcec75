package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join node — the whole-operator Catalyst path
  * (custom `LogicalPlan` → `SparkStrategy` → `SparkPlan`) for the
  * operator Spark's own algebra lacks (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`; reference behavior per `src/features/temporal_features
  * .py`-style latest-state attachment).
  *
  * Semantics (left-outer): for each left row, attach `payload` from
  * the single right row with the greatest `rightTime` ≤ `leftTime`
  * (backward; `forward = true` flips to the smallest `rightTime` ≥
  * `leftTime`, `inclusive = false` makes the comparison strict) among
  * right rows whose `rightKeys` equal the left row's `leftKeys`.
  * SQL equality semantics on keys and times: a NULL in any key or in
  * either time never matches (the compositional
  * [[graft.operators.AsOfJoin]] instead groups NULL keys together,
  * window-partition style — the one place the two forms diverge).
  *
  * Why a physical operator when the union-and-carry form already
  * avoids the range join: the union form sorts |L|+|R| rows of the
  * UNIONED schema (every row padded to left-cols + payload struct +
  * tags) and runs a window operator over it. This node sorts each
  * side separately on its own narrow schema and streams a single
  * O(1)-state merge pass per partition — less sort I/O, no window
  * buffer, and each side's exchange is reusable by other consumers of
  * that side's key partitioning. At 100 TB both are shuffle-bound on
  * the key; this one shuffles strictly fewer bytes.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    inclusive: Boolean,
    forward: Boolean) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi key and equal-length key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise (co-partitioning hashes by type)")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")

  /** Left columns pass through; the attached payload is nullable (no
    * match → NULLs), same exprIds so parents resolve against it. */
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsOfJoinPlan]] to [[AsOfJoinExec]].
  * Registered per-session by [[graft.operators.AsOfJoin.asOfNative]]
  * (idempotent, via the experimental-strategies seam) or cluster-wide
  * via `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Float/double equi keys are wrapped in Spark's own floating-point
  * normalization here (the `NormalizeFloatingNumbers` rule only
  * matches built-in Join/Window/Aggregate nodes, so a custom operator
  * must normalize its own keys): without it, -0.0 vs 0.0 and
  * non-canonical NaN key bits compare unequal in the exec's
  * `RowOrdering`/co-partitioning while SQL equality treats them as
  * equal — built-in joins would match, this operator would silently
  * miss. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      import org.apache.spark.sql.GraftSqlBridge.normalizeFloatingNumbers
      AsOfJoinExec(p.leftKeys.map(normalizeFloatingNumbers),
        p.rightKeys.map(normalizeFloatingNumbers), p.leftTime, p.rightTime,
        p.payload, p.inclusive, p.forward,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}
