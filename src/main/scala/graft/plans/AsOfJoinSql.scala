package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

/** SQL-visible as-of join — the parser-level form of
  * [[graft.operators.AsOfJoin.asOfNative]] (r12 verdict ask #6), the
  * way DuckDB exposes `ASOF JOIN` in plain SQL. Spark's parser can't
  * grow new join syntax through the public extension API, so the
  * standard library technique applies instead (the same one Spark
  * itself uses for hints-as-functions): a MARKER predicate the user
  * writes as an ordinary ON-clause conjunct,
  *
  * {{{
  *   SELECT * FROM purchases p
  *   LEFT JOIN clicks c
  *     ON p.user_id = c.user_id AND graft_asof(p.pts, c.cts)
  * }}}
  *
  * and a rewrite rule that recognizes the shape
  * `equi-conjuncts AND graft_asof(leftTime, rightTime[, inclusive[,
  * forward]])` on a LEFT or INNER join and replaces the whole Join
  * with [[AsOfJoinPlan]] → [[AsOfJoinExec]] (each side exchanged and
  * sorted on its own narrow schema, one O(1)-state merge pass). The
  * payload is the ENTIRE right row — SQL join column semantics — so
  * `SELECT *` reads exactly like the left join it replaces, with the
  * matched right row being the as-of winner; an INNER join adds the
  * exact post-filter `rightTime IS NOT NULL` (a matched row always has
  * one; an unmatched row never does).
  *
  * Tolerance needs no marker argument here: unlike the DSL (whose
  * payload is re-aliased, forcing [[graft.operators.AsOfJoin]] to
  * re-select), the SQL form keeps the matched right time as a real
  * output column, so pandas-style tolerance is ordinary SQL over the
  * join result — e.g. `CASE WHEN l.pts - r.cts <= INTERVAL 5 MINUTES
  * THEN r.v END`.
  *
  * Guards (each leaves the join unrewritten, and the unevaluable
  * marker then fails at planning with its own clear message): more
  * than one marker; a marker nested under OR/NOT; a non-equi residual
  * conjunct; null-safe equality (`<=>` groups NULL keys, the exec's
  * SQL equality does not); no equi key at all; a join type other than
  * LEFT/INNER. Time arguments may be written in either order — the
  * rule orients them by which side each references.
  *
  * Registered by [[graft.GraftExtensions]] (static conf) or
  * [[installSql]] (live session). */
object AsOfJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner | LeftOuter, Some(cond), _)
        if cond.exists(_.isInstanceOf[AsOfMarker]) =>
      rewrite(j).getOrElse(j)
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, joinType, Some(cond), _) = j
    val conjuncts = splitConjunctivePredicates(cond)
    val (markers, others) = conjuncts.partition(_.isInstanceOf[AsOfMarker])
    // exactly one marker, at the top conjunct level only
    if (markers.length != 1 ||
      others.exists(_.exists(_.isInstanceOf[AsOfMarker]))) return None
    val m = markers.head.asInstanceOf[AsOfMarker]

    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)

    // orient the marker's time arguments by the side they reference
    val times = (m.t1, m.t2) match {
      case (a, b) if fromLeft(a) && fromRight(b) => Some((a, b))
      case (a, b) if fromRight(a) && fromLeft(b) => Some((b, a))
      case _ => None
    }
    // every residual conjunct must be a cross-side equality (the
    // exec's co-partitioning keys); anything else leaves the naive
    // plan — and <=> is rejected because the exec uses SQL equality
    val keys = others.map {
      case EqualTo(a, b) if fromLeft(a) && fromRight(b) => Some((a, b))
      case EqualTo(a, b) if fromRight(a) && fromLeft(b) => Some((b, a))
      case _ => None
    }
    if (times.isEmpty || keys.isEmpty || keys.exists(_.isEmpty)) return None
    val (lt, rt) = times.get
    if (lt.dataType != rt.dataType) return None
    val (leftKeys, rightKeys) = keys.flatten.unzip

    val node = AsOfJoinPlan(left, right, leftKeys, rightKeys, lt, rt,
      payload = right.output, inclusive = m.inclusive, forward = m.forward)
    joinType match {
      case LeftOuter => Some(node)
      // inner = left-outer + matched-only: a match always carries a
      // non-null right time (NULL times never match), an unmatched row
      // never does; rt's references live in the payload, so the filter
      // resolves against the node's own output. The references must be
      // re-marked nullable to MATCH that output: the node declares every
      // payload attribute nullable (no match → NULL), but rt still holds
      // the right child's original instances — if the source column is
      // required (parquet REQUIRED field, primitive toDF), NullPropagation
      // folds IsNotNull(non-nullable) to TRUE in the same fixed-point
      // batch as this rule and the inner join silently degrades to left.
      case _ =>
        val rtOut = rt.transform {
          case a: AttributeReference => a.withNullability(true)
        }
        Some(Filter(IsNotNull(rtOut), node))
    }
  }

  /** Install the SQL surface on a live session: the `graft_asof`
    * marker function, this rewrite, and the planner strategy.
    * Idempotent. Cluster-wide deployments use
    * `spark.sql.extensions=graft.GraftExtensions` instead. */
  def installSql(spark: SparkSession): Unit = {
    graft.GraftFunctions.register(spark)
    GraftSqlBridge.addOptimizerRule(spark, AsOfJoinRewrite)
    GraftSqlBridge.addStrategy(spark, AsOfJoinStrategy)
  }
}

/** The `graft_asof(leftTime, rightTime[, inclusive[, forward]])`
  * ON-clause marker predicate. Never evaluated: [[AsOfJoinRewrite]]
  * consumes it; if the surrounding join doesn't match the rewritable
  * shape the plan fails at execution with this expression's
  * unevaluable error, pointing at the guard list above. */
case class AsOfMarker(t1: Expression, t2: Expression,
    inclusive: Boolean, forward: Boolean)
    extends Expression with Unevaluable {
  override def children: Seq[Expression] = Seq(t1, t2)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_asof"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfMarker =
    copy(t1 = newChildren(0), t2 = newChildren(1))
}

object AsOfMarker {
  /** Function-registry builder: 2 time args plus up to two BOOLEAN
    * literals (inclusive, forward), defaulting to the
    * [[graft.operators.AsOfJoin.asOf]] defaults (inclusive backward). */
  def build(children: Seq[Expression]): Expression = {
    require(children.length >= 2 && children.length <= 4,
      "graft_asof(leftTime, rightTime[, inclusive[, forward]]) takes 2-4 arguments")
    def boolLit(e: Expression, name: String): Boolean = e match {
      case Literal(v: Boolean, BooleanType) => v
      case other => throw new IllegalArgumentException(
        s"graft_asof: $name must be a boolean literal, got $other")
    }
    AsOfMarker(children.head, children(1),
      inclusive = if (children.length >= 3) boolLit(children(2), "inclusive") else true,
      forward = if (children.length >= 4) boolLit(children(3), "forward") else false)
  }
}
