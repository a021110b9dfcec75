package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Generate, HintInfo, Join, LogicalPlan, Project, ResolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DoubleType, LongType, NumericType, TimestampType}

/** Catalyst optimizer rule: band-join binning.
  *
  * An inner join whose only cross-side predicate is a range band —
  * `points JOIN intervals ON p >= lo AND p < hi` (any mix of
  * strict/non-strict, either operand order, point on either side) —
  * has no equi key, so Spark plans it as a broadcast nested loop (or a
  * cartesian product when neither side broadcasts): per-row cost is
  * O(|intervals|), the classic scale killer the moment the interval
  * table outgrows a broadcast. (The reference's tier/band assignments,
  * e.g. `src/features/business_features.py` price-tier binning, are
  * exactly this join shape once the tier table is data-derived.)
  *
  * This rule rewrites the join to the bucketed equi-join form
  * automatically — the same plan [[graft.operators.RangeJoin
  * .bandedRange]] builds by hand, derived here from the join
  * CONDITION so any naive range join picks it up:
  *
  *  - point side gains `__graft_bin_pt = floor(p / binSize)`;
  *  - interval side `Generate`-explodes the bin ids its [lo, hi] span
  *    covers (`sequence(floor(lo/b), floor(hi/b))` — empty when
  *    lo > hi or either bound is NULL, preserving inner-join
  *    semantics);
  *  - the join becomes `EqualTo(bin, bin) AND <original condition>`:
  *    a plain shuffled hash/sort-merge join on the bin key with the
  *    exact band predicate as the refine filter — strictness and
  *    boundary semantics come from the ORIGINAL predicate, so the
  *    rewrite is exact for every comparison mix.
  *
  * Cost: linear in |points| + |intervals| · (avg interval width /
  * binSize); pick `binSize` near the median interval width so most
  * intervals explode into ≤ 2 bins. Guards (each leaves the plan
  * untouched): non-inner joins; joins that already have a cross-side
  * equi conjunct (they hash-join fine, the band is just a post
  * filter); joins either of whose sides carries an explicit BROADCAST
  * hint (a user-forced tiny-table nested loop is already the right
  * plan — [[graft.operators.RangeJoin.broadcastRange]]); band
  * expressions that are not numeric, timestamp, or date. Idempotent by construction: the rewritten join
  * HAS a cross-side equi conjunct, so the fixed-point batch skips it
  * on the next pass.
  *
  * Scoped use: [[GraftPlans.rewriteRangeJoin]] (one plan, explicit
  * binSize). Session/cluster-wide: [[GraftPlans.install]] /
  * `spark.sql.extensions=graft.GraftExtensions`, gated on the
  * `spark.graft.rangeJoin.binSize` conf (≤ 0 — the default — is off).
  */
case class RangeJoinRewrite(binSize: Double) extends Rule[LogicalPlan]
    with PredicateHelper {
  require(binSize > 0, "binSize must be positive")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(_), _) => rewrite(j).getOrElse(j)
  }

  /** Some(true) if every reference of `e` comes from `l`, Some(false)
    * if every one comes from `r`, None if mixed or reference-free. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  /** Numerics bin directly; timestamps and dates bin via their
    * cast-to-double epoch seconds (`binSize` is then in seconds;
    * dates route through a session-timezone timestamp cast first) —
    * the SCD/validity-window join shape `fact.ts BETWEEN dim.start
    * AND dim.end`. All three band operands share the identical cast,
    * which is monotonic, so a point's bin always lands inside its
    * interval's generated span and the original predicate stays the
    * exact refine filter. */
  private def bandable(dt: DataType): Boolean =
    dt.isInstanceOf[NumericType] || dt == TimestampType || dt == DateType

  /** Normalize a comparison to (small, large) regardless of operator
    * direction; strictness is irrelevant here — the original conjunct
    * stays in the join as the exact refine predicate. */
  private def asOrdered(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(a, b)           => Some((a, b))
    case LessThanOrEqual(a, b)    => Some((a, b))
    case GreaterThan(a, b)        => Some((b, a))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _                        => None
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    def broadcastHinted(h: Option[HintInfo]) = h.flatMap(_.strategy).contains(BROADCAST)
    // pre-optimizer (scoped) plans still carry the hint as a ResolvedHint
    // node on the join input; post-analysis it is folded into JoinHint
    def hintNode(p: LogicalPlan): Boolean = p match {
      case h: ResolvedHint => h.hints.strategy.contains(BROADCAST) || hintNode(h.child)
      case _: Join         => false
      case other           => other.children.exists(hintNode)
    }
    if (broadcastHinted(hint.leftHint) || broadcastHinted(hint.rightHint) ||
      hintNode(left) || hintNode(right)) return None

    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(a: Expression, b: Expression): Boolean = (for {
      sa <- sideOf(a, left, right)
      sb <- sideOf(b, left, right)
    } yield sa != sb).getOrElse(false)
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
    if (hasEquiKey) return None

    // A band = one conjunct bounding p from below, one from above,
    // p wholly from one side and both bounds wholly from the other.
    val ordered = conjuncts.flatMap(asOrdered)
    val band = (for {
      (lo, p1) <- ordered.iterator
      (p2, hi) <- ordered.iterator
      if p1.semanticEquals(p2)
      if bandable(p1.dataType) && bandable(lo.dataType) && bandable(hi.dataType)
      pSide <- sideOf(p1, left, right)
      loSide <- sideOf(lo, left, right)
      hiSide <- sideOf(hi, left, right)
      if loSide == hiSide && loSide != pSide
    } yield (p1, lo, hi, pSide)).nextOption()

    band.map { case (p, lo, hi, pointOnLeft) =>
      def binOf(e: Expression): Expression = {
        // date → timestamp needs the session zone resolved at rule time
        val asNum = if (e.dataType == DateType)
          Cast(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)), DoubleType)
        else Cast(e, DoubleType)
        Floor(Divide(asNum, Literal(binSize))) // floor(double) IS long
      }
      val (pointSide, boundSide) = if (pointOnLeft) (left, right) else (right, left)

      val binAlias = Alias(binOf(p), "__graft_bin_pt")()
      val newPointSide = Project(pointSide.output :+ binAlias, pointSide)

      // sequence is null-intolerant (NULL bound → NULL array → no rows
      // from a non-outer Generate) and throws on descending ranges, so
      // lo > hi routes to an empty literal — both exactly the rows an
      // inner join with a NULL/contradictory predicate would keep: none.
      val loBin = binOf(lo)
      val hiBin = binOf(hi)
      val bins = If(LessThanOrEqual(loBin, hiBin),
        new Sequence(loBin, hiBin, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val binAttr = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
      val newBoundSide =
        Generate(Explode(bins), Nil, outer = false, None, Seq(binAttr), boundSide)

      val (newLeft, newRight) =
        if (pointOnLeft) (newPointSide, newBoundSide) else (newBoundSide, newPointSide)
      Project(j.output,
        Join(newLeft, newRight, Inner,
          Some(And(EqualTo(binAlias.toAttribute, binAttr), cond)), hint))
    }
  }
}

/** Session-installable variant, gated at OPTIMIZATION time on the
  * `spark.graft.rangeJoin.binSize` conf so one deployment-level
  * setting turns the rewrite on cluster-wide (via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * [[GraftPlans.install]]) without touching call sites. */
object ConfRangeJoinRewrite extends Rule[LogicalPlan] {
  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = conf.getConfString(BinSizeKey, "0").toDouble
    if (b > 0) RangeJoinRewrite(b)(plan) else plan
  }
}
