package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, Generate, HintInfo, Join, JoinHint, LogicalPlan, Project, ResolvedHint, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
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
  * intervals explode into ≤ 2 bins. Intervals spanning more than
  * `maxBinsPerInterval` bins (open-ended SCD sentinels like
  * 9999-12-31, which would otherwise Sequence-explode into billions
  * of bin rows and throw past MAX_ROUNDED_ARRAY_LENGTH) are split
  * into a separate union branch that keeps the ORIGINAL naive join —
  * exact for every row, pathological intervals just stay off the fast
  * path. Guards (each leaves the plan
  * untouched): non-inner joins; joins that already have a cross-side
  * equi conjunct (they hash-join fine, the band is just a post
  * filter); joins either of whose sides carries an explicit BROADCAST
  * hint (a user-forced tiny-table nested loop is already the right
  * plan — [[graft.operators.RangeJoin.broadcastRange]]); band
  * expressions that are not numeric, timestamp, or date. Idempotent by construction: the rewritten join
  * HAS a cross-side equi conjunct, so the fixed-point batch skips it
  * on the next pass, and the wide-interval fallback join carries
  * [[RangeJoinRewrite.SkipTag]].
  *
  * Scoped use: [[GraftPlans.rewriteRangeJoin]] (one plan, explicit
  * binSize). Session/cluster-wide: [[GraftPlans.install]] /
  * `spark.sql.extensions=graft.GraftExtensions`, gated on the
  * `spark.graft.rangeJoin.binSize` conf (≤ 0 — the default — is off).
  */
case class RangeJoinRewrite(binSize: Double,
    maxBinsPerInterval: Long = RangeJoinRewrite.DefaultMaxBinsPerInterval)
    extends Rule[LogicalPlan] with PredicateHelper {
  require(binSize > 0, "binSize must be positive")
  require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be at least 1")

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

  /** Structural twin of [[RangeJoinRewrite.SkipTag]]: TreeNodeTags only
    * survive makeCopy/withNewChildren, so a rule that rebuilds the join
    * via case-class copy (InferFiltersFromConstraints does) drops the
    * tag and the fallback join — band conjuncts, no equi key — would be
    * rewritten AGAIN, nesting one extra union layer per fixed-point
    * iteration. The fallback's interval side always sits behind the
    * `span > cap` filter whose span is `floor(x/b) - floor(y/b)` — a
    * fingerprint no user predicate plausibly carries — so a join with
    * that shape under either input (through the Filter/Project chain
    * other rules may interleave) is recognized as already-fallen-back. */
  private def hasWideGuard(p: LogicalPlan): Boolean = p match {
    case Filter(cond, child) =>
      cond.exists {
        case GreaterThan(Subtract(Floor(Divide(_, _, _)), Floor(Divide(_, _, _)), _), _) => true
        case _ => false
      } || hasWideGuard(child)
    case Project(_, child) => hasWideGuard(child)
    case _ => false
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    // the wide-interval fallback branch below is intentionally left on
    // the naive plan — don't rewrite it again on the next fixed-point
    // pass (the tag rides plan copies via copyTagsFrom; the structural
    // guard catches rebuilds that drop it)
    if (j.getTagValue(RangeJoinRewrite.SkipTag).isDefined) return None
    if (hasWideGuard(j.left) || hasWideGuard(j.right)) return None
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
      // Per-interval bin explosion is bounded: an interval spanning
      // more than maxBinsPerInterval bins (the SCD open-ended sentinel
      // end date, e.g. 9999-12-31, spans billions at a 1-day binSize —
      // Sequence would throw past MAX_ROUNDED_ARRAY_LENGTH, and short
      // of that the explode multiplies the interval side's row count)
      // stays on the naive nested-loop plan in a separate, usually
      // empty, union branch. NULL-bound intervals fail the narrow
      // filter too — correct, an inner join against a NULL band bound
      // keeps nothing.
      val guarded = maxBinsPerInterval != Long.MaxValue
      val span = Subtract(hiBin, loBin)
      val narrowBound = if (guarded)
        Filter(LessThanOrEqual(span, Literal(maxBinsPerInterval)), boundSide)
      else boundSide
      val bins = If(LessThanOrEqual(loBin, hiBin),
        new Sequence(loBin, hiBin, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val binAttr = AttributeReference("__graft_bin_iv", LongType, nullable = false)()
      val newBoundSide =
        Generate(Explode(bins), Nil, outer = false, None, Seq(binAttr), narrowBound)

      val (newLeft, newRight) =
        if (pointOnLeft) (newPointSide, newBoundSide) else (newBoundSide, newPointSide)
      val binned = Project(j.output,
        Join(newLeft, newRight, Inner,
          Some(And(EqualTo(binAlias.toAttribute, binAttr), cond)), hint))
      if (!guarded) binned
      else {
        // pathological intervals (span > cap, or a NULL span that a
        // NULL bound produces — those match nothing either way) ride a
        // separate branch that keeps the ORIGINAL naive join over the
        // wide subset only. Healthy data leaves this branch empty; AQE
        // then folds the empty-side join away at runtime.
        val wideBound =
          Filter(GreaterThan(span, Literal(maxBinsPerInterval)), boundSide)
        val (wideLeft, wideRight) =
          if (pointOnLeft) (pointSide, wideBound) else (wideBound, pointSide)
        // the WIDE side carries an explicit broadcast hint when the
        // WHOLE interval side's size estimate fits the broadcast
        // threshold: it is pathological-rows-only (usually empty), and
        // making it the BUILD side turns its emptiness into a
        // materialized broadcast stage AQE's empty-relation propagation
        // can see — the fallback join (and its rescan of the point
        // side) folds away at runtime instead of streaming the full
        // point side against nothing. The gate matters because Spark
        // honors a BROADCAST hint regardless of actual size and the
        // wide subset is NOT always small — on a real SCD table every
        // current row carries the open-ended sentinel end date, so the
        // "pathological" subset can be most of the table; when the
        // interval side's estimate exceeds the threshold the fallback
        // stays unhinted and the planner degrades the way the
        // pre-rewrite naive join would (one nested-loop/cartesian pass,
        // no forced driver materialization). Sentinel-heavy tables
        // should pre-split current rows off the banded path instead.
        val bcThreshold = conf.autoBroadcastJoinThreshold
        val hintWide = bcThreshold > 0 && boundSide.stats.sizeInBytes <= bcThreshold
        val jh = if (!hintWide) JoinHint.NONE
        else {
          val wideHint = HintInfo(strategy = Some(BROADCAST))
          if (pointOnLeft) JoinHint(None, Some(wideHint))
          else JoinHint(Some(wideHint), None)
        }
        val wideJoin = Join(wideLeft, wideRight, Inner, Some(cond), jh)
        wideJoin.setTagValue(RangeJoinRewrite.SkipTag, ())
        Union(Seq(binned, Project(j.output, wideJoin)))
      }
    }
  }
}

object RangeJoinRewrite {
  /** Pathological-interval fallback marker (see [[RangeJoinRewrite]]
    * guards): a join tagged with this is never rewritten again. */
  val SkipTag: TreeNodeTag[Unit] = TreeNodeTag[Unit]("graft.rangeJoin.skip")

  /** Default per-interval bin cap: at the recommended binSize (near
    * the median interval width, so typical intervals explode into
    * ≤ 2 bins) 4096 bins is already a 2000×-outlier interval — wide
    * enough to keep real data on the fast path, far below Sequence's
    * array-length ceiling. `Long.MaxValue` disables the guard (and its
    * fallback union branch) entirely — the pure binned two-table plan,
    * for inputs KNOWN to be bounded. */
  val DefaultMaxBinsPerInterval: Long = 4096L
}

/** Session-installable variant, gated at OPTIMIZATION time on the
  * `spark.graft.rangeJoin.binSize` conf so one deployment-level
  * setting turns the rewrite on cluster-wide (via
  * `spark.sql.extensions=graft.GraftExtensions` or
  * [[GraftPlans.install]]) without touching call sites. */
object ConfRangeJoinRewrite extends Rule[LogicalPlan] {
  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val b = conf.getConfString(BinSizeKey, "0").toDouble
    if (b > 0) {
      val mb = conf.getConfString(MaxBinsKey,
        RangeJoinRewrite.DefaultMaxBinsPerInterval.toString).toLong
      RangeJoinRewrite(b, mb)(plan)
    } else plan
  }
}
