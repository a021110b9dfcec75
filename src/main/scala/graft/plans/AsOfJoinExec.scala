package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of join: co-partition both sides on the equi keys
  * (`ClusteredDistribution`, so `EnsureRequirements` inserts/reuses the
  * exchanges and aligns partition counts exactly as it does for a
  * sort-merge join), sort each side within partitions by
  * (keys, time) — ascending time for backward as-of, descending for
  * forward, so both directions run the IDENTICAL merge — then stream
  * one merge pass per partition:
  *
  * both iterators arrive key-grouped and time-ordered, so the right
  * cursor only ever moves forward. For each left row, consume right
  * rows while their key is smaller, or equal with time on the
  * matchable side of the left time; the last one consumed is by
  * construction the closest match, carried as one copied k/payload
  * pair — O(1) state per partition, no window buffer, no pair
  * materialization, spill handled by the per-side external sorts.
  *
  * Emit = left row ++ carried payload (NULLs when the carried key
  * differs, the keys/time contain NULLs, or the right side ran dry) —
  * left-outer, exactly one output row per left row.
  *
  * AQE-safe: the paired `ClusteredDistribution`s are the same contract
  * `CoGroupExec`/sort-merge join use, so adaptive partition coalescing
  * treats the two exchanges as one coalesce group and `zipPartitions`
  * always sees equal partition counts (the specs run under Spark's
  * default AQE with tiny inputs — the maximal-coalesce case).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    payload: Seq[Attribute],
    inclusive: Boolean,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val dir = if (forward) Descending else Ascending
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, dir),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, dir))
  }

  /** One output row per left row, in left order, under left's hash. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    // capture plain values; projections/orderings are built per
    // partition inside the closure (codegen'd objects don't serialize)
    val (lOut, rOut) = (left.output, right.output)
    val (lKeyEx, rKeyEx, lTimeEx, rTimeEx) = (leftKeys, rightKeys, leftTime, rightTime)
    val (payloadEx, outAttrs) = (payload, output)
    val (inc, sign) = (inclusive, if (forward) -1 else 1)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyEx, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyEx, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeEx), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeEx), rOut)
      val payloadProj = UnsafeProjection.create(payloadEx, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ payloadEx.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyEx.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeEx.dataType))
      val nullPayload = new GenericInternalRow(payloadEx.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the carried match: copies (the projections reuse their buffers)
      var carriedKey: UnsafeRow = null
      var carriedPayload: UnsafeRow = null

      lIter.map { lRow =>
        var matched: InternalRow = nullPayload
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow)
        if (!lKey.anyNull && !lTime.isNullAt(0)) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            if (rKey.anyNull) rBuf.next() // NULL key never matches: consume
            else {
              val kc = keyOrd.compare(rKey, lKey)
              if (kc < 0) rBuf.next() // behind the left key: consume
              else if (kc > 0) advance = false
              else {
                val rTime = rTimeProj(rBuf.head)
                if (rTime.isNullAt(0)) rBuf.next() // NULL time never matches
                else {
                  val tc = sign * timeOrd.compare(rTime, lTime)
                  if (tc < 0 || (inc && tc == 0)) {
                    carriedKey = rKey.copy()
                    carriedPayload = payloadProj(rBuf.next()).copy()
                  } else advance = false
                }
              }
            }
          }
          if (carriedKey != null && keyOrd.compare(carriedKey, lKey) == 0) {
            matched = carriedPayload
            numMatched += 1
          }
        }
        numOutputRows += 1
        resultProj(joined(lRow, matched))
      }
    }
  }
}
