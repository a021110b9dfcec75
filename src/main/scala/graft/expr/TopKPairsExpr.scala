package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}

/** Bounded per-group top-k (score, id) ROWS — the payload-carrying
  * sibling of [[TopKExpr]].
  *
  * The window formulation of "top k rows per group by score"
  * (`row_number().over(partitionBy(g).orderBy(score.desc, id.asc)) <= k`)
  * SORTS every group's full contents: even with Spark's
  * WindowGroupLimit rewrite the physical plan sorts each map-side
  * partition in full before the partial limit (rank limiting is
  * sort-based), so an N-row input pays O(N log N) comparisons and a
  * full-width local sort. This aggregate keeps a k-element bounded heap
  * of (score, id) pairs per group instead: O(N log k) updates, map-side
  * partial aggregation (each partition ships at most k pairs per group
  * into the shuffle) and a k-element merge on the reduce side. At
  * 100 TB the shuffle carries |groups|·k pairs, never the fact.
  *
  * ORDER CONTRACT — identical to the window form on non-null inputs:
  * rank by score DESCENDING, ties broken by id ASCENDING; NaN scores
  * rank ABOVE all finite scores (java.lang.Double.compare, the same
  * NaN-largest convention Spark's sort uses). Rows with a NULL score or
  * id are SKIPPED (the aggregate convention) — the window form instead
  * ranks null scores last, so callers relying on null-padding up to k
  * must keep the window; every engine call site has non-null inputs by
  * construction. Duplicate (score, id) pairs are kept (a PriorityQueue,
  * not a set), preserving row multiplicity.
  *
  * Result: array<struct<score:double, id:bigint>> in rank order
  * (index 0 = rank 1) — `posexplode` recovers (rank-1, row).
  */
case class TopKPairsExpr(score: Expression, id: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"graft_topk_pairs k must be positive, got $k")

  override def prettyName: String = "graft_topk_pairs"
  override def left: Expression = score
  override def right: Expression = id
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${s.catalogString}, ${i.catalogString})")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  // heap head = the WORST retained pair (lowest score; ties: highest id),
  // so a better candidate replaces the head in O(log k).
  // java.lang.Double.compare puts NaN above every finite double — the
  // same NaN-largest total order Spark's DESC sort uses.
  private object WorstFirst extends java.util.Comparator[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, WorstFirst)

  private def offer(b: java.util.PriorityQueue[(Double, Long)],
                    s: Double, i: Long): Unit =
    if (b.size < k) { b.add((s, i)); () }
    else {
      val worst = b.peek()
      // candidate beats the worst retained pair iff it orders AFTER it
      // under WorstFirst (higher score, or equal score and lower id)
      if (WorstFirst.compare((s, i), worst) > 0) { b.poll(); b.add((s, i)); () }
    }

  override def update(b: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(b, s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.PriorityQueue[(Double, Long)],
                     o: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = o.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(b, s, i) }
    b
  }

  override def eval(b: java.util.PriorityQueue[(Double, Long)]): Any = {
    // drain worst-first, fill the array back to front -> rank order
    val n = b.size
    val out = new Array[Any](n)
    var i = n - 1
    while (i >= 0) {
      val (s, id0) = b.poll()
      out(i) = InternalRow(s, id0)
      i -= 1
    }
    // refill the buffer (eval must not destroy state for safety under
    // speculative re-evaluation)
    var j = 0
    while (j < n) {
      val row = out(j).asInstanceOf[InternalRow]
      b.add((row.getDouble(0), row.getLong(1)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * b.size)
    val it = b.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) b.add((bb.getDouble, bb.getLong))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKPairsExpr =
    copy(score = newLeft, id = newRight)
}

object TopKPairsExpr {
  /** DataFrame-side aggregate column: `graft_topk_pairs(score, id, k)`. */
  def column(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKPairsExpr(
      GraftBridge.expression(score), GraftBridge.expression(id), k)
      .toAggregateExpression())
}
