package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NumericType}

/** Bounded per-group top-k as a native typed imperative aggregate.
  *
  * The window formulation of "top k values per group"
  * (`row_number().over(partitionBy(g).orderBy(v.desc)) <= k`) SORTS
  * every group's full contents — O(n log n) per group and a full-width
  * shuffle of the fact. This aggregate keeps a k-element min-heap per
  * group instead: O(n log k) updates, map-side partial aggregation
  * (each partition ships at most k doubles per group into the
  * shuffle), and a k-element merge on the reduce side. At 100 TB the
  * shuffle carries |groups|·k doubles, not the fact.
  *
  * Heap state lives in the aggregation buffer via the standard
  * TypedImperativeAggregate serialize/deserialize contract (8 bytes
  * per element, ≤ k elements). Result: array<double> sorted
  * descending (ties keep the value multiset, so the output is
  * deterministic even though tied ROWS are interchangeable).
  */
case class TopKExpr(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
  with UnaryLike[Expression] {

  require(k > 0, s"graft_topk k must be positive, got $k")

  override def prettyName: String = "graft_topk"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val asDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case org.apache.spark.sql.types.FloatType => v => v.asInstanceOf[Float].toDouble
    case org.apache.spark.sql.types.LongType => v => v.asInstanceOf[Long].toDouble
    case org.apache.spark.sql.types.IntegerType => v => v.asInstanceOf[Int].toDouble
    case org.apache.spark.sql.types.ShortType => v => v.asInstanceOf[Short].toDouble
    case org.apache.spark.sql.types.ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: org.apache.spark.sql.types.DecimalType =>
      v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case dt => throw new IllegalStateException(s"non-numeric $dt")
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def offer(b: java.util.PriorityQueue[java.lang.Double], d: Double): Unit =
    if (b.size < k) b.add(d)
    else if (d > b.peek()) { b.poll(); b.add(d) }

  override def update(b: java.util.PriorityQueue[java.lang.Double],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(b, asDouble(v))
    b
  }

  override def merge(b: java.util.PriorityQueue[java.lang.Double],
                     o: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    val out = new Array[Any](arr.length)
    i = 0
    while (i < arr.length) { out(i) = arr(arr.length - 1 - i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) b.add(bb.getDouble)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKExpr =
    copy(child = newChild)
}

object TopKExpr {
  /** DataFrame-side aggregate column: `graft_topk(v, k)`. */
  def column(v: Column, k: Int): Column =
    GraftBridge.column(TopKExpr(GraftBridge.expression(v), k).toAggregateExpression())
}
