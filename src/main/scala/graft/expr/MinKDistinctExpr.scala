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
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType,
  LongType, ShortType}

/** Bounded per-group k smallest DISTINCT longs — the aggregation core
  * of the KMV distinct sketch ([[graft.operators.SketchRollup]]).
  *
  * The composed formulation `slice(array_sort(collect_set(h)), 1, k)`
  * is value-correct but its aggregation state is the FULL distinct set
  * per group — unbounded at 100 TB (a group with 10^8 distinct hashes
  * buffers 10^8 longs before the slice). This aggregate keeps a sorted
  * set capped at k entries instead: O(log k) updates, map-side partial
  * aggregation (each partition ships at most k longs per group into
  * the shuffle), and a k-bounded merge on the reduce side — the state
  * IS the sketch.
  *
  * Result: array<long> of the ≤ k smallest distinct inputs, ascending —
  * byte-identical to the composed form (SketchSpec pins equality), so
  * the q285 oracle is unchanged.
  */
case class MinKDistinctExpr(child: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"graft_min_k_distinct k must be positive, got $k")

  override def prettyName: String = "graft_min_k_distinct"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got ${dt.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  @transient private lazy val asLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
    case dt => throw new IllegalStateException(s"non-integral $dt")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(b: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (b.size < k) { b.add(v); () }
    else if (v < b.last()) { if (b.add(v)) { b.pollLast(); () } }

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(b, asLong(v))
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) offer(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    val it = b.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.size)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) b.add(bb.getLong)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinctExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinctExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKDistinctExpr =
    copy(child = newChild)
}

object MinKDistinctExpr {
  /** DataFrame-side aggregate column: `graft_min_k_distinct(v, k)`. */
  def column(v: Column, k: Int): Column =
    GraftBridge.column(MinKDistinctExpr(GraftBridge.expression(v), k)
      .toAggregateExpression())
}
