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

/** All `depth × width` count-min slot counts of one (key, period) group
  * as a SINGLE fixed-size aggregation buffer — the build kernel of
  * [[graft.operators.SketchRollup.cmSketchTable]].
  *
  * The composed formulation exploded every fact row `depth` ways and
  * hash-aggregated the (keys, period, row j, slot) grain: the partial
  * aggregate probed a per-task hash table of up to depth·width·|groups|
  * entries and the shuffle carried one row per touched slot PER MAP
  * TASK (CmProbe r18: the build was 2.65 s of q302's 2.87 s at sf0.1).
  * This aggregate keeps one long[depth·width] per group instead:
  * per input row it computes the `depth` slot hashes — the exact
  * `cmSlot` arithmetic, same Lehmer constants — and increments `depth`
  * array cells; partial states merge by element-wise addition (the
  * count-min merge, exactly associative), and each map task ships at
  * most |groups| fixed-size arrays into the shuffle.
  *
  * Result: array<struct<row int, slot bigint, cnt bigint>> of the
  * TOUCHED cells only (cnt > 0), ascending (row, slot) — one explode
  * away from the composed form's sparse output, bit for bit including
  * field nullability (counts are exact integers either way;
  * CmSketchSpec pins equality, the q302 oracle replays the estimates
  * end to end). NULL items are not counted (the composed form filtered
  * NULL slots).
  */
case class CmCountsExpr(child: Expression, depth: Int, width: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
  require(depth.toLong * width <= (1 << 22),
    "depth*width capped at 4M cells (32 MB buffer) — widen the oracle contract first")

  override def prettyName: String = "graft_cm_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral input, got ${dt.catalogString}")
  }
  override def dataType: DataType = CmCountsExpr.outType
  override def nullable: Boolean = false

  @transient private lazy val asLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
    case dt => throw new IllegalStateException(s"non-integral $dt")
  }

  // the cmSlot hash family's constants, identical literals to the
  // column form: h_j(x) = ((x mod M31)·A_j + B_j) mod M31, mod width
  @transient private lazy val M31 = graft.functions.PortableHash.M31
  @transient private lazy val as: Array[Long] =
    Array.tabulate(depth)(j => graft.functions.PortableHash.lehmerLong(1234567L + j))
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(depth)(j => graft.functions.PortableHash.lehmerLong(7654321L + j))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val raw = asLong(v)
      // Scala/Java % keeps the dividend's sign exactly like Spark's %,
      // so a NEGATIVE item would hash to a negative slot in the column
      // form — a nonsense sketch coordinate either way. The column form
      // emitted it silently; the array form cannot index it, so it
      // fails loudly instead (the house overflow posture). Every
      // declared user hashes non-negative keys.
      require(raw >= 0, s"$prettyName requires non-negative items, got $raw")
      val x = raw % M31
      var j = 0
      while (j < depth) {
        val slot = (((x * as(j) + bs(j)) % M31) % width).toInt
        b(j * width + slot) += 1L
        j += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    var n = 0
    var i = 0
    while (i < b.length) { if (b(i) > 0) n += 1; i += 1 }
    val out = new Array[Any](n)
    i = 0; var o = 0
    while (i < b.length) {
      if (b(i) > 0) {
        out(o) = InternalRow(i / width, (i % width).toLong, b(i))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.length)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmCountsExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmCountsExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmCountsExpr =
    copy(child = newChild)
}

object CmCountsExpr {
  /** Sparse-cell output type. `slot` is declared nullable ONLY to match
    * the composed form's schema verbatim (its slot came from arithmetic
    * on the nullable item column); the array build never emits a null. */
  private[graft] val outType = ArrayType(org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("row", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("slot", LongType, nullable = true),
    org.apache.spark.sql.types.StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  /** DataFrame-side aggregate column: `graft_cm_counts(x, depth, width)`. */
  def column(x: Column, depth: Int, width: Int): Column =
    GraftBridge.column(CmCountsExpr(GraftBridge.expression(x), depth, width)
      .toAggregateExpression())
}
