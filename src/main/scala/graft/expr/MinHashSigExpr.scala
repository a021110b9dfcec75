package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the PORTABLE MinHash signature: the
  * `numHashes` minima of `(pa_i·h + pb_i) mod (2^31−1)` over all
  * `gram`-character shingle hashes `h` (polynomial mod 1e9+7 — the
  * PortableHash contract, reproducible in DuckDB).
  *
  * Why not the higher-order-function formulation
  * (transform→polyHash per shingle, then numHashes × array_min):
  * that evaluates interpreted — O(len·gram + len·numHashes) boxed
  * lambda frames PER DOCUMENT, and it was the dominant Spark-side cost
  * of the q122/q128 candidate generation. This expression makes one
  * O(len·numHashes) primitive pass: Karp–Rabin rolling shingle hash
  * (same VALUE as the windowed fold, mod 1e9+7), each updating all
  * running minima — inside whole-stage codegen via a static call.
  *
  * Value-identical to the HOF form: min over duplicate shingle hashes
  * equals min over the distinct set, so the HOF's `array_distinct` is
  * semantically a no-op here. Pinned by DedupSpec parity and the q122
  * DuckDB oracle.
  *
  * Documents shorter than `gram` characters yield an EMPTY array —
  * callers filter `length(text) >= gram` first (as the HOF path did).
  */
case class MinHashSigExpr(child: Expression, gram: Int, numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    MinHashSigExpr.compute(s.asInstanceOf[UTF8String], gram, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.MinHashSigExpr.compute($c, $gram, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  final val MPoly = 1000000007L
  final val M31 = 2147483647L

  // permutation coefficients pa_i = lehmer(i+1), pb_i = lehmer(10000+i),
  // cached per numHashes (tiny; computed once per JVM, not per row)
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coefs(n: Int): (Array[Long], Array[Long]) =
    coefCache.computeIfAbsent(n, _ => (
      Array.tabulate(n)(i => graft.functions.PortableHash.lehmerLong(i + 1L)),
      Array.tabulate(n)(i => graft.functions.PortableHash.lehmerLong(10000L + i))))

  /** Static entry shared by eval and generated code. Codepoint-based so
    * multibyte text hashes identically to the character-indexed SQL. */
  def compute(s: UTF8String, w: Int, nHashes: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.empty[Long])
    val (pa, pb) = coefs(nHashes)
    val sig = Array.fill(nHashes)(Long.MaxValue)

    @inline def update(h: Long): Unit = {
      var j = 0
      while (j < nHashes) {
        val v = (pa(j) * h + pb(j)) % M31
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }

    var h = 0L
    var i = 0
    while (i < w) { h = (h * 31L + cps(i)) % MPoly; i += 1 }
    update(h)
    var pw = 1L; i = 0
    while (i < w - 1) { pw = pw * 31L % MPoly; i += 1 }
    i = w
    while (i < n) {
      h = (h - cps(i - w) * pw % MPoly + MPoly) % MPoly // evict outgoing
      h = (h * 31L + cps(i)) % MPoly                    // admit incoming
      update(h)
      i += 1
    }
    new GenericArrayData(sig)
  }

  def column(text: Column, gram: Int, numHashes: Int): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(text), gram, numHashes))
}
