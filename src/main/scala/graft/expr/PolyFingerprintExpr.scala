package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the portable polynomial document
  * fingerprint (min over `shingle`-gram polynomial hashes mod 1e9+7 —
  * see graft.functions.PortableHash for the semantics contract and the
  * DuckDB-oracle formulation).
  *
  * Why not the higher-order-function formulation: `transform` +
  * `aggregate` evaluate interpreted — per row they allocate a lambda
  * frame per shingle per character and box every codepoint, and the
  * enclosing operator falls out of whole-stage codegen. That is
  * O(len·shingle) boxed work per document. This expression is the
  * Karp–Rabin rolling form — O(len) primitive arithmetic (drop the
  * outgoing codepoint via the precomputed 31^(w−1) term, push the
  * incoming one) — and stays inside codegen via a static call.
  *
  * Value-identical to the HOF form (same fold, same modulus; the
  * rolling update is the same value mod M) — pinned by
  * PortableHashSpec, and by the q113 oracle which hashes against
  * DuckDB's per-window `list_reduce`.
  */
case class PolyFingerprintExpr(child: Expression, shingle: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    PolyFingerprintExpr.compute(s.asInstanceOf[UTF8String], shingle)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.PolyFingerprintExpr.compute($c, $shingle)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyFingerprintExpr {
  final val M = 1000000007L

  /** Static entry shared by eval and generated code. Codepoint-based
    * (not UTF-16 units) so multibyte text hashes identically to the
    * character-indexed SQL formulations. */
  def compute(s: UTF8String, w: Int): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n <= w) { // single window = the whole (short) string
      var h = 0L; var i = 0
      while (i < n) { h = (h * 31L + cps(i)) % M; i += 1 }
      return h
    }
    var h = 0L; var i = 0
    while (i < w) { h = (h * 31L + cps(i)) % M; i += 1 }
    var min = h
    var pw = 1L; i = 0
    while (i < w - 1) { pw = pw * 31L % M; i += 1 }
    i = w
    while (i < n) {
      h = (h - cps(i - w) * pw % M + M) % M // evict the outgoing codepoint
      h = (h * 31L + cps(i)) % M            // admit the incoming one
      if (h < min) min = h
      i += 1
    }
    min
  }

  def column(text: Column, shingle: Int): Column =
    GraftBridge.column(PolyFingerprintExpr(GraftBridge.expression(text), shingle))
}
