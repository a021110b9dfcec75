package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the first
  * step of every corpus-cleaning pipeline (composed forms make
  * byte-level dedup/fingerprinting see "é" and "é" as the same
  * text). Spark has no built-in normalizer; a Scala UDF would box every
  * row and break whole-stage codegen, so this wraps
  * `java.text.Normalizer` behind a static call that stays inside the
  * generated code. ASCII fast path: NFC is the identity on ASCII, so
  * the common case skips the normalizer allocation entirely.
  *
  * Cross-engine contract: NFC output is defined by the Unicode
  * standard, so DuckDB's `nfc_normalize` produces identical bytes —
  * q211 pins the composed cleaner against it.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Static entry shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    // ASCII is closed under NFC — skip the String round-trip
    if (isAscii(s)) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
