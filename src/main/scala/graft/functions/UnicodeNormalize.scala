package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for multilingual corpus cleaning — the
  * step [[CanonText]] (byte-level, ASCII) deliberately skips: the same
  * text crawled twice can arrive composed (é = U+00E9) or decomposed
  * (e + U+0301) and would fingerprint as different documents.
  *
  * Two codegen'd scalar expressions, both with DuckDB twins so the
  * oracle replays them exactly:
  *  - [[NfcNormalizeExpr]] — canonical composition (Unicode NFC),
  *    DuckDB `nfc_normalize`.
  *  - [[StripAccentsExpr]] — canonical decomposition, then drop
  *    non-spacing marks (category Mn): é→e, ñ→n, ç→c, while
  *    compatibility forms survive untouched (ﬁ, ß, fullwidth ＡＢＣ) —
  *    byte-for-byte DuckDB `strip_accents` on every probed input
  *    (spec-pinned).
  *
  * Both are ASCII-fast-path per row: a pure-ASCII string (no byte ≥
  * 0x80) is already NFC and accent-free, so it returns unchanged with
  * no `String` materialization — on mostly-ASCII corpora the
  * normalizer costs one byte scan. No reference analog; EXT surface.
  */
object UnicodeNormalize {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Unicode NFC (canonical composition). */
  def nfcNormalize(text: Column): Column =
    column(NfcNormalizeExpr(expression(text)))

  /** Drop diacritics: NFD, remove non-spacing marks. */
  def stripAccents(text: Column): Column =
    column(StripAccentsExpr(expression(text)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def compute(s: UTF8String): UTF8String = {
    if (UnicodeHelpers.isAscii(s)) return s // ASCII is NFC by definition
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    StripAccentsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccentsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccentsExpr {
  def compute(s: UTF8String): UTF8String = {
    if (UnicodeHelpers.isAscii(s)) return s // no accents to strip
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

private[functions] object UnicodeHelpers {
  /** One byte scan; ASCII bytes are 0..0x7f (UTF-8 continuation and
    * lead bytes are ≥ 0x80, i.e. negative as signed bytes). */
  def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) return false
      i += 1
    }
    true
  }
}
