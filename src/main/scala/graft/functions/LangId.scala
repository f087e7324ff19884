package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-word language ID as a single-pass native expression.
  *
  * Semantics (identical to the algebraic form in
  * [[graft.ext.TextOps.langId]] and its DuckDB oracle): lowercase the
  * text, tokenize on runs of non-`[a-z0-9]` bytes, count marker-word
  * hits per language profile, emit the argmax language (first
  * alphabetically on ties), `und` when nothing hits. Lowercasing is
  * ASCII `A-Z` only — multi-byte UTF-8 bytes are ≥ 0x80 and never match
  * the token class, so they act as delimiters exactly like the
  * oracle's `[^a-z0-9]+` regex on non-ASCII input.
  *
  * The algebraic form re-tokenizes and re-scans the token array once
  * per language (5 interpreted higher-order filters over 8-element
  * marker arrays); this is one scan of the bytes with a perfect-hash-
  * free linear probe over the 40 marker words, grouped by token length
  * (markers are 1–6 bytes, so most tokens short-circuit on length).
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects a string input, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangIdExpr {

  /** (language, markers) in alphabetical language order — must stay in
    * sync with [[graft.ext.TextOps.LangProfiles]]. */
  val Profiles: Array[(String, Array[String])] = Array(
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Array("the", "and", "of", "is", "to", "in", "that", "it"),
    "es" -> Array("el", "la", "los", "las", "y", "es", "que", "una"),
    "fr" -> Array("le", "la", "les", "et", "est", "que", "une", "dans"),
    "it" -> Array("il", "la", "che", "e", "di", "un", "per", "non"))

  private val NumLangs = Profiles.length
  private val LangNames = Profiles.map(_._1).map(UTF8String.fromString)
  private val Und = UTF8String.fromString("und")

  // markers as byte arrays, flattened with (langIdx) parallel array
  private val MarkerBytes: Array[Array[Byte]] =
    Profiles.flatMap(_._2).map(_.getBytes("UTF-8"))
  private val MarkerLang: Array[Int] =
    Profiles.zipWithIndex.flatMap { case ((_, ms), i) => ms.map(_ => i) }
  private val MaxMarkerLen = MarkerBytes.map(_.length).max

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** Token [start, end) in `bytes` (already token-class, pre-lowered
    * on comparison): bump the vote of every language whose marker
    * equals it. */
  private def vote(bytes: UTF8String, start: Int, end: Int,
      scores: Array[Int]): Unit = {
    val len = end - start
    if (len > MaxMarkerLen) return
    var m = 0
    while (m < MarkerBytes.length) {
      val mb = MarkerBytes(m)
      if (mb.length == len) {
        var i = 0
        var eq = true
        while (eq && i < len) {
          if (lower(bytes.getByte(start + i)) != mb(i)) eq = false
          i += 1
        }
        if (eq) scores(MarkerLang(m)) += 1
      }
      m += 1
    }
  }

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val scores = new Array[Int](NumLangs)
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val in = i < n && isTokenByte(s.getByte(i))
      if (in && tokStart < 0) tokStart = i
      else if (!in && tokStart >= 0) {
        vote(s, tokStart, i, scores)
        tokStart = -1
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < NumLangs) {
      if (scores(l) > best) { best = scores(l); bestIdx = l }
      l += 1
    }
    if (bestIdx < 0) Und else LangNames(bestIdx)
  }
}

/** Column API for [[LangIdExpr]]. */
object LangId {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def langId(text: Column): Column = column(LangIdExpr(expression(text)))
}
