package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The five Gopher rule counters in ONE byte pass.
  *
  * The column-algebra form costs a regex matcher per token for the
  * alphabetic test (`filter(toks, w => w.rlike("[A-Za-z]"))` — an
  * interpreted lambda compiling a java.util.regex per evaluation) plus
  * a `regexp_count` scan and three more array traversals; measured
  * ~1.9 s of the sf0.1 bench on `quality_gopher` alone, and the gate
  * re-pays it inside `curate_corpus_gopher`. This expression computes
  * identical values in a single scan of the UTF-8 bytes, inside
  * WholeStageCodegen.
  *
  * Semantics, byte for byte with the algebraic form (spec-pinned by
  * equivalence on random fixtures; the DuckDB twin is unchanged —
  * oracles mirror semantics, not implementation):
  *   - tokens: maximal non-whitespace runs ([[CanonTextExpr.isWs]] —
  *     the repo-wide `TextOps.tokens` contract)
  *   - n_words: token count
  *   - sum_chars: Σ CHARACTER lengths of tokens (code points — UTF-8
  *     continuation bytes don't count, matching Spark `length`)
  *   - n_alpha: tokens containing ≥ 1 ASCII letter
  *   - n_stop: tokens byte-equal to one of `stopwords`
  *   - n_sym: non-overlapping occurrences of '#' or "..." in the RAW
  *     text, exactly `regexp_count(t, "#|\.\.\.")`'s left-to-right
  *     scan (a '....' run counts once — the regex consumes 3 dots and
  *     the leftover single dot matches nothing)
  */
case class GopherCountersExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gopher_counters expects a string input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false)))

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    GopherCountersExpr.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the stopword byte table through a codegen reference — the
    // list is tiny and constant per plan
    val stopsRef = ctx.addReferenceObj("gopherStops", stopBytes,
      "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherCountersExpr.compute($c, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherCountersExpr {

  def compute(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    var nWords = 0L
    var sumChars = 0L
    var nAlpha = 0L
    var nStop = 0L
    var nSym = 0L
    var i = 0
    while (i < len) {
      val b = bytes(i)
      if (CanonTextExpr.isWs(b)) {
        // symbol scan covers whitespace positions too (it never
        // matches one, but the non-overlapping cursor must advance
        // uniformly); nothing else to do
        i += 1
      } else {
        // token span [i, end)
        val start = i
        var chars = 0L
        var hasAlpha = false
        while (i < len && !CanonTextExpr.isWs(bytes(i))) {
          val tb = bytes(i)
          // count code points: skip UTF-8 continuation bytes
          if ((tb & 0xc0) != 0x80) chars += 1
          if ((tb >= 'A' && tb <= 'Z') || (tb >= 'a' && tb <= 'z'))
            hasAlpha = true
          i += 1
        }
        nWords += 1
        sumChars += chars
        if (hasAlpha) nAlpha += 1
        if (matchesAny(bytes, start, i - start, stops)) nStop += 1
      }
    }
    // second cursor for the symbol scan: '#' (1 byte) or '...' (3
    // bytes), non-overlapping left-to-right — regexp_count semantics
    var j = 0
    while (j < len) {
      if (bytes(j) == '#') { nSym += 1; j += 1 }
      else if (bytes(j) == '.' && j + 2 < len &&
        bytes(j + 1) == '.' && bytes(j + 2) == '.') { nSym += 1; j += 3 }
      else j += 1
    }
    InternalRow(nWords, sumChars, nAlpha, nStop, nSym)
  }

  private def matchesAny(bytes: Array[Byte], off: Int, n: Int,
      stops: Array[Array[Byte]]): Boolean = {
    var k = 0
    while (k < stops.length) {
      val st = stops(k)
      if (st.length == n) {
        var m = 0
        while (m < n && bytes(off + m) == st(m)) m += 1
        if (m == n) return true
      }
      k += 1
    }
    false
  }
}

/** Column API for [[GopherCountersExpr]]. */
object GopherText {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def counters(text: Column, stopwords: Seq[String]): Column =
    column(GopherCountersExpr(expression(text), stopwords))
}
