package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): hash every k-gram, then keep the minimum of each
  * sliding window of `w` grams, deduplicated in first-appearance
  * order. Near-identical documents share most fingerprints, so the
  * output is joinable for plagiarism-style containment detection.
  *
  * A native expression instead of column algebra because the
  * `transform(sequence(...), hash(substr(...)))` formulation
  * allocates one array slice per character: ~66 s for 500 docs. This
  * is one O(n) pass per row (monotonic-deque window minimum), invoked
  * from within whole-stage codegen.
  *
  * Grams are k consecutive CODE POINTS (so `substr(text, i, k)` in
  * any SQL engine names the same gram), hashed with the portable
  * md5 family reduced mod 2^61−1 — gram g hashes to
  * `md5_number_lower(g) % P` in DuckDB terms, over the UTF-8 bytes of
  * the gram, which are exactly the corresponding byte span of the
  * document. The distinct fingerprint SET is therefore reproducible
  * as `list_distinct(window-mins)` in an external oracle; only the
  * (irrelevant for joins) first-appearance ORDER is engine-specific.
  * An ASCII fast path skips code-point decoding (byte == char there).
  */
case class WinnowingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "gram length and window must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowingFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowingFingerprint.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingFingerprint {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
    // char-start byte offsets; ASCII fast path: numChars == numBytes
    // means offsets are the identity, skip the decode pass
    val nChars = s.numChars()
    var charStart: Array[Int] = null
    if (nChars != nBytes) {
      charStart = new Array[Int](nChars + 1)
      var b = 0
      var c = 0
      while (b < nBytes) {
        charStart(c) = b
        b += UTF8String.numBytesForFirstByte(bytes(b))
        c += 1
      }
      charStart(nChars) = nBytes
    }
    @inline def gramFrom(i: Int): Int = if (charStart == null) i else charStart(i)
    @inline def gramTo(i: Int): Int = {
      val e = math.min(i + k, nChars)
      if (charStart == null) e else charStart(e)
    }
    // documents shorter than one gram hash as a single short gram,
    // mirroring substr-past-end semantics
    val numGrams = math.max(nChars - k + 1, 1)
    val grams = new Array[Long](numGrams)
    var i = 0
    while (i < numGrams) {
      val from = gramFrom(i)
      grams(i) = PortableHash.modP(
        PortableHash.md5Lower64(bytes, from, gramTo(i) - from))
      i += 1
    }
    // monotonic deque of candidate minima (indices, increasing values)
    val deque = new Array[Int](numGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < numGrams) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      // first full window ends at w-1; short docs emit their single window
      if (i >= w - 1 || i == numGrams - 1) seen.add(grams(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}

/** Column API for [[WinnowingFingerprint]]. */
object Winnowing {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowingFingerprint(expression(text), k, w))
}
