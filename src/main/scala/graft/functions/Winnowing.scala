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
  * Rabin–Karp polynomial over the code-point values mod P = 2^61−1
  * (base [[PortableHash.GramBase]]): h(g) = Σ cp_i·B^{k-1-i} mod P.
  * Rolling makes it O(1) per gram — one multiply-add per position
  * instead of re-hashing k code points (the md5-per-gram form it
  * replaces cost +64% on the winnowing bench) — and the oracle twin
  * is plain SQL: `list_reduce([unicode(substr(g, i, 1)) ...],
  * (acc, c) -> (acc*B + c) % P)` in HUGEINT. The distinct
  * fingerprint SET is therefore reproducible externally; only the
  * (irrelevant for joins) first-appearance ORDER is engine-specific.
  * An ASCII fast path skips code-point decoding (byte == code point).
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
    // decode to code points once; ASCII fast path: numChars == numBytes
    // means every byte IS its code point, skip the decode
    val nChars = s.numChars()
    val cps = new Array[Int](nChars)
    if (nChars == nBytes) {
      var b = 0
      while (b < nBytes) { cps(b) = bytes(b) & 0xff; b += 1 }
    } else {
      var b = 0
      var c = 0
      while (b < nBytes) {
        val first = bytes(b) & 0xff
        val nb = UTF8String.numBytesForFirstByte(bytes(b))
        cps(c) = nb match {
          case 1 => first
          case 2 => ((first & 0x1f) << 6) | (bytes(b + 1) & 0x3f)
          case 3 => ((first & 0x0f) << 12) | ((bytes(b + 1) & 0x3f) << 6) |
            (bytes(b + 2) & 0x3f)
          case _ => ((first & 0x07) << 18) | ((bytes(b + 1) & 0x3f) << 12) |
            ((bytes(b + 2) & 0x3f) << 6) | (bytes(b + 3) & 0x3f)
        }
        b += nb
        c += 1
      }
    }
    // documents shorter than one gram hash as a single short gram,
    // mirroring substr-past-end semantics
    val B = PortableHash.GramBase
    val numGrams = math.max(nChars - k + 1, 1)
    val grams = new Array[Long](numGrams)
    // Horner for the first gram (shorter than k when nChars < k) ...
    val gLen = math.min(k, nChars)
    var h = 0L
    var g = 0
    while (g < gLen) { h = PortableHash.mulAddModP(B, h, cps(g)); g += 1 }
    grams(0) = h
    if (numGrams > 1) {
      // ... then roll: drop cp_{i-1}·B^{k-1}, shift by B, add cp_{i+k-1}
      val bk = PortableHash.powModP(B, k - 1)
      var i = 1
      while (i < numGrams) {
        var t = h - PortableHash.mulAddModP(bk, cps(i - 1), 0L)
        if (t < 0) t += PortableHash.P
        h = PortableHash.mulAddModP(B, t, cps(i + k - 1))
        grams(i) = h
        i += 1
      }
    }
    // monotonic deque of candidate minima (indices, increasing values)
    val deque = new Array[Int](numGrams)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
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
