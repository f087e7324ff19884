package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): xxhash64 every k-byte gram, then keep the minimum of
  * each sliding window of `w` grams, deduplicated in first-appearance
  * order. Near-identical documents share most fingerprints, so the
  * output is joinable for plagiarism-style containment detection.
  *
  * A native expression instead of column algebra because the
  * `transform(sequence(...), xxhash64(substr(...)))` formulation
  * allocates one array slice per character: ~66 s for 500 docs. This
  * is one O(n) pass per row (monotonic-deque window minimum), invoked
  * from within whole-stage codegen.
  *
  * Grams are byte-grams of the UTF-8 encoding (identical to char-grams
  * for ASCII corpora); hash seed matches Spark's `xxhash64` default (42).
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

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val n = s.numBytes()
    // documents shorter than one gram hash as a single short gram,
    // mirroring substr-past-end semantics
    val numGrams = math.max(n - k + 1, 1)
    val grams = new Array[Long](numGrams)
    var i = 0
    while (i < numGrams) {
      val len = math.min(k, n - i)
      grams(i) = XXH64.hashUnsafeBytes(base, offset + i, len, Seed)
      i += 1
    }
    val numWindows = math.max(numGrams - w + 1, 1)
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
