package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (the rsync/LBFS/FastCDC family;
  * Muthitacharoen et al., "A Low-Bandwidth Network File System",
  * SOSP'01): a chunk boundary falls wherever the rolling hash of the
  * last `k` code points satisfies `h ≡ 0 (mod divisor)`, so boundary
  * positions depend only on LOCAL content. Insert a sentence at the
  * top of a document and every later boundary lands on the same
  * text — which is exactly what fixed-offset chunking cannot do, and
  * why CDC is the dedup modality for re-encoded/prefixed document
  * revisions: identical chunks re-align no matter how far they
  * shifted. Expected chunk length ≈ `divisor` code points (geometric;
  * production CDC adds min/max chunk clamps — FastCDC — which this
  * deliberately omits to keep the boundary rule pure and the SQL twin
  * one comprehension).
  *
  * Output: 0-based chunk START positions, always beginning with 0.
  * A gram at 0-based index i (covering code points [i, i+k)) that
  * satisfies the rule opens a new chunk at i+k (when i+k < length).
  *
  * Same native-expression rationale and the same portable Rabin–Karp
  * arithmetic as [[WinnowingFingerprint]] (base
  * [[PortableHash.GramBase]], mod P = 2⁶¹−1, code-point grams): one
  * O(n) rolling pass per row inside whole-stage codegen, and the
  * boundary set is reproducible in plain SQL.
  */
case class CdcChunkStarts(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression {

  require(k > 0, "gram length must be positive")
  require(divisor > 1, "divisor must exceed 1 (1 would cut every gram)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdcChunkStarts expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunkStarts.compute(input.asInstanceOf[UTF8String], k, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunkStarts.compute($c, $k, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunkStarts {

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int, divisor: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nBytes = bytes.length
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
    val B = PortableHash.GramBase
    val numGrams = math.max(nChars - k + 1, 1)
    val starts = new Array[Int](numGrams + 1)
    starts(0) = 0
    var nStarts = 1
    val gLen = math.min(k, nChars)
    var h = 0L
    var g = 0
    while (g < gLen) { h = PortableHash.mulAddModP(B, h, cps(g)); g += 1 }
    if (h % divisor == 0 && k < nChars) { starts(nStarts) = k; nStarts += 1 }
    if (numGrams > 1) {
      val bk = PortableHash.powModP(B, k - 1)
      var i = 1
      while (i < numGrams) {
        var t = h - PortableHash.mulAddModP(bk, cps(i - 1), 0L)
        if (t < 0) t += PortableHash.P
        h = PortableHash.mulAddModP(B, t, cps(i + k - 1))
        if (h % divisor == 0 && i + k < nChars) {
          starts(nStarts) = i + k; nStarts += 1
        }
        i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(starts, nStarts))
  }
}

/** Column API for [[CdcChunkStarts]]. */
object CdcChunking {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def cdcChunkStarts(text: Column, k: Int = 8, divisor: Int = 64): Column =
    column(CdcChunkStarts(expression(text), k, divisor))
}
