package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text-hashing expressions for the dedup hot paths.
  *
  * The column-algebra formulations (`transform(sequence(...), ...)`
  * with per-element lambdas) evaluate an interpreted closure per
  * array element and sit outside whole-stage codegen — at 64 hash
  * slots × hundreds of shingles per document they dominate the whole
  * bench (ngram/minhash/simhash ≈ 54 s of a 78 s sf0.1 run). Each
  * expression here is one tight O(n) pass per row invoked from within
  * WholeStageCodegen.
  *
  * Hash family: XXH64 over UTF-8 bytes, seed 42 — identical to Spark's
  * `xxhash64` — so algebraic twins exist for every expression and the
  * specs pin equivalence.
  */
object TextHashes {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Distinct hashed word n-gram shingles (order unspecified). */
  def hashedShingles(text: Column, n: Int): Column =
    column(HashedWordShingles(expression(text), n))

  /** MinHash signature over a hashed-shingle array: slot j = min over
    * elements of XXH64(element, seed = j). */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    column(MinHashSig(expression(shingleHashes), k))

  /** 64-bit SimHash of the space-tokenized text: per-token xxhash64,
    * signed bit votes, sign → bit. Bit-identical to the column-algebra
    * form `aggregate(transform(split(text,' '), xxhash64), votes...)`. */
  def simhash(text: Column): Column =
    column(SimHash64(expression(text)))
}

/** Distinct XXH64 hashes of the word n-gram shingles of a
  * space-separated text.
  *
  * Tokens are the maximal runs between single-space separators —
  * exactly Spark `split(text, " ")` / DuckDB `string_split(text, ' ')`
  * semantics (consecutive spaces yield empty tokens). Joining n
  * consecutive tokens with a single space therefore reconstructs the
  * original byte span from the first token's start to the last token's
  * end, so each shingle hash is computed over that span with ZERO
  * string materialization. A 64-bit hash stands in for the shingle
  * string; collisions (~p² /2^64) are negligible for set-similarity.
  *
  * Texts with fewer than n tokens yield an empty array (callers filter
  * on size > 0, mirroring the algebraic form).
  */
case class HashedWordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, "shingle width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles expects a string input, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashedWordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedWordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedWordShingles {

  private val Seed = 42L

  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    // token start offsets: 0 and every byte after a space (0x20)
    var numToks = 1
    var i = 0
    while (i < len) { if (s.getByte(i) == ' ') numToks += 1; i += 1 }
    if (numToks < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](numToks)
    val ends = new Array[Int](numToks)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (s.getByte(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = len
    val numShingles = numToks - n + 1
    // distinct via a simple open-addressed long set (load ≤ 0.5)
    var cap = java.lang.Integer.highestOneBit(math.max(numShingles * 2 - 1, 4)) * 2
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](numShingles)
    var outN = 0
    var sIdx = 0
    while (sIdx < numShingles) {
      val from = starts(sIdx)
      val to = ends(sIdx + n - 1)
      val h = XXH64.hashUnsafeBytes(base, offset + from, to - from, Seed)
      // probe
      var slot = (h.toInt & (cap - 1))
      var found = false
      while (used(slot) && !found) {
        if (table(slot) == h) found = true else slot = (slot + 1) & (cap - 1)
      }
      if (!found) {
        used(slot) = true; table(slot) = h
        out(outN) = h; outN += 1
      }
      sIdx += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }
}

/** MinHash signature of a hashed-shingle array: k independent hash
  * families realized as XXH64(elementHash, seed = slot index); slot j
  * keeps the minimum. O(|shingles| × k) primitive ops, no allocation
  * beyond the k-slot output. Null/empty input → array of Long.MaxValue
  * (callers filter empty shingle sets upstream).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, "signature length must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def compute(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val e = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(e, j)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** 64-bit SimHash of space-separated text: one XXH64 per token (seed
  * 42, = Spark `xxhash64`), each of its 64 bits votes ±1, sign of the
  * vote sum is the output bit. Bit-identical to the algebraic
  * formulation over `split(text, " ")`, in one pass.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash expects a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private val Seed = 42L

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || s.getByte(i) == ' ') {
        val h = XXH64.hashUnsafeBytes(base, offset + start, i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
