package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object VectorLshSigs {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** All `tables` hyperplane sign-bit signatures of a float vector in
    * one pass — the codegen'd form of [[graft.ext.VectorLsh]]'s
    * algebraic signature (nested aggregate-in-transform lambdas are
    * interpreted per element: tables×nBits×dim closure evaluations per
    * row dominated the similarity_lsh bench at 8.6 s / 500 rows).
    * Bit-identical to the algebraic form (equivalence spec-pinned):
    * same xxhash64 chain ("vlsh", t, h, d from seed 42), same long →
    * double scaling, same sequential d-order summation, same bit
    * packing. */
  def signatures(vec: Column, nBits: Int, tables: Int): Column =
    column(VectorLshSig(expression(vec), nBits, tables))
}

/** Element d of table t's bit-h hyperplane is
  * XXH64(d ← h ← t ← "vlsh", seed 42) scaled to [−1, 1); bit h of
  * table t's signature is sign(Σ_d vec(d)·w(t,h,d)) packed MSB-first —
  * exactly Spark's `xxhash64(lit("vlsh"), t, h, d)` multi-argument
  * chain, so the algebraic twin produces identical longs.
  */
case class VectorLshSig(child: Expression, nBits: Int, tables: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, "nBits must be in [1, 63]")
  require(tables >= 1, "tables must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vector_lsh_sig expects array<float>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    VectorLshSig.compute(input.asInstanceOf[ArrayData], nBits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorLshSig.compute($c, $nBits, $tables)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorLshSig {

  // xxhash64("vlsh") with Spark's default seed 42 — the constant prefix
  // of every plane-component hash chain
  private val Base: Long = {
    val s = UTF8String.fromString("vlsh")
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
  }

  private val Scale: Double = 9.223372036854776e18 // == 2^63 as a double

  def compute(vec: ArrayData, nBits: Int, tables: Int): GenericArrayData = {
    val dim = vec.numElements()
    // widen once: ArrayData float reads in the hot loop cost a branch
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getFloat(d).toDouble; d += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val ht = XXH64.hashInt(t, Base)
      var sig = 0L
      var h = 0
      while (h < nBits) {
        val hth = XXH64.hashInt(h, ht)
        var dot = 0.0d
        d = 0
        while (d < dim) {
          dot += v(d) * (XXH64.hashInt(d, hth).toDouble / Scale)
          d += 1
        }
        sig = (sig << 1) | (if (dot > 0) 1L else 0L)
        h += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
