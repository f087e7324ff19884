package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the similarity hot path: dot product
  * of two `array<float>` columns, accumulated in double.
  *
  * Why not `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`:
  * higher-order functions evaluate their lambda per element through an
  * interpreted closure and sit outside whole-stage codegen, which is
  * exactly wrong for an operator that runs N×K times in a top-k scan.
  * This expression generates a tight primitive loop inside the
  * WholeStageCodegen stage.
  *
  * Accumulation is sequential (element order), so results are
  * deterministic and match a naive reference implementation bit-for-bit.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level vector math built on [[DotProductFloat]]. */
object VectorMath {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  def dotF(a: Column, b: Column): Column =
    column(DotProductFloat(expression(a), expression(b)))

  /** Cosine similarity = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))).
    * Written in exactly this form (not sqrt(na*nb)) so an oracle
    * computing the same formula agrees to the last bit before rounding.
    */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / (sqrt(dotF(a, a)) * sqrt(dotF(b, b)))
  }
}
