package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native dot product over two ArrayType(DoubleType) columns.
  *
  * Why a custom Catalyst Expression and not `aggregate(zip_with(...))`:
  * Spark's higher-order functions evaluate their lambdas interpreted,
  * outside whole-stage codegen — orders of magnitude slower per element
  * on a hot inner loop. Pairwise similarity evaluates this expression
  * O(candidates × dims) times; `doGenCode` keeps it a tight primitive
  * `double` loop inside the generated stage.
  *
  * Summation is a strict sequential left-to-right fold (same in eval
  * and generated code) so results are bit-identical to any engine that
  * folds the same way — required for oracle hash parity.
  *
  * Lives in the org.apache.spark.sql namespace because the input-type
  * contract (`AbstractDataType`) is `private[sql]`; the public surface
  * is graft.functions.DotProduct.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
