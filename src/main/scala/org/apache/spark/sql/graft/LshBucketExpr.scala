package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane LSH bucket id over an ArrayType(DoubleType)
  * vector: bit p of the result = sign(v · plane_p) for `numPlanes`
  * deterministic ±1 hyperplanes (component sign = parity of the fixed
  * integer mix `(j·2654435761 + p·40503) % 97 % 2`).
  *
  * Replaces the HOF form (`aggregate(zip_with(...))` per plane — 8
  * interpreted lambda folds per row). This kernel is one fused
  * primitive loop inside whole-stage codegen, evaluated once per row
  * across the 8 planes. Semantics are BIT-IDENTICAL to the HOF form
  * and the DuckDB oracle: each plane's projection is a strict
  * left-to-right fold from 0.0, the bit test is strictly `> 0`.
  *
  * Lives in the org.apache.spark.sql namespace for the `private[sql]`
  * `AbstractDataType` contract; public surface is
  * graft.functions.LshBucket.
  */
case class LshBucketExpr(child: Expression, numPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var j = 0
      while (j < n) {
        val sign =
          if ((j.toLong * 2654435761L + p.toLong * 40503L) % 97 % 2 == 0) 1.0
          else -1.0
        s += v.getDouble(j) * sign
        j += 1
      }
      if (s > 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $numPlanes; $p++) {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double sign = (((long) $j * 2654435761L + (long) $p * 40503L) % 97 % 2 == 0) ? 1.0 : -1.0;
         |    $s += $a.getDouble($j) * sign;
         |  }
         |  if ($s > 0) $bucket |= 1L << $p;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
