package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a token array as ONE compiled per-row
  * kernel, optionally de-duplicated (first-occurrence order — the same
  * order `array_distinct` keeps).
  *
  * Rationale: the declarative form
  * `transform(sequence(1, size(ws)-n+1), i -> concat_ws(' ',
  * element_at(ws, i), …))` evaluates its lambda INTERPRETED, and any
  * non-attribute `ws` embedded in the lambda body (e.g. an inline
  * `tokens(text)` split+filter) is re-evaluated per element — turning a
  * linear scan into O(|tokens|²) interpreted work per document. This
  * kernel reads the token array once, emits each window with a single
  * `UTF8String.concatWs`, and codegen keeps the surrounding projection
  * inside whole-stage codegen.
  *
  * Returns an EMPTY array when the doc has fewer than `n` tokens — the
  * same contract as the guarded declarative form (callers explode or
  * count, so short docs simply contribute nothing). */
case class WordNGramsExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n-gram width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(a: Any): Any =
    WordNGramsExpr.compute(a.asInstanceOf[ArrayData], n, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordNGramsExpr.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGramsExpr {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel shared by eval and generated code. */
  def compute(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[AnyRef])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.ArrayList[AnyRef](len - n + 1)
    val seen =
      if (distinct) new java.util.HashSet[UTF8String](2 * (len - n + 1)) else null
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      val g = UTF8String.concatWs(Space, window: _*)
      if (seen == null || seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
