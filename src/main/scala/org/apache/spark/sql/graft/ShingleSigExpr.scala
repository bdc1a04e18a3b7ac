package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document character-shingle MinHash signature as ONE compiled
  * per-row kernel: slides a `width`-codepoint window over the text,
  * hashes each shingle (first 8 md5 hex chars as an unsigned int, mod
  * 2^31−1 — byte-identical to the SQL `md5`/`substr`/`conv` recipe the
  * oracle uses), and folds all `NumPerms` permutation minima in the
  * same loop.
  *
  * Rationale: the declarative form (`transform(sequence(...), substr)`
  * → `array_distinct` → `explode` → hash-aggregate) materializes
  * |docs|×|chars| shingle strings through an INTERPRETED lambda and
  * shuffles them into an aggregation, for a value that is a pure
  * per-document projection. This kernel is zero-shuffle, allocates no
  * shingle array, and (dedup being irrelevant under `min`) skips the
  * distinct entirely. Codegen emits a single static call, so the
  * surrounding projection stays inside whole-stage codegen.
  *
  * Returns array<bigint> of length NumPerms; EMPTY array when the text
  * is shorter than `width` codepoints (callers explode, so such docs
  * simply contribute no rows — same as the declarative form). */
case class ShingleSigExpr(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_sig"

  override def nullSafeEval(t: Any): Any =
    ShingleSigExpr.compute(t.asInstanceOf[UTF8String], width)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleSigExpr.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSigExpr {
  val NumPerms = 16
  val Prime = 2147483647L // 2^31-1

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String, width: Int): ArrayData = {
    val n = text.numChars()
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val md = digest.get()
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    // ASCII fast path: when byte count == char count every codepoint is
    // one byte, so the window can slide over the raw byte array with no
    // per-shingle substring/copy. Multi-byte text falls back to
    // codepoint-based UTF8String.substring (matching SQL substr).
    val ascii = if (text.numBytes == n) text.getBytes else null
    var i = 0
    while (i <= n - width) {
      md.reset()
      if (ascii != null) md.update(ascii, i, width)
      else md.update(text.substring(i, i + width).getBytes)
      val d = md.digest()
      // first 8 hex chars = first 4 digest bytes as an unsigned int
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % Prime
      var k = 0
      while (k < NumPerms) {
        val v = ((4099L * k + 8191L) * h + (9973L * k + 104729L)) % Prime
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
