package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType}

/** 64-bit dHash of an opaque byte payload as ONE compiled per-row
  * kernel, returned as 8 byte-band values (band b holds gradient bits
  * 8b..8b+7) ready for LSH banding.
  *
  * Semantics (mirrored exactly by the SQL oracle): 65 brightness
  * samples at evenly strided byte positions — sample i reads byte
  * ⌊i·(n−1)/64⌋ — and gradient bit i = sample_i < sample_{i+1},
  * packed little-endian within each band.
  *
  * Rationale: the declarative form needs 65 named sample columns
  * feeding 8 band expressions; projection collapse inlines each
  * sample's substring/hex/conv snippet into every consumer and the
  * generated `processNext()` overflows janino's 64KB method limit —
  * whole-stage codegen then silently falls back to interpreted for
  * the hottest stage. One kernel call keeps the stage compiled and
  * reads each byte exactly once.
  *
  * Returns all-zero bands for payloads shorter than 2 bytes (no
  * gradient exists; callers filter empty payloads). */
case class DHashBandsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dhash_bands"

  override def nullSafeEval(a: Any): Any =
    DHashBandsExpr.compute(a.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DHashBandsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHashBandsExpr {
  val Bits = 64

  /** Static kernel shared by eval and generated code. */
  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val bands = new Array[Long](8)
    if (n >= 1) {
      var prev = bytes(0) & 0xff
      var i = 0
      while (i < Bits) {
        // sample i+1 at byte floor((i+1)*(n-1)/64); Long arithmetic so
        // payloads past ~33.5 MB (where (i+1)*(n-1) overflows Int) still
        // index correctly — the oracle side uses unbounded integers.
        val cur = bytes((((i + 1).toLong * (n - 1)) / Bits).toInt) & 0xff
        if (prev < cur) bands(i >> 3) |= (1L << (i & 7))
        prev = cur
        i += 1
      }
    }
    new GenericArrayData(bands)
  }
}
