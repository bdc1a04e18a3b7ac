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

/** The DISTINCT word n-gram set of a token array as 64-bit xxhash64
  * fingerprints (seed 42 — the same value Spark's `xxhash64()` SQL
  * function computes over each space-joined gram string), one compiled
  * per-row kernel.
  *
  * Rationale (guide §2.3 "shuffle fewer bytes" / §2.6): the LSH verify
  * join attaches each candidate doc's gram SET to the pair row and
  * intersects the two sets — the gram strings themselves never appear
  * in any output, only |∩| and the set sizes do. Shuffling ~20-byte
  * gram strings (and comparing them byte-wise inside array_intersect)
  * is pure overhead: an 8-byte fingerprint per gram carries the same
  * set algebra at a fraction of the exchange volume and compare width.
  *
  * Collision safety — the equality argument (pinned by ExtSpec's
  * hashed-vs-exact test): |∩|/|A|/|B| computed on hash sets differ
  * from the string-set values ONLY if two DISTINCT grams within the
  * union of one candidate pair's gram sets collide in the full 64-bit
  * space. For gram sets of size m₁, m₂ that probability is ≤
  * (m₁+m₂)²/2⁶⁵ per pair (birthday bound) — at m ≈ 10⁴ grams/doc
  * that is ~10⁻¹¹ per pair, so even 10¹⁰ verified candidate pairs at
  * 100 TB expect ≪ 1 affected pair; the driver's DuckDB oracle
  * computes the exact string-set jaccard and would catch any realized
  * collision as a hash mismatch. Dedup happens ON the hashes (a gram
  * string duplicated in the window stream maps to the same hash either
  * way), so the emitted array is exactly the hash SET.
  *
  * Returns an EMPTY array when the doc has fewer than `n` tokens —
  * same contract as [[WordNGramsExpr]]. */
case class WordNGramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n-gram width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_word_ngram_hashes"

  override def nullSafeEval(a: Any): Any =
    WordNGramsExpr.computeHashes(a.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordNGramsExpr.computeHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGramsExpr {
  private val Space = UTF8String.fromString(" ")

  /** xxhash64 seed used by Spark's `xxhash64()` function. */
  private val Xxh64Seed = 42L

  /** [[WordNGramHashesExpr]]'s kernel: the distinct gram-hash set, in
    * first-occurrence order (dedup on the hash — see the collision
    * argument on the expression). */
  def computeHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](len - n + 1)
    var m = 0
    val seen = new java.util.HashSet[java.lang.Long](2 * (len - n + 1))
    val window = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      var k = 0
      while (k < n) { window(k) = toks(i + k); k += 1 }
      val g = UTF8String.concatWs(Space, window: _*)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        g.getBaseObject, g.getBaseOffset, g.numBytes, Xxh64Seed)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

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
