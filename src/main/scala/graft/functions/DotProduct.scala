package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ArrayEqCountExpr, BoundedDistinctTopKAgg, BoundedTopKAgg, ColumnShim, DHashBandsExpr, DotProductExpr, LshBucketExpr, NearestCentroidsExpr, ShingleSigExpr, WordNGramsExpr}

/** Public Column surface for the native codegen'd dot product
  * (see org.apache.spark.sql.graft.DotProductExpr for the rationale). */
object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(DotProductExpr(ColumnShim.expression(a), ColumnShim.expression(b)))
}

/** Count of pairwise-equal positions in two long arrays (codegen'd). */
object ArrayEqCount {
  def apply(a: Column, b: Column): Column =
    ColumnShim.column(ArrayEqCountExpr(ColumnShim.expression(a), ColumnShim.expression(b)))
}

/** Whole-doc character-shingle MinHash signature (codegen'd kernel). */
object ShingleSig {
  def apply(text: Column, width: Int): Column =
    ColumnShim.column(ShingleSigExpr(ColumnShim.expression(text), width))
}

/** Bounded grouped top-k aggregate: keeps the k smallest structs under
  * field-order ordering, returned as a sorted array (see
  * org.apache.spark.sql.graft.BoundedTopKAgg for the heap/shuffle
  * rationale). Descending orders: negate the leading field. */
object BoundedTopK {
  def apply(k: Int, ordered: Column): Column =
    ColumnShim.column(
      BoundedTopKAgg(ColumnShim.expression(ordered), k).toAggregateExpression())
}

/** Bounded DISTINCT top-k aggregate — the KMV sketch's state algebra:
  * k smallest DISTINCT structs (duplicates never occupy a slot), as a
  * sorted array (see org.apache.spark.sql.graft.BoundedDistinctTopKAgg). */
object BoundedDistinctTopK {
  def apply(k: Int, ordered: Column): Column =
    ColumnShim.column(
      BoundedDistinctTopKAgg(ColumnShim.expression(ordered), k)
        .toAggregateExpression())
}

/** Random-hyperplane LSH bucket id of a double vector (codegen'd — one
  * fused loop replacing 8 interpreted HOF folds per row). */
object LshBucket {
  def apply(v: Column, numPlanes: Int): Column =
    ColumnShim.column(LshBucketExpr(ColumnShim.expression(v), numPlanes))
}

/** Space-joined word n-grams of a token array (codegen'd kernel; empty
  * array below width n, optional first-occurrence dedup). */
object WordNGrams {
  def apply(tokens: Column, n: Int, distinct: Boolean): Column =
    ColumnShim.column(
      WordNGramsExpr(ColumnShim.expression(tokens), n, distinct))
}

/** DISTINCT word n-grams of a token array as 64-bit xxhash64
  * fingerprints (codegen'd kernel) — the shuffle-narrow form the LSH
  * verify join consumes; see
  * [[org.apache.spark.sql.graft.WordNGramHashesExpr]] for the
  * collision-safety equality argument. */
object WordNGramHashes {
  def apply(tokens: Column, n: Int): Column =
    ColumnShim.column(
      org.apache.spark.sql.graft.WordNGramHashesExpr(
        ColumnShim.expression(tokens), n))
}

/** 64-bit dHash of a binary payload as 8 byte-band values (codegen'd
  * kernel — see [[org.apache.spark.sql.graft.DHashBandsExpr]]). */
object DHashBands {
  def apply(payload: Column): Column =
    ColumnShim.column(DHashBandsExpr(ColumnShim.expression(payload)))
}

/** Top-`maxProbe` nearest centroids of a double vector against a
  * driver-known (id, centroid) table, as an array of
  * (list_id, cn, sim) structs ordered by probe rank (codegen'd
  * kernel — see [[org.apache.spark.sql.graft.NearestCentroidsExpr]]
  * for the round-6/tie-to-lower-id argmax discipline). Centroid
  * norms are precomputed here with the same sequential fold the
  * kernel and the SQL oracle use. */
object NearestCentroids {
  def apply(v: Column, cents: Seq[(Long, Seq[Double])], maxProbe: Int): Column = {
    val ids = cents.map(_._1).toArray
    val mat = cents.map(_._2.toArray).toArray
    val norms = mat.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      math.sqrt(s)
    }
    ColumnShim.column(NearestCentroidsExpr(
      ColumnShim.expression(v), ids, mat, norms, maxProbe))
  }
}
