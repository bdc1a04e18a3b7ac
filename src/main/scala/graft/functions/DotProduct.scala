package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{ArrayEqCountExpr, ColumnShim, DotProductExpr, ShingleSigExpr, WordNGramsExpr}

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

/** Space-joined word n-grams of a token array (codegen'd kernel; empty
  * array below width n, optional first-occurrence dedup). */
object WordNGrams {
  def apply(tokens: Column, n: Int, distinct: Boolean): Column =
    ColumnShim.column(
      WordNGramsExpr(ColumnShim.expression(tokens), n, distinct))
}
