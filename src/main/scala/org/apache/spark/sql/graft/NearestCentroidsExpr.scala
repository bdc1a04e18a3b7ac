package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Top-`maxProbe` nearest centroids of a double vector against a
  * driver-known centroid matrix, as ONE compiled per-row kernel.
  * Returns an array of (list_id, cn, sim) structs ordered by
  * (sim desc, list_id asc) — i.e. element p is probe rank p+1.
  *
  * Why a kernel and not crossJoin(broadcast(centroids)) + argmax:
  * the join materializes n×k scored rows — each dragging the full
  * vector payload — through a hash aggregate (or worse, a window
  * sort) just to keep the per-row max. With a corpus-adaptive list
  * count (k ≈ √(n/2), see graft.ext.Similarity.numLists) that
  * intermediate grows as n^1.5 ROWS; the kernel keeps the same
  * n·k·d flops but touches each row exactly once and stays inside
  * whole-stage codegen. The centroid matrix is bounded (≤ 4096×dim
  * doubles) and rides to executors as a plan reference object —
  * the same footprint the broadcast join would ship.
  *
  * Engine-independence discipline (mirrored by the SQL oracle):
  * sim = dot(v, c) / (‖v‖·‖c‖) with strict left-to-right folds
  * (the [[DotProductExpr]] contract), ROUNDED to 6 decimals before
  * any comparison — matching Spark's `round` (decimal HALF_UP via
  * the shortest-string representation) so sub-ulp differences can't
  * flip a probe ordering — and ties broken toward the lower list id.
  * The rounding hot path is a scaled floor; only values within 1e-7
  * of a .5 boundary fall back to the exact BigDecimal route, so the
  * per-candidate cost stays a handful of flops. */
case class NearestCentroidsExpr(
    child: Expression,
    listIds: Array[Long],
    centroids: Array[Array[Double]],
    norms: Array[Double],
    maxProbe: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("list_id", LongType, nullable = false),
      StructField("cn", DoubleType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(a: Any): Any =
    NearestCentroidsExpr.compute(
      a.asInstanceOf[ArrayData], listIds, centroids, norms, maxProbe)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("ncIds", listIds, "long[]")
    val cents = ctx.addReferenceObj("ncCents", centroids, "double[][]")
    val nrms = ctx.addReferenceObj("ncNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NearestCentroidsExpr.compute(" +
        s"$c, $ids, $cents, $nrms, $maxProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidsExpr {

  /** Spark-round(d, 6): scaled-floor fast path, exact decimal HALF_UP
    * fallback inside the 1e-7 ambiguity band around .5 (where the
    * scaled double can't attest which side of the boundary the decimal
    * value lies). Away from the band both routes produce the correctly
    * rounded double of the same 6-decimal value, so they agree. */
  def round6(d: Double): Double = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return d
    val scaled = d * 1e6
    val fl = math.floor(scaled)
    val frac = scaled - fl
    if (math.abs(frac - 0.5) < 1e-7) {
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    } else if (frac > 0.5) (fl + 1.0) / 1e6 else fl / 1e6
  }

  /** Static kernel shared by eval and generated code. */
  def compute(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
              norms: Array[Double], maxProbe: Int): ArrayData = {
    val d = v.numElements()
    // ‖v‖ by the same sequential fold as DotProductExpr + sqrt
    var ss = 0.0
    var i = 0
    while (i < d) { val x = v.getDouble(i); ss += x * x; i += 1 }
    val vnrm = math.sqrt(ss)
    val k = cents.length
    val m = math.min(maxProbe, k)
    val bestSim = new Array[Double](m)
    val bestId = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      val cv = cents(c)
      val n = math.min(d, cv.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += v.getDouble(j) * cv(j); j += 1 }
      // zero-norm guard (same contract as graft.ext.Similarity.cos6):
      // a zero-norm vector or degenerate all-zero centroid scores 0.0
      // instead of propagating NaN through every probe rank — it still
      // gets deterministic assignments (ties → lowest list ids), and
      // downstream inertia/pair math stays NaN-free
      val den = vnrm * norms(c)
      val sim = if (den > 0) round6(s / den) else 0.0
      // ascending list-id iteration + strictly-greater insertion =
      // rounded ties keep the lower list id, matching the oracle's
      // (sim DESC, list_id) row_number ordering
      if (filled < m || sim > bestSim(filled - 1)) {
        var p = filled
        if (p == m) p = m - 1
        while (p > 0 && sim > bestSim(p - 1)) {
          bestSim(p) = bestSim(p - 1); bestId(p) = bestId(p - 1); p -= 1
        }
        bestSim(p) = sim
        bestId(p) = c
        if (filled < m) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) {
      out(i) = InternalRow(ids(bestId(i)), norms(bestId(i)), bestSim(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
