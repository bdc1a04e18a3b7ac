package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Nonparam}

/** Value-level invariants + plan-shape checks for the distribution
  * statistics suite (Mann-Whitney, KS, PSI, Benford, weighted median,
  * co-purchase) and interval coverage / CDC chunking. */
class NonparamSpec extends SparkSpec {

  test("mann-whitney U lies in [0, na*nb] and z is finite") {
    val r = Nonparam.mannWhitneySpend(spark, sf0001).collect().head
    val na = r.getAs[Long]("n_urgent"); val nb = r.getAs[Long]("n_rest")
    val u = r.getAs[Double]("u_stat"); val z = r.getAs[Double]("z_stat")
    assert(na > 0 && nb > 0 && na + nb == 1500)
    assert(u >= 0 && u <= na.toDouble * nb)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("ks statistic is a valid sup-distance in [0,1]") {
    val r = Nonparam.ksTestEvents(spark, sf0001).collect().head
    val d = r.getAs[Double]("d_stat")
    assert(d >= 0.0 && d <= 1.0)
    assert(r.getAs[Long]("n_click") > 0 && r.getAs[Long]("n_purchase") > 0)
  }

  test("psi terms are nonnegative and sum to psi_total") {
    val rows = Nonparam.psiDriftPrice(spark, sf0001).collect()
    assert(rows.length == 20)
    // (p-q)·ln(p/q) ≥ 0 always (same sign factors)
    assert(rows.forall(_.getAs[Double]("psi_term") >= 0.0))
    val total = rows.head.getAs[Double]("psi_total")
    val s = rows.map(_.getAs[Double]("psi_term")).sum
    assert(math.abs(s - total) < 1e-6, s"terms sum $s vs total $total")
  }

  test("benford audit covers digits 1-9 with probabilities that sum to 1") {
    val rows = Nonparam.benfordPrice(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("digit")).sorted.toSeq ==
      (1 to 9).map(_.toString))
    val expSum = rows.map(_.getAs[Double]("benford_p")).sum
    assert(math.abs(expSum - 1.0) < 1e-6)
    val obsSum = rows.map(_.getAs[Double]("observed_p")).sum
    assert(math.abs(obsSum - 1.0) < 1e-3)
  }

  test("weighted median splits the weight mass at least in half") {
    val cum = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
    Nonparam.weightedMedianPrice(spark, sf0001).collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val m = r.getAs[Double]("weighted_median")
      val w = cum.filter(col("l_returnflag") === flag)
      val tot = w.agg(sum("l_quantity")).collect().head.getDouble(0)
      val below = w.filter(col("l_extendedprice") <= m)
        .agg(sum("l_quantity")).collect().head.getDouble(0)
      assert(below * 2 >= tot, s"$flag: weight below median $below of $tot")
    }
  }

  test("poisson bootstrap: CI brackets the point mean at plausible width, weights are Poisson(1)-shaped") {
    val r = operators.Nonparam.bootstrapMeanCi(spark, sf0001).collect().head
    val (pm, lo, hi, se) = (r.getAs[Double]("point_mean"),
      r.getAs[Double]("boot_lo"), r.getAs[Double]("boot_hi"),
      r.getAs[Double]("boot_se"))
    assert(lo < pm && pm < hi, s"CI [$lo, $hi] misses the mean $pm")
    // the 95% percentile interval of B=32 replicate means spans
    // roughly ±2 se; allow [1, 8]·se per side for bootstrap noise
    assert(hi - lo > 2 * se && hi - lo < 16 * se,
      s"CI width ${hi - lo} implausible vs se $se")
    // the deterministic inverse-CDF draw must look Poisson(1): mean
    // weight ≈ 1 (hash uniformity; 1500·32 draws → ±3σ ≈ 0.014)
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), lit(0.0).as("x"))
    val meanW = o.select(
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"),
        explode(array((0 until 32).map(lit(_)): _*)).as("r"))
      .select(((((lit(4099L) * col("r") + 8191L) * col("h") +
        (lit(9973L) * col("r") + 104729L)) % 2147483647L).cast("double") /
        lit(2147483647L)).as("u"))
      .select(operators.Nonparam.PoissonCdf.zipWithIndex.foldRight(
        lit(operators.Nonparam.PoissonCdf.length).cast("long")) {
          case ((c, k), rest) => when(col("u") < c, lit(k.toLong)).otherwise(rest)
        }.as("w"))
      .agg(avg("w")).collect().head.getDouble(0)
    assert(math.abs(meanW - 1.0) < 0.05, s"mean weight $meanW drifts from 1")
  }

  test("bootstrap split-long replicate sums equal the DECIMAL(28,10) accumulator exactly") {
    // r13 pinned equivalence: the hi/lo split-long "cents" aggregate
    // (codegen integer sums, exact decimal recombination) must yield
    // the SAME rounded replicate mean as the former decimal
    // accumulator on every replicate — w·x is a 2-dp value (integer
    // weight × 2-dp price), so both forms sum the identical exact
    // 4-dp quantities; only the accumulator representation differs.
    import org.apache.spark.sql.types.DecimalType
    val p = 2147483647L
    val reps = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice").as("x"))
      .withColumn("h",
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long"))
      .select(col("x"), col("h"),
        explode(array((0 until 32).map(lit(_)): _*)).as("r"))
      .withColumn("u",
        (((lit(4099L) * col("r") + 8191L) * col("h") +
          (lit(9973L) * col("r") + 104729L)) % p).cast("double") / p)
      .withColumn("w", operators.Nonparam.PoissonCdf.zipWithIndex.foldRight(
        lit(operators.Nonparam.PoissonCdf.length).cast("long")) {
          case ((c, k), rest) => when(col("u") < c, lit(k.toLong)).otherwise(rest)
        })
    val decimalForm = reps.groupBy("r")
      .agg((sum(round(col("w") * col("x"), 4).cast(DecimalType(28, 10)))
          .cast("double") / sum(col("w"))).as("m0"))
      .select(col("r"), round(col("m0"), 6).as("m"))
      .orderBy("r").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val splitForm = reps
      .select(col("r"), col("w"),
        round(col("w") * col("x") * 10000).cast("long").as("cents"))
      .groupBy("r")
      .agg(sum(expr("cents DIV 1000000")).as("chi"),
        sum(col("cents") % 1000000L).as("clo"),
        sum(col("w")).as("ws"))
      .select(col("r"), round(
        ((col("chi").cast(DecimalType(38, 0)) * 1000000L + col("clo"))
          * lit(new java.math.BigDecimal("0.0001"))).cast("double") /
          col("ws"), 6).as("m"))
      .orderBy("r").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(decimalForm.length == 32 && splitForm.length == 32)
    decimalForm.zip(splitForm).foreach { case ((r1, m1), (r2, m2)) =>
      assert(r1 == r2 && m1 == m2, s"replicate $r1: $m1 vs $m2")
    }
  }

  test("experimentation family: DiD cell identity and CUPED's pooled-variance guarantee") {
    val did = operators.Relational.didSegmentSpend(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("mean_spend"))
      .toMap
    val est = operators.Relational.didSegmentSpend(spark, sf0001).collect()
      .head.getAs[Double]("did_estimate")
    // the estimate IS the 2×2 cell identity (to output rounding)
    val recomputed = (did(("treated", "post")) - did(("treated", "pre"))) -
      (did(("control", "post")) - did(("control", "pre")))
    assert(math.abs(est - recomputed) < 1e-4, s"$est vs $recomputed")
    val cuped = operators.Relational.cupedSegmentSpend(spark, sf0001).collect()
    // adj_diff is the adjusted-mean difference (internal consistency)
    val byArm = cuped.map(r => r.getString(0) -> r).toMap
    val adjDiff = byArm("treated").getAs[Double]("mean_y_adj") -
      byArm("control").getAs[Double]("mean_y_adj")
    assert(math.abs(byArm("treated").getAs[Double]("adj_diff") - adjDiff) < 1e-4)
    // θ is the OLS minimizer, so the POOLED var(Ỹ) ≤ var(Y); per-arm
    // reduction can dip epsilon-negative, never materially
    cuped.foreach { r =>
      val vr = r.getAs[Double]("var_reduction")
      assert(vr > -0.05 && vr < 1.0, s"${r.getString(0)} var_reduction $vr")
    }
  }

  test("copurchase pair generation is a key join, not a cartesian") {
    val df = Nonparam.copurchasePairs(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    val rows = df.collect()
    assert(rows.length == 20)
    // support is a sorted-desc count; every pair is canonical p1<p2
    assert(rows.forall(r => r.getAs[Long]("p1") < r.getAs[Long]("p2")))
    val sups = rows.map(_.getAs[Long]("support")).toSeq
    assert(sups == sups.sortBy(-_))
  }

  test("interval coverage: covered <= span, islands <= events") {
    val rows = EventOps.intervalCoverage(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("covered_seconds") <= math.max(r.getAs[Long]("span_seconds"), 1))
      assert(r.getAs[Long]("n_islands") <= r.getAs[Long]("n_events"))
      val u = r.getAs[Double]("utilization")
      assert(u >= 0.0 && u <= 1.0)
    }
  }

  test("cdc chunk lengths reassemble every document exactly") {
    val rows = graft.ext.Dedup.cdcChunks(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalLen = rows.map(r =>
      r.getAs[Double]("avg_chunk_len") * r.getAs[Long]("n_chunks")).sum
    val expected = Tables.documents(spark, sf0001)
      .filter(length(col("text")) >= 8)
      .agg(sum(length(col("text")))).collect().head.getLong(0)
    // avg is rounded to 1e-6, so reassembled total is within n_chunks*1e-6
    assert(math.abs(totalLen - expected.toDouble) < 1.0,
      s"chunks reassemble to $totalLen, corpus is $expected chars")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_chunks") <= r.getAs[Long]("n_chunks"))
    }
  }
}
