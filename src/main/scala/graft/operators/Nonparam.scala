package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Distribution statistics that need exact GLOBAL ranks or CDFs:
  * Mann-Whitney U, Kolmogorov-Smirnov, PSI drift, Benford audit,
  * weighted median, market-basket pairs.
  *
  * The shared scale problem: exact ranks/CDFs over a whole table. A
  * single global window is a one-partition sort (the classic
  * parallelism collapse), so every operator here goes through
  * [[cumByValue]]: group to distinct values first (the fixture metrics
  * carry 2 decimals, so the distinct-value table is orders of
  * magnitude smaller than the rows and BOUNDED by the value domain),
  * then a two-stage cumulative sum — per-bucket windows in parallel
  * plus a bucket-prefix table that is vocabulary-sized (domain/width
  * buckets) and broadcast. No stage sorts more than one bucket of
  * distinct values in one task.
  *
  * Determinism: every statistic is derived from integer counts (exact
  * in doubles up to 2^53) through ONE mirrored IEEE op sequence;
  * ln()-terms are rounded to 9 decimals before any cross-engine
  * comparison surface (see Relational's header for the discipline).
  */
object Nonparam {

  /** Apriori support threshold for [[assocRulesParts]]: a pair must
    * co-occur in at least this many orders before any rule is scored. */
  val AssocMinSupport = 2

  /** Exclusive cumulative arm counts per distinct value, two-stage.
    * Input must have columns (x: double, ca: long, cb: long) with x
    * distinct; emits (x, ca, cb, cuma_excl, cumb_excl). `width` sets
    * the bucket granularity: domain/width buckets — pick it so bucket
    * count is 100s-1000s (the prefix table stays tiny) while each
    * bucket holds a bounded slice of distinct values. */
  private[operators] def cumByValue(byVal: DataFrame,
                                    width: Double): DataFrame = {
    val b = byVal.withColumn("bkt", floor(col("x") / width).cast("long"))
    val wIn = Window.partitionBy("bkt").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket-prefix totals: one row per bucket; the window over them is
    // single-partition but bounded by the value DOMAIN, not the data
    val wB = graft.BoundedWindow.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = b.groupBy("bkt")
      .agg(sum("ca").as("ta"), sum("cb").as("tb"))
      .select(col("bkt"),
        coalesce(sum(col("ta")).over(wB), lit(0L)).as("pa"),
        coalesce(sum(col("tb")).over(wB), lit(0L)).as("pb"))
    b.withColumn("ia", coalesce(sum(col("ca")).over(wIn), lit(0L)))
      .withColumn("ib", coalesce(sum(col("cb")).over(wIn), lit(0L)))
      .join(broadcast(prefix), Seq("bkt"))
      .select(col("x"), col("ca"), col("cb"),
        (col("ia") + col("pa")).as("cuma_excl"),
        (col("ib") + col("pb")).as("cumb_excl"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) with tie correction: does
    * urgent-priority spend stochastically dominate the rest? The
    * nonparametric twin of [[Relational.ttestUrgentSpend]] — the A/B
    * test that survives heavy tails. Average ranks come from the
    * distinct-value cumulative counts (rank arithmetic on integers:
    * avg rank of value v = #below + (#at+1)/2), so R₁ is a sum of
    * exact half-integers — order-independent in double. z uses the
    * normal approximation with the standard tie-corrected variance. */
  def mannWhitneySpend(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Tables.orders(spark, dir)
      .select(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("ua"),
        col("o_totalprice").as("x"))
      .groupBy("x")
      .agg(count(when(col("ua") === 1, 1)).as("ca"),
        count(when(col("ua") === 0, 1)).as("cb"))
    val s = cumByValue(byVal, 1000.0)
      .select(col("ca"), col("cb"),
        ((col("cuma_excl") + col("cumb_excl")).cast("double") +
          (col("ca") + col("cb") + 1).cast("double") / 2.0).as("avg_rank"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(col("ca").cast("double") * col("avg_rank")).as("r1"),
        sum((col("ca") + col("cb")) * (col("ca") + col("cb")) *
          (col("ca") + col("cb")) - (col("ca") + col("cb"))).as("tie"))
    val na = col("na").cast("double"); val nb = col("nb").cast("double")
    val n = (col("na") + col("nb")).cast("double")
    val u1 = col("r1") - na * (col("na") + 1).cast("double") / 2.0
    s.select(col("na").as("n_urgent"), col("nb").as("n_rest"),
      round(u1, 1).as("u_stat"),
      round((u1 - na * nb / 2.0) /
        sqrt(na * nb / 12.0 *
          ((n + 1.0) - col("tie").cast("double") / (n * (n - 1.0)))), 6)
        .as("z_stat"))
  }

  def mannWhitneySpendOracle: String =
    """WITH d AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
      |    END AS ua, o_totalprice AS x FROM orders),
      |g AS (SELECT x, CAST(COUNT(*) FILTER (WHERE ua = 1) AS BIGINT) AS ca,
      |    CAST(COUNT(*) FILTER (WHERE ua = 0) AS BIGINT) AS cb
      |  FROM d GROUP BY x),
      |c AS (SELECT x, ca, cb,
      |    COALESCE(SUM(ca) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cae,
      |    COALESCE(SUM(cb) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbe
      |  FROM g),
      |s AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
      |    SUM(CAST(ca AS DOUBLE) * (CAST(cae + cbe AS DOUBLE) +
      |      CAST(ca + cb + 1 AS DOUBLE) / 2.0)) AS r1,
      |    CAST(SUM((ca+cb)*(ca+cb)*(ca+cb) - (ca+cb)) AS BIGINT) AS tie
      |  FROM c)
      |SELECT na AS n_urgent, nb AS n_rest,
      |  round(r1 - CAST(na AS DOUBLE) * CAST(na + 1 AS DOUBLE) / 2.0, 1)
      |    AS u_stat,
      |  round((r1 - CAST(na AS DOUBLE) * CAST(na + 1 AS DOUBLE) / 2.0
      |      - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) /
      |    sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
      |      ((CAST(na + nb AS DOUBLE) + 1.0) - CAST(tie AS DOUBLE) /
      |        (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0)))), 6)
      |    AS z_stat
      |FROM s""".stripMargin

  /** Two-sample Kolmogorov-Smirnov: are click values and purchase
    * values drawn from the same distribution? D = sup|F₁−F₂| over the
    * pooled distinct values — exact empirical CDFs from the two-stage
    * cumulative counts, never a global sort. Per-value diffs are
    * rounded to 9 decimals (each is ONE subtraction of two exact
    * count ratios) so the sup and its argmin location compare
    * bit-identically across engines. */
  def ksTestEvents(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select((col("event_type") === "click").as("isa"), col("value").as("x"))
      .groupBy("x")
      .agg(count(when(col("isa"), 1)).as("ca"),
        count(when(!col("isa"), 1)).as("cb"))
    val tot = byVal.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val diffs = cumByValue(byVal, 10.0)
      .crossJoin(broadcast(tot))
      .select(col("x"), col("na"), col("nb"),
        round(abs((col("cuma_excl") + col("ca")).cast("double") /
            col("na").cast("double") -
          (col("cumb_excl") + col("cb")).cast("double") /
            col("nb").cast("double")), 9).as("d"))
    val top = diffs.agg(max(col("d")).as("d_stat"))
    diffs.join(broadcast(top), col("d") === col("d_stat"))
      .groupBy("na", "nb", "d_stat")
      .agg(min(col("x")).as("at_value"))
      .select(col("na").as("n_click"), col("nb").as("n_purchase"),
        round(col("d_stat"), 6).as("d_stat"),
        round(col("d_stat") *
          sqrt(col("na").cast("double") * col("nb").cast("double") /
            (col("na") + col("nb")).cast("double")), 6).as("ks_score"),
        col("at_value"))
  }

  def ksTestEventsOracle: String =
    """WITH d AS (SELECT event_type = 'click' AS isa, value AS x FROM events
      |    WHERE event_type IN ('click', 'purchase')),
      |g AS (SELECT x, CAST(COUNT(*) FILTER (WHERE isa) AS BIGINT) AS ca,
      |    CAST(COUNT(*) FILTER (WHERE NOT isa) AS BIGINT) AS cb
      |  FROM d GROUP BY x),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM g),
      |c AS (SELECT x,
      |    SUM(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cai,
      |    SUM(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cbi
      |  FROM g),
      |f AS (SELECT x, na, nb,
      |    round(abs(CAST(cai AS DOUBLE) / CAST(na AS DOUBLE) -
      |              CAST(cbi AS DOUBLE) / CAST(nb AS DOUBLE)), 9) AS d
      |  FROM c, t),
      |m AS (SELECT MAX(d) AS d_stat FROM f)
      |SELECT na AS n_click, nb AS n_purchase,
      |  round(d_stat, 6) AS d_stat,
      |  round(d_stat * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) /
      |    CAST(na + nb AS DOUBLE)), 6) AS ks_score,
      |  MIN(x) AS at_value
      |FROM f, m WHERE d = d_stat
      |GROUP BY na, nb, d_stat""".stripMargin

  /** Population Stability Index between the 1995-97 and 1998+ order
    * cohorts over fixed price bins — the drift monitor run on every
    * feature before a model (or data mix) refresh: PSI < 0.1 stable,
    * > 0.25 shifted. Fixed bins (domain/25k, capped at 20) make the
    * aggregation ONE map-side-partial pass to 20×2 counts; +0.5
    * Laplace smoothing keeps empty bins finite. Each bin's
    * (p−q)·ln(p/q) term is rounded to 9 then decimal-summed — the
    * ln-discipline that keeps the total identical at any parallelism. */
  def psiDriftPrice(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.orders(spark, dir)
      .select(least(floor(col("o_totalprice") / 25000), lit(19L)).as("bin"),
        (col("o_orderdate") < lit("1998-01-01").cast("timestamp")).as("isRef"))
      .groupBy("bin")
      .agg(count(when(col("isRef"), 1)).as("n_ref"),
        count(when(!col("isRef"), 1)).as("n_cur"))
    val tot = binned.agg(sum("n_ref").as("tr"), sum("n_cur").as("tc"))
    val terms = binned.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        ((col("n_ref").cast("double") + 0.5) /
          (col("tr").cast("double") + 10.0)).as("p"),
        ((col("n_cur").cast("double") + 0.5) /
          (col("tc").cast("double") + 10.0)).as("q"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round(col("p"), 6).as("p_ref"), round(col("q"), 6).as("p_cur"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 9).as("psi_term"))
    val total = terms.agg(
      sum(col("psi_term").cast(DecimalType(28, 12))).cast("double").as("t"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"),
        col("p_cur"), col("psi_term"), round(col("t"), 6).as("psi_total"))
      .orderBy("bin")
  }

  def psiDriftPriceOracle: String =
    """WITH b AS (SELECT CAST(least(floor(o_totalprice / 25000), 19) AS BIGINT)
      |      AS bin,
      |    o_orderdate < TIMESTAMP '1998-01-01' AS isref FROM orders),
      |g AS (SELECT bin, CAST(COUNT(*) FILTER (WHERE isref) AS BIGINT) AS n_ref,
      |    CAST(COUNT(*) FILTER (WHERE NOT isref) AS BIGINT) AS n_cur
      |  FROM b GROUP BY bin),
      |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
      |    CAST(SUM(n_cur) AS BIGINT) AS tc FROM g),
      |pq AS (SELECT bin, n_ref, n_cur,
      |    (CAST(n_ref AS DOUBLE) + 0.5) / (CAST(tr AS DOUBLE) + 10.0) AS p,
      |    (CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + 10.0) AS q
      |  FROM g, t),
      |terms AS (SELECT bin, n_ref, n_cur, round(p, 6) AS p_ref,
      |    round(q, 6) AS p_cur, round((p - q) * ln(p / q), 9) AS psi_term
      |  FROM pq),
      |tot AS (SELECT CAST(SUM(CAST(psi_term AS DECIMAL(28,12))) AS DOUBLE)
      |    AS t FROM terms)
      |SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term,
      |  round(t, 6) AS psi_total
      |FROM terms, tot ORDER BY bin""".stripMargin

  /** Benford first-digit audit of order totals — the classic
    * fabricated-data screen. The digit comes from STRING arithmetic
    * (first char of the exact cent count), never log10, so bin
    * assignment can't straddle an ulp; expected Benford shares are
    * ln-terms rounded to 9 before entering the χ² arithmetic. One
    * pass to 9 counts, everything downstream is on the 9-row table.
    * (Uniform fixture prices fail Benford loudly — the audit's
    * verdict column is the point, not conformity.) */
  def benfordPrice(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice") * 100)
        .cast("long").cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("observed_p"),
        round(log((col("digit").cast("double") + 1.0) /
          col("digit").cast("double")) / log(lit(10.0)), 9).as("benford_p"),
        col("total"))
      .select(col("digit"), col("n"), col("observed_p"), col("benford_p"),
        round(pow(col("n").cast("double") -
            col("total").cast("double") * col("benford_p"), 2.0) /
          (col("total").cast("double") * col("benford_p")), 6).as("chi2_term"))
      .orderBy("digit")
  }

  def benfordPriceOracle: String =
    """WITH d AS (SELECT substring(CAST(CAST(round(o_totalprice * 100, 0)
      |      AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM orders),
      |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
      |e AS (SELECT digit, n, total,
      |    round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed_p,
      |    round(ln((CAST(digit AS DOUBLE) + 1.0) / CAST(digit AS DOUBLE)) /
      |      ln(10.0), 9) AS benford_p
      |  FROM g, t)
      |SELECT digit, n, observed_p, benford_p,
      |  round(pow(CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * benford_p, 2.0)
      |    / (CAST(total AS DOUBLE) * benford_p), 6) AS chi2_term
      |FROM e ORDER BY digit""".stripMargin

  /** Weighted (lower) median of extended price per return flag,
    * weighted by quantity — the importance-weighted central tendency
    * used when rows carry unequal mass (token counts, sampling
    * weights). Sort-based: per-group running weight via a window
    * partitioned BY GROUP (parallelism = group count; for wide groups
    * this is the same per-group rank machinery as percentile_price),
    * then the smallest value whose doubled running weight reaches the
    * group total. Integer-valued weights keep every comparison exact;
    * no interpolation, so the result is an actual data value. */
  def weightedMedianPrice(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("cumw", sum(col("l_quantity")).over(w))
    val tot = cum.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("total_w"),
        count(lit(1)).as("n_items"))
    cum.join(broadcast(tot), Seq("l_returnflag"))
      .filter(col("cumw") * 2 >= col("total_w"))
      .groupBy("l_returnflag")
      .agg(min(col("l_extendedprice")).as("weighted_median"),
        first(col("total_w")).as("total_w"),
        first(col("n_items")).as("n_items"))
      .select(col("l_returnflag"), round(col("weighted_median"), 2)
        .as("weighted_median"), round(col("total_w"), 1).as("total_weight"),
        col("n_items"))
      .orderBy("l_returnflag")
  }

  def weightedMedianPriceOracle: String =
    """WITH c AS (SELECT l_returnflag, l_extendedprice, l_quantity,
      |    SUM(l_quantity) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
      |  FROM lineitem),
      |t AS (SELECT l_returnflag, SUM(l_quantity) AS total_w,
      |    CAST(COUNT(*) AS BIGINT) AS n_items FROM lineitem GROUP BY 1)
      |SELECT c.l_returnflag,
      |  round(MIN(c.l_extendedprice), 2) AS weighted_median,
      |  round(MIN(t.total_w), 1) AS total_weight,
      |  MIN(t.n_items) AS n_items
      |FROM c JOIN t USING (l_returnflag)
      |WHERE c.cumw * 2 >= t.total_w
      |GROUP BY c.l_returnflag ORDER BY c.l_returnflag""".stripMargin

  /** Market-basket co-purchase pairs: the top part pairs appearing in
    * the same order, with lift. The pair generation is a SELF-JOIN ON
    * THE ORDER KEY (co-partitioned, shuffle-once; quadratic only in
    * per-order basket size, which is bounded by business reality, not
    * data volume) — never a cross join. Lift's per-part order counts
    * join back on part keys; the final top-20 is a
    * TakeOrderedAndProject, not a global sort. */
  def copurchasePairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = d.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val partCnt = d.groupBy("l_partkey").agg(count(lit(1)).as("pc"))
    val pairs = d.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(d.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
    pairs
      .join(partCnt.select(col("l_partkey").as("p1"), col("pc").as("c1")),
        Seq("p1"))
      .join(partCnt.select(col("l_partkey").as("p2"), col("pc").as("c2")),
        Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("support"), col("c1"), col("c2"),
        round(col("support").cast("double") * col("n_orders").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double")), 6).as("lift"))
      .orderBy(col("support").desc, col("p1"), col("p2"))
      .limit(20)
  }

  def copurchasePairsOracle: String =
    """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |  FROM d),
      |pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS pc FROM d
      |  GROUP BY 1),
      |p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      |    CAST(COUNT(*) AS BIGINT) AS support
      |  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2)
      |SELECT p.p1, p.p2, p.support, c1.pc AS c1, c2.pc AS c2,
      |  round(CAST(p.support AS DOUBLE) * CAST(n.n_orders AS DOUBLE) /
      |    (CAST(c1.pc AS DOUBLE) * CAST(c2.pc AS DOUBLE)), 6) AS lift
      |FROM p JOIN pc c1 ON p.p1 = c1.l_partkey
      |  JOIN pc c2 ON p.p2 = c2.l_partkey, n
      |ORDER BY p.support DESC, p.p1, p.p2 LIMIT 20""".stripMargin

  /** Bootstrap replicate count for [[bootstrapMeanCi]]. */
  val BootReplicates = 32

  /** Poisson(1) CDF thresholds for the deterministic inverse-CDF
    * weight draw (k = number of thresholds below the uniform hash).
    * Fixed 10-decimal literals so both engines compare the identical
    * doubles — the tail is capped at 8 (P ≈ 1e-5 per draw). */
  val PoissonCdf: Seq[Double] = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508)

  /** Bootstrap confidence interval for the mean order value — by the
    * POISSON bootstrap, the resampling scheme that actually works
    * distributed (per-row replicate weights w ~ Poisson(1) instead of
    * drawing n rows with replacement, which would need global
    * coordination; E[w]=1 preserves the resample-size expectation).
    * Every weight is a pure hash of (row id, replicate id) through the
    * fixed inverse-CDF ladder [[PoissonCdf]] — deterministic, retry-
    * safe, and reconstructible by the oracle, the same no-rand() rule
    * the sampling family lives by (a production run swaps the salt
    * per experiment; the plan is identical).
    *
    * Scale shape: ONE fact scan exploded ×[[BootReplicates]], then a
    * map-side-partial hash agg to B rows; everything after —
    * percentile endpoints, the moment-formula standard error —
    * happens on the B-row frame. The percentile CI takes the lower
    * order statistic at rank 1+floor(q·(B−1)) (the quantile-sketch
    * convention).
    *
    * Replicate sums are partition-order-free EXACT integer sums of
    * w·x in 1e-4 units ("cents"): w·x is a 2-dp value by domain
    * (integer weight × 2-dp price), so cents = round(w·x·1e4) is the
    * exact scaled value (the double's representation error at
    * magnitude ≤ 1e7 is ≪ 0.5 at the 1e4 scale). The sum rides TWO
    * long buffers (hi = cents DIV 1e6, lo = cents MOD 1e6) instead of
    * one DECIMAL buffer: a decimal sum pays BigDecimal arithmetic per
    * exploded row (measured 4.5–5.3 s vs 1.2–1.7 s at sf0.1×32
    * replicates, scale-insensitive — r13 probe), while the split long
    * sums stay in codegen'd integer arithmetic and remain
    * overflow-safe far past fact scale (Σlo < 1e6·n overflows long at
    * n ≈ 9e12 rows per replicate; Σhi ≤ (w·x/100)·n at ≈ 2e14 rows —
    * both ≫ the ~1.5e11 orders rows of a 100 TB corpus). The exact
    * recombination hi·1e6+lo → ·1e-4 runs in decimal on the B-row
    * frame (double recombination would lose exactness past 2^53).
    * Equivalence with the former DECIMAL(28,10) accumulator is pinned
    * by NonparamSpec (identical replicate means on the fixture) and
    * the full oracle gate. */
  def bootstrapMeanCi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val b = BootReplicates
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice").as("x"))
    // ONE md5 per row; the 32 replicate uniforms derive from it via
    // the pairwise-independent affine family (the CMS/MinHash prime)
    // — 32 multiplies instead of 32 digest rounds per row
    val p = 2147483647L // 2^31-1, the sketch family's prime
    val reps = o
      .withColumn("h",
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 8),
          16, 10).cast("long"))
      .select(col("x"), col("h"),
        explode(array((0 until b).map(lit(_)): _*)).as("r"))
      .withColumn("u",
        (((lit(4099L) * col("r") + 8191L) * col("h") +
          (lit(9973L) * col("r") + 104729L)) % p).cast("double") / p)
      .withColumn("w", PoissonCdf.zipWithIndex.foldRight(
        lit(PoissonCdf.length).cast("long")) { case ((c, k), rest) =>
          when(col("u") < c, lit(k.toLong)).otherwise(rest)
        })
    // B rows, LAZY: the three downstream branches (both rank fetches +
    // the moment aggregate) re-reference the exploded fact pass in the
    // plan, but AQE exchange reuse dedupes them at runtime — the one
    // action reads the replicate aggregate's exchange once. An eager
    // BoundedCheckpoint here (r12) made the single-pass shape
    // structural but cost a driver-sequenced extra action BEFORE the
    // consumers ran: driver-measured 0.52×, quiet +16% — reverted
    // (r13). The broadcast audit instead proves the bound structurally:
    // grouping by "r" — the replicate index, explode of a ≤
    // [[BootReplicates]]-literal array — yields ≤ b rows at any corpus
    // size (PlanSpec's enum-domain grouping rule).
    // (A 2·b-aggregate-column single-pass form was also tried and
    // measured SLOWER: ~130 aggregate buffer fields fall out of
    // whole-stage codegen, and the Poisson ladder evaluates per
    // buffer instead of once per exploded row.)
    val means = reps
      // exact integer "cents" (1e-4 units) of the 2-dp product w·x —
      // see the header: split-long sums replace the BigDecimal-bound
      // DECIMAL accumulator (measured 3.5× on this stage, r13)
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
    val ranked = means // B rows — bounded by construction
      .select(col("m"), row_number().over(
        graft.BoundedWindow.orderBy(col("m"), col("r"))).as("rk"))
    val lo = 1 + math.floor(0.025 * (b - 1)).toLong
    val hi = 1 + math.floor(0.975 * (b - 1)).toLong
    val moments = means.agg(
      sum(col("m").cast(DecimalType(28, 10))).cast("double").as("s1"),
      sum(round(col("m") * col("m"), 6).cast(DecimalType(28, 10)))
        .cast("double").as("s2"))
    val point = o.agg(count(lit(1)).as("n_rows"),
      round(sum(col("x").cast(DecimalType(28, 4))).cast("double") /
        count(lit(1)), 6).as("point_mean"))
    point
      .crossJoin(broadcast(ranked.filter(col("rk") === lo)
        .select(col("m").as("boot_lo"))))
      .crossJoin(broadcast(ranked.filter(col("rk") === hi)
        .select(col("m").as("boot_hi"))))
      .crossJoin(broadcast(moments))
      .select(col("n_rows"), col("point_mean"), col("boot_lo"), col("boot_hi"),
        round(sqrt((col("s2") - col("s1") * col("s1") / b) / (b - 1)), 6)
          .as("boot_se"),
        lit(b.toLong).as("n_replicates"))
  }

  def bootstrapMeanCiOracle: String = {
    val b = BootReplicates
    val wCase = PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }
      .mkString(" ") + s" ELSE ${PoissonCdf.length}"
    val lo = 1 + math.floor(0.025 * (b - 1)).toLong
    val hi = 1 + math.floor(0.975 * (b - 1)).toLong
    s"""WITH reps AS (SELECT o_totalprice AS x, r.range AS r,
       |    CAST((((4099 * r.range + 8191) *
       |      CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
       |        1, 8)) AS BIGINT) +
       |      (9973 * r.range + 104729)) % 2147483647) AS DOUBLE)
       |      / 2147483647 AS u
       |  FROM orders CROSS JOIN range($b) r),
       |wr AS (SELECT x, r, CAST(CASE $wCase END AS BIGINT) AS w FROM reps),
       |-- exact integer sum of w·x in 1e-4 units, mirroring the Spark
       |-- side's split-long accumulator (DuckDB's SUM(BIGINT) is
       |-- HUGEINT, exact without the split); both engines then take
       |-- the identical nearest-double of the same exact 4-dp sum
       |means AS (SELECT r,
       |    round(CAST(SUM(CAST(round(w * x * 10000) AS BIGINT))
       |      AS DOUBLE) / 10000 / SUM(w), 6) AS m
       |  FROM wr GROUP BY r),
       |ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rk
       |  FROM means),
       |mom AS (SELECT CAST(SUM(CAST(m AS DECIMAL(28,10))) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST(round(m * m, 6) AS DECIMAL(28,10))) AS DOUBLE) AS s2
       |  FROM means),
       |pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    round(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
       |      / COUNT(*), 6) AS point_mean
       |  FROM orders)
       |SELECT pt.n_rows, pt.point_mean,
       |  (SELECT m FROM ranked WHERE rk = $lo) AS boot_lo,
       |  (SELECT m FROM ranked WHERE rk = $hi) AS boot_hi,
       |  round(sqrt((mom.s2 - mom.s1 * mom.s1 / $b) / ${b - 1}), 6)
       |    AS boot_se,
       |  CAST($b AS BIGINT) AS n_replicates
       |FROM pt, mom""".stripMargin
  }

  /** Association rules mined from the co-purchase pairs: for every
    * frequent unordered part pair {a, b} (support ≥ [[AssocMinSupport]]
    * orders), BOTH directed rules a→b and b→a with the three classic
    * measures — support (co-occurrence count), confidence
    * (supp(ab)/supp(antecedent) — the conditional attach rate a
    * recommender thresholds on), and lift (confidence over the
    * consequent's base rate — >1 ⇔ genuinely associated, not just
    * popular). Top-20 by confidence.
    *
    * Scale shape: identical to [[copurchasePairs]] — the pair
    * generation is a self-join ON THE ORDER KEY (co-partitioned,
    * quadratic only in basket size), the per-part counts join back on
    * part keys after the support filter has cut the pair set, and the
    * final top-20 is a TakeOrderedAndProject. The support filter is
    * the apriori step: downstream work is |frequent pairs|-sized, not
    * |pairs|-sized. */
  def assocRulesParts(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = d.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val partCnt = d.groupBy("l_partkey").agg(count(lit(1)).as("pc"))
    val pairs = d.select(col("l_orderkey"), col("l_partkey").as("p1"))
      .join(d.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
      .filter(col("support") >= AssocMinSupport)
    val rules = pairs.select(col("p1").as("antecedent"),
        col("p2").as("consequent"), col("support"))
      .unionByName(pairs.select(col("p2").as("antecedent"),
        col("p1").as("consequent"), col("support")))
    rules
      .join(partCnt.select(col("l_partkey").as("antecedent"),
        col("pc").as("n_antecedent")), Seq("antecedent"))
      .join(partCnt.select(col("l_partkey").as("consequent"),
        col("pc").as("n_consequent")), Seq("consequent"))
      .crossJoin(broadcast(nOrders))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("n_antecedent"), col("n_consequent"),
        round(col("support").cast("double") /
          col("n_antecedent").cast("double"), 6).as("confidence"),
        round(col("support").cast("double") * col("n_orders").cast("double") /
          (col("n_antecedent").cast("double") *
            col("n_consequent").cast("double")), 6).as("lift"))
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
      .limit(20)
  }

  def assocRulesPartsOracle: String =
    s"""WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
       |  FROM d),
       |pc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS pc FROM d
       |  GROUP BY 1),
       |p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       |    CAST(COUNT(*) AS BIGINT) AS support
       |  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $AssocMinSupport),
       |r AS (SELECT p1 AS antecedent, p2 AS consequent, support FROM p
       |  UNION ALL SELECT p2, p1, support FROM p)
       |SELECT r.antecedent, r.consequent, r.support,
       |  ca.pc AS n_antecedent, cc.pc AS n_consequent,
       |  round(CAST(r.support AS DOUBLE) / ca.pc, 6) AS confidence,
       |  round(CAST(r.support AS DOUBLE) * n.n_orders /
       |    (CAST(ca.pc AS DOUBLE) * cc.pc), 6) AS lift
       |FROM r JOIN pc ca ON r.antecedent = ca.l_partkey
       |  JOIN pc cc ON r.consequent = cc.l_partkey, n
       |ORDER BY confidence DESC, r.antecedent, r.consequent
       |LIMIT 20""".stripMargin

  /** Kruskal-Wallis H across the five order priorities on spend — the
    * k-group generalization of [[mannWhitneySpend]] (one-way ANOVA on
    * ranks; the omnibus "does ANY priority tier spend differently"
    * test). Ranks come from the same two-stage distinct-value
    * cumulative counts — the GLOBAL exclusive cumulative needs only
    * per-value totals, so adding groups costs nothing; per-group rank
    * sums are a join of the (value, group) count table against the
    * |values|-row rank frame. Average ranks are exact half-integers
    * (sums stay exact in double); the per-group R²/n terms are
    * rounded to 6 then decimal-summed so the 5-term Σ is
    * partition-order-free; tie correction from Σ(t³−t). Output: one
    * row per group (n, mean rank) with the H statistics broadcast on. */
  def kruskalWallisSpend(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("x"))
    val cnt = d.groupBy("x", "grp").agg(count(lit(1)).as("c"))
    val byVal = cnt.groupBy("x").agg(sum("c").as("ca"))
      .withColumn("cb", lit(0L))
    val ranks = cumByValue(byVal, 1000.0)
      .select(col("x"),
        (col("cuma_excl").cast("double") +
          (col("ca") + 1).cast("double") / 2.0).as("avg_rank"))
    val ties = byVal.agg(sum("ca").as("n_total"),
      sum(col("ca") * col("ca") * col("ca") - col("ca")).as("tie"))
    val per = cnt.join(ranks, Seq("x"))
      .groupBy("grp")
      .agg(sum("c").as("n_i"),
        sum(col("c").cast("double") * col("avg_rank")).as("r_i"))
    val h = per.select(col("n_i"), col("r_i"))
      .agg(sum(col("n_i")).as("k_check"),
        count(lit(1)).as("k"),
        // (38,6): r_i²/n_i reaches ~4e21 on a 100× probe corpus — a
        // (28,10) cast overflows there; 32 integer digits hold to
        // ~3e12 input rows, far past any single-table reality
        sum(round(col("r_i") * col("r_i") / col("n_i").cast("double"), 6)
          .cast(DecimalType(38, 6))).cast("double").as("s"))
      .crossJoin(broadcast(ties))
      .select(col("k"),
        col("n_total"),
        (lit(12.0) / (col("n_total").cast("double") *
          (col("n_total") + 1).cast("double")) * col("s") -
          lit(3.0) * (col("n_total") + 1).cast("double")).as("h_raw"),
        (lit(1.0) - col("tie").cast("double") /
          (col("n_total").cast("double") * col("n_total").cast("double") *
            col("n_total").cast("double") - col("n_total").cast("double")))
          .as("cc"))
      .select(col("k"), col("n_total"), round(col("h_raw"), 6).as("h_stat"),
        round(col("h_raw") / col("cc"), 6).as("h_tie_adjusted"),
        (col("k") - 1).as("df"))
    per.select(col("grp").as("priority"), col("n_i").as("n"),
        round(col("r_i") / col("n_i").cast("double"), 6).as("mean_rank"))
      .crossJoin(broadcast(h))
      .orderBy("priority")
  }

  def kruskalWallisSpendOracle: String =
    """WITH d AS (SELECT o_orderpriority AS grp, o_totalprice AS x
      |  FROM orders),
      |cnt AS (SELECT x, grp, CAST(COUNT(*) AS BIGINT) AS c FROM d
      |  GROUP BY x, grp),
      |bv AS (SELECT x, CAST(SUM(c) AS BIGINT) AS ca FROM cnt GROUP BY x),
      |rk AS (SELECT x,
      |    CAST(COALESCE(SUM(ca) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
      |      + CAST(ca + 1 AS DOUBLE) / 2.0 AS avg_rank
      |  FROM bv),
      |ties AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_total,
      |    CAST(SUM(ca*ca*ca - ca) AS BIGINT) AS tie FROM bv),
      |per AS (SELECT grp, CAST(SUM(c) AS BIGINT) AS n_i,
      |    SUM(CAST(c AS DOUBLE) * avg_rank) AS r_i
      |  FROM cnt JOIN rk USING (x) GROUP BY grp),
      |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, ties.n_total,
      |    12.0 / (CAST(ties.n_total AS DOUBLE) *
      |      CAST(ties.n_total + 1 AS DOUBLE)) *
      |      CAST(SUM(CAST(round(r_i * r_i / CAST(n_i AS DOUBLE), 6)
      |        AS DECIMAL(38,6))) AS DOUBLE)
      |      - 3.0 * CAST(ties.n_total + 1 AS DOUBLE) AS h_raw,
      |    1.0 - CAST(ties.tie AS DOUBLE) /
      |      (CAST(ties.n_total AS DOUBLE) * CAST(ties.n_total AS DOUBLE) *
      |        CAST(ties.n_total AS DOUBLE) - CAST(ties.n_total AS DOUBLE))
      |      AS cc
      |  FROM per, ties GROUP BY ties.n_total, ties.tie)
      |SELECT per.grp AS priority, per.n_i AS n,
      |  round(per.r_i / CAST(per.n_i AS DOUBLE), 6) AS mean_rank,
      |  h.k, h.n_total, round(h.h_raw, 6) AS h_stat,
      |  round(h.h_raw / h.cc, 6) AS h_tie_adjusted,
      |  h.k - 1 AS df
      |FROM per, h ORDER BY priority""".stripMargin
}
