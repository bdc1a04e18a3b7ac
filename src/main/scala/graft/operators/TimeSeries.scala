package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Time-series diagnostics over the daily order-revenue series:
  * autocorrelation, CUSUM changepoint, truncated-EWMA smoothing,
  * day-of-week seasonality. These are the monitoring primitives run
  * over ingest volumes and metric streams (is yesterday's drop noise
  * or a level shift? is the weekly cycle real?).
  *
  * The shared scale shape: ONE input-sized aggregation reduces the
  * fact table to a day-keyed series (map-side partial sums; the day
  * domain is bounded by the calendar, not data volume — seven years
  * is ~2.5k rows), and every statistic runs on that domain-bounded
  * frame with broadcast joins. Nothing downstream of the first
  * aggregation ever shuffles input-sized data; at 100 TB the series
  * frame is still kilobytes.
  *
  * Determinism: daily sums are exact DECIMAL(18,2); the mean and
  * every deviation/product derive from them through IEEE +,-,*,/
  * ops, which are correctly-rounded and therefore bit-identical
  * across engines — only multi-term summation is order-dependent,
  * so every Σ over series terms goes through a DECIMAL(38,6) cast
  * (exact, order-free). No ln/exp anywhere in this family. */
object TimeSeries {

  private def dsum2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Order-free sum of deterministic double terms (see header). */
  private def dsum6(c: Column): Column =
    sum(c.cast(DecimalType(38, 6))).cast("double")

  /** (d: date, x: double) daily revenue — the one input-sized pass. */
  private def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(dsum2(col("o_totalprice")).as("x"))

  /** Autocorrelation of daily revenue at lags 1..7 — "does today
    * predict tomorrow / the same weekday next week". r_k =
    * Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², pairs formed by a date-shift
    * self-join on the day frame (missing days drop out of lag pairs
    * identically in both engines). The lag explode is 7× the SERIES,
    * not the input. */
  def acfDailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val day = daily(spark, dir)
    val stats = day.agg(count(lit(1)).as("n"), dsum2(col("x")).as("s"))
      .select(col("n"), (col("s") / col("n")).as("mean"))
    val dev = day.crossJoin(broadcast(stats))
      .select(col("d"), (col("x") - col("mean")).as("dev"))
    val denom = dev.agg(dsum6(col("dev") * col("dev")).as("ss"))
    val lagged = dev.select(
        explode(sequence(lit(1), lit(7))).as("lag"), col("d"), col("dev"))
      .withColumn("d2", date_add(col("d"), col("lag")))
    val pairs = lagged.join(
      dev.select(col("d").as("d2"), col("dev").as("dev2")), Seq("d2"))
    pairs.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), dsum6(col("dev") * col("dev2")).as("num"))
      .crossJoin(broadcast(denom))
      .select(col("lag"), col("n_pairs"),
        round(col("num") / col("ss"), 6).as("acf"))
      .orderBy("lag")
  }

  def acfDailyRevenueOracle: String =
    """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM orders GROUP BY 1),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean
      |  FROM day),
      |dev AS (SELECT d, x - st.mean AS dev FROM day, st),
      |den AS (SELECT CAST(SUM(CAST(dev * dev AS DECIMAL(38,6))) AS DOUBLE)
      |    AS ss FROM dev),
      |lagged AS (SELECT lag, d, dev, d + CAST(lag AS INTEGER) AS d2
      |  FROM dev, (SELECT unnest(range(1, 8)) AS lag) l),
      |pairs AS (SELECT a.lag, a.dev AS dev, b.dev AS dev2
      |  FROM lagged a JOIN dev b ON a.d2 = b.d)
      |SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  round(CAST(SUM(CAST(dev * dev2 AS DECIMAL(38,6))) AS DOUBLE) /
      |    MIN(den.ss), 6) AS acf
      |FROM pairs, den GROUP BY lag ORDER BY lag""".stripMargin

  /** CUSUM changepoint scan: the day where the cumulative sum of
    * mean-deviations peaks in magnitude — the classic level-shift
    * detector (a mean shift makes |S_t| drift to a max at the change
    * point). The cumulative window runs over the single day series —
    * ONE partition but calendar-bounded rows (the documented
    * domain-not-data stance; a decade is <4k rows). The normalized
    * statistic |S|max/(σ√n) is the one monitors threshold (~>1.36
    * rejects "no change" at 5%). Decimal window sums keep every S_t
    * exact, so the argmax and its tiebreak (earliest day) are
    * engine-independent without rounding. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val day = daily(spark, dir)
    val stats = day.agg(count(lit(1)).as("n"), dsum2(col("x")).as("s"))
      .select(col("n"), (col("s") / col("n")).as("mean"))
    val dev = day.crossJoin(broadcast(stats))
      .select(col("d"), col("n"), col("mean"), (col("x") - col("mean")).as("dev"))
    val sd = dev.groupBy("n", "mean")
      .agg(sqrt(dsum6(col("dev") * col("dev")) /
        col("n").cast("double")).as("sigma"))
      .select(col("sigma"), col("n"), col("mean"))
    val wCum = graft.BoundedWindow.orderBy(col("d")) // one row per day: calendar-bounded
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dev.select(col("d"),
      sum(col("dev").cast(DecimalType(38, 6))).over(wCum).cast("double").as("s_t"))
    val mx = cum.agg(max(abs(col("s_t"))).as("s_max"))
    cum.crossJoin(broadcast(mx))
      .filter(abs(col("s_t")) === col("s_max"))
      .groupBy("s_max")
      .agg(min(col("d")).as("change_day"), min(col("s_t")).as("s_at_max"))
      .crossJoin(broadcast(sd))
      .select(col("n").as("n_days"), round(col("mean"), 2).as("mean_daily"),
        col("change_day"), round(col("s_at_max"), 2).as("s_at_max"),
        round(col("s_max") / (col("sigma") *
          sqrt(col("n").cast("double"))), 6).as("cusum_stat"))
  }

  def cusumChangepointOracle: String =
    """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM orders GROUP BY 1),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean
      |  FROM day),
      |dev AS (SELECT d, x - st.mean AS dev FROM day, st),
      |sd AS (SELECT sqrt(CAST(SUM(CAST(dev * dev AS DECIMAL(38,6)))
      |      AS DOUBLE) / st.n) AS sigma, MIN(st.n) AS n, MIN(st.mean) AS mean
      |  FROM dev, st GROUP BY st.n),
      |cum AS (SELECT d, CAST(SUM(CAST(dev AS DECIMAL(38,6)))
      |      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS s_t FROM dev),
      |mx AS (SELECT MAX(abs(s_t)) AS s_max FROM cum),
      |pk AS (SELECT mx.s_max, MIN(cum.d) AS change_day, MIN(cum.s_t) AS s_at_max
      |  FROM cum, mx WHERE abs(cum.s_t) = mx.s_max GROUP BY mx.s_max)
      |SELECT sd.n AS n_days, round(sd.mean, 2) AS mean_daily, pk.change_day,
      |  round(pk.s_at_max, 2) AS s_at_max,
      |  round(pk.s_max / (sd.sigma * sqrt(CAST(sd.n AS DOUBLE))), 6)
      |    AS cusum_stat
      |FROM pk, sd""".stripMargin

  val EwmaAlpha = 0.3
  val EwmaWindow = 30

  /** Truncated-EWMA weights α(1−α)^k, k=0..29, rounded to 12 decimals
    * and embedded as identical literals in BOTH engines' plans — the
    * weight table is part of the operator definition, so cross-engine
    * pow() is never invoked. (1−α)^30 < 2e-5, so the truncation tail
    * is far below the output's 2-decimal rounding.) */
  private[graft] val ewmaWeights: IndexedSeq[BigDecimal] =
    (0 until EwmaWindow).map { k =>
      BigDecimal(EwmaAlpha * math.pow(1.0 - EwmaAlpha, k))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }

  /** EWMA-smoothed daily revenue — the "is today off-trend" monitor
    * line. Truncated to a 30-day window and renormalized by the
    * weight mass actually present (Σw over observed days), which
    * makes the start of the series and calendar gaps well-defined:
    * ewma_t = Σ_k w_k x_{t−k} / Σ_k w_k. The weight join explodes
    * the SERIES 30× (domain-bounded), never the input; weighted
    * terms are decimal-summed. Emits the most recent 60 days —
    * the monitoring window a dashboard would show. */
  def ewmaDailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val day = daily(spark, dir).localCheckpoint()
    val weights = ewmaWeights.zipWithIndex.map { case (w, k) =>
      struct(lit(k).as("k"), lit(w.toDouble).as("w"))
    }
    val lagged = day
      .select(col("d"), explode(array(weights: _*)).as("kw"))
      .select(col("d"), col("kw.k").as("k"), col("kw.w").as("w"))
      .withColumn("dsrc", date_sub(col("d"), col("k")))
    val terms = lagged.join(
      day.select(col("d").as("dsrc"), col("x").as("xs")), Seq("dsrc"))
    val ew = terms.groupBy("d")
      .agg(dsum6(col("w") * col("xs")).as("wx"), dsum6(col("w")).as("wsum"),
        count(lit(1)).as("n_obs"))
      .select(col("d"), col("n_obs"), round(col("wx") / col("wsum"), 2).as("ewma"))
    val cutoff = day.agg(date_sub(max(col("d")), 59).as("lo"))
    day.join(ew, Seq("d")).crossJoin(broadcast(cutoff))
      .filter(col("d") >= col("lo"))
      .select(col("d"), col("x").as("revenue"), col("n_obs"), col("ewma"))
      .orderBy("d")
  }

  def ewmaDailyRevenueOracle: String = {
    val weightRows = ewmaWeights.zipWithIndex
      .map { case (w, k) => s"($k, ${w.toString})" }.mkString(", ")
    s"""WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
       |  FROM orders GROUP BY 1),
       |wt0 (k, w0) AS (VALUES $weightRows),
       |-- w0 parses as DECIMAL(13,12); DuckDB truncates decimal→decimal
       |-- casts (0.0000009 → 0.0 at scale 6) while double→decimal rounds
       |-- like Spark — route through DOUBLE so both engines round.
       |wt AS (SELECT k, CAST(w0 AS DOUBLE) AS w FROM wt0),
       |lagged AS (SELECT day.d, wt.k, wt.w,
       |    day.d - CAST(wt.k AS INTEGER) AS dsrc FROM day, wt),
       |terms AS (SELECT l.d, l.w, s.x AS xs
       |  FROM lagged l JOIN day s ON l.dsrc = s.d),
       |ew AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_obs,
       |    round(CAST(SUM(CAST(w * xs AS DECIMAL(38,6))) AS DOUBLE) /
       |      CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE), 2) AS ewma
       |  FROM terms GROUP BY d),
       |cutoff AS (SELECT MAX(d) - 59 AS lo FROM day)
       |SELECT day.d, day.x AS revenue, ew.n_obs, ew.ewma
       |FROM day JOIN ew USING (d), cutoff
       |WHERE day.d >= cutoff.lo ORDER BY day.d""".stripMargin
  }

  /** Day-of-week seasonality profile (0=Sunday): per-weekday mean
    * revenue, the multiplicative seasonal index (weekday mean /
    * overall mean), and ONE shared variance-reduction column — how
    * much of the daily variance the weekly cycle explains
    * (1 − var(x/idx)/var(x), the signal a synthetic-uniform series
    * shows ≈0 on, which is itself the point of the audit). */
  def seasonalityDow(spark: SparkSession, dir: String): DataFrame = {
    val day = daily(spark, dir)
      .select(col("d"), col("x"), (dayofweek(col("d")) - 1).cast("long").as("dow"))
    val overall = day.agg(count(lit(1)).as("n"), dsum2(col("x")).as("s"))
      .select(col("n"), (col("s") / col("n")).as("mean"))
    val byDow = day.groupBy("dow")
      .agg(count(lit(1)).as("n_days"), dsum2(col("x")).as("sd"))
      .crossJoin(broadcast(overall))
      .select(col("dow"), col("n_days"),
        (col("sd") / col("n_days")).as("dow_mean"),
        ((col("sd") / col("n_days")) / col("mean")).as("idx"))
    val deseason = day.join(broadcast(byDow.select(col("dow"), col("idx"))), Seq("dow"))
      .crossJoin(broadcast(overall))
      .select(col("x"), (col("x") / col("idx")).as("xd"), col("mean"))
    val vr = deseason.agg(
        (dsum6((col("x") - col("mean")) * (col("x") - col("mean"))))
          .as("var_raw"),
        (dsum6((col("xd") - col("mean")) * (col("xd") - col("mean"))))
          .as("var_des"))
      .select(round(lit(1.0) - col("var_des") / col("var_raw"), 6)
        .as("var_explained"))
    byDow.crossJoin(broadcast(vr))
      .select(col("dow"), col("n_days"), round(col("dow_mean"), 2).as("mean_revenue"),
        round(col("idx"), 6).as("seasonal_index"), col("var_explained"))
      .orderBy("dow")
  }

  def seasonalityDowOracle: String =
    """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM orders GROUP BY 1),
      |dd AS (SELECT d, x, CAST(dayofweek(d) AS BIGINT) AS dow FROM day),
      |ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean
      |  FROM dd),
      |bd AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS dow_mean
      |  FROM dd GROUP BY dow),
      |bi AS (SELECT bd.dow, bd.n_days, bd.dow_mean,
      |    bd.dow_mean / ov.mean AS idx FROM bd, ov),
      |des AS (SELECT dd.x, dd.x / bi.idx AS xd, ov.mean
      |  FROM dd JOIN bi USING (dow), ov),
      |vr AS (SELECT round(1.0 -
      |    CAST(SUM(CAST((xd - mean) * (xd - mean) AS DECIMAL(38,6))) AS DOUBLE) /
      |    CAST(SUM(CAST((x - mean) * (x - mean) AS DECIMAL(38,6))) AS DOUBLE), 6)
      |      AS var_explained FROM des)
      |SELECT bi.dow, bi.n_days, round(bi.dow_mean, 2) AS mean_revenue,
      |  round(bi.idx, 6) AS seasonal_index, vr.var_explained
      |FROM bi, vr ORDER BY bi.dow""".stripMargin

  /** Robust trend on the daily series: the Mann-Kendall test (is
    * there a monotone trend, distribution-free) paired with the
    * Theil-Sen slope (how steep, outlier-immune) — the standard
    * robust alternative to OLS on monitoring series, where one spike
    * day would drag a least-squares fit.
    *
    * Both statistics are pairwise over DAYS — calendar²-bounded (a
    * decade is <7M pairs), never input-sized, formed AFTER the one
    * input-sized daily aggregation (the family contract above). The
    * input-sized work is exactly that aggregation; the pairwise
    * arithmetic then runs driver-side over the collected day series
    * (a bounded output-of-aggregation collect — see the body
    * comment), mirroring quantile_cont's lo + (hi−lo)·frac median
    * formula so engines agree to the last ulp. z uses the standard
    * continuity correction; |z| > 1.96 calls the 5% two-sided
    * trend. */
  def trendRobust(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE distributed aggregate (orders → daily revenue), then the
    // pairwise Mann-Kendall / Theil-Sen arithmetic runs on the driver
    // over the collected series. Bounded-collect justification: the
    // day frame is OUTPUT-of-aggregation and calendar-bounded (≤ a
    // few thousand rows for years of data, regardless of corpus
    // size) — the same class as the union-find edge set and the Lloyd
    // centroid matrices (SCALE.md). The previous all-DataFrame form
    // spent ~7 s of scheduler rounds at ANY scale (localCheckpoints,
    // broadcast builds, the bucketed rank fetch) to process a few
    // hundred rows. Arithmetic mirrors the oracle step for step:
    // integer S, slope = diff/gap in IEEE double, interpolated
    // median lo + (hi − lo)·0.5 on the two middle order statistics,
    // exact-integer tie sum; final rounding stays in Spark
    // expressions so round-half-up semantics are unchanged.
    // null-safe extraction mirroring the oracle: a NULL-date group
    // joins no pairs (NULL < d is never true) but still counts in n
    // and in the tie histogram; a NULL revenue contributes no sign or
    // slope (SUM/quantile_cont skip NULLs) — degraded shapes degrade,
    // never throw (the HostileFixtureSpec contract)
    val dayAll = daily(spark, dir)
      .select(col("d"), col("x")).collect()
      .map(r => (
        if (r.isNullAt(0)) None else Some(r.getDate(0).toLocalDate.toEpochDay),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val day = dayAll.collect { case (Some(d), x) => (d, x) }.sortBy(_._1)
    val n = dayAll.length.toLong
    var s = 0L
    var nPairs = 0L // date pairs (oracle COUNT(*) — x nullity irrelevant)
    val slopesB = Array.newBuilder[Double]
    var i = 0
    while (i < day.length) {
      var j = i + 1
      while (j < day.length) {
        nPairs += 1L
        (day(i)._2, day(j)._2) match {
          case (Some(xi), Some(xj)) =>
            val diff = xj - xi
            s += math.signum(diff).toLong
            slopesB += diff / (day(j)._1 - day(i)._1).toDouble
          case _ => // NULL revenue: pair counts, contributes nothing
        }
        j += 1
      }
      i += 1
    }
    val slopes = slopesB.result()
    java.util.Arrays.sort(slopes)
    // quantile_cont skips NULL slopes: median ranks run over the
    // NON-NULL slope count; an empty slope set (0/1-day series or
    // all-NULL revenue) yields NULL sen, matching the oracle instead
    // of indexing out of bounds
    val nSlopes = slopes.length.toLong
    val sen: Option[Double] =
      if (nSlopes == 0L) None
      else {
        val lo = slopes(((nSlopes + 1L) / 2L - 1L).toInt)
        val hi = slopes(((nSlopes + 2L) / 2L - 1L).toInt)
        Some(lo + (hi - lo) * 0.5)
      }
    val tsum = dayAll.groupBy(_._2).valuesIterator.map(_.length.toLong)
      .filter(_ > 1L).map(t => t * (t - 1L) * (2L * t + 5L)).sum
    val varS = (n * (n - 1L) * (2L * n + 5L) - tsum).toDouble / 18.0
    Seq((n, nPairs, s, varS, sen))
      .toDF("n_days", "n_pairs", "s_stat", "var_s", "sen0")
      .select(col("n_days"), col("n_pairs"), col("s_stat"),
        round(when(col("s_stat") > 0,
            (col("s_stat") - 1L).cast("double") / sqrt(col("var_s")))
          .when(col("s_stat") < 0,
            (col("s_stat") + 1L).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)), 4).as("z"),
        round(col("sen0"), 4).as("sen_slope"))
      .withColumn("trend",
        when(abs(col("z")) <= 1.96, "no trend")
          .when(col("z") > 0, "increasing").otherwise("decreasing"))
  }

  def trendRobustOracle: String =
    """WITH day AS (SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM orders GROUP BY 1),
      |pairs AS (SELECT CAST(b.d - a.d AS DOUBLE) AS gap, b.x - a.x AS diff
      |  FROM day a JOIN day b ON a.d < b.d),
      |st AS (SELECT CAST(SUM(CAST(sign(diff) AS BIGINT)) AS BIGINT) AS s,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    quantile_cont(diff / gap, 0.5) AS sen FROM pairs),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM day),
      |ties AS (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
      |    AS tsum
      |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM day GROUP BY x
      |        HAVING COUNT(*) > 1) u),
      |v AS (SELECT st.s, st.n_pairs, st.sen, nn.n,
      |    CAST(n * (n - 1) * (2 * n + 5) - ties.tsum AS DOUBLE) / 18.0 AS var_s
      |  FROM st, nn, ties),
      |zc AS (SELECT n AS n_days, n_pairs, s AS s_stat,
      |    round(CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE) / sqrt(var_s)
      |               WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) / sqrt(var_s)
      |               ELSE 0.0 END, 4) AS z,
      |    round(sen, 4) AS sen_slope FROM v)
      |SELECT n_days, n_pairs, s_stat, z, sen_slope,
      |  CASE WHEN abs(z) <= 1.96 THEN 'no trend'
      |       WHEN z > 0 THEN 'increasing' ELSE 'decreasing' END AS trend
      |FROM zc""".stripMargin
}
