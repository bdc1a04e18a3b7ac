package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sketch family: the sub-linear summaries a 100 TB
  * pipeline leans on when exact is unaffordable — KMV distinct
  * estimation, count-min heavy-hitter counts, Bloom-filter join
  * pre-filtering — each implemented AGAINST ITS EXACT ANSWER so the
  * query output is simultaneously the sketch demo and its accuracy
  * audit.
  *
  * The reference has no sketch surface (its one job is wordcount —
  * SURVEY §2); these are engine-provided extensions.
  *
  * Unlike library sketches (Spark's HLL++/theta, DataSketches), every
  * sketch here is built from the repo's engine-neutral hash — first 8
  * md5 hex chars as an integer (the [[Dedup]] discipline) — with exact
  * 64-bit modular arithmetic for the derived hash functions, so DuckDB
  * reconstructs the identical sketch bit-for-bit and the driver gate
  * hash-compares the whole result. That is the point: a sketch you can
  * oracle is a sketch you can trust cross-engine.
  */
object Sketches {

  /** Engine-neutral 32-bit hash of any value, via its string form. */
  private[ext] def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  private[ext] def h32Sql(e: String): String =
    s"CAST(concat('0x', substr(md5(CAST($e AS VARCHAR)), 1, 8)) AS BIGINT)"

  private val M32 = 4294967296L // 2^32: h32's range

  // ── KMV (k minimum values) distinct-count estimate ──

  val KmvK = 256

  /** Distinct l_partkey estimated from the k smallest distinct hash
    * values: with uniform hashes, the kth smallest h_(k) sits at about
    * k/D of the range, so D ≈ (k-1)·M / h_(k). The whole corpus
    * collapses to one bounded top-k — map-side partial agg to distinct
    * hashes, then per-partition k-item heaps (TakeOrderedAndProject):
    * no full sort, O(k) memory per partition, one row out. The exact
    * distinct count rides along in the same job so the row IS the
    * accuracy audit (rel_err ~ 1/√k ≈ 6% at k=256). */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val hashes = li.select(h32(col("l_partkey")).as("h")).distinct()
    val topk = hashes.orderBy("h").limit(KmvK)
      .agg(max("h").as("hk"), count(lit(1)).as("k"))
    val exact = li.agg(countDistinct(col("l_partkey")).as("exact_distinct"))
    topk.crossJoin(broadcast(exact))
      .select(col("exact_distinct"),
        when(col("k") < KmvK, col("k")) // tiny domain: KMV saw everything
          .otherwise(round((col("k") - 1).cast("double") * M32 / col("hk"), 3))
          .cast("double").as("kmv_estimate"))
      .withColumn("rel_err",
        round(abs(col("kmv_estimate") - col("exact_distinct")) /
          col("exact_distinct"), 6))
  }

  def kmvDistinctOracle: String =
    s"""WITH h AS (SELECT DISTINCT ${h32Sql("l_partkey")} AS h FROM lineitem),
       |tk AS (SELECT max(h) AS hk, CAST(COUNT(*) AS BIGINT) AS k
       |       FROM (SELECT h FROM h ORDER BY h LIMIT $KmvK) t),
       |ex AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
       |         AS exact_distinct FROM lineitem)
       |SELECT ex.exact_distinct,
       |  CAST(CASE WHEN tk.k < $KmvK THEN tk.k
       |       ELSE round(CAST(tk.k - 1 AS DOUBLE) * $M32 / tk.hk, 3)
       |       END AS DOUBLE) AS kmv_estimate,
       |  round(abs(CAST(CASE WHEN tk.k < $KmvK THEN tk.k
       |       ELSE round(CAST(tk.k - 1 AS DOUBLE) * $M32 / tk.hk, 3)
       |       END AS DOUBLE) - ex.exact_distinct) / ex.exact_distinct, 6)
       |    AS rel_err
       |FROM tk, ex""".stripMargin

  // ── per-source KMV sketches: build, merge, estimate ──

  /** Per-source KMV sketch over document text hashes — the k smallest
    * DISTINCT hashes per source, via the native
    * [[graft.functions.BoundedDistinctTopK]] aggregate (a duplicate
    * hash must not occupy a slot or the k-th minimum drifts upward and
    * the estimate biases LOW — the reason plain BoundedTopK is the
    * wrong state algebra here). The aggregate is duplicate-idempotent,
    * commutative, and order-independent with O(k) state per source, so
    * this same plan IS the streaming form and its converged state
    * equals the batch sketch exactly. */
  private[graft] def kmvSourceSketch(d: DataFrame): DataFrame =
    d.select(col("source").as("scope"), h32(col("text")).as("h"))
      .groupBy("scope")
      .agg(graft.functions.BoundedDistinctTopK(KmvK, struct(col("h")))
        .as("hs"))
      .select(col("scope"),
        transform(col("hs"), x => x.getField("h")).as("hs"))

  /** Fold per-source KMV sketches to the UNION sketch (union the hash
    * sets, re-clip to the k smallest — the theta-union; global top-k ⊆
    * union of per-source top-ks, so no information is missing) and
    * estimate every scope against its exact distinct count. Shared by
    * the batch query and the streaming twin — literal same oracle. */
  private[graft] def kmvMergeReport(spark: SparkSession, dir: String,
                                    sketches: DataFrame): DataFrame = {
    val per = sketches.select(col("scope"),
      size(col("hs")).cast("long").as("kf"), array_max(col("hs")).as("hk"))
    val merged = sketches.select(explode(col("hs")).as("h")).distinct()
      .orderBy("h").limit(KmvK) // ≤ |sources|·k input rows — sketch-sized
      .agg(count(lit(1)).as("kf"), max(col("h")).as("hk"))
      .select(lit("ALL").as("scope"), col("kf"), col("hk"))
    val est = per.unionByName(merged)
      .select(col("scope"), col("kf").as("n_retained"),
        when(col("kf") < KmvK, col("kf").cast("double"))
          .otherwise(round((col("kf") - 1).cast("double") * M32 / col("hk"), 3))
          .as("kmv_estimate"))
    val d = Tables.documents(spark, dir).select(col("source"), col("text"))
    val exacts = d.groupBy(col("source").as("scope"))
      .agg(countDistinct(col("text")).as("exact_distinct"))
      .unionByName(d.agg(countDistinct(col("text")).as("exact_distinct"))
        .select(lit("ALL").as("scope"), col("exact_distinct")))
    est.join(exacts, Seq("scope"))
      .select(col("scope"), col("exact_distinct"), col("n_retained"),
        col("kmv_estimate"),
        round(abs(col("kmv_estimate") - col("exact_distinct")) /
          col("exact_distinct"), 6).as("rel_err"))
      .orderBy("scope")
  }

  def kmvMergeSources(spark: SparkSession, dir: String): DataFrame =
    kmvMergeReport(spark, dir,
      kmvSourceSketch(Tables.documents(spark, dir)
        .select(col("source"), col("text"))))

  def kmvMergeSourcesOracle: String =
    s"""WITH d AS (SELECT source, ${h32Sql("text")} AS h, text FROM documents),
       |ph AS (SELECT DISTINCT source, h FROM d),
       |ranked AS (SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS rk
       |  FROM ph),
       |clipped AS (SELECT source, h FROM ranked WHERE rk <= $KmvK),
       |per AS (SELECT source AS scope, CAST(COUNT(*) AS BIGINT) AS kf,
       |    CAST(MAX(h) AS BIGINT) AS hk
       |  FROM clipped GROUP BY 1),
       |mtop AS (SELECT h FROM (SELECT DISTINCT h FROM clipped) u
       |  ORDER BY h LIMIT $KmvK),
       |mstat AS (SELECT 'ALL' AS scope, CAST(COUNT(*) AS BIGINT) AS kf,
       |    CAST(MAX(h) AS BIGINT) AS hk FROM mtop),
       |allstats AS (SELECT * FROM per UNION ALL SELECT * FROM mstat),
       |est AS (SELECT scope, kf AS n_retained,
       |    CASE WHEN kf < $KmvK THEN CAST(kf AS DOUBLE)
       |      ELSE round(CAST(kf - 1 AS DOUBLE) * $M32 / hk, 3) END
       |      AS kmv_estimate
       |  FROM allstats),
       |ex AS (SELECT source AS scope,
       |    CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
       |  FROM d GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL', CAST(COUNT(DISTINCT text) AS BIGINT) FROM d)
       |SELECT est.scope AS scope, ex.exact_distinct, est.n_retained,
       |  est.kmv_estimate,
       |  round(abs(est.kmv_estimate - ex.exact_distinct) /
       |    ex.exact_distinct, 6) AS rel_err
       |FROM est JOIN ex ON est.scope = ex.scope
       |ORDER BY est.scope""".stripMargin

  // ── KMV / theta-style set-intersection estimate ──

  /** Distinct-customer OVERLAP between two order years (1995 ∩ 1996)
    * estimated from two KMV sketches alone — the theta-sketch set
    * operation that answers "how much do these corpora share?" without
    * ever joining them. Per the theta framework: clip both sketches to
    * θ = min(θ_A, θ_B) (each θ_X = its kth smallest hash; a set with
    * < k distinct hashes is exact, θ_X = M). Every surviving hash is a
    * uniform sample of the domain at rate θ/M, so
    * |A∩B| ≈ n_both · M/θ and |A∪B| ≈ n_union · M/θ, and the Jaccard
    * estimate n_both/n_union needs no scaling at all. When θ = M (both
    * sides tiny) the estimates collapse to the exact counts — no
    * special case, the same formula.
    *
    * Scale shape: each sketch is a per-set distinct (map-side partial
    * hash agg) into a global top-k heap — O(k) memory per partition,
    * k = [[KmvK]] rows out per side. All set arithmetic after that is
    * on ≤ 2k rows. The exact intersection/union ride along as the
    * accuracy audit (rel err ~ 1/√k); at 100 TB the exact arm is the
    * one you drop, same acceptance-gate stance as [[kmvDistinct]]. */
  def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def keys(y: Int): DataFrame = o
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("k"), h32(col("o_custkey")).as("h"))
    def sketch(y: Int): DataFrame =
      keys(y).select("h").distinct().orderBy("h").limit(KmvK)
    def thetaOf(s: DataFrame): DataFrame =
      s.agg(when(count(lit(1)) < KmvK, lit(M32))
        .otherwise(max("h")).as("theta"))
    val sa = sketch(1995).cache()
    val sb = sketch(1996).cache()
    graft.GraftSession.releaseAfterAction(spark, sa, sb)
    val theta = thetaOf(sa)
      .crossJoin(broadcast(thetaOf(sb).withColumnRenamed("theta", "tb")))
      .select(least(col("theta"), col("tb")).as("theta"))
    def clip(s: DataFrame): DataFrame =
      s.crossJoin(broadcast(theta)).filter(col("h") < col("theta")).select("h")
    val both = clip(sa).join(clip(sb), Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val union = clip(sa).union(clip(sb)).distinct()
      .agg(count(lit(1)).as("n_union"))
    // exact arm: plain distinct-key set ops (dimension-sized, audit-only)
    val ea = keys(1995).select("k").distinct()
    val eb = keys(1996).select("k").distinct()
    val exInter = ea.join(eb, Seq("k"), "left_semi")
      .agg(count(lit(1)).as("exact_inter"))
    val exUnion = ea.union(eb).distinct().agg(count(lit(1)).as("exact_union"))
    both.crossJoin(broadcast(union)).crossJoin(broadcast(theta))
      .crossJoin(broadcast(exInter)).crossJoin(broadcast(exUnion))
      // empty union / empty intersection make the ratios 0/0 —
      // contracted NULL in both engines (DuckDB IEEE division would
      // differ from Spark's ANSI-off NULL if inherited)
      .select(
        col("exact_inter"), col("exact_union"),
        when(col("exact_union") > 0,
          round(col("exact_inter").cast("double") / col("exact_union"), 6))
          .as("exact_jaccard"),
        round(col("n_both").cast("double") * M32 / col("theta"), 3)
          .as("est_inter"),
        round(col("n_union").cast("double") * M32 / col("theta"), 3)
          .as("est_union"),
        when(col("n_union") > 0,
          round(col("n_both").cast("double") / col("n_union"), 6))
          .as("est_jaccard"))
      .withColumn("rel_err_inter",
        when(col("exact_inter") > 0,
          round(abs(col("est_inter") - col("exact_inter")) /
            col("exact_inter"), 6)))
  }

  def kmvOverlapOracle: String =
    s"""WITH ka AS (SELECT DISTINCT o_custkey AS k, ${h32Sql("o_custkey")} AS h
       |            FROM orders WHERE year(o_orderdate) = 1995),
       |kb AS (SELECT DISTINCT o_custkey AS k, ${h32Sql("o_custkey")} AS h
       |       FROM orders WHERE year(o_orderdate) = 1996),
       |sa AS (SELECT h FROM ka ORDER BY h LIMIT $KmvK),
       |sb AS (SELECT h FROM kb ORDER BY h LIMIT $KmvK),
       |th AS (SELECT least(
       |    (SELECT CASE WHEN COUNT(*) < $KmvK THEN $M32 ELSE max(h) END FROM sa),
       |    (SELECT CASE WHEN COUNT(*) < $KmvK THEN $M32 ELSE max(h) END FROM sb))
       |  AS theta),
       |ca AS (SELECT h FROM sa, th WHERE h < theta),
       |cb AS (SELECT h FROM sb, th WHERE h < theta),
       |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both
       |       FROM ca WHERE h IN (SELECT h FROM cb)),
       |nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union
       |       FROM (SELECT h FROM ca UNION SELECT h FROM cb) u),
       |ei AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter
       |       FROM (SELECT DISTINCT k FROM ka) a
       |       WHERE k IN (SELECT k FROM kb)),
       |eu AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union
       |       FROM (SELECT k FROM ka UNION SELECT k FROM kb) u)
       |SELECT ei.exact_inter, eu.exact_union,
       |  CASE WHEN eu.exact_union > 0 THEN
       |    round(CAST(ei.exact_inter AS DOUBLE) / eu.exact_union, 6)
       |  END AS exact_jaccard,
       |  round(CAST(nb.n_both AS DOUBLE) * $M32 / th.theta, 3) AS est_inter,
       |  round(CAST(nu.n_union AS DOUBLE) * $M32 / th.theta, 3) AS est_union,
       |  CASE WHEN nu.n_union > 0 THEN
       |    round(CAST(nb.n_both AS DOUBLE) / nu.n_union, 6)
       |  END AS est_jaccard,
       |  CASE WHEN ei.exact_inter > 0 THEN
       |    round(abs(round(CAST(nb.n_both AS DOUBLE) * $M32 / th.theta, 3)
       |              - ei.exact_inter) / ei.exact_inter, 6)
       |  END AS rel_err_inter
       |FROM nb, nu, th, ei, eu""".stripMargin

  // ── bottom-k-by-hash quantile sketch ──

  /** Sample size of the quantile sketch over lineitem prices. */
  val QsK = 1024

  /** Per-source quantile-sketch sample size over documents — small on
    * purpose so the merged-ALL sketch is genuinely lossy at fixture
    * scale and the rel_err columns exercise the estimator, while each
    * tiny per-source sketch hits the k<K exact branch. */
  val QsDocK = 64

  /** The quantile probe points of the headline price sketch. */
  val QsProbes: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95, 0.99)

  /** Mergeable QUANTILE sketch completing the family's fourth state
    * algebra: CMS cells are SUMS, HLL registers are MAXES, KMV is a
    * bounded distinct top-k of KEY hashes — and quantiles come from a
    * bounded top-k of ROW hashes with the measured value riding
    * along. The rows whose identity-hash lands in the k global minima
    * form a uniform-without-replacement size-k row sample (bottom-k /
    * coordinated sampling), so the sample's order statistics estimate
    * the population's with rel. rank error ~ 1/√k — and unlike KLL/
    * t-digest the sketch is DETERMINISTIC (no RNG), duplicate-
    * idempotent, order-independent, and mergeable by union + re-clip,
    * which is what lets DuckDB rebuild it bit-for-bit and the driver
    * hash-verify the whole row (the family discipline: a sketch you
    * can oracle is a sketch you can trust cross-engine).
    *
    * This query: l_extendedprice quantiles at [[QsProbes]] estimated
    * from a [[QsK]]-row sample vs the exact order statistics. Plan
    * shape: the sample is ONE global [[graft.functions.BoundedTopK]]
    * aggregate — an O(k) heap per partition feeding a k-item merge,
    * no sort, no shuffle of data rows — and every estimate reads the
    * resulting 1-row array. The exact arm is the shared histogram-
    * locate fetch ([[graft.operators.Relational.valuesAtGroupRanks]],
    * nothing sorts the corpus) and is the audit you drop at 100 TB.
    * Both sides take the LOWER order statistic at rank
    * 1+floor(q·(n−1)) — no interpolation, so a sample value equals a
    * population value wherever the ranks coincide. */
  def quantileSketchPrice(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(h32(concat_ws("-", col("l_orderkey"), col("l_linenumber"))).as("h"),
        col("l_extendedprice").as("v"))
    val sample = li
      .agg(graft.functions.BoundedTopK(QsK, struct(col("h"), col("v"))).as("s"))
      .select(sort_array(transform(col("s"), x => x.getField("v"))).as("vs"))
    val probes = li.agg(count(lit(1)).as("n"))
      .select(explode(array(QsProbes.map(lit(_)): _*)).as("q"), col("n"))
      .select(col("q"), col("n"),
        (floor(col("q") * (col("n") - lit(1))) + lit(1)).cast("long").as("rk"))
      .localCheckpoint() // 5 rows; feeds the fetch and the final join
    val exact = graft.operators.Relational.valuesAtGroupRanks(
      li.select(lit("all").as("g"), col("v")),
      probes.select(lit("all").as("g"), col("rk")).distinct())
    probes
      .join(broadcast(exact.select(col("rk"), col("v").as("exact_v"))), Seq("rk"))
      .crossJoin(broadcast(sample))
      .select(col("q"), col("n"),
        size(col("vs")).cast("long").as("k_retained"),
        col("exact_v"),
        element_at(col("vs"),
          (floor(col("q") * (size(col("vs")) - lit(1))) + lit(1)).cast("int"))
          .as("est_v"))
      .withColumn("rel_err",
        round(abs(col("est_v") - col("exact_v")) / col("exact_v"), 6))
      .orderBy("q")
  }

  def quantileSketchPriceOracle: String =
    s"""WITH v AS (SELECT
       |    ${h32Sql("concat_ws('-', l_orderkey, l_linenumber)")} AS h,
       |    l_extendedprice AS v FROM lineitem),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
       |s AS (SELECT v FROM v ORDER BY h, v LIMIT $QsK),
       |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM s),
       |sv AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM s),
       |rv AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM v),
       |q AS (SELECT unnest([${QsProbes.mkString(", ")}]) AS q),
       |tgt AS (SELECT q.q, n.n, kk.k,
       |    CAST(floor(q.q * (n.n - 1)) + 1 AS BIGINT) AS rk_ex,
       |    CAST(floor(q.q * (kk.k - 1)) + 1 AS BIGINT) AS rk_s
       |  FROM q, n, kk)
       |SELECT t.q, t.n, t.k AS k_retained, r.v AS exact_v, s2.v AS est_v,
       |  round(abs(s2.v - r.v) / r.v, 6) AS rel_err
       |FROM tgt t JOIN rv r ON r.rk = t.rk_ex JOIN sv s2 ON s2.rk = t.rk_s
       |ORDER BY t.q""".stripMargin

  /** Per-source quantile sketches over document lengths — the bottom-
    * [[QsDocK]] row-hash sample per source, via the native
    * [[graft.functions.BoundedDistinctTopK]] aggregate (a replayed
    * arrival of the same row re-presents the identical (h, v) struct
    * and must not occupy a second slot — the duplicate-idempotence
    * that makes the SAME plan the streaming form, converging to the
    * batch sketch exactly). NULL-length rows are excluded up front on
    * both engines: a NULL value cannot carry an order statistic. */
  private[graft] def qsSourceSketch(d: DataFrame): DataFrame =
    d.filter(col("n_chars").isNotNull)
      .select(col("source").as("scope"), h32(col("doc_id")).as("h"),
        col("n_chars").cast("double").as("v"))
      .groupBy("scope")
      .agg(graft.functions.BoundedDistinctTopK(QsDocK,
        struct(col("h"), col("v"))).as("s"))

  /** Fold per-source quantile sketches to the corpus sketch (union
    * the (hash, value) samples, re-clip to the k smallest hashes —
    * the global bottom-k is a subset of the union of per-source
    * bottom-ks, so no information is missing: the same theta-union
    * argument as [[kmvMergeReport]]) and estimate p50/p90 of every
    * scope against its exact order statistics. Shared by the batch
    * query and the streaming twin — literal same oracle object. The
    * exact arm (a per-scope histogram-locate fetch) is the audit you
    * drop at 100 TB, where the sketches — k rows per source,
    * mergeable per partition — are the whole point. */
  private[graft] def qsMergeReport(spark: SparkSession, dir: String,
                                   sketches: DataFrame): DataFrame = {
    val merged = sketches.select(explode(col("s")).as("e")).distinct()
      .select(col("e").getField("h").as("h"), col("e").getField("v").as("v"))
      .agg(graft.functions.BoundedDistinctTopK(QsDocK,
        struct(col("h"), col("v"))).as("s"))
      .select(lit("ALL").as("scope"), col("s"))
    val est = sketches.unionByName(merged)
      .select(col("scope"),
        sort_array(transform(col("s"), x => x.getField("v"))).as("vs"))
      .select(col("scope"), size(col("vs")).cast("long").as("k_retained"),
        element_at(col("vs"),
          (floor(lit(0.5) * (size(col("vs")) - lit(1))) + lit(1)).cast("int"))
          .as("est_p50"),
        element_at(col("vs"),
          (floor(lit(0.9) * (size(col("vs")) - lit(1))) + lit(1)).cast("int"))
          .as("est_p90"))
    val d = Tables.documents(spark, dir).filter(col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").cast("double").as("v"))
    val vals = d.select(col("source").as("g"), col("v"))
      .unionByName(d.select(lit("ALL").as("g"), col("v")))
    val counts = vals.groupBy("g").agg(count(lit(1)).as("n")).localCheckpoint()
    val probes = counts
      .select(col("g"), col("n"), explode(array(lit(0.5), lit(0.9))).as("q"))
      .select(col("g"), col("n"), col("q"),
        (floor(col("q") * (col("n") - lit(1))) + lit(1)).cast("long").as("rk"))
      .localCheckpoint()
    val fetched = graft.operators.Relational.valuesAtGroupRanks(
      vals, probes.select("g", "rk").distinct())
    val exact = probes
      .join(fetched, Seq("g", "rk"))
      .groupBy(col("g").as("scope"))
      .agg(max(col("n")).as("n_exact"),
        max(when(col("q") === 0.5, col("v"))).as("exact_p50"),
        max(when(col("q") === 0.9, col("v"))).as("exact_p90"))
    est.join(exact, Seq("scope"))
      .select(col("scope"), col("n_exact"), col("k_retained"),
        col("exact_p50"), col("est_p50"),
        round(abs(col("est_p50") - col("exact_p50")) / col("exact_p50"), 6)
          .as("rel_err_p50"),
        col("exact_p90"), col("est_p90"),
        round(abs(col("est_p90") - col("exact_p90")) / col("exact_p90"), 6)
          .as("rel_err_p90"))
      .orderBy("scope")
  }

  def quantileSketchMerge(spark: SparkSession, dir: String): DataFrame =
    qsMergeReport(spark, dir, qsSourceSketch(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))))

  def quantileSketchMergeOracle: String =
    s"""WITH d AS (SELECT source, ${h32Sql("doc_id")} AS h,
       |    CAST(n_chars AS DOUBLE) AS v
       |  FROM documents WHERE n_chars IS NOT NULL),
       |ranked AS (SELECT source, h, v,
       |    row_number() OVER (PARTITION BY source ORDER BY h, v) AS rk
       |  FROM (SELECT DISTINCT source, h, v FROM d) dd),
       |clipped AS (SELECT source AS scope, h, v FROM ranked
       |  WHERE rk <= $QsDocK),
       |mr AS (SELECT h, v, row_number() OVER (ORDER BY h, v) AS rk
       |  FROM (SELECT DISTINCT h, v FROM clipped) u),
       |sk AS (SELECT * FROM clipped
       |  UNION ALL SELECT 'ALL', h, v FROM mr WHERE rk <= $QsDocK),
       |sv AS (SELECT scope, v, row_number()
       |    OVER (PARTITION BY scope ORDER BY v) AS rk FROM sk),
       |kk AS (SELECT scope, CAST(COUNT(*) AS BIGINT) AS k FROM sk
       |  GROUP BY 1),
       |full_v AS (SELECT source AS scope, v FROM d
       |  UNION ALL SELECT 'ALL', v FROM d),
       |fv AS (SELECT scope, v, row_number()
       |    OVER (PARTITION BY scope ORDER BY v) AS rk FROM full_v),
       |nn AS (SELECT scope, CAST(COUNT(*) AS BIGINT) AS n FROM full_v
       |  GROUP BY 1),
       |est AS (SELECT kk.scope, kk.k,
       |    e50.v AS est_p50, e90.v AS est_p90
       |  FROM kk
       |  JOIN sv e50 ON e50.scope = kk.scope
       |    AND e50.rk = CAST(floor(0.5 * (kk.k - 1)) + 1 AS BIGINT)
       |  JOIN sv e90 ON e90.scope = kk.scope
       |    AND e90.rk = CAST(floor(0.9 * (kk.k - 1)) + 1 AS BIGINT)),
       |ex AS (SELECT nn.scope, nn.n,
       |    x50.v AS exact_p50, x90.v AS exact_p90
       |  FROM nn
       |  JOIN fv x50 ON x50.scope = nn.scope
       |    AND x50.rk = CAST(floor(0.5 * (nn.n - 1)) + 1 AS BIGINT)
       |  JOIN fv x90 ON x90.scope = nn.scope
       |    AND x90.rk = CAST(floor(0.9 * (nn.n - 1)) + 1 AS BIGINT))
       |SELECT est.scope, ex.n AS n_exact, est.k AS k_retained,
       |  ex.exact_p50, est.est_p50,
       |  round(abs(est.est_p50 - ex.exact_p50) / ex.exact_p50, 6)
       |    AS rel_err_p50,
       |  ex.exact_p90, est.est_p90,
       |  round(abs(est.est_p90 - ex.exact_p90) / ex.exact_p90, 6)
       |    AS rel_err_p90
       |FROM est JOIN ex ON est.scope = ex.scope
       |ORDER BY est.scope""".stripMargin

  // ── count-min join-cardinality estimate (sketch inner product) ──

  /** Join SIZE |events ⋈ orders on user_id = o_custkey| (many-to-many
    * both sides) estimated from two count-min sketches alone — the inner-product estimator the
    * planner needs when choosing join order/strategy for tables it
    * cannot afford to pre-join: est_i = Σ_b A_i[b]·B_i[b] for each
    * hash row i, est = min_i. Like the point-query CM bound the
    * estimate is ONE-SIDED (collisions only ever add mass):
    * est ≥ exact always, and the row carries the exact size (computed
    * from the two per-key count tables — never by materializing the
    * join) as its own accuracy audit.
    *
    * Scale shape: each side collapses to per-key counts (map-side
    * partial hash agg, |keys| rows), deposits into depth×width =
    * [[CmsDepth]]×[[CmsWidth]] cells, and every operation after that
    * touches ≤ depth·width rows per side. The exact arm joins the two
    * count tables on the key — |keys|-sized, the audit you drop at
    * 100 TB where the sketches (a few KB, mergeable per partition)
    * are the whole point. Products/sums ride in DECIMAL(38,0): cell
    * masses at petabyte row counts multiply past int64. */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    def sideCounts(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
    def sketch(counts: DataFrame): DataFrame = counts
      .select(col("c"), h32(col("k")).as("h"),
        explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("i"))
      .select(col("i"), cmsBucket(col("h"), col("i")).as("b"), col("c"))
      .groupBy("i", "b").agg(sum("c").as("cell"))
    val ca = sideCounts(Tables.events(spark, dir), "user_id")
    val cb = sideCounts(Tables.orders(spark, dir), "o_custkey")
    val est = sketch(ca).withColumnRenamed("cell", "ca")
      .join(sketch(cb).withColumnRenamed("cell", "cb"), Seq("i", "b"))
      .groupBy("i")
      .agg(sum((col("ca") * col("cb")).cast("decimal(38,0)")).as("est_i"))
      .agg(min("est_i").cast("long").as("cms_join_size"))
    val exact = ca.join(cb.withColumnRenamed("c", "cb"), Seq("k"))
      .agg(sum((col("c") * col("cb")).cast("decimal(38,0)"))
        .cast("long").as("exact_join_size"))
    est.crossJoin(broadcast(exact))
      // a disjoint-key join has exact size 0: rel_err is contracted
      // NULL (DuckDB's IEEE x/0 would be inf, Spark's ANSI-off NULL —
      // state the degenerate contract, don't inherit it); the empty
      // sketch side also makes the inner product itself empty ⇒ NULL
      // estimate, coalesced to the true 0
      .select(coalesce(col("exact_join_size"), lit(0L))
          .as("exact_join_size"),
        coalesce(col("cms_join_size"), lit(0L)).as("cms_join_size"))
      .select(col("exact_join_size"), col("cms_join_size"),
        (col("cms_join_size") - col("exact_join_size")).as("overcount"),
        when(col("exact_join_size") > 0,
          round((col("cms_join_size") - col("exact_join_size"))
            .cast("double") / col("exact_join_size"), 6)).as("rel_err"))
  }

  def joinSizeEstimateOracle: String =
    s"""WITH ca AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1),
       |cb AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM orders GROUP BY 1),
       |sa AS (SELECT i, ${cmsBucketSql(h32Sql("k"), "i")} AS b,
       |    CAST(SUM(c) AS BIGINT) AS cell
       |  FROM ca CROSS JOIN range($CmsDepth) r(i) GROUP BY 1, 2),
       |sb AS (SELECT i, ${cmsBucketSql(h32Sql("k"), "i")} AS b,
       |    CAST(SUM(c) AS BIGINT) AS cell
       |  FROM cb CROSS JOIN range($CmsDepth) r(i) GROUP BY 1, 2),
       |est AS (SELECT CAST(COALESCE(MIN(est_i), 0) AS BIGINT)
       |    AS cms_join_size
       |  FROM (SELECT sa.i, SUM(sa.cell * sb.cell) AS est_i
       |        FROM sa JOIN sb ON sa.i = sb.i AND sa.b = sb.b
       |        GROUP BY sa.i) t),
       |ex AS (SELECT CAST(COALESCE(SUM(ca.c * cb.c), 0) AS BIGINT)
       |    AS exact_join_size
       |  FROM ca JOIN cb USING (k))
       |SELECT ex.exact_join_size, est.cms_join_size,
       |  CAST(est.cms_join_size - ex.exact_join_size AS BIGINT) AS overcount,
       |  CASE WHEN ex.exact_join_size > 0
       |    THEN round(CAST(est.cms_join_size - ex.exact_join_size AS DOUBLE)
       |      / ex.exact_join_size, 6) END AS rel_err
       |FROM est, ex""".stripMargin

  // ── count-min sketch heavy hitters ──

  val CmsDepth = 4
  val CmsWidth = 512
  private val CmsP = 2147483647L // 2^31-1, same prime as MinHash perms

  /** Row-i bucket for a token hash: pairwise-independent family
    * (a_i·h + b_i mod p) mod w, exact 64-bit arithmetic. */
  private def affineBucket(h: Column, i: Column, w: Long): Column =
    ((lit(4099L) * i + 8191L) * h + (lit(9973L) * i + 104729L)) % CmsP % w

  private def affineBucketSql(h: String, i: String, w: Long): String =
    s"(((4099*$i + 8191) * $h + (9973*$i + 104729)) % $CmsP) % $w"

  private def cmsBucket(h: Column, i: Column): Column =
    affineBucket(h, i, CmsWidth)

  private def cmsBucketSql(h: String, i: String): String =
    affineBucketSql(h, i, CmsWidth)

  /** Count-min sketch over the token stream vs exact counts for the
    * top heavy hitters. Build: exact token counts first (the hash agg
    * every wordcount does — vocab-sized, map-side partials), then each
    * token deposits its count into [[CmsDepth]] buckets — the sketch is
    * a ([[CmsDepth]]×[[CmsWidth]])-row table, a few KB at ANY corpus
    * size; that fixed size is the whole point. Probe: the top-25 exact
    * tokens (round-free integer counts, token tiebreak) look up
    * min-over-rows — CM's one-sided estimate: est ≥ exact always,
    * overcount = collision mass. Every join here is vocab- or
    * sketch-sized; nothing rescans the corpus. */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val counts = exactTokenCounts(spark, dir)
      .localCheckpoint() // sketch + probe reuse; don't rescan the corpus
    val rows = counts
      .select(col("cw"), h32(col("w")).as("h"),
        explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("i"))
      .select(col("i"), cmsBucket(col("h"), col("i")).as("b"), col("cw"))
      .groupBy("i", "b").agg(sum("cw").as("cell"))
    cmsProbeReport(counts, rows)
  }

  /** CMS cell table built from raw token OCCURRENCES — the streaming
    * build shape (a stream can't pre-count its vocabulary, so every
    * occurrence deposits 1 into its [[CmsDepth]] buckets). Converges
    * to exactly the batch cells: Σ over occurrences = Σ over
    * (token, count), and the cells are plain sums — commutative and
    * order-independent, so retries and batch boundaries can't move a
    * counter. State: ≤ [[CmsDepth]]·[[CmsWidth]] rows at ANY stream
    * length. */
  private[graft] def cmsOccurrenceCells(d: DataFrame): DataFrame =
    d.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(h32(col("w")).as("h"),
        explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("i"))
      .select(col("i"), cmsBucket(col("h"), col("i")).as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("cell"))

  /** Probe the top-25 exact tokens against a CMS cell table — the
    * report arm shared by the batch sketch and the streaming monitor
    * (which therefore verify against the literal same oracle).
    * `counts` is the exact vocabulary count table (the audit side);
    * `cells` any converged ([[CmsDepth]]×[[CmsWidth]])-bounded cell
    * table. */
  private[graft] def cmsProbeReport(counts: DataFrame,
                                    cells: DataFrame): DataFrame = {
    val probes = counts.orderBy(col("cw").desc, col("w")).limit(25)
      .select(col("w"), col("cw"), h32(col("w")).as("h"))
    probes
      .crossJoin(broadcast(cells.groupBy("i")
        .agg(map_from_entries(collect_list(struct(col("b"), col("cell"))))
          .as("row_cells"))))
      .select(col("w"), col("cw"),
        element_at(col("row_cells"), cmsBucket(col("h"), col("i"))).as("est_i"))
      .groupBy("w", "cw").agg(min("est_i").as("cms_estimate"))
      .select(col("w").as("token"), col("cw").as("exact_count"),
        col("cms_estimate"),
        (col("cms_estimate") - col("cw")).as("overcount"))
      .orderBy(col("exact_count").desc, col("token"))
  }

  /** Exact token counts for [[cmsProbeReport]]'s audit arm. */
  private[graft] def exactTokenCounts(spark: SparkSession,
                                      dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))

  def cmsHeavyHittersOracle: String = {
    val toks = Dedup.tokensSqlPublic
    s"""WITH counts AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
       |  FROM (SELECT unnest(ws) AS w
       |        FROM (SELECT $toks AS ws FROM documents) t) u
       |  GROUP BY w),
       |cells AS (
       |  SELECT i, ${cmsBucketSql(h32Sql("w"), "i")} AS b,
       |         CAST(SUM(cw) AS BIGINT) AS cell
       |  FROM counts CROSS JOIN range($CmsDepth) r(i)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT w, cw, ${h32Sql("w")} AS h FROM counts
       |  ORDER BY cw DESC, w LIMIT 25)
       |SELECT p.w AS token, p.cw AS exact_count,
       |  CAST(MIN(c.cell) AS BIGINT) AS cms_estimate,
       |  CAST(MIN(c.cell) - p.cw AS BIGINT) AS overcount
       |FROM probes p JOIN cells c
       |  ON c.b = ${cmsBucketSql("p.h", "c.i")}
       |GROUP BY p.w, p.cw
       |ORDER BY exact_count DESC, token""".stripMargin
  }

  // ── HyperLogLog distinct-count estimate ──

  val HllM = 256L // registers (2^8)

  /** HyperLogLog over l_orderkey, register-exact in both engines: the
    * 32-bit hash splits into an 8-bit register index (h mod m) and a
    * 24-bit tail (h >> 8); the register value is the tail's
    * leading-zero rank ρ = 25 − bitlength(tail) (ρ = 25 for tail 0),
    * computed via `bin()` string length — identical built-in in Spark
    * and DuckDB, no engine-private intrinsics. ONE map-side-partial
    * hash agg collapses the whole scan to ≤ m register rows (max is
    * idempotent, so no pre-distinct is needed — this is the actual
    * streaming-HLL shape: fixed memory at any cardinality). The
    * estimator sum Σ 2^−ρ is EXACT in IEEE doubles (≤ 256 terms, each
    * a power of two ≥ 2^−25: 33 bits of significand), so the estimate
    * is partition-order-free without any decimal crutch; the standard
    * linear-counting small-range correction branches identically in
    * both engines. Error ~ 1.04/√m ≈ 6.5% at m = 256. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val regs = li
      .select(h32(col("l_orderkey")).as("h"))
      .select((col("h") % HllM).as("bucket"), shiftright(col("h"), 8).as("w"))
      .select(col("bucket"),
        when(col("w") === 0, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rho"))
      .groupBy("bucket").agg(max("rho").as("mj"))
    val est = regs.agg(count(lit(1)).as("present"),
        sum(pow(lit(2.0), -col("mj"))).as("s_present"))
      .select(
        (lit(HllM) - col("present")).as("n_zero_registers"),
        (lit(0.7213) / (lit(1.0) + lit(1.079) / HllM) * (HllM * HllM) /
          ((lit(HllM) - col("present")) + col("s_present"))).as("raw"))
      .select(col("n_zero_registers"),
        when(col("raw") <= 2.5 * HllM && col("n_zero_registers") > 0,
          round(lit(HllM.toDouble) * log(lit(HllM.toDouble) /
            col("n_zero_registers")), 3))
          .otherwise(round(col("raw"), 3)).as("hll_estimate"))
    val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
    est.crossJoin(broadcast(exact))
      .select(col("exact_distinct"), col("hll_estimate"),
        round(abs(col("hll_estimate") - col("exact_distinct")) /
          col("exact_distinct"), 6).as("rel_err"),
        col("n_zero_registers"))
  }

  def hllDistinctOracle: String =
    s"""WITH hs AS (SELECT ${h32Sql("l_orderkey")} AS h FROM lineitem),
       |sp AS (SELECT h % $HllM AS bucket, h // $HllM AS w FROM hs),
       |rg AS (SELECT bucket,
       |    MAX(CASE WHEN w = 0 THEN 25
       |        ELSE 25 - length(bin(w)) END) AS mj
       |  FROM sp GROUP BY bucket),
       |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS present,
       |    SUM(pow(2.0, -mj)) AS s_present FROM rg),
       |e AS (SELECT ($HllM - present) AS n_zero_registers,
       |    0.7213 / (1.0 + 1.079 / $HllM) * (${HllM * HllM}) /
       |      (($HllM - present) + s_present) AS raw
       |  FROM ag),
       |est AS (SELECT CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
       |    CASE WHEN raw <= 2.5 * $HllM AND n_zero_registers > 0
       |      THEN round(${HllM}.0 * ln(${HllM}.0 / n_zero_registers), 3)
       |      ELSE round(raw, 3) END AS hll_estimate
       |  FROM e),
       |ex AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
       |         AS exact_distinct FROM lineitem)
       |SELECT ex.exact_distinct, est.hll_estimate,
       |  round(abs(est.hll_estimate - ex.exact_distinct) /
       |    ex.exact_distinct, 6) AS rel_err,
       |  est.n_zero_registers
       |FROM est, ex""".stripMargin

  // ── HLL mergeability: per-source sketches → union by register max ──

  /** The property that makes HLL the 1000-executor distinct counter:
    * per-source register tables merge into the UNION's registers by
    * plain per-bucket MAX — no rescan, no re-shuffle of data, just
    * |sources|·[[HllM]] register rows folding to [[HllM]]. Reported
    * per source AND for the merged union, each against its exact
    * distinct count, so the merge identity (union estimate from
    * merged registers == estimate a direct pass would build) is
    * hash-verified, not assumed. This is the algebra a partitioned
    * 100 TB count-distinct rides: every partition sketches locally,
    * the driver folds registers. */
  /** Per-source HLL register table from any (source, text) frame —
    * ONE map-side-partial hash agg to ≤ |sources|·[[HllM]] rows. The
    * register max is the entire aggregation state, so this same plan
    * IS the streaming form: [[graft.streaming.DocStream]]'s HLL
    * monitor runs it verbatim over the ingest stream, state bounded
    * identically. */
  private[graft] def hllSourceRegs(d: DataFrame): DataFrame =
    d.select(col("source").as("scope"),
        (h32(col("text")) % HllM).as("bucket"),
        shiftright(h32(col("text")), 8).as("w"))
      .select(col("scope"), col("bucket"),
        when(col("w") === 0, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rho"))
      .groupBy("scope", "bucket").agg(max("rho").as("mj"))

  /** Fold per-source registers to the union sketch, estimate every
    * scope, and audit each against its exact distinct count (one
    * batch pass over the same corpus — the verification arm). Shared
    * by the batch query and the streaming twin, which therefore
    * verify against the literal same oracle. */
  private[graft] def hllMergeReport(spark: SparkSession, dir: String,
                                    perSrcRegs: DataFrame): DataFrame = {
    def estFromRegs(regs: DataFrame): DataFrame =
      regs.groupBy("scope")
        .agg(count(lit(1)).as("present"),
          sum(pow(lit(2.0), -col("mj"))).as("s_present"))
        .select(col("scope"),
          (lit(HllM) - col("present")).as("nz"),
          (lit(0.7213) / (lit(1.0) + lit(1.079) / HllM) * (HllM * HllM) /
            ((lit(HllM) - col("present")) + col("s_present"))).as("raw"))
        .select(col("scope"),
          when(col("raw") <= 2.5 * HllM && col("nz") > 0,
            round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("nz")), 3))
            .otherwise(round(col("raw"), 3)).as("hll_estimate"))
    // THE merge: union registers = per-bucket max over source registers
    val mergedRegs = perSrcRegs.groupBy("bucket")
      .agg(max("mj").as("mj")).select(lit("ALL").as("scope"),
        col("bucket"), col("mj"))
    val ests = estFromRegs(perSrcRegs.unionByName(mergedRegs))
    val d = Tables.documents(spark, dir).select(col("source"), col("text"))
    val exacts = d.groupBy(col("source").as("scope"))
      .agg(countDistinct(col("text")).as("exact_distinct"))
      .unionByName(d.agg(countDistinct(col("text")).as("exact_distinct"))
        .select(lit("ALL").as("scope"), col("exact_distinct")))
    ests.join(exacts, Seq("scope"))
      .select(col("scope"), col("exact_distinct"), col("hll_estimate"),
        round(abs(col("hll_estimate") - col("exact_distinct")) /
          col("exact_distinct"), 6).as("rel_err"))
      .orderBy("scope")
  }

  def hllMergeSources(spark: SparkSession, dir: String): DataFrame =
    hllMergeReport(spark, dir,
      hllSourceRegs(Tables.documents(spark, dir)
        .select(col("source"), col("text"))))

  def hllMergeSourcesOracle: String =
    s"""WITH d AS (SELECT source, text, ${h32Sql("text")} AS h FROM documents),
       |sp AS (SELECT source, h % $HllM AS bucket, h // $HllM AS w FROM d),
       |regs AS (SELECT source AS scope, bucket,
       |    MAX(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS mj
       |  FROM sp GROUP BY 1, 2),
       |merged AS (SELECT 'ALL' AS scope, bucket, MAX(mj) AS mj
       |  FROM regs GROUP BY bucket),
       |allregs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
       |ag AS (SELECT scope, CAST(COUNT(*) AS BIGINT) AS present,
       |    SUM(pow(2.0, -mj)) AS s_present FROM allregs GROUP BY 1),
       |e AS (SELECT scope, ($HllM - present) AS nz,
       |    0.7213 / (1.0 + 1.079 / $HllM) * (${HllM * HllM}) /
       |      (($HllM - present) + s_present) AS raw FROM ag),
       |est AS (SELECT scope,
       |    CASE WHEN raw <= 2.5 * $HllM AND nz > 0
       |      THEN round(${HllM}.0 * ln(${HllM}.0 / nz), 3)
       |      ELSE round(raw, 3) END AS hll_estimate FROM e),
       |ex AS (SELECT source AS scope,
       |    CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct
       |  FROM d GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL', CAST(COUNT(DISTINCT text) AS BIGINT) FROM d)
       |SELECT est.scope AS scope, ex.exact_distinct, est.hll_estimate,
       |  round(abs(est.hll_estimate - ex.exact_distinct) /
       |    ex.exact_distinct, 6) AS rel_err
       |FROM est JOIN ex ON est.scope = ex.scope
       |ORDER BY est.scope""".stripMargin

  // ── Bloom-filter membership pre-filter ──

  val BloomBits = 8192
  val BloomHashes = 4

  /** Bloom filter as a join pre-filter, with its false-positive audit:
    * the filter is built over the custkeys that placed urgent orders
    * (the build side of a would-be semi join), then every customer
    * probes it; the output compares bloom verdicts to exact semi-join
    * truth per market segment. Build: distinct build keys × k bit
    * positions → distinct set-bit table (≤ [[BloomBits]] rows — KB-scale
    * at any data size, broadcastable where a 100M-key build side is
    * not). Probe: k positions per probe key left-joined against the bit
    * table; member ⇔ all k present. This is exactly the runtime-filter
    * shape engines inject before expensive shuffles — materialized here
    * as data so the oracle can verify the filter property (zero false
    * negatives, counted false positives). */
  def bloomFilterAudit(spark: SparkSession, dir: String): DataFrame = {
    val ks = (0 until BloomHashes).map(lit(_))
    val buildKeys = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k")).distinct()
    val bits = buildKeys
      .select(h32(col("k")).as("h"), explode(array(ks: _*)).as("i"))
      .select(affineBucket(col("h"), col("i"), BloomBits).as("bit")).distinct()
    val probes = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), h32(col("c_custkey")).as("h"),
        explode(array(ks: _*)).as("i"))
      .select(col("c_custkey"), col("c_mktsegment"),
        affineBucket(col("h"), col("i"), BloomBits).as("bit"))
      .join(broadcast(bits.withColumn("present", lit(1))), Seq("bit"), "left")
      .groupBy("c_custkey", "c_mktsegment")
      .agg((count(col("present")) === BloomHashes).as("bloom_hit"))
    val truth = Tables.customer(spark, dir)
      .join(buildKeys, col("c_custkey") === col("k"), "left_semi")
      .select(col("c_custkey"), lit(true).as("actual"))
    probes.join(truth, Seq("c_custkey"), "left")
      .select(col("c_mktsegment"), col("bloom_hit"),
        coalesce(col("actual"), lit(false)).as("actual"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("actual"), 1L).otherwise(0L)).as("n_actual"),
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_positive"),
        sum(when(col("bloom_hit") && !col("actual"), 1L).otherwise(0L))
          .as("n_false_positive"),
        sum(when(!col("bloom_hit") && col("actual"), 1L).otherwise(0L))
          .as("n_false_negative")) // provably 0: the filter property
      .orderBy("c_mktsegment")
  }

  def bloomFilterAuditOracle: String = {
    val bitSql = affineBucketSql("h", "i", BloomBits)
    s"""WITH build AS (SELECT DISTINCT o_custkey AS k FROM orders
       |               WHERE o_orderpriority = '1-URGENT'),
       |bits AS (SELECT DISTINCT $bitSql AS bit
       |  FROM (SELECT ${h32Sql("k")} AS h FROM build) b
       |  CROSS JOIN range($BloomHashes) r(i)),
       |probe AS (SELECT c_custkey, c_mktsegment, $bitSql AS bit
       |  FROM (SELECT c_custkey, c_mktsegment, ${h32Sql("c_custkey")} AS h
       |        FROM customer) c
       |  CROSS JOIN range($BloomHashes) r(i)),
       |verdict AS (SELECT p.c_custkey, p.c_mktsegment,
       |    (COUNT(b.bit) = $BloomHashes) AS bloom_hit
       |  FROM probe p LEFT JOIN bits b ON p.bit = b.bit
       |  GROUP BY 1, 2),
       |truth AS (SELECT c_custkey, TRUE AS actual FROM customer
       |          WHERE c_custkey IN (SELECT k FROM build))
       |SELECT v.c_mktsegment,
       |  CAST(COUNT(*) AS BIGINT) AS n_customers,
       |  CAST(SUM(CASE WHEN COALESCE(t.actual, FALSE) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_actual,
       |  CAST(SUM(CASE WHEN v.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bloom_positive,
       |  CAST(SUM(CASE WHEN v.bloom_hit AND NOT COALESCE(t.actual, FALSE)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
       |  CAST(SUM(CASE WHEN NOT v.bloom_hit AND COALESCE(t.actual, FALSE)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative
       |FROM verdict v LEFT JOIN truth t ON v.c_custkey = t.c_custkey
       |GROUP BY v.c_mktsegment ORDER BY v.c_mktsegment""".stripMargin
  }
}
