package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-data curation pipeline composing the ext
  * operators — the shape a 100 TB corpus actually runs:
  *
  *   1. fingerprint + exact/bag dedup (hash groupBy, keeper = min id)
  *   2. quality filter (pure projection thresholds)
  *   3. near-dup removal via MinHash-LSH pairs (keep the smaller id of
  *      each high-similarity pair)
  *   4. per-doc token/subword accounting for budget packing
  *
  * Stage order matters at scale: cheap exact dedup shrinks the corpus
  * before the (shuffling) LSH stage; quality filtering is a projection
  * and goes wherever it prunes most. Every stage is a DataFrame
  * transform — the whole pipeline is one lazy plan until the sink.
  */
object Pipeline {

  case class CurationStats(n_input: Long, n_after_exact: Long,
                           n_after_quality: Long, n_after_neardup: Long,
                           total_tokens: Long)

  /** The curation thresholds — ONE definition consumed by [[curate]]'s
    * parameter defaults AND [[curateDocs]]'s inline pipeline, so the
    * oracle-gated survivor set cannot silently drift from the waterfall
    * stats (they also appear as literals in [[curationCtes]], which the
    * driver's oracle hash pins). Tuned for the fixture corpus;
    * parameters in a real run. */
  private[graft] val CurateMinTokens = 10L
  private[graft] val CurateMaxStopwordRatio = 0.9
  private[graft] val CurateNearDupThreshold = 0.9

  /** Stage 1: exact dedup on normalized text (keeper = min doc_id) —
    * one lazy definition shared by the stats path and the stats-free
    * survivor query so the two cannot drift. */
  private def exactKeepers(docs: DataFrame): DataFrame = docs
    .withColumn("norm", trim(regexp_replace(lower(col("text")), "\\s+", " ")))
    .withColumn("keeper",
      min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("norm")))
    .filter(col("doc_id") === col("keeper"))
    .drop("norm", "keeper")

  /** Stage 2: quality filter (projection-only), lazily defined. */
  private def qualityFrame(keepers: DataFrame, minTokens: Long,
                           maxStopwordRatio: Double): DataFrame = {
    val ws = TextAnalysis.tokens(col("text"))
    keepers
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("stop_ratio",
        size(filter(ws, w => w.isin("the", "a", "of", "and", "to", "in", "is", "it")))
          .cast("double") / col("n_tokens"))
      .filter(col("n_tokens") >= minTokens && col("stop_ratio") <= maxStopwordRatio)
      .drop("stop_ratio")
  }

  /** Stage 3: near-dup drop set over the survivors (greedy
    * keep-the-smaller-id per high-similarity LSH pair). */
  private def nearDupDrops(quality: DataFrame,
                           nearDupThreshold: Double): DataFrame =
    Dedup.minhashPairs(quality, threshold = nearDupThreshold)
      .select(col("d2").as("doc_id")).distinct()

  /** Curate the documents table: returns (curated corpus, stage stats).
    * Thresholds tuned for the fixture corpus; parameters in a real run. */
  def curate(spark: SparkSession, dir: String,
             minTokens: Long = CurateMinTokens,
             maxStopwordRatio: Double = CurateMaxStopwordRatio,
             nearDupThreshold: Double = CurateNearDupThreshold)
      : (DataFrame, CurationStats) = {
    val docs = Tables.documents(spark, dir)
    val nInput = docs.count()

    val keepers = exactKeepers(docs)
    val nExact = keepers.count()

    // quality is persisted: reused by the survivor-join below and the
    // final stats
    val quality = qualityFrame(keepers, minTokens, maxStopwordRatio).persist()
    val nQuality = quality.count()

    // 3. near-dup removal over the SURVIVORS only (LSH on the already-
    // shrunk corpus — the dominant shuffle never sees dropped docs).
    // Greedy keep-the-smaller-id per pair; both endpoints are
    // survivors by construction, so no content is lost. (Transitive
    // chains A≈B≈C may keep C when B was dropped — the standard greedy
    // trade-off vs. Dedup.duplicateGroups' connected components.)
    val drops = nearDupDrops(quality, nearDupThreshold)
    val curated = quality.join(drops, Seq("doc_id"), "left_anti").persist()
    val nFinal = curated.count()

    // 4. token accounting (sum over zero rows is NULL, not 0)
    val totalTokens = Option(curated.agg(sum(col("n_tokens"))).collect()(0).get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    quality.unpersist()

    (curated, CurationStats(nInput, nExact, nQuality, nFinal, totalTokens))
  }

  /** The curated corpus as a verifiable query: (doc_id, n_tokens) of
    * every surviving document — the whole four-stage pipeline under
    * the driver's oracle gate. Built from the SAME lazy stage
    * definitions as [[curate]] but without the five per-stage count
    * actions (the waterfall's deliverable, dead weight here): the
    * survivor set is one lazy plan; `quality` is persisted because the
    * LSH drop-set and the anti-join spine both read it, and released
    * after the consuming action. */
  def curateDocs(spark: SparkSession, dir: String): DataFrame = {
    val quality = qualityFrame(
      exactKeepers(Tables.documents(spark, dir)),
      CurateMinTokens, CurateMaxStopwordRatio).persist()
    val curated = quality.join(nearDupDrops(quality, CurateNearDupThreshold),
      Seq("doc_id"), "left_anti")
    graft.GraftSession.releaseAfterAction(spark, quality)
    curated.select(col("doc_id"), col("n_tokens")).orderBy("doc_id")
  }

  /** The curation WATERFALL: one row per pipeline stage with the doc
    * count entering, removed, and surviving, plus retention vs the
    * raw input — the per-stage attribution every dedup campaign
    * reports ("exact dedup took 4%, quality took 14%, near-dup took
    * 5%"), which is what decides where the next unit of curation
    * effort goes. The counts are [[curate]]'s own stage aggregates
    * (output-of-aggregation scalars — the bounded-collect class);
    * the report frame is 4 rows built from them, and the oracle
    * re-derives every stage count from the same CTE chain as
    * [[curateDocsOracle]], so the whole four-stage composition is
    * verified at EVERY cut point, not just the final survivor set. */
  def pipelineWaterfall(spark: SparkSession, dir: String): DataFrame = {
    val (curated, st) = curate(spark, dir)
    // only the four scalar counts are consumed here — releasing the
    // survivor cache immediately (a discarded persist would otherwise
    // pin executor storage until session end)
    curated.unpersist()
    def r6(num: Long): Option[Double] =
      if (st.n_input > 0)
        Some(BigDecimal(num.toDouble / st.n_input)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    val rows = Seq(
      ("0_input", st.n_input, 0L),
      ("1_exact_dedup", st.n_after_exact, st.n_input - st.n_after_exact),
      ("2_quality", st.n_after_quality, st.n_after_exact - st.n_after_quality),
      ("3_neardup", st.n_after_neardup, st.n_after_quality - st.n_after_neardup))
    import spark.implicits._
    rows.map { case (stage, out, removed) =>
      (stage, out, removed, r6(out)) }
      .toDF("stage", "docs_out", "docs_removed", "retention")
      .orderBy("stage")
  }

  def pipelineWaterfallOracle: String =
    s"""WITH $curationCtes,
       |s0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM k0
       |       WHERE doc_id = keeper),
       |s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM quality),
       |s3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM quality
       |       WHERE doc_id NOT IN (SELECT d2 FROM drops)),
       |w AS (
       |  SELECT '0_input' AS stage, s0.n AS docs_out,
       |    CAST(0 AS BIGINT) AS docs_removed FROM s0
       |  UNION ALL SELECT '1_exact_dedup', s1.n, s0.n - s1.n FROM s0, s1
       |  UNION ALL SELECT '2_quality', s2.n, s1.n - s2.n FROM s1, s2
       |  UNION ALL SELECT '3_neardup', s3.n, s2.n - s3.n FROM s2, s3)
       |SELECT w.stage, w.docs_out, w.docs_removed,
       |  CASE WHEN s0.n > 0
       |       THEN round(CAST(w.docs_out AS DOUBLE) / s0.n, 6) END AS retention
       |FROM w, s0 ORDER BY w.stage""".stripMargin

  /** The pipeline's shared CTE chain (k0 → quality → est → drops),
    * mirroring every stage: whitespace-normalized exact dedup, quality
    * thresholds, capped-LSH near-dup candidates. ONE definition
    * interpolated by BOTH the survivor-set and waterfall oracles — a
    * threshold edit cannot drift them apart. DuckDB's regexp_replace
    * needs the 'g' flag — it replaces only the first match by
    * default, unlike Spark. */
  private def curationCtes: String =
    s"""k0 AS (
       |  SELECT doc_id, text,
       |    MIN(doc_id) OVER (PARTITION BY
       |      trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS keeper
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id, text, len(ws) AS n_tokens FROM (
       |    SELECT doc_id, text, ${Dedup.tokensSqlPublic} AS ws
       |    FROM k0 WHERE doc_id = keeper) t
       |  WHERE len(ws) >= $CurateMinTokens
       |    AND CAST(len(list_filter(ws,
       |      w -> w IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
       |        / len(ws) <= $CurateMaxStopwordRatio),
       |${Dedup.minhashEstCtesPublic("quality")},
       |drops AS (SELECT DISTINCT d2 FROM est
       |          WHERE est_jaccard >= $CurateNearDupThreshold)"""
      .stripMargin

  def curateDocsOracle: String =
    s"""WITH $curationCtes
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
       |FROM quality WHERE doc_id NOT IN (SELECT d2 FROM drops)
       |ORDER BY doc_id""".stripMargin

  /** Training-readiness report — the one-table answer to "may I train
    * on this corpus?": every pre-training gate this engine implements,
    * each collapsed to its headline number, compared against a policy
    * threshold, with a pass verdict. Seven checks: exact-duplicate
    * rate, near-duplicate doc rate (docs in multi-member LSH groups),
    * residual split leakage under the NAIVE split (the number
    * [[graft.ext.Dedup.groupSafeSplit]] drives to zero), 8-gram and
    * verbatim-run eval contamination rates (whose FIXes are dropping
    * or [[graft.ext.Dedup.substringExcise]]-style excision), quality
    * pass rate, and PII document rate ([[Pii.piiRedact]] is the fix).
    * A failing row is the report working, not the report broken — on
    * the gate fixture the leakage/contamination rows FAIL because the
    * fixture plants cross-source duplicates, and each failing check
    * names the operator that repairs it. Thresholds are policy knobs
    * (documented literals, identical in the oracle); the value
    * arithmetic is counts and single divisions, rounded to 6 — the
    * whole report is deterministic. Cost: each check is a bounded
    * aggregate over a pipeline this library already runs at scale
    * (the CC pair graph, two gram scans, a quality scan, a PII
    * scan); nothing new shuffles. */
  /** One verdict row: (check_name, value, threshold, pass). Shared by
    * the batch gate and the incremental twin so the rounding and the
    * pass comparison cannot drift between them. */
  private def asCheck(name: String, v: DataFrame, threshold: Double,
                      lessIsGood: Boolean): DataFrame =
    v.select(lit(name).as("check_name"), round(col("value"), 6).as("value"),
      lit(threshold).as("threshold"),
      (if (lessIsGood) round(col("value"), 6) <= threshold
       else round(col("value"), 6) >= threshold).as("pass"))

  def trainingReadiness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ev = TextAnalysis.EvalSource
    val exactDup = docs.agg((lit(1.0) -
      countDistinct(md5(col("text"))).cast("double") / count(lit(1)))
      .as("value"))
    // resolve connected components ONCE — both the near-dup sizes and
    // the leakage audit read the same groups frame (duplicateGroups is
    // eager: the pair graph + union-find run at call time)
    val groups = Dedup.duplicateGroups(spark, dir)
    val sizes = groups.groupBy("group_id").agg(count(lit(1)).as("sz"))
    val nearDup = sizes.agg(
      (sum(when(col("sz") >= 2, col("sz")).otherwise(0L)).cast("double") /
        sum(col("sz"))).as("value"))
    val leakage = Dedup.splitLeakageAuditFromGroups(spark, dir, groups)
      .agg(count(lit(1)).cast("double").as("value"))
    val nTrain = docs.filter(col("source") =!= ev)
      .agg(count(lit(1)).as("nt"))
    val ngram = TextAnalysis.decontaminate(spark, dir)
      .agg(count(lit(1)).as("c")).crossJoin(broadcast(nTrain))
      .select((col("c").cast("double") / col("nt")).as("value"))
    val substr = Dedup.decontaminateSubstring(spark, dir)
      .filter(col("contam_tokens") > 0)
      .agg(count(lit(1)).as("c")).crossJoin(broadcast(nTrain))
      .select((col("c").cast("double") / col("nt")).as("value"))
    val quality = docs.agg(
      (sum(when(TextAnalysis.qualityReason(col("text")) === "pass", 1L)
        .otherwise(0L)).cast("double") / count(lit(1))).as("value"))
    val pii = Pii.piiScan(spark, dir).agg(
      (sum(when(col("has_pii"), 1L).otherwise(0L)).cast("double") /
        count(lit(1))).as("value"))
    Seq(
      asCheck("exact_dup_rate", exactDup, 0.05, lessIsGood = true),
      asCheck("near_dup_doc_rate", nearDup, 0.10, lessIsGood = true),
      asCheck("split_leakage_groups", leakage, 0.0, lessIsGood = true),
      asCheck("ngram_contaminated_rate", ngram, 0.02, lessIsGood = true),
      asCheck("substring_contaminated_rate", substr, 0.02,
        lessIsGood = true),
      asCheck("quality_pass_rate", quality, 0.70, lessIsGood = false),
      asCheck("pii_doc_rate", pii, 0.01, lessIsGood = true))
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }

  // ── incremental training-readiness: the per-ingest-batch gate ──

  /** Standing per-check sufficient statistics of the BASE corpus
    * (doc_id % DeltaMod ≠ DeltaMod−1) — what a production deployment
    * maintains as tables/counters between ingest batches, memoized
    * here per (session, corpus) exactly like [[graft.ext.Dedup
    * .standingDedupState]]. Scalars (counts) plus six checkpointed
    * frames: the distinct text fingerprints, and per contamination
    * check the standing eval gram set, the standing train gram INDEX
    * (the inverted structure that lets NEW eval grams re-screen the
    * standing corpus without a re-scan), and the already-contaminated
    * train doc set. Every member is either delta-joinable state or a
    * running counter — nothing here is a per-tick recomputation. */
  private[graft] final case class ReadyState(
      nBase: Long, nTrainBase: Long, qualityPassBase: Long, piiBase: Long,
      nFpBase: Long, fpBase: DataFrame,
      evalNg: DataFrame, trainNgIdx: DataFrame, contamNgBase: DataFrame,
      evalSs: DataFrame, trainSsIdx: DataFrame, contamSsBase: DataFrame)

  private val readyStateMemo = new graft.SessionDirMemo[ReadyState]
  private[graft] def resetReadyStateMemo(): Unit = readyStateMemo.reset()

  private def isDeltaId(c: Column): Column =
    c % Dedup.DeltaMod === (Dedup.DeltaMod - 1)

  /** Per-row PII flag — the same pattern battery [[Pii.piiScan]]
    * counts, collapsed to the has_pii verdict (a pure projection, so
    * it applies to a delta frame verbatim). */
  private def hasPiiCol: Column =
    Pii.Patterns.map { case (_, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long") }.reduce(_ + _) > 0

  private[graft] def readyState(spark: SparkSession, dir: String): ReadyState =
    readyStateMemo.get(spark, dir) {
      val ev = TextAnalysis.EvalSource
      val base = Tables.documents(spark, dir)
        .filter(!isDeltaId(col("doc_id")))
        .select(col("doc_id"), col("source"), col("text")).persist()
      val h = base.agg(
        count(lit(1)),
        coalesce(sum(when(col("source") =!= ev, 1L).otherwise(0L)), lit(0L)),
        coalesce(sum(when(
          TextAnalysis.qualityReason(col("text")) === "pass", 1L)
          .otherwise(0L)), lit(0L)),
        coalesce(sum(when(hasPiiCol, 1L).otherwise(0L)), lit(0L))).first()
      // NULL-text docs hash to a NULL fingerprint; countDistinct (the
      // batch gate and the shared oracle) skips NULLs, so the standing
      // set must too or the delta gate diverges on NULL-text corpora
      val fpBase = base.select(md5(col("text")).as("fp"))
        .filter(col("fp").isNotNull)
        .distinct().localCheckpoint()
      val ng = TextAnalysis.ngramArr(TextAnalysis.DecontamN)
      val evalNg = base.filter(col("source") === ev)
        .select(explode(ng).as("g")).distinct().localCheckpoint()
      // per-doc gram arrays are already distinct — the explode is the
      // per-doc-distinct (g, doc_id) index with no extra aggregation
      val trainNgIdx = base.filter(col("source") =!= ev)
        .select(col("doc_id"), explode(ng).as("g")).localCheckpoint()
      val contamNgBase = trainNgIdx
        .join(evalNg, Seq("g"), "leftsemi")
        .select(col("doc_id")).distinct().localCheckpoint()
      val evalSs = Dedup.gramRows(base.filter(col("source") === ev)
          .select(col("doc_id"), col("text")))
        .select(col("g")).distinct().localCheckpoint()
      val trainSsIdx = Dedup.gramRows(base.filter(col("source") =!= ev)
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("g")).distinct().localCheckpoint()
      val contamSsBase = trainSsIdx
        .join(evalSs, Seq("g"), "leftsemi")
        .select(col("doc_id")).distinct().localCheckpoint()
      base.unpersist()
      ReadyState(h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3),
        fpBase.count(), fpBase,
        evalNg, trainNgIdx, contamNgBase, evalSs, trainSsIdx, contamSsBase)
    }

  /** Incremental training-readiness — the seven verdict rows of
    * [[trainingReadiness]] maintained per ingest batch instead of
    * recomputed over the lake. Composition per check, each bounded by
    * the delta (plus, for the two near-dup rows, the [[graft.ext.Dedup
    * .dedupGroupsDelta]] fold that replaces the corpus-wide CC
    * re-resolution the 100× sweep measured at 29 s):
    *   - exact/quality/PII: running counters + one aggregate over the
    *     delta (pure projections, the same column expressions as the
    *     batch gate); new-fingerprint count is one anti join of the
    *     delta's fingerprints against the standing set.
    *   - n-gram & verbatim-run contamination, BOTH directions: delta
    *     train docs screen against the full eval gram set (standing ∪
    *     delta), and NEW eval grams (anti join, delta-sized) re-screen
    *     the standing corpus through the standing train gram index —
    *     a keyed lookup, never a corpus re-scan. The contaminated-doc
    *     set is the union of standing ∪ both screens, so the value
    *     converges to the batch gate exactly.
    *   - near-dup rate & split leakage: read the incrementally
    *     maintained group labels (provably identical to from-scratch).
    * Emits the SAME seven rows with the same thresholds and rounding
    * ([[asCheck]] is shared), and registers the SAME oracle object as
    * `training_readiness` — the monitor discipline: one oracle, two
    * execution forms, bit-identical results. */
  def trainingReadinessDelta(spark: SparkSession, dir: String): DataFrame = {
    val st = readyState(spark, dir)
    val delta = Tables.documents(spark, dir)
      .filter(isDeltaId(col("doc_id")))
      .select(col("doc_id"), col("source"), col("text"))
    readinessFromDeltaScreen(spark, dir, deltaDocScreen(st)(delta))
  }

  /** The per-arriving-doc screen — ONE kernel shared verbatim by the
    * batch delta gate and the streaming twin ([[graft.streaming
    * .DocStream.streamingTrainingReadiness]]), so the two execution
    * forms cannot drift: per delta doc, the flag projections (train /
    * quality-pass / PII / content fingerprint — the same column
    * expressions as the batch gate, coalesced to the batch
    * `when(...).otherwise(0)` NULL semantics) plus hit flags against
    * the STANDING eval gram sets of both contamination families.
    * Streaming-legal by construction: three stateless projections of
    * the input (a flag sentinel row per doc, the n-gram rows, the
    * positional k-gram rows) union into one frame, the gram rows join
    * the checkpoint-frozen standing sets stream-static, and the ONLY
    * aggregation is the final groupBy(doc_id) — state is one row per
    * delta doc, the quarantine verdict a crawl gate upserts. */
  private[graft] def deltaDocScreen(st: ReadyState)(
      docs: DataFrame): DataFrame = {
    val ev = TextAnalysis.EvalSource
    val ng = TextAnalysis.ngramArr(TextAnalysis.DecontamN)
    def z = lit(0)
    def nullI = lit(null).cast("int")
    def hit(grams: DataFrame, standing: DataFrame): DataFrame =
      grams.join(standing.select(col("g"), lit(1).as("h")), Seq("g"), "left")
        .select(col("doc_id"), coalesce(col("h"), lit(0)).as("h"))
    val docRows = docs.select(col("doc_id"),
      coalesce((col("source") =!= ev).cast("int"), z).as("it"),
      coalesce((TextAnalysis.qualityReason(col("text")) === "pass")
        .cast("int"), z).as("qp"),
      coalesce(hasPiiCol.cast("int"), z).as("hp"),
      md5(col("text")).as("fp"), nullI.as("hng"), nullI.as("hss"))
    val ngRows = hit(docs.select(col("doc_id"), explode(ng).as("g")),
        st.evalNg)
      .select(col("doc_id"), nullI.as("it"), nullI.as("qp"), nullI.as("hp"),
        lit(null).cast("string").as("fp"), col("h").as("hng"),
        nullI.as("hss"))
    val ssRows = hit(Dedup.gramRows(docs.select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("g")), st.evalSs)
      .select(col("doc_id"), nullI.as("it"), nullI.as("qp"), nullI.as("hp"),
        lit(null).cast("string").as("fp"), nullI.as("hng"),
        col("h").as("hss"))
    docRows.unionByName(ngRows).unionByName(ssRows)
      .groupBy("doc_id")
      .agg(max(col("it")).as("it"), max(col("qp")).as("qp"),
        max(col("hp")).as("hp"), max(col("fp")).as("fp"),
        coalesce(max(col("hng")), lit(0)).as("hit_ng"),
        coalesce(max(col("hss")), lit(0)).as("hit_ss"))
  }

  /** The per-tick FOLD shared by the batch delta gate and the
    * streaming twin: assemble the seven verdict rows from standing
    * state + the converged per-doc screen. Everything here is bounded
    * by the delta (or by standing |touched| slices):
    *   - exact/quality/PII: running counters + one aggregate over the
    *     screen; new-fingerprint count is one anti join of the
    *     screen's (non-NULL — countDistinct semantics) fingerprints
    *     against the standing set.
    *   - contamination, BOTH directions and families: the screen
    *     already carries delta-train hits vs the STANDING eval gram
    *     sets; this fold adds the NEW-eval-gram cross terms — new
    *     grams (anti join, delta-sized) re-screen the delta train
    *     docs AND the standing corpus through the standing train gram
    *     index (keyed lookups, never a corpus re-scan). The
    *     contaminated set is the union of standing ∪ all screens, so
    *     the value converges to the batch gate exactly.
    *   - near-dup rate & split leakage: read the incrementally
    *     maintained group labels (provably identical to from-scratch).
    * Emits the SAME seven rows with the same thresholds and rounding
    * ([[asCheck]] is shared), and registers the SAME oracle object as
    * `training_readiness` — one oracle, three execution forms. */
  private[graft] def readinessFromDeltaScreen(
      spark: SparkSession, dir: String, screen: DataFrame): DataFrame = {
    val st = readyState(spark, dir)
    val ev = TextAnalysis.EvalSource
    // The tick's scalar terms used to run as ~6 driver-sequenced
    // actions (screen moments, the new-fingerprint anti-join count,
    // and per contamination family an eager new-gram checkpoint plus
    // a union-distinct count). They are all 1-row aggregates over the
    // same two delta-bounded inputs, so they now ride ONE action: the
    // screen and the delta slice are localCheckpoint'ed once each
    // (single-action multi-branch reuse — persist() races its own
    // cache fill across the parallel branches, the r12 conformal
    // lesson), and the seven scalars cross-join into one collected
    // row whose branches run as parallel stages of one job. The
    // per-family new-gram frame stays lazy: both of its consumers
    // broadcast the same subtree, which exchange reuse dedupes inside
    // the one action.
    val scr = screen.localCheckpoint()
    // NEW-eval-gram cross terms need the delta slice itself (the
    // per-tick batch step, exactly like the CC fold's label assembly)
    val delta = Tables.documents(spark, dir)
      .filter(isDeltaId(col("doc_id")))
      .select(col("doc_id"), col("source"), col("text")).localCheckpoint()
    val ng = TextAnalysis.ngramArr(TextAnalysis.DecontamN)
    def contamCount(newEval: DataFrame, deltaTrainGrams: DataFrame,
                    trainIdx: DataFrame, contamBase: DataFrame,
                    streamedHits: DataFrame, name: String): DataFrame = {
      val deltaNewHits = deltaTrainGrams
        .join(broadcast(newEval), Seq("g"), "leftsemi")
        .select(col("doc_id")).distinct()
      val baseNewHits = trainIdx
        .join(broadcast(newEval), Seq("g"), "leftsemi")
        .select(col("doc_id")).distinct()
      contamBase.union(streamedHits).union(deltaNewHits).union(baseNewHits)
        .distinct().agg(count(lit(1)).as(name))
    }
    val contamNgC = contamCount(
      delta.filter(col("source") === ev)
        .select(explode(ng).as("g")).distinct()
        .join(st.evalNg, Seq("g"), "left_anti"),
      delta.filter(col("source") =!= ev)
        .select(col("doc_id"), explode(ng).as("g")),
      st.trainNgIdx, st.contamNgBase,
      scr.filter(col("it") === 1 && col("hit_ng") === 1)
        .select(col("doc_id")), "c_ng")
    val contamSsC = contamCount(
      Dedup.gramRows(delta.filter(col("source") === ev)
          .select(col("doc_id"), col("text")))
        .select(col("g")).distinct()
        .join(st.evalSs, Seq("g"), "left_anti"),
      Dedup.gramRows(delta.filter(col("source") =!= ev)
          .select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("g")),
      st.trainSsIdx, st.contamSsBase,
      scr.filter(col("it") === 1 && col("hit_ss") === 1)
        .select(col("doc_id")), "c_ss")
    val newFpC = scr.select(col("fp"))
      .filter(col("fp").isNotNull).distinct()
      .join(st.fpBase, Seq("fp"), "left_anti")
      .agg(count(lit(1)).as("c_fp"))
    val h = scr.agg(
        count(lit(1)).as("c_n"),
        coalesce(sum(col("it").cast("long")), lit(0L)).as("c_it"),
        coalesce(sum(col("qp").cast("long")), lit(0L)).as("c_qp"),
        coalesce(sum(col("hp").cast("long")), lit(0L)).as("c_hp"))
      .crossJoin(broadcast(newFpC))
      .crossJoin(broadcast(contamNgC))
      .crossJoin(broadcast(contamSsC))
      .first()
    val (nDelta, nTrainDelta, qualDelta, piiDelta) =
      (h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3))
    val n = st.nBase + nDelta
    val nTrain = st.nTrainBase + nTrainDelta
    val newFp = h.getLong(4)
    val nContamNg = h.getLong(5)
    val nContamSs = h.getLong(6)

    // the two group-structure rows read the incrementally maintained
    // labels — the whole point: no corpus-wide CC re-resolution here
    val groups = Dedup.dedupGroupsDelta(spark, dir)
      .select(col("doc_id"), col("group_id"))
    val sizes = groups.groupBy("group_id").agg(count(lit(1)).as("sz"))
    val nearDup = sizes.agg(
      (sum(when(col("sz") >= 2, col("sz")).otherwise(0L)).cast("double") /
        sum(col("sz"))).as("value"))
    val leakage = Dedup.splitLeakageAuditFromGroups(spark, dir, groups)
      .agg(count(lit(1)).cast("double").as("value"))

    // identical integer→double divisions to the batch expressions:
    // same exact operands, same IEEE result, same round(…, 6)
    def one(v: Column): DataFrame = spark.range(1).select(v.as("value"))
    val exactDup = one(lit(1.0) - lit((st.nFpBase + newFp).toDouble) / lit(n.toDouble))
    val ngramV = one(lit(nContamNg.toDouble) / lit(nTrain.toDouble))
    val substrV = one(lit(nContamSs.toDouble) / lit(nTrain.toDouble))
    val quality = one(lit((st.qualityPassBase + qualDelta).toDouble) / lit(n.toDouble))
    val pii = one(lit((st.piiBase + piiDelta).toDouble) / lit(n.toDouble))
    Seq(
      asCheck("exact_dup_rate", exactDup, 0.05, lessIsGood = true),
      asCheck("near_dup_doc_rate", nearDup, 0.10, lessIsGood = true),
      asCheck("split_leakage_groups", leakage, 0.0, lessIsGood = true),
      asCheck("ngram_contaminated_rate", ngramV, 0.02, lessIsGood = true),
      asCheck("substring_contaminated_rate", substrV, 0.02,
        lessIsGood = true),
      asCheck("quality_pass_rate", quality, 0.70, lessIsGood = false),
      asCheck("pii_doc_rate", pii, 0.01, lessIsGood = true))
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }

  def trainingReadinessOracle: String = {
    val ev = TextAnalysis.EvalSource
    val g8 = (0 until 8).map(o => s"ws[i+${o + 1}]").mkString(" || ' ' || ")
    val piiHit = graft.ext.Pii.Patterns
      .map { case (_, pat, _) => s"len(regexp_extract_all(text, '$pat'))" }
      .mkString(" + ")
    s"""WITH RECURSIVE
       |${Dedup.minhashEstCtesPublic("documents")},
       |edges AS (SELECT d1 AS src, d2 AS dst FROM est
       |            WHERE est_jaccard >= ${Dedup.PairThreshold}
       |          UNION ALL
       |          SELECT d2, d1 FROM est
       |            WHERE est_jaccard >= ${Dedup.PairThreshold}),
       |reach AS (SELECT doc_id, doc_id AS label FROM documents
       |          UNION
       |          SELECT e.dst AS doc_id, r.label
       |          FROM reach r JOIN edges e ON r.doc_id = e.src),
       |grp AS (SELECT doc_id, CAST(min(label) AS BIGINT) AS group_id
       |        FROM reach GROUP BY doc_id),
       |sizes AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS sz
       |          FROM grp GROUP BY 1),
       |splits AS (SELECT doc_id,
       |    ${graft.ext.Sampling.splitCaseSql("doc_id")} AS split
       |  FROM documents),
       |leak AS (SELECT g.group_id FROM grp g JOIN splits s USING (doc_id)
       |  GROUP BY g.group_id HAVING COUNT(DISTINCT s.split) > 1),
       |tok AS (SELECT doc_id, source, ${Dedup.tokensSqlPublic} AS ws
       |  FROM documents),
       |g8 AS (SELECT doc_id, source,
       |    list_distinct(list_transform(
       |      range(greatest(len(ws) - 7, 0)), i -> $g8)) AS grams
       |  FROM tok),
       |evg8 AS (SELECT DISTINCT unnest(grams) AS g FROM g8
       |  WHERE source = '$ev'),
       |ng AS (SELECT DISTINCT doc_id FROM
       |  (SELECT doc_id, unnest(grams) AS g FROM g8 WHERE source <> '$ev') t
       |  WHERE g IN (SELECT g FROM evg8)),
       |pos AS (SELECT doc_id, source, p,
       |    md5(array_to_string(ws[p + 1:p + 8], ' ')) AS g
       |  FROM (SELECT doc_id, source, ws, unnest(range(len(ws) - 7)) AS p
       |        FROM tok WHERE len(ws) >= 8) u),
       |evp AS (SELECT DISTINCT g FROM pos WHERE source = '$ev'),
       |sdoc AS (SELECT DISTINCT doc_id FROM pos
       |  WHERE source <> '$ev' AND g IN (SELECT g FROM evp)),
       |qm AS (SELECT
       |  ${TextAnalysis.qualityMeasuresSql}
       |  FROM tok),
       |qr AS (SELECT
       |  ${TextAnalysis.qualityReasonCaseSql} AS reason
       |  FROM qm),
       |piid AS (SELECT doc_id, ($piiHit) > 0 AS has_pii FROM documents),
       |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS nd FROM documents),
       |ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM documents
       |  WHERE source <> '$ev'),
       |rows AS (
       |  SELECT 'exact_dup_rate' AS check_name,
       |    round(1.0 - CAST(nd AS DOUBLE) / n, 6) AS value,
       |    0.05 AS threshold FROM base
       |  UNION ALL
       |  SELECT 'near_dup_doc_rate',
       |    round(CAST((SELECT COALESCE(SUM(CASE WHEN sz >= 2 THEN sz
       |        ELSE 0 END), 0) FROM sizes) AS DOUBLE) /
       |      (SELECT SUM(sz) FROM sizes), 6), 0.10
       |  UNION ALL
       |  SELECT 'split_leakage_groups',
       |    round(CAST((SELECT COUNT(*) FROM leak) AS DOUBLE), 6), 0.0
       |  UNION ALL
       |  SELECT 'ngram_contaminated_rate',
       |    round(CAST((SELECT COUNT(*) FROM ng) AS DOUBLE) /
       |      (SELECT nt FROM ntr), 6), 0.02
       |  UNION ALL
       |  SELECT 'substring_contaminated_rate',
       |    round(CAST((SELECT COUNT(*) FROM sdoc) AS DOUBLE) /
       |      (SELECT nt FROM ntr), 6), 0.02
       |  UNION ALL
       |  SELECT 'quality_pass_rate',
       |    round(CAST((SELECT COUNT(*) FROM qr WHERE reason = 'pass')
       |      AS DOUBLE) / (SELECT COUNT(*) FROM qr), 6), 0.70
       |  UNION ALL
       |  SELECT 'pii_doc_rate',
       |    round(CAST((SELECT COUNT(*) FROM piid WHERE has_pii)
       |      AS DOUBLE) / (SELECT COUNT(*) FROM piid), 6), 0.01)
       |SELECT check_name, value, threshold,
       |  CASE WHEN check_name = 'quality_pass_rate'
       |       THEN value >= threshold ELSE value <= threshold END AS pass
       |FROM rows ORDER BY check_name""".stripMargin
  }

  // ── delta-join IVM: a materialized JOIN view maintained per batch ──

  /** The two slim keyed projections the maintained view joins — at
    * lake scale these are the maintained tables themselves (fact keyed
    * by order, dimension keyed by customer), not scans. */
  private def ordersSlim(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  private def custSlim(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))

  /** Standing state of the join view: the materialized base view plus
    * the two base sides it was built from (the delta-join algebra
    * needs OLD sides, not current ones — folding ΔA against an
    * already-updated B double-counts ΔA⋈ΔB). */
  private[graft] final case class JoinViewState(
      view: DataFrame, baseOrders: DataFrame, baseCust: DataFrame)

  private val joinViewMemo = new graft.SessionDirMemo[JoinViewState]
  private[graft] def resetJoinViewMemo(): Unit = joinViewMemo.reset()

  /** The view definition — ONE place, shared by bootstrap and every
    * fold term, so the maintained view cannot drift from its spec. */
  private def enrichJoin(o: DataFrame, c: DataFrame): DataFrame =
    o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"),
        col("c_mktsegment"), col("c_nationkey"), col("o_totalprice"))

  private[graft] def joinViewState(spark: SparkSession,
                                   dir: String): JoinViewState =
    joinViewMemo.get(spark, dir) {
      val bo = ordersSlim(spark, dir)
        .filter(!isDeltaId(col("o_orderkey"))).localCheckpoint()
      val bc = custSlim(spark, dir)
        .filter(!isDeltaId(col("c_custkey"))).localCheckpoint()
      JoinViewState(enrichJoin(bo, bc).localCheckpoint(), bo, bc)
    }

  /** ONE maintenance tick of the classic delta-join algebra for
    * insert-only deltas on BOTH sides:
    *
    *   Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB
    *
    * Returns the UPDATED state (view ∪ ΔV, sides ∪ deltas) so ticks
    * COMPOSE — ExtSpec proves K sequential folds equal the one-shot
    * join, which holds because the three terms tile A_new⋈B_new −
    * A_old⋈B_old exactly (the sides are disjoint by the delta split).
    * Cost shape at 100 TB: every term is delta-bounded on at least one
    * side — ΔA⋈B_old and A_old⋈ΔB broadcast the delta against the
    * maintained (bucketed) base table, ΔA⋈ΔB is delta×delta; the
    * standing view is APPENDED, never rebuilt, so the tick is
    * O(|Δ| + |Δ-matched rows|) while the from-scratch refresh pays the
    * full fact-scan join every day. */
  private[graft] def foldJoinDelta(st: JoinViewState,
                                   dO: DataFrame, dC: DataFrame): JoinViewState = {
    val dv = enrichJoin(broadcast(dO), st.baseCust)
      .unionByName(enrichJoin(st.baseOrders, broadcast(dC)))
      .unionByName(enrichJoin(broadcast(dO), broadcast(dC)))
    JoinViewState(st.view.unionByName(dv),
      st.baseOrders.unionByName(dO), st.baseCust.unionByName(dC))
  }

  /** Incremental maintenance of a materialized JOIN view — the one
    * incremental shape production lakes run daily that the aggregate
    * ([[graft.operators.Relational.ivmPriorityRevenue]]), CC
    * ([[graft.ext.Dedup.dedupGroupsDelta]]) and gate
    * ([[trainingReadinessDelta]]) forms don't cover: orders enriched
    * by customer attributes, maintained under an ingest batch that
    * lands rows in BOTH the fact and the dimension (key ≡
    * DeltaMod−1, the standing delta discipline). The standing view is
    * memoized per (session, corpus) like the other standing states;
    * the tick is [[foldJoinDelta]]. `src` attributes every row to its
    * algebra term (standing / ΔA⋈B / A⋈ΔB / ΔA⋈ΔB) — recomputed from
    * the keys, so the oracle checks term attribution too. The oracle
    * is the from-scratch join of the FULL tables: fold result ≡
    * re-derivation, the monitor discipline. */
  def ivmJoinEnriched(spark: SparkSession, dir: String): DataFrame = {
    val st = joinViewState(spark, dir)
    val dO = ordersSlim(spark, dir).filter(isDeltaId(col("o_orderkey")))
    val dC = custSlim(spark, dir).filter(isDeltaId(col("c_custkey")))
    foldJoinDelta(st, dO, dC).view
      .select(col("o_orderkey"), col("c_custkey"),
        col("c_mktsegment"), col("c_nationkey"), col("o_totalprice"),
        when(isDeltaId(col("o_orderkey")) && isDeltaId(col("c_custkey")),
          lit("delta_both"))
          .when(isDeltaId(col("o_orderkey")), lit("delta_fact"))
          .when(isDeltaId(col("c_custkey")), lit("delta_dim"))
          .otherwise(lit("standing")).as("src"))
      .orderBy("o_orderkey")
  }

  def ivmJoinEnrichedOracle: String = {
    val m = Dedup.DeltaMod
    s"""SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, c.c_nationkey,
       |  o.o_totalprice,
       |  CASE WHEN o.o_orderkey % $m = ${m - 1}
       |        AND c.c_custkey % $m = ${m - 1} THEN 'delta_both'
       |       WHEN o.o_orderkey % $m = ${m - 1} THEN 'delta_fact'
       |       WHEN c.c_custkey % $m = ${m - 1} THEN 'delta_dim'
       |       ELSE 'standing' END AS src
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |ORDER BY o.o_orderkey""".stripMargin
  }

  // ── CDC-join IVM: the view maintained under UPDATES and DELETES ──

  /** Synthetic-but-deterministic CDC batch: dimension rows with
    * c_custkey ≡ [[CdcUpdSlot]] (mod 10) receive an attribute UPDATE,
    * fact rows with o_orderkey ≡ [[CdcDelSlot]] (mod 10) are DELETED.
    * Slots deliberately differ from the insert slice (DeltaMod−1 = 9)
    * so the three IVM forms exercise disjoint shapes. */
  val CdcUpdSlot = 3
  val CdcDelSlot = 7
  val CdcNewSegment = "RESEGMENTED"

  /** Standing state for the CDC view: the FULL materialized join (the
    * lake's current view — CDC modifies in place, unlike the
    * insert-only form whose base excludes the future delta). */
  private val cdcViewMemo = new graft.SessionDirMemo[JoinViewState]
  private[graft] def resetCdcViewMemo(): Unit = cdcViewMemo.reset()

  private[graft] def cdcViewState(spark: SparkSession,
                                  dir: String): JoinViewState =
    cdcViewMemo.get(spark, dir) {
      val ao = ordersSlim(spark, dir).localCheckpoint()
      val ac = custSlim(spark, dir).localCheckpoint()
      JoinViewState(enrichJoin(ao, ac).localCheckpoint(), ao, ac)
    }

  /** ONE maintenance tick of the SIGNED (Z-set) delta-join algebra —
    * the retraction form the insert-only [[foldJoinDelta]] cannot
    * express: a delete is a −1 row, an update is −old ⊎ +new, and the
    * same three-term algebra with multiplied signs
    *
    *   ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB,  s = s_A·s_B
    *
    * tiles A_new⋈B_new − A_old⋈B_old exactly (expand (A−delA)⋈
    * (B−delB+newB): the six cross terms are precisely the signed sum).
    * Consolidation NEVER touches the whole view: the keys present in
    * ΔV are delta-bounded, so the view splits into an untouched
    * anti-join slice (passed through untouched — the
    * [[graft.ext.Dedup.foldDeltaEdges]] touched-slice discipline) and
    * a semi-join slice that groups with ΔV summing signs, keeping net
    * count > 0. Returns the updated state (consolidated view, sides
    * with deletes removed and updates applied) so CDC ticks COMPOSE —
    * ExtSpec folds a second batch and re-checks against re-derivation.
    * Cost shape: both delta terms broadcast the CDC batch against a
    * maintained keyed base; consolidation shuffles only
    * |touched keys| + |ΔV| rows. */
  private[graft] def foldJoinCdc(st: JoinViewState,
                                 dO: DataFrame, dC: DataFrame): JoinViewState = {
    val viewCols = Seq("o_orderkey", "c_custkey", "c_mktsegment",
      "c_nationkey", "o_totalprice").map(col)
    def term(o: DataFrame, c: DataFrame): DataFrame =
      o.join(c, col("o_custkey") === col("c_custkey"))
        .select(viewCols :+ (col("sA") * col("sB")).as("s"): _*)
    val dV = term(broadcast(dO.withColumnRenamed("s", "sA")),
        st.baseCust.withColumn("sB", lit(1L)))
      .unionByName(term(st.baseOrders.withColumn("sA", lit(1L)),
        broadcast(dC.withColumnRenamed("s", "sB"))))
      .unionByName(term(broadcast(dO.withColumnRenamed("s", "sA")),
        broadcast(dC.withColumnRenamed("s", "sB"))))
    val touched = dV.select("o_orderkey").distinct().localCheckpoint()
    val untouched =
      st.view.join(broadcast(touched), Seq("o_orderkey"), "left_anti")
    val consolidated = st.view
      .join(broadcast(touched), Seq("o_orderkey"), "semi")
      .withColumn("s", lit(1L)).unionByName(dV)
      .groupBy(viewCols: _*).agg(sum("s").as("n"))
      .filter(col("n") > 0).select(viewCols: _*)
    // maintain the sides the same way: deletes drop, updates replace
    val delO = dO.filter(col("s") < 0).select("o_orderkey")
    val updC = dC.select("c_custkey").distinct()
    val newOrders =
      st.baseOrders.join(broadcast(delO), Seq("o_orderkey"), "left_anti")
    val newCust =
      st.baseCust.join(broadcast(updC), Seq("c_custkey"), "left_anti")
        .unionByName(dC.filter(col("s") > 0).drop("s"))
    JoinViewState(untouched.unionByName(consolidated),
      newOrders, newCust)
  }

  /** The CDC batch the oracled query applies (shared with ExtSpec):
    * −old/+new dimension rows for the updated segment slice, −1 fact
    * rows for the deleted order slice. */
  private[graft] def cdcBatch(st: JoinViewState): (DataFrame, DataFrame) = {
    val oldDim = st.baseCust.filter(col("c_custkey") % 10 === CdcUpdSlot)
    val dC = oldDim.withColumn("s", lit(-1L))
      .unionByName(oldDim.withColumn("c_mktsegment", lit(CdcNewSegment))
        .withColumn("s", lit(1L)))
    val dO = st.baseOrders.filter(col("o_orderkey") % 10 === CdcDelSlot)
      .withColumn("s", lit(-1L))
    (dO, dC)
  }

  /** CDC maintenance of the materialized join view — the
    * update/delete twin of [[ivmJoinEnriched]] (production CDC feeds
    * carry all three verbs; insert-only IVM cannot retract a row the
    * dimension just re-attributed). One [[foldJoinCdc]] tick applies
    * the deterministic [[cdcBatch]]; the emitted view must equal the
    * from-scratch join of the POST-CDC tables (the oracle re-derives
    * it independently — a failed retraction would leave the old
    * segment row behind and break the hash). `src` attributes rows to
    * 'updated' (re-emitted by the dimension update) vs 'standing';
    * deleted orders are simply absent. */
  def ivmJoinCdc(spark: SparkSession, dir: String): DataFrame = {
    val st = cdcViewState(spark, dir)
    val (dO, dC) = cdcBatch(st)
    foldJoinCdc(st, dO, dC).view
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"),
        col("c_nationkey"), col("o_totalprice"),
        when(col("c_custkey") % 10 === CdcUpdSlot, lit("updated"))
          .otherwise(lit("standing")).as("src"))
      .orderBy("o_orderkey")
  }

  def ivmJoinCdcOracle: String =
    s"""WITH c2 AS (SELECT c_custkey,
       |    CASE WHEN c_custkey % 10 = $CdcUpdSlot THEN '$CdcNewSegment'
       |         ELSE c_mktsegment END AS c_mktsegment,
       |    c_nationkey FROM customer),
       |o2 AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       |       WHERE o_orderkey % 10 <> $CdcDelSlot)
       |SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, c.c_nationkey,
       |  o.o_totalprice,
       |  CASE WHEN c.c_custkey % 10 = $CdcUpdSlot THEN 'updated'
       |       ELSE 'standing' END AS src
       |FROM o2 o JOIN c2 c ON o.o_custkey = c.c_custkey
       |ORDER BY o.o_orderkey""".stripMargin
}
