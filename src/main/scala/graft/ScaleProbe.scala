package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe harness: synthesizes a 10× copy of the sf dir's fact
  * tables (shifted keys, perturbed text/timestamps so dedup/session
  * structure stays realistic) and times headline queries at 1× vs 10×.
  *
  * Purpose: measured evidence for the SCALE.md claims — a plan whose
  * runtime grows ~linearly from 1× to 10× on the same 32 cores is
  * shuffle/partition-shaped correctly; anything super-linear flags a
  * quadratic term or a parallelism collapse. (Absolute times still
  * carry local-mode noise; the RATIO is the signal.)
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [workDir] [probe,probe,...]
  * Prints one JSON line: {"probe":..., "t1":..., "t10":..., "ratio":...}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val work =
      if (args.length > 1) args(1) else s"/tmp/graft_scale$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // the streaming replay twins collect through a memory sink — a
      // LOCAL-harness term (production writes a distributed sink); at
      // 1000× the interval join's batch exceeds the 1g default, so
      // probes may raise it (driver heap is sized via SPARK_DRIVER_MEM)
      .config("spark.driver.maxResultSize",
        sys.env.getOrElse("SPARK_GRAFT_MAX_RESULT", "1g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    buildScaled(spark, sfDir, work, factor)

    val probes: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q1_pricing_summary" -> (graft.operators.Relational.q1PricingSummary _),
      "q3_shipping" -> (graft.operators.Relational.q3Shipping _),
      "q6_forecast_revenue" -> (graft.operators.Relational.q6ForecastRevenue _),
      "sessionize_events" -> (graft.operators.EventOps.sessionize _),
      "time_window_events" -> (graft.operators.EventOps.timeWindow _),
      "wordcount" -> ((s, d) =>
        graft.operators.WordCount.wordCount(Tables.documents(s, d), "text")),
      "dedup_minhash_signatures" -> (graft.ext.Dedup.minhashSignatures _),
      "dedup_minhash_pairs" ->
        ((s, d) => graft.ext.Dedup.minhashPairs(s, d)),
      "token_count" -> (graft.ext.TextAnalysis.tokenCount _),
      // statistics / audit / layout family (round-3 additions)
      "outlier_zscore" -> (graft.operators.Relational.outlierZscore _),
      "winsorize_prices" -> (graft.operators.Relational.winsorizePrices _),
      "chi2_priority_status" -> (graft.operators.Relational.chi2PriorityStatus _),
      "table_checksum" -> (graft.operators.Relational.tableChecksum _),
      "zorder_lineitem" -> (graft.operators.Layout.zorderLineitem _),
      "inverted_index" -> ((s, d) => graft.ext.TextAnalysis.invertedIndex(s, d)),
      "dedup_keep_best" -> (graft.ext.Dedup.keepBest _),
      // graph / sketch / LM family (round-4 additions): the heavy part
      // of each is an input-sized scan or join chain, so the probe
      // checks the collapse to bounded intermediates actually holds
      "pagerank_nations" -> (graft.ext.Graph.pagerankNations _),
      "sketch_hll_distinct" -> (graft.ext.Sketches.hllDistinct _),
      "sketch_cms_heavy_hitters" -> (graft.ext.Sketches.cmsHeavyHitters _),
      "perplexity_bigram" -> ((s, d) => graft.ext.TextAnalysis.perplexityBigram(
        s, d, graft.ext.TextAnalysis.PplFixtureBigramB)),
      // post-cut LM family (r11): the model frame is top-V/top-B
      // bounded, so only the token/bigram scan terms should scale
      "perplexity_unigram" -> ((s, d) => graft.ext.TextAnalysis.perplexityUnigram(
        s, d, graft.ext.TextAnalysis.PplFixtureVocabV)),
      "kl_source_divergence" -> (graft.ext.TextAnalysis.klSourceDivergence _),
      // durable pair-graph artifact (r11): the cold build is the
      // input-sized LSH+verify pass; reuse must be load-only (the
      // artifact is candidate-bounded, tiny next to the corpus)
      "dedup_edges_build" -> ((s, d) => {
        graft.ext.Dedup.edgesArtifactReset(d)
        graft.ext.Dedup.edgesLoadOrBuild(s, d)
      }),
      "dedup_edges_reuse" ->
        ((s, d) => graft.ext.Dedup.lshVerifiedFromArtifact(s, d)),
      // r11 curation reports: artifact-served community excision
      // profile, span-level LM quality, panel containment search
      "dedup_community_profile" ->
        (graft.ext.Dedup.dedupCommunityProfile _),
      "ppl_span_outliers" -> ((s, d) => graft.ext.TextAnalysis.pplSpanOutliers(
        s, d, graft.ext.TextAnalysis.PplFixtureVocabV)),
      "containment_search" -> (graft.ext.Dedup.containmentSearch _),
      // winnowing: gram scan + per-doc window min + sparse-set agg
      "winnow_fingerprints" -> (graft.ext.Dedup.winnowFingerprints _),
      // learning / retrieval / tokenizer / featurizer family (round-4):
      // each collapses the corpus to vocabulary- or dimension-sized
      // frames before any join — the probe checks that collapse holds.
      // zipf_profile exercises the chunked rank derivation (no
      // vocabulary-wide window); sim_ann_lsh is the embedding scale
      // path (bucket join, not all-pairs).
      "zipf_profile" -> (graft.ext.TextAnalysis.zipfProfile _),
      "bm25_search" -> (graft.ext.TextAnalysis.bm25Search _),
      "feature_hashing" -> (graft.ext.TextAnalysis.featureHashing _),
      "bpe_encode" -> (graft.ext.TextAnalysis.bpeEncode _),
      "nb_lang_confusion" -> (graft.ext.Learn.nbLangConfusion _),
      "kruskal_wallis_spend" -> (graft.operators.Nonparam.kruskalWallisSpend _),
      "window_func_battery" -> (graft.operators.Relational.windowFuncBattery _),
      "sim_ann_lsh" -> ((s, d) => graft.ext.Similarity.annLsh(s, d)),
      "quantize_embeddings" -> (graft.ext.Similarity.quantizeEmbeddings _),
      // round-4 additions: cross-doc boilerplate + DSIR are gram/vocab
      // collapses; phash is a fixed-65-sample projection + band LSH;
      // semantic dedup pairs per k-means list (never cross-corpus);
      // trend_robust is pairwise over the calendar-bounded day frame
      "boilerplate_ngrams" -> (graft.ext.TextAnalysis.boilerplateNgrams _),
      "dsir_weights" -> (graft.ext.TextAnalysis.dsirWeights _),
      "dedup_phash_pairs" -> ((s, d) => graft.ext.Dedup.phashPairs(s, d)),
      "dedup_semantic" -> (graft.ext.Similarity.semanticDedup _),
      // round-5: corpus-adaptive list count — the probe checks per-list
      // work stays bounded as k grows with n (was fixed k=16, 8.7×@100×)
      "sim_ann_ivf" -> ((s, d) => graft.ext.Similarity.annIvf(s, d)),
      // round-5: PII is a pure regex scan (cost = bytes), and the
      // z-order WRITE path must scale as one range exchange — the
      // rank-emitting query form is the 20.7× sort-bound outlier the
      // write exists to avoid (the probe times the eager parquet write)
      "pii_scan" -> (graft.ext.Pii.piiScan _),
      "frame_phash_pairs" -> ((s, d) => graft.ext.Dedup.framePhashPairs(s, d)),
      // a streaming bounded replay at scale: per-source PII aggregation
      // state is |sources|-bounded; the probe checks the replay cost is
      // the ingest scan, not the state machinery
      "stream_pii_monitor" ->
        ((s, d) => graft.streaming.DocStream.streamingPiiMonitor(s, d)),
      "zorder_write" -> ((s, d) => {
        val n = graft.operators.Layout.zorderWriteLineitem(
          s, d, s"/tmp/graft_zw_probe/${math.abs(d.hashCode)}", 64)
        s.range(n).toDF("files_written")
      }),
      // round-6: PQ codebook training is now strided-sample-bounded
      // (TrainSampleCap, the IVF recipe) — the probe watches training
      // + the one full-corpus encode; ivfpq composes routing + ADC
      "pq_codes" -> (graft.ext.Similarity.pqCodes _),
      "sim_ann_ivfpq" -> (graft.ext.Similarity.annIvfPq _),
      // round-9: the serving-path re-rank — adds one candidate-bounded
      // exact join on top of ivfpq; growth should track ivfpq itself
      "sim_ann_ivfpq_refine" -> (graft.ext.Similarity.annIvfPqRefine _),
      // ANN-audited kNN: IVF routing + bounded panel join
      "knn_audit_ann" -> (graft.ext.Learn.knnAuditAnn _),
      "trend_robust" -> (graft.operators.TimeSeries.trendRobust _),
      "ivf_recall_sweep" -> ((s, d) => graft.ext.Similarity.ivfRecallSweep(s, d)),
      "shuffle_skew_audit" -> (graft.operators.Relational.shuffleSkewAudit _),
      // round-6b: version diff is one co-partitioned full-outer join;
      // containment's candidate join is bounded by the rare-gram df
      // cap (O(Σ df²) over df≤64 grams); the outlier screen is one
      // posexplode agg + broadcast stats
      "snapshot_diff" -> (graft.operators.Relational.snapshotDiff _),
      "dedup_containment" -> ((s, d) => graft.ext.Dedup.containmentPairs(s, d)),
      "embedding_outliers" -> (graft.ext.Similarity.embeddingOutliers _),
      // calibration includes GD training (memo reset per run); the
      // streaming wordcount replay cost must be the ingest scan
      "calibration_bins" -> (graft.ext.Learn.calibrationBins _),
      "stream_wordcount" ->
        ((s, d) => graft.streaming.DocStream.streamingWordCount(s, d)),
      "t_closeness_audit" -> (graft.operators.Relational.tClosenessAudit _),
      // fertility probes COLD = includes the 5-round BPE learn
      "tokenizer_fertility" -> (graft.ext.TextAnalysis.tokenizerFertility _),
      "decontaminate_semantic" -> (graft.ext.Similarity.decontaminateSemantic _),
      "shard_manifest" -> (graft.ext.Sampling.shardManifest _),
      // delta×base bucket join: candidates bounded by the base-side cap
      "dedup_incremental" -> ((s, d) => graft.ext.Dedup.incrementalDedup(s, d)),
      "stream_quality_monitor" ->
        ((s, d) => graft.streaming.DocStream.streamingQualityMonitor(s, d)),
      "dp_release_counts" -> (graft.operators.Relational.dpReleaseCounts _),
      "frame_scene_cuts" -> ((s, d) => graft.ext.Dedup.frameSceneCuts(s, d)),
      "psi_value_drift" -> (graft.operators.EventOps.psiValueDrift _),
      "stream_psi_monitor" ->
        ((s, d) => graft.streaming.EventStream.psiMonitorOverFiles(s, d)),
      "stream_shard_manifest" ->
        ((s, d) => graft.streaming.DocStream.streamingShardManifest(s, d)),
      // round-7: substring runs are one gram window + one island
      // window (nothing pairwise); the streaming screen's cost is the
      // base signature build + ingest replay; delta assignment is one
      // corpus scan against memoized standing centroids (memo reset
      // per probe run ⇒ the probe includes the base-slice training)
      "dedup_substring" -> (graft.ext.Dedup.substringDedup _),
      "dedup_substring_excise" -> (graft.ext.Dedup.substringExcise _),
      "stream_substring_screen" ->
        ((s, d) => graft.streaming.DocStream.streamingSubstringScreen(s, d)),
      "stream_incremental_dedup" ->
        ((s, d) => graft.streaming.DocStream.streamingIncrementalDedup(s, d)),
      // round-10: the state-store scale check for the two heaviest
      // streaming twins — state is O(|delta|) by construction
      // (readiness: one screen row per delta doc; groups: one row per
      // delta-touching LSH edge, capped-bucket-bounded), so per-tick
      // cost must track the DELTA slice + the standing-state build,
      // never the corpus replay
      "stream_training_readiness" ->
        ((s, d) => graft.streaming.DocStream.streamingTrainingReadiness(s, d)),
      "stream_groups_monitor" ->
        ((s, d) => graft.streaming.DocStream.streamingGroupsMonitor(s, d)),
      // round-10 additions: AUC is a value-domain histogram collapse
      // (must stay flat); HITS rides the trade-edge build; SQ8 is a
      // dequantize scan + brute scoring (linear in corpus, the recall
      // audit's exact arm is the other linear term)
      "auc_returns" -> (graft.ext.Learn.aucReturns _),
      "hits_nations" -> (graft.ext.Graph.hitsNations _),
      "sim_ann_sq8" -> ((s, d) => graft.ext.Similarity.annSq8(s, d)),
      "event_freshness" -> (graft.operators.EventOps.eventFreshness _),
      "sim_ivf_delta_assign" -> (graft.ext.Similarity.ivfDeltaAssign _),
      // the ladder is one input-sized agg + bounded re-aggregations;
      // the mixture plan is a wordcount-shape scan to |sources| rows
      "k_generalization_ladder" ->
        (graft.operators.Relational.kGeneralizationLadder _),
      "mixture_budget" -> (graft.ext.Sampling.mixtureBudget _),
      "pipeline_waterfall" -> (graft.ext.Pipeline.pipelineWaterfall _),
      "embedding_batch_drift" ->
        (graft.ext.Similarity.embeddingBatchDrift _),
      // the forget cascade's only join is the lineitem semi join
      "tombstone_purge_audit" ->
        (graft.operators.Relational.tombstonePurgeAudit _),
      // round-7b: metadata-scale planners (manifest aggregates +
      // bounded post-work) and sketch set/size arithmetic (per-key
      // partial aggs into fixed-size cells); kappa/padding are
      // wordcount-shape projections into bounded aggregates
      "compaction_plan" -> (graft.operators.Layout.compactionPlan _),
      "clustering_depth" -> (graft.operators.Layout.clusteringDepth _),
      "sketch_kmv_overlap" -> (graft.ext.Sketches.kmvOverlap _),
      "sketch_join_size" -> (graft.ext.Sketches.joinSizeEstimate _),
      "padding_waste_buckets" ->
        (graft.ext.TextAnalysis.paddingWasteBuckets _),
      "kappa_lang_agreement" ->
        (graft.ext.TextAnalysis.kappaLangAgreement _),
      // graded eval composes two bounded retrievals; the eval joins
      // are queries×k-sized
      "rank_eval_ndcg" ->
        ((s: SparkSession, d: String) => graft.ext.Similarity.rankEvalNdcg(s, d)),
      // round-7d additions: leakage fix, calibration sweep, streaming
      // sketches, index health, KS gate
      "group_safe_split" ->
        ((s: SparkSession, d: String) => graft.ext.Dedup.groupSafeSplit(s, d)),
      "dedup_threshold_sweep" ->
        ((s: SparkSession, d: String) => graft.ext.Dedup.thresholdSweep(s, d)),
      "stream_hll_monitor" ->
        (graft.streaming.DocStream.streamingHllMonitor _),
      "stream_cms_monitor" ->
        (graft.streaming.DocStream.streamingCmsMonitor _),
      "stream_compaction_monitor" ->
        (graft.streaming.DocStream.streamingCompactionMonitor _),
      "ivf_balance_audit" -> (graft.ext.Similarity.ivfBalanceAudit _),
      "cluster_silhouette" -> (graft.ext.Similarity.clusterSilhouette _),
      "ks_value_drift" -> (graft.operators.EventOps.ksValueDrift _),
      "session_examples" -> (graft.operators.EventOps.sessionExamples _),
      "quality_cut_tradeoff" ->
        (graft.ext.TextAnalysis.qualityCutTradeoff _),
      "bpe_merge_curve" -> (graft.ext.TextAnalysis.bpeMergeCurve _),
      "quantize_bits_curve" ->
        (graft.ext.Similarity.quantizeBitsCurve _),
      "sketch_kmv_merge" -> (graft.ext.Sketches.kmvMergeSources _),
      "decontaminate_substring" ->
        ((s: SparkSession, d: String) => graft.ext.Dedup.decontaminateSubstring(s, d)),
      "pseudonymize_customers" ->
        (graft.operators.Relational.pseudonymizeCustomers _),
      "training_readiness" -> (graft.ext.Pipeline.trainingReadiness _),
      "dedup_groups_cc" ->
        ((s: SparkSession, d: String) => graft.ext.Dedup.duplicateGroups(s, d)),
      "media_downsample" -> (graft.ext.Multimodal.mediaDownsample _),
      "stream_kmv_monitor" ->
        (graft.streaming.DocStream.streamingKmvMonitor _),
      // round-8: incremental CC — the cold form pays bootstrap + fold
      // (should track dedup_groups_cc); the _fold form is the real
      // maintenance tick (standing state loaded, only the delta fold
      // timed) and is the measured answer to the 100× sweep's finding
      // that corpus-wide CC re-resolution dominates the daily gate
      "dedup_groups_delta" -> (graft.ext.Dedup.dedupGroupsDelta _),
      "dedup_groups_delta_fold" -> (graft.ext.Dedup.dedupGroupsDelta _),
      "training_readiness_delta" ->
        (graft.ext.Pipeline.trainingReadinessDelta _),
      "training_readiness_delta_fold" ->
        (graft.ext.Pipeline.trainingReadinessDelta _),
      // two scans + 64-cell moment aggregates + the co-keyed diagonal
      // join — growth should track the embedding/feature scans
      "caption_frame_alignment" ->
        (graft.ext.Multimodal.captionFrameAlignment _),
      // on-ingest CC twin: stream-static bucket join + per-edge state
      "stream_groups_monitor" ->
        (graft.streaming.DocStream.streamingGroupsMonitor _),
      // on-ingest gate twin: streamed per-doc screen (state = one row
      // per delta doc) + the shared per-tick fold
      "stream_training_readiness" ->
        (graft.streaming.DocStream.streamingTrainingReadiness _),
      // round-9: delta-join IVM — cold pays bootstrap (the base join)
      // + fold; the _fold form is the real tick: three delta-bounded
      // join terms appended to the standing view, O(|delta|)
      "ivm_join_enriched" -> (graft.ext.Pipeline.ivmJoinEnriched _),
      "ivm_join_enriched_fold" -> (graft.ext.Pipeline.ivmJoinEnriched _),
      // CDC IVM: signed retraction fold; _fold times the tick alone —
      // two broadcast delta terms + touched-key-only consolidation
      "ivm_join_cdc" -> (graft.ext.Pipeline.ivmJoinCdc _),
      "ivm_join_cdc_fold" -> (graft.ext.Pipeline.ivmJoinCdc _),
      // cross-modal retrieval: panel-bounded broadcast scoring + heap
      // top-k — growth should track the two feature scans
      "caption_asset_topk" -> (graft.ext.Multimodal.captionAssetTopK _),
      // indexed retrieval arm: bucket scan + ×9 panel probe fan-out
      "caption_asset_topk_ann" ->
        (graft.ext.Multimodal.captionAssetTopKAnn _),
      // incremental BPE: cold pays standing training + fold; the
      // _fold form is the real tick — delta wordcount + per-round
      // delta-sized pair counts against the standing pair tables
      "bpe_merges_delta" -> (graft.ext.TextAnalysis.bpeMergesDelta _),
      "bpe_merges_delta_fold" -> (graft.ext.TextAnalysis.bpeMergesDelta _),
      // constraint gate: scan-aggs + one anti join per fk — linear
      "data_contract_audit" ->
        (graft.operators.Contract.dataContractAudit _),
      // one scan into a 9-cell aggregate — wordcount shape
      "benford_totalprice" ->
        (graft.operators.Contract.benfordTotalprice _),
      // round-9b: quantile sketch is one bounded-heap agg (+ the exact
      // fetch audit arm, which is the input-sized part); the merge
      // form adds per-source heaps + a sketch-sized re-clip
      "sketch_quantile_price" -> (graft.ext.Sketches.quantileSketchPrice _),
      "sketch_quantile_merge" -> (graft.ext.Sketches.quantileSketchMerge _),
      // LPA communities: the LSH verify pass + 3 label-join rounds
      // over candidate-bounded edges — growth should track
      // dedup_lsh_verified, the rounds are |E|-sized
      "dedup_communities_lpa" ->
        ((s: SparkSession, d: String) => graft.ext.Dedup.dedupCommunitiesLpa(s, d)),
      // basket self-join bounded by per-order basket size; the rule
      // scoring joins run on the apriori-filtered pair set
      "assoc_rules_parts" -> (graft.operators.Nonparam.assocRulesParts _),
      // one corpus pass to |domains| rows, then EG rounds on the
      // checkpointed frame — iteration cost must be flat
      "mixture_reweight" -> (graft.ext.Sampling.mixtureReweight _),
      // bigram scan collapsed to a vocabulary graph; iterations join
      // the broadcast rank vector against ≤|V|² edges
      "textrank_keywords" -> (graft.ext.Graph.textrankKeywords _),
      // one scan ×B replicates map-side-collapsed to B rows — linear
      // in the explode volume, everything after on the B-row frame
      "bootstrap_mean_ci" -> (graft.operators.Nonparam.bootstrapMeanCi _),
      // sufficient-stats fit + broadcast residual scoring + the
      // histogram-locate rank fetch — regression-family growth
      "conformal_price_interval" -> (graft.ext.Learn.conformalPriceInterval _),
      // event scan → |users| subject rows → calendar-bounded day frame
      "survival_km" -> (graft.operators.EventOps.survivalKm _),
      // one fact scan to 4 sufficient-stat cells — wordcount shape
      "did_segment_spend" -> (graft.operators.Relational.didSegmentSpend _),
      // fact scan → |units| frame → two bounded aggregations
      "cuped_segment_spend" ->
        (graft.operators.Relational.cupedSegmentSpend _),
      // LSH verify + h-index rounds over cap-bounded neighbor lists
      "dedup_kcore" ->
        ((s: SparkSession, d: String) => graft.ext.Dedup.dedupKcore(s, d)),
      // round-12: the coverage curve is a wordcount collapse + top-V
      // cut + bounded window (model-frame terms must stay flat); the
      // inflation report is one md5-partitioned window + |sources|
      // aggregate; the MR docfreq job round-trips the A7/A8 file sink
      // so the probe watches the sink+parse loop too
      "vocab_coverage_curve" -> ((s: SparkSession, d: String) =>
        graft.ext.TextAnalysis.vocabCoverageCurve(
          s, d, graft.ext.TextAnalysis.VocabCovFixtureTopV)),
      "dedup_token_inflation" -> (graft.ext.Dedup.dedupTokenInflation _),
      "mr_token_docfreq" -> SparkEntry.queries("mr_token_docfreq"),
      // Heaps fit = two wordcount-shaped collapses to the 10-bucket
      // grid; burstiness = the inverted-index shuffle into a bounded
      // heap — both must stay scan-dominated
      "heaps_law_fit" -> (graft.ext.TextAnalysis.heapsLawFit _),
      "term_burstiness" -> (graft.ext.TextAnalysis.termBurstiness _),
      // lang mix = two bounded re-aggregations of the (source×lang)
      // collapse; calibration rides the capped-bucket SimHash pairs +
      // the endpoint-pruned trigram join (scoredKeeperPairs shape)
      "source_lang_mix" -> (graft.ext.TextAnalysis.sourceLangMix _),
      "simhash_calibration" -> (graft.ext.Dedup.simhashCalibration _),
      // on-ingest twin: replay cost must be the ingest scan; state is
      // the (source×lang) count table, the fold is bounded-frame work
      "stream_lang_mix_monitor" ->
        (graft.streaming.DocStream.streamingLangMixMonitor _),
      // the interval family's one-time shared streaming pass (the
      // bench line): memo reset so the probe times the COLD stream-
      // stream full-outer replay — per-micro-batch state commits are
      // the cost; growth should track the events ingest scan
      "stream_interval_shared_pass" -> ((s: SparkSession, d: String) => {
        graft.streaming.EventStream.resetIntervalMemo()
        val n = graft.streaming.EventStream.primeSharedIntervalPass(s, d)
        s.range(1).select(lit(n).as("pass_rows"))
      }),
    )

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def runOnce(dir: String, fn: (SparkSession, String) => DataFrame,
                name: String = ""): Double = {
      spark.catalog.clearCache()
      // probes time COLD runs: the cross-query trained-state memos (a
      // real optimization for gate/bench passes) would otherwise hide
      // Lloyd/GD training cost — exactly the growth these probes watch
      graft.ext.Similarity.resetCentroidMemo()
      graft.ext.Learn.resetLogitMemo()
      graft.ext.TextAnalysis.resetBpeMemo()
      if (name.endsWith("_fold")) {
        // fold probes time the MAINTENANCE tick: in production the
        // standing pair/label/gram-index tables are loaded, not
        // rebuilt — warm them untimed (bootstrap), then time the
        // fold-only path
        if (name.startsWith("ivm_join_cdc"))
          graft.ext.Pipeline.cdcViewState(spark, dir)
        else if (name.startsWith("ivm_join"))
          graft.ext.Pipeline.joinViewState(spark, dir)
        else if (name.startsWith("bpe_merges"))
          graft.ext.TextAnalysis.warmBpeStanding(spark, dir)
        else {
          graft.ext.Dedup.standingDedupState(spark, dir)
          if (name.startsWith("training_readiness"))
            graft.ext.Pipeline.readyState(spark, dir)
        }
      } else {
        graft.ext.Dedup.resetStandingStateMemo()
        graft.ext.Pipeline.resetReadyStateMemo()
        graft.ext.Pipeline.resetJoinViewMemo()
        graft.ext.Pipeline.resetCdcViewMemo()
        graft.ext.TextAnalysis.resetBpeStandingMemo()
      }
      time(fn(spark, dir).write.format("noop").mode("overwrite").save())
    }

    // optional 3rd arg: comma-separated probe names (dev loop)
    val selected =
      if (args.length > 2) probes.filter(p => args(2).split(",").contains(p._1))
      else probes
    // warmup both paths once so codegen/scan setup isn't billed
    selected.take(1).foreach { case (_, fn) => runOnce(sfDir, fn); runOnce(work, fn) }
    val rows = selected.map { case (name, fn) =>
      val t1 = math.min(runOnce(sfDir, fn, name), runOnce(sfDir, fn, name))
      val tN = math.min(runOnce(work, fn, name), runOnce(work, fn, name))
      val r = tN / t1
      println(f"""{"probe":"$name","factor":$factor,"t1":$t1%.2f,"tN":$tN%.2f,"ratio":$r%.1f}""")
      (name, t1, tN, r)
    }
    val worst = rows.maxBy(_._4)
    println(f"""{"probe":"WORST","name":"${worst._1}","ratio":${worst._4}%.1f}""")
    spark.stop()
  }

  /** 10× fact tables with shifted keys; dims copied as-is.
    *   - lineitem/orders: orderkey += k·10^12 per replica k (custkey,
    *     partkey, suppkey unchanged — dimension fan-out grows 10×,
    *     exactly like a bigger fact against fixed dims)
    *   - events: event_id/user_id shifted so session/user cardinality
    *     scales (more users, same per-user density), ts jittered +k s
    *   - documents: doc_id shifted, a replica token prepended so the
    *     corpus isn't 10 exact copies (which would put every doc in a
    *     10-way dup group and distort LSH bucket shape)
    * Skips the build when the work dir already exists. */
  private[graft] def buildScaled(spark: SparkSession, sfDir: String, work: String,
                                 factor: Int): Unit = {
    val done = new java.io.File(s"$work/_built")
    if (done.exists()) return
    val ks = (0 until factor)
    def replicate(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      ks.map(k => f(df, k)).reduce(_ unionAll _)

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    replicate(li, (d, k) => d.withColumn("l_orderkey",
        col("l_orderkey") + lit(k.toLong * 1000000000000L)))
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")

    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    replicate(ord, (d, k) => d.withColumn("o_orderkey",
        col("o_orderkey") + lit(k.toLong * 1000000000000L)))
      .write.mode("overwrite").parquet(s"$work/orders.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val jitterTs: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column =
      ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // raw nanos vintage
          (c, k) => c + lit(k.toLong * 1000000000L)
        case _ =>                                    // native timestamp vintage
          // cast first: the raw read may surface TIMESTAMP_NTZ, which
          // unix_micros rejects; TimestampType unifies either form
          (c, k) => org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.unix_micros(c.cast("timestamp")) +
              lit(k.toLong * 1000000L))
      }
    replicate(ev, (d, k) => d
        .withColumn("event_id", col("event_id") + lit(k.toLong * 1000000000000L))
        .withColumn("user_id", col("user_id") + lit(k.toLong * 100000000L))
        .withColumn("ts", jitterTs(col("ts"), k)))
      .write.mode("overwrite").parquet(s"$work/events.parquet")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    replicate(docs, (d, k) => d
        .withColumn("doc_id", col("doc_id") + lit(k.toLong * 100000000L))
        .withColumn("text", concat(lit(s"replica$k "), col("text")))
        .withColumn("n_chars", length(col("text")).cast("long")))
      .write.mode("overwrite").parquet(s"$work/documents.parquet")

    // embeddings scale too (the ANN/quantize probes are meaningless on
    // a fixed-size corpus): vec_id shifted per replica, first element
    // nudged by k·1e-3 so replicas aren't bit-identical vectors (LSH
    // buckets and quantization ranges keep realistic shape)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    replicate(emb, (d, k) => d
        .withColumn("vec_id", col("vec_id") + lit(k.toLong * 100000000L))
        .withColumn("embedding", concat(
          array((col("embedding")(0) + lit(k * 0.001f)).cast("float")),
          slice(col("embedding"), 2, 100000))))
      .write.mode("overwrite").parquet(s"$work/embeddings.parquet")

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$work/$t.parquet")
      }
    done.getParentFile.mkdirs(); done.createNewFile()
  }
}
