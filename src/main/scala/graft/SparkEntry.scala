package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Ingest
import graft.functions.Vec

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query has a DuckDB oracle in [[oracleSql]] unless the op is not
  * SQL-expressible (minhash/simhash — hash functions have no portable SQL
  * equivalent; they carry property-based ScalaTest specs instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A — ingestion
    "src_parquet_pruned"     -> Ingest.parquetPruned _,
    "src_csv_read"           -> Ingest.csvRead _,
    "src_json_features"      -> Ingest.jsonFeatures _,
    "src_xml_features"       -> Ingest.xmlFeatures _,
    "src_rest_oid_sweep"     -> ((s: SparkSession, d: String) => Ingest.restOidSweep(s, d)),
    "src_rest_offset_paging" -> ((s: SparkSession, d: String) => Ingest.restOffsetPaging(s, d)),
    "src_snapshot_load"      -> Ingest.snapshotLoad _,
    "src_cache_ttl"          -> ((s: SparkSession, d: String) => Ingest.srcCacheTtl(s, d)),
    "src_orc_roundtrip"      -> Ingest.orcRoundtrip _,
    "src_url_filenames"      -> Ingest.urlFilenames _,
    "src_archive_unpack"     -> Ingest.archiveUnpack _,
    "src_resume_ingest"      -> ((s: SparkSession, d: String) => Ingest.resumeIngest(s, d)),
    "src_atom_filterable"    -> ((s: SparkSession, d: String) => Ingest.atomFilterable(s, d)),
    "src_atom_feed"          -> ((s: SparkSession, d: String) => Ingest.atomFeed(s, d)),
    "src_oid_page_fetch"     -> ((s: SparkSession, d: String) => Ingest.oidPageFetch(s, d)),
    "src_ogc_collections"    -> ((s: SparkSession, d: String) => Ingest.ogcCollections(s, d)),
    "src_rest_layers"        -> ((s: SparkSession, d: String) => Ingest.restLayers(s, d)),
    "src_esri_json"          -> Ingest.esriJsonFeatures _,
    // B — staging / normalization
    "etl_sanitize_names"     -> Staging.sanitizeNames _,
    "etl_schema_normalize"   -> Staging.schemaNormalize _,
    "etl_geomtype_split"     -> Staging.geomTypeSplit _,
    "etl_geomtype_fallback"  -> Staging.geomTypeFallback _,
    "etl_best_candidate"     -> Staging.bestCandidate _,
    "etl_null_audit"         -> Staging.nullAudit _,
    "etl_schema_drift"       -> Staging.schemaDriftReport _,
    "q_cube"                 -> Relational.qCube _,
    "q_grouping_sets"        -> Relational.qGroupingSets _,
    "q_band_join"            -> ((s: SparkSession, d: String) => Relational.qBandJoin(s, d)),
    "q_interval_join"        -> ((s: SparkSession, d: String) => Relational.qIntervalJoin(s, d)),
    "q_heavy_hitters"        -> ((s: SparkSession, d: String) => Relational.qHeavyHitters(s, d)),
    "q_funnel"               -> Relational.qFunnel _,
    "q_histogram"            -> ((s: SparkSession, d: String) => Relational.qHistogram(s, d)),
    "text_pii_scrub"         -> TextAnalysis.piiScrub _,
    // C — geoprocessing
    "geo_bbox_clip"          -> Geo.bboxClip _,
    "geo_reproject"          -> Geo.reproject _,
    "geo_reproject_tm"       -> ((s: SparkSession, d: String) => Geo.reprojectTm(s, d)),
    "geo_reproject_tm3010"   -> Geo.reprojectTm3010 _,
    "geo_transform_select"   -> ((s, d) => Geo.transformSelect(s, d)),
    "geo_pip_raycast"        -> Geo.pipRaycast _,
    "geo_zonal_stats"        -> Geo.zonalStats _,
    "geo_dbscan"             -> ((s: SparkSession, d: String) => Geo.dbscan(s, d)),
    "geo_sr_validate"        -> Geo.srValidate _,
    "geo_envelope_check"     -> Geo.envelopeCheck _,
    "geo_count_sanity"       -> Geo.countSanity _,
    "geo_sr_infer"           -> Geo.srInfer _,
    "geo_sr_declared"        -> Geo.srDeclared _,
    "geo_polygon_clip"       -> Geo.polygonClip _,
    "geo_wkt_roundtrip"      -> Geo.wktRoundtrip _,
    "geo_measures"           -> Geo.geomMeasures _,
    "geo_nearest_join"       -> ((s: SparkSession, d: String) => Geo.nearestJoin(s, d)),
    "geo_zorder_buckets"     -> Geo.zorderBuckets _,
    // D — load / monitoring
    "load_truncate_load"     -> LoadOps.truncateLoad _,
    "load_append_dedup"      -> LoadOps.appendDedupLoad _,
    "load_bucketed_join"     -> LoadOps.bucketedJoin _,
    "load_partitioned_prune" -> ((s: SparkSession, d: String) => LoadOps.partitionedPrune(s, d)),
    "load_cdc_merge"         -> LoadOps.cdcMerge _,
    "load_changelog_apply"   -> LoadOps.changelogApply _,
    "load_check_constraints" -> LoadOps.checkConstraints _,
    "mon_source_summary"     -> LoadOps.sourceSummary _,
    "mon_authority_rollup"   -> LoadOps.authorityRollup _,
    "mon_error_patterns"     -> LoadOps.errorPatterns _,
    "mon_failure_streaks"    -> LoadOps.failureStreaks _,
    "mon_perf_outliers"      -> ((s: SparkSession, d: String) => LoadOps.perfOutliers(s, d)),
    "mon_run_drift"          -> ((s: SparkSession, d: String) => LoadOps.runDrift(s, d)),
    "load_compaction"        -> ((s: SparkSession, d: String) => LoadOps.loadCompaction(s, d)),
    "load_mor_delete"        -> LoadOps.morDelete _,
    "load_circuit_breaker"   -> ((s: SparkSession, d: String) => LoadOps.circuitBreaker(s, d)),
    "load_zorder"            -> LoadOps.zorderLayout _,
    "load_backfill"          -> LoadOps.loadBackfill _,
    "load_dyn_overwrite"     -> LoadOps.loadDynamicOverwrite _,
    "etl_quarantine"         -> Staging.quarantineRoute _,
    "load_analyze_stats"     -> LoadOps.analyzeStats _,
    "mon_value_drift"        -> ((s: SparkSession, d: String) => LoadOps.valueDrift(s, d)),
    "mon_ks_test"            -> LoadOps.ksTest _,
    "mon_wasserstein"        -> LoadOps.wassersteinDrift _,
    "mon_chi2"               -> LoadOps.chi2Drift _,
    "mon_changepoint"        -> ((s: SparkSession, d: String) => LoadOps.changepoint(s, d)),
    "mon_autocorr"           -> ((s: SparkSession, d: String) => LoadOps.autocorr(s, d)),
    "mon_theilsen"           -> ((s: SparkSession, d: String) => LoadOps.theilSen(s, d)),
    "text_pmi"               -> ((s: SparkSession, d: String) => TextAnalysis.pmi(s, d)),
    "text_zipf_fit"          -> ((s: SparkSession, d: String) => TextAnalysis.zipfFit(s, d)),
    "mon_mad_outliers"       -> LoadOps.madOutliers _,
    "mon_sla_burn"           -> ((s: SparkSession, d: String) => LoadOps.slaBurn(s, d)),
    "load_compact_plan"      -> LoadOps.compactPlan _,
    "mon_cusum"              -> ((s: SparkSession, d: String) => LoadOps.cusum(s, d)),
    "mon_seasonal"           -> ((s: SparkSession, d: String) => LoadOps.seasonal(s, d)),
    "mon_forecast"           -> ((s: SparkSession, d: String) => LoadOps.holtForecast(s, d)),
    "load_erasure"           -> ((s: SparkSession, d: String) => LoadOps.loadErasure(s, d)),
    "mon_benford"            -> ((s: SparkSession, d: String) => LoadOps.benford(s, d)),
    "load_bloom_index"       -> ((s: SparkSession, d: String) => LoadOps.bloomIndex(s, d)),
    "load_table_checksum"    -> LoadOps.tableChecksum _,
    "load_incremental_view"  -> (LoadOps.incrementalView _),
    "load_observed_qc"       -> (LoadOps.observedQc _),
    "load_scd2"              -> ((s: SparkSession, d: String) => LoadOps.scd2Merge(s, d)),
    "load_fk_validate"       -> LoadOps.fkValidate _,
    "mon_freshness"          -> ((s: SparkSession, d: String) => LoadOps.freshness(s, d)),
    "etl_schema_evolve"      -> Staging.schemaEvolve _,
    "etl_fuzzy_match"        -> ((s: SparkSession, d: String) => Staging.fuzzyMatch(s, d)),
    "mon_run_gaps"           -> LoadOps.runGaps _,
    "mon_gap_fill"           -> LoadOps.gapFill _,
    "mon_decay_avg"          -> ((s: SparkSession, d: String) => LoadOps.decayAvg(s, d)),
    "load_file_stats"        -> ((s: SparkSession, d: String) => LoadOps.fileStats(s, d)),
    "geo_hotspot"            -> ((s: SparkSession, d: String) => Geo.gridHotspots(s, d)),
    "mon_key_skew"           -> LoadOps.keySkew _,
    "etl_response_validate"  -> ((s: SparkSession, d: String) => LoadOps.responseValidate(s, d)),
    "etl_response_diagnose"  -> LoadOps.responseDiagnose _,
    "etl_xml_validate"       -> ((s: SparkSession, d: String) => LoadOps.xmlValidate(s, d)),
    // E — relational core
    "q1_agg"                 -> Relational.q1Agg _,
    "q3_join_agg"            -> Relational.q3JoinAgg _,
    "q5_multi_join"          -> Relational.q5MultiJoin _,
    "q6_filter_agg"          -> Relational.q6FilterAgg _,
    "q_semi_join"            -> Relational.qSemiJoin _,
    "q_anti_join"            -> Relational.qAntiJoin _,
    "q_window_topk"          -> Relational.qWindowTopK _,
    "q_topk_pergroup"        -> Relational.qTopKPerGroup _,
    "q_rollup"               -> Relational.qRollup _,
    "q_pivot"                -> Relational.qPivot _,
    "q_unpivot"              -> Relational.qUnpivot _,
    "sample_hash"            -> Relational.qHashSample _,
    "q_skyline"              -> Relational.qSkyline _,
    "q_union_dedup"          -> Relational.qUnionDedup _,
    "q_asof_join"            -> Relational.qAsofJoin _,
    "q_sessionize"           -> Relational.qSessionize _,
    "q_cohort_retention"     -> Relational.qCohortRetention _,
    "q_gaps_islands"         -> Relational.qGapsIslands _,
    "q_rfm"                  -> Relational.qRfm _,
    "q_gini"                 -> Relational.qGini _,
    "q_abc"                  -> Relational.qAbc _,
    "mon_uptime"             -> ((s: SparkSession, d: String) => LoadOps.uptime(s, d)),
    "text_readability"       -> ((s: SparkSession, d: String) => TextAnalysis.readability(s, d)),
    "q_markov_transitions"   -> Relational.qMarkovTransitions _,
    "q_ab_ttest"             -> Relational.qAbTtest _,
    "q_mannwhitney"          -> Relational.qMannWhitney _,
    "q_kruskal_wallis"       -> Relational.qKruskalWallis _,
    "q_regression"           -> Relational.qRegression _,
    "q_hierarchy_rollup"     -> ((s: SparkSession, d: String) => Relational.qHierarchyRollup(s, d)),
    "q_set_ops_all"          -> Relational.qSetOpsAll _,
    "emb_silhouette"         -> ((s: SparkSession, d: String) => Similarity.embSilhouette(s, d)),
    "emb_kmeans"             -> ((s: SparkSession, d: String) => Similarity.kmeans(s, d)),
    "emb_purity"             -> ((s: SparkSession, d: String) => Similarity.embPurity(s, d)),
    "q_decile_lift"          -> Relational.qDecileLift _,
    "q_basket_lift"          -> ((s: SparkSession, d: String) => Relational.qBasketLift(s, d)),
    "q_churn_hazard"         -> Relational.qChurnHazard _,
    "q_new_vs_returning"     -> Relational.qNewVsReturning _,
    "mon_rolling_median"     -> ((s: SparkSession, d: String) => LoadOps.rollingMedian(s, d)),
    "mon_burstiness"         -> LoadOps.burstiness _,
    "q_attribution"          -> Relational.qAttribution _,
    "q_lorenz"               -> Relational.qLorenz _,
    "q_order_latency"        -> Relational.qOrderLatency _,
    "q_survival_km"          -> Relational.qSurvivalKm _,
    "q_spearman"             -> Relational.qSpearman _,
    "q_cramers_v"            -> Relational.qCramersV _,
    "q_theil"                -> Relational.qTheil _,
    "q_shape_stats"          -> Relational.qShapeStats _,
    "q_growth_accounting"    -> Relational.qGrowthAccounting _,
    "q_session_stats"        -> Relational.qSessionStats _,
    "mon_delta_attribution"  -> LoadOps.deltaAttribution _,
    "text_rake"              -> ((s: SparkSession, d: String) => TextAnalysis.rake(s, d)),
    "q_winsorized"           -> Relational.qWinsorized _,
    "mon_hampel"             -> ((s: SparkSession, d: String) => LoadOps.hampel(s, d)),
    "mon_scorecard"          -> LoadOps.monitorDigest _,
    "emb_lof"                -> ((s: SparkSession, d: String) => Similarity.embLof(s, d)),
    "emb_triplet_mine"       -> ((s: SparkSession, d: String) => Similarity.tripletMine(s, d)),
    "q_top_paths"            -> ((s: SparkSession, d: String) => Relational.qTopPaths(s, d)),
    "ann_recall"             -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    "ann_recall_curve"       -> ((s: SparkSession, d: String) => Similarity.annRecallCurve(s, d)),
    "ann_pq_curve"           -> ((s: SparkSession, d: String) => Similarity.annPqCurve(s, d)),
    "text_quality_model"     -> ((s: SparkSession, d: String) => TextAnalysis.qualityModel(s, d)),
    "q_funnel_windowed"      -> ((s: SparkSession, d: String) => Relational.qFunnelWindowed(s, d)),
    "q_time_bucket"          -> Relational.qTimeBucket _,
    "q_running_agg"          -> Relational.qRunningAgg _,
    "q_sliding_distinct"     -> ((s: SparkSession, d: String) => Relational.qSlidingDistinct(s, d)),
    "q_percentile"           -> Relational.qPercentile _,
    "q_stats"                -> Relational.qStats _,
    "q_approx_distinct"      -> Relational.qApproxDistinct _,
    "q_cms_sketch"           -> Relational.qCmsSketch _,
    "q_quantile_sketch"      -> Relational.qQuantileSketch _,
    "q_hll_sketch"           -> Relational.qHllSketch _,
    "q_bloom_prune_join"     -> Relational.qBloomPruneJoin _,
    "pipeline_e2e"           -> (PipelineDemo.run _),
    "pipeline_run_filter"    -> (PipelineDemo.runFiltered _),
    "pipeline_archive"       -> (PipelineDemo.runArchive _),
    "pipeline_ogc"           -> (PipelineDemo.runOgc _),
    "pipeline_wfs"           -> (PipelineDemo.runWfs _),
    "pipeline_rest"          -> (PipelineDemo.runRest _),
    "pipeline_atom"          -> (PipelineDemo.runAtom _),
    "pipeline_manifest"      -> (PipelineDemo.runManifest _),
    "pipeline_time_travel"   -> (PipelineDemo.runTimeTravel _),
    "pipeline_clone"         -> (PipelineDemo.runClone _),
    "pipeline_vacuum"        -> (PipelineDemo.runVacuum _),
    "pipeline_restore"       -> (PipelineDemo.runRestore _),
    "pipeline_expire"        -> (PipelineDemo.runExpire _),
    "pipeline_diff"          -> (PipelineDemo.runDiff _),
    "pipeline_incremental"   -> (PipelineDemo.runIncremental _),
    "pipeline_wap"           -> (PipelineDemo.runWap _),
    "pipeline_branch"        -> (PipelineDemo.runBranch _),
    "pipeline_curation"      -> ((s: SparkSession, d: String) => TextAnalysis.curationPipeline(s, d)),
    // F — LLM-training-data operators
    "dedup_exact"            -> Dedup.dedupExact _,
    "dedup_paragraph"        -> ((s, d) => Dedup.dedupParagraph(s, d)),
    "dedup_soft"             -> ((s, d) => Dedup.dedupSoft(s, d)),
    "dedup_fingerprint"      -> Dedup.dedupFingerprint _,
    "dedup_ngram_jaccard"    -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dedup_components"       -> ((s: SparkSession, d: String) => Dedup.dedupComponents(s, d)),
    "dedup_select_rep"       -> ((s: SparkSession, d: String) => Dedup.dedupSelectRep(s, d)),
    "dedup_minhash_lsh"      -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    "dedup_simhash"          -> ((s: SparkSession, d: String) => Dedup.simhashBuckets(s, d)),
    "dedup_winnow"           -> ((s: SparkSession, d: String) => Dedup.winnowDedup(s, d)),
    "dedup_semantic"         -> ((s: SparkSession, d: String) => Similarity.semDedup(s, d)),
    "graph_pagerank"         -> ((s: SparkSession, d: String) => Graph.pagerank(s, d)),
    "graph_triangles"        -> ((s: SparkSession, d: String) => Graph.triangles(s, d)),
    "graph_label_prop"       -> ((s: SparkSession, d: String) => Graph.labelProp(s, d)),
    "graph_kcore"            -> ((s: SparkSession, d: String) => Graph.kcore(s, d)),
    "graph_bfs"              -> ((s: SparkSession, d: String) => Graph.bfs(s, d)),
    "graph_jaccard"          -> ((s: SparkSession, d: String) => Graph.jaccard(s, d)),
    "graph_adamic_adar"      -> ((s: SparkSession, d: String) => Graph.adamicAdar(s, d)),
    "text_lexical_diversity" -> ((s: SparkSession, d: String) => TextAnalysis.lexicalDiversity(s, d)),
    "text_watermark"         -> ((s: SparkSession, d: String) => TextAnalysis.watermark(s, d)),
    "text_bigram_entropy"    -> ((s: SparkSession, d: String) => TextAnalysis.bigramEntropy(s, d)),
    "text_ngram_counts"      -> ((s: SparkSession, d: String) => TextAnalysis.ngramCounts(s, d)),
    "dedup_containment"      -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    "sample_density_prune"   -> ((s: SparkSession, d: String) => Similarity.densityPrune(s, d)),
    "mon_embedding_drift"    -> ((s: SparkSession, d: String) => Similarity.embeddingDrift(s, d)),
    "ann_ivf_append"         -> Similarity.ivfAppend _,
    "emb_pca_power"          -> ((s: SparkSession, d: String) => Similarity.embPcaPower(s, d)),
    "emb_pca_top2"           -> ((s: SparkSession, d: String) => Similarity.embPcaTop2(s, d)),
    "emb_all_but_top"        -> Similarity.embAllButTop _,
    "text_novelty"           -> ((s: SparkSession, d: String) => TextAnalysis.textNovelty(s, d)),
    "neardup_cosine"         -> ((s: SparkSession, d: String) => Similarity.neardupCosine(s, d)),
    "neardup_ivf_gated"      -> ((s: SparkSession, d: String) => Similarity.neardupIvfGated(s, d)),
    "ann_topk"               -> ((s: SparkSession, d: String) => Similarity.annTopK(s, d)),
    "ann_mmr_diverse"        -> ((s: SparkSession, d: String) => Similarity.annMmrDiverse(s, d)),
    "ann_lsh_bucketed"       -> Similarity.annLshBuckets _,
    "ann_lsh_multiprobe"     -> ((s: SparkSession, d: String) => Similarity.annLshMultiProbe(s, d)),
    "ann_ivf"                -> ((s: SparkSession, d: String) => Similarity.ivfAnn(s, d)),
    "ann_range"              -> ((s: SparkSession, d: String) => Similarity.annRange(s, d)),
    "ann_ivf_batch"          -> ((s: SparkSession, d: String) => Similarity.ivfAnnBatch(s, d)),
    "emb_quantize"           -> ((s: SparkSession, d: String) => Similarity.embQuantize(s, d)),
    "ann_pq_adc"             -> ((s: SparkSession, d: String) => Similarity.annPqAdc(s, d)),
    "ann_matryoshka"         -> ((s: SparkSession, d: String) => Similarity.annMatryoshka(s, d)),
    "ann_ivfpq"              -> ((s: SparkSession, d: String) => Similarity.annIvfPq(s, d)),
    "ann_ivfpq_batch"        -> ((s: SparkSession, d: String) => Similarity.annIvfPqBatch(s, d)),
    "sample_hard_negatives"  -> ((s: SparkSession, d: String) => Similarity.hardNegatives(s, d)),
    "sample_kcenter"         -> ((s: SparkSession, d: String) => Similarity.sampleKcenter(s, d)),
    "sample_doremi"          -> ((s: SparkSession, d: String) => TextAnalysis.sampleDoremi(s, d)),
    "text_code_detect"       -> ((s: SparkSession, d: String) => TextAnalysis.textCodeDetect(s, d)),
    "text_bpe_train"         -> ((s: SparkSession, d: String) => TextAnalysis.bpeTrain(s, d)),
    "text_bpe_tokens"        -> ((s: SparkSession, d: String) => TextAnalysis.bpeTokens(s, d)),
    "q_salted_join"          -> ((s: SparkSession, d: String) => Relational.qSaltedJoin(s, d)),
    "text_quality"           -> TextAnalysis.quality _,
    "text_langid"            -> TextAnalysis.langid _,
    "text_tokens"            -> TextAnalysis.tokenCount _,
    "text_topterms"          -> ((s: SparkSession, d: String) => TextAnalysis.topTerms(s, d)),
    "sample_split"           -> TextAnalysis.datasetSplit _,
    "dedup_incremental"      -> Dedup.dedupIncremental _,
    "dedup_substring"        -> ((s: SparkSession, d: String) => Dedup.dedupSubstring(s, d)),
    "text_trim_spans"        -> ((s: SparkSession, d: String) => Dedup.trimSpans(s, d)),
    "emb_knn_graph"          -> ((s: SparkSession, d: String) => Similarity.knnGraph(s, d)),
    "dedup_url"              -> Dedup.dedupUrl _,
    "text_pack_chunks"       -> ((s: SparkSession, d: String) => TextAnalysis.packChunks(s, d)),
    "text_contamination"     -> ((s: SparkSession, d: String) => TextAnalysis.contamination(s, d)),
    "text_repetition"        -> ((s: SparkSession, d: String) => TextAnalysis.repetition(s, d)),
    "text_gopher_rules"      -> TextAnalysis.gopherRules _,
    "pipeline_traindata"     -> ((s: SparkSession, d: String) => TextAnalysis.traindataPipeline(s, d)),
    "text_tfidf"             -> ((s: SparkSession, d: String) => TextAnalysis.tfidf(s, d)),
    "text_lm_score"          -> TextAnalysis.lmScore _,
    "sample_stratified"      -> ((s: SparkSession, d: String) => TextAnalysis.stratifiedSample(s, d)),
    "sample_curriculum"      -> ((s: SparkSession, d: String) => TextAnalysis.sampleCurriculum(s, d)),
    "sample_shuffle"         -> ((s: SparkSession, d: String) => TextAnalysis.sampleShuffle(s, d)),
    "q_set_ops"              -> Relational.qSetOps _,
    "q_corr_matrix"          -> Relational.qCorrMatrix _,
    "sample_weighted"        -> ((s: SparkSession, d: String) => TextAnalysis.weightedSample(s, d)),
    "sample_balanced"        -> TextAnalysis.sampleBalanced _,
    "mm_contrastive_pairs"   -> ((s: SparkSession, d: String) => TextAnalysis.contrastivePairs(s, d)),
    "sample_domain_mix"      -> TextAnalysis.domainMix _,
    "sample_temperature"     -> ((s: SparkSession, d: String) => TextAnalysis.temperatureMix(s, d)),
    "sample_dsir"            -> ((s: SparkSession, d: String) => TextAnalysis.dsirWeights(s, d)),
    "text_domain_divergence" -> TextAnalysis.domainDivergence _,
    "text_entropy"           -> ((s: SparkSession, d: String) => TextAnalysis.charEntropy(s, d)),
    "mm_audio_chunks"        -> ((s: SparkSession, d: String) => Multimodal.audioChunks(s, d)),
    "mm_image_patches"       -> ((s: SparkSession, d: String) => Multimodal.imagePatches(s, d)),
    "text_ccnet_buckets"     -> ((s: SparkSession, d: String) => TextAnalysis.ccnetBuckets(s, d)),
    "mm_binary_meta"         -> Multimodal.binaryMeta _,
    "mm_frame_sample"        -> Multimodal.frameSample _,
    "mm_scene_cut"           -> ((s, d) => Multimodal.sceneCut(s, d)),
    "mm_clip_sample"         -> ((s, d) => Multimodal.clipSample(s, d)),
    "mm_ahash_dedup"         -> ((s, d) => Multimodal.ahashDedup(s, d)),
    "mm_video_keyframe"      -> ((s, d) => Multimodal.videoKeyframe(s, d)),
    "pipeline_media_curation" -> ((s, d) => Multimodal.mediaCuration(s, d)),
    "mm_audio_vad"           -> ((s, d) => Multimodal.audioVad(s, d)),
    "mm_audio_fingerprint"   -> ((s, d) => Multimodal.audioFingerprint(s, d)),
    "load_partition_evolution" -> (LoadOps.partitionEvolution _),
    "mm_resize"              -> ((s: SparkSession, d: String) => Multimodal.resize(s, d)),
    // G — streaming (real Structured Streaming runs to completion; the
    // materialized result is the gated frame — see StreamGate's scaladoc
    // for the per-entry determinism contract)
    "stream_window_agg"      -> graft.streaming.StreamGate.streamWindowAgg _,
    "stream_dedup"           -> graft.streaming.StreamGate.streamDedup _,
    "stream_sessionize"      -> graft.streaming.StreamGate.streamSessionize _,
    "stream_paragraph_dedup" -> graft.streaming.StreamGate.streamParagraphDedup _,
    "stream_markov"          -> graft.streaming.StreamGate.streamMarkov _,
    "stream_cusum"           -> graft.streaming.StreamGate.streamCusum _,
    "stream_constraints"     -> graft.streaming.StreamGate.streamConstraints _,
    "stream_heavy_hitters"   -> graft.streaming.StreamGate.streamHeavyHitters _,
    "stream_benford"         -> graft.streaming.StreamGate.streamBenford _,
    "stream_holt"            -> graft.streaming.StreamGate.streamHolt _,
    "stream_seasonal"        -> graft.streaming.StreamGate.streamSeasonal _,
    "stream_hampel"          -> graft.streaming.StreamGate.streamHampel _,
    "stream_top_paths"       -> graft.streaming.StreamGate.streamTopPaths _,
    "stream_cramers"         -> graft.streaming.StreamGate.streamCramers _,
    "stream_winsorized"      -> graft.streaming.StreamGate.streamWinsorized _,
    "stream_changelog"       -> graft.streaming.StreamGate.streamChangelog _,
    "stream_breaker"         -> graft.streaming.StreamGate.streamBreaker _,
    "stream_novelty"         -> graft.streaming.StreamGate.streamNovelty _,
    "stream_enrich"          -> graft.streaming.StreamGate.streamEnrich _,
    "stream_abtest"          -> graft.streaming.StreamGate.streamAbtest _,
    "stream_drift"           -> graft.streaming.StreamGate.streamDrift _,
    "stream_decay"           -> graft.streaming.StreamGate.streamDecay _,
    "stream_join"            -> graft.streaming.StreamGate.streamJoin _,
    "stream_chi2"            -> graft.streaming.StreamGate.streamChi2 _,
    "stream_changepoint"     -> graft.streaming.StreamGate.streamChangepoint _,
    "stream_cms"             -> graft.streaming.StreamGate.streamCms _,
    "stream_staleness"       -> graft.streaming.StreamGate.streamStaleness _,
    "stream_outer_join"      -> graft.streaming.StreamGate.streamOuterJoin _,
    "stream_hll"             -> graft.streaming.StreamGate.streamHll _,
    "stream_quantile"        -> graft.streaming.StreamGate.streamQuantile _,
    "stream_bloom"           -> graft.streaming.StreamGate.streamBloom _,
    "mon_page_hinkley"       -> ((s: SparkSession, d: String) => LoadOps.pageHinkley(s, d)),
    "stream_page_hinkley"    -> graft.streaming.StreamGate.streamPageHinkley _,
    "mon_stream_scorecard"   -> graft.operators.Scorecard.streamScorecard _,
    "q_auc_roc"              -> ((s: SparkSession, d: String) => Relational.qAucRoc(s, d)),
    "mon_calibration"        -> ((s: SparkSession, d: String) => LoadOps.calibration(s, d)),
    "mon_mann_kendall"       -> ((s: SparkSession, d: String) => LoadOps.mannKendall(s, d)),
    "mon_psi"                -> ((s: SparkSession, d: String) => LoadOps.psi(s, d)),
    "text_bm25"              -> ((s: SparkSession, d: String) => TextAnalysis.bm25(s, d)),
    "stream_psi"             -> graft.streaming.StreamGate.streamPsi _,
    "mon_drift_panel"        -> ((s: SparkSession, d: String) => LoadOps.driftPanel(s, d)),
    "stream_auc"             -> graft.streaming.StreamGate.streamAuc _,
    "stream_mann_kendall"    -> graft.streaming.StreamGate.streamMannKendall _,
    "text_ndcg"              -> ((s: SparkSession, d: String) => TextAnalysis.ndcgAt10(s, d)),
    "q_srm"                  -> ((s: SparkSession, d: String) => Relational.qSrm(s, d)),
    "q_cuped"                -> ((s: SparkSession, d: String) => Relational.qCuped(s, d)),
    "q_power_mde"            -> ((s: SparkSession, d: String) => Relational.qPowerMde(s, d)),
    "stream_srm"             -> graft.streaming.StreamGate.streamSrm _,
    "dedup_lsh_recall"       -> ((s: SparkSession, d: String) => Dedup.lshRecall(s, d)),
    "dedup_lsh_recall_curve" -> ((s: SparkSession, d: String) => Dedup.lshRecallCurve(s, d)),
    "mon_seasonal_mk"        -> ((s: SparkSession, d: String) => LoadOps.seasonalMannKendall(s, d)),
    "mon_forecast_eval"      -> ((s: SparkSession, d: String) => LoadOps.forecastEval(s, d)),
    "stream_forecast_eval"   -> graft.streaming.StreamGate.streamForecastEval _,
    "stream_calibration"     -> graft.streaming.StreamGate.streamCalibration _,
  )

  // shared SQL fragments for the oracle ---------------------------------

  private val toks =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  // ---- FNV-1a replay (F4/F5 oracles) -------------------------------
  // The engine's shingle/token hash is FNV-1a 64-bit (ShingleHashes /
  // SimHash64) — chosen BECAUSE it is engine-independent. DuckDB has no
  // wrapping 64-bit arithmetic, so the fold carries the hash as a HUGEINT
  // in [0, 2^64): per byte, convert to the signed bit pattern for xor
  // (bitwise-identical to Java), then widen for the wrap multiply.
  /** Signed 64-bit view of an unsigned HUGEINT expression. */
  private def u2s(x: String) =
    s"CAST($x - CASE WHEN $x >= 9223372036854775808::HUGEINT THEN " +
      s"18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
  /** One FNV-1a step: (h ^ c) * 0x100000001b3 mod 2^64 (h, c HUGEINT). */
  private val fnvStep = {
    val x = "xor(" + u2s("h") + ", CAST(c AS BIGINT))"
    s"CAST((CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN " +
      "18446744073709551616::HUGEINT ELSE 0::HUGEINT END) " +
      "* 1099511628211 % 18446744073709551616::HUGEINT AS HUGEINT)"
  }
  /** FNV-1a 64 over a HUGEINT byte-list expression (unsigned result). */
  private def fnvFold(bytesList: String) =
    s"list_reduce(list_prepend(14695981039346656037::HUGEINT, $bytesList), (h, c) -> $fnvStep)"

  // D35/H1k shared constraint list — MUST mirror LoadOps.checkConstraintDefs
  // name-for-name, predicate-for-predicate (order included)
  private val checkDefsSql: Seq[(String, String)] = Seq(
    "discount_le_8pct" -> "l_discount <= 0.08",
    "price_covers_qty" -> "l_extendedprice >= l_quantity",
    "qty_le_45"        -> "l_quantity <= 45.0",
    "qty_positive"     -> "l_quantity > 0.0",
    "tax_le_6pct"      -> "l_tax <= 0.06")

  // F57 power-iteration chain — shared by the PCA oracle and the F59
  // all-but-the-top apply. MATERIALIZED throughout: DuckDB inlines plain
  // CTEs per reference, and a 20-deep recurrence referencing its
  // predecessor would blow up exponentially (observed as fd exhaustion
  // re-scanning the parquet); materialization keeps the chain linear.
  private lazy val pcaCtes: String = {
    val iterCtes = (1 to 20).map { k =>
      s"""w$k AS MATERIALIZED (SELECT C.i AS pos, sum(C.c * v.x) AS x
         | FROM C JOIN v${k - 1} v ON v.pos = C.j GROUP BY 1),
         |v$k AS MATERIALIZED (SELECT pos,
         |  x / (SELECT sqrt(sum(x * x)) FROM w$k) AS x FROM w$k)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |u AS MATERIALIZED (SELECT vec_id, unnest(v) AS x,
       |  generate_subscripts(v, 1) - 1 AS pos FROM e),
       |m AS MATERIALIZED (SELECT pos, avg(x) AS mn, count(*) AS cnt FROM u GROUP BY pos),
       |cen AS MATERIALIZED (SELECT u.vec_id, u.pos, u.x - m.mn AS xc
       | FROM u JOIN m USING (pos)),
       |C AS MATERIALIZED (SELECT a.pos AS i, b.pos AS j,
       |   round(sum(a.xc * b.xc) / (SELECT max(cnt) FROM m), 6) AS c
       | FROM cen a JOIN cen b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |v0 AS MATERIALIZED (SELECT DISTINCT pos, 0.125 AS x FROM u),
       |$iterCtes,
       |lam AS (SELECT sqrt(sum(x * x)) AS l FROM w20),
       |sgn AS (SELECT CASE WHEN (SELECT x FROM v20 ORDER BY abs(x) DESC, pos LIMIT 1) < 0
       |   THEN -1.0 ELSE 1.0 END AS s)""".stripMargin
  }

  // F9 scored-document relation — shared by the quality audit and the
  // curriculum bucketing oracle
  private lazy val qualityScoredSql =
    s"""SELECT doc_id, n_chars_m, n_words, avg_word_len, punct_ratio, stop_ratio,
       | round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5
       |   + (1.0 - punct_ratio) * 0.3 + stop_ratio * 0.2, 4) AS quality_score
       |FROM (SELECT doc_id, n_chars_m, n_words,
       |  round(CAST(n_alpha AS DOUBLE) / greatest(n_words, 1), 4) AS avg_word_len,
       |  round(CAST(n_punct AS DOUBLE) / greatest(n_chars_m, 1), 4) AS punct_ratio,
       |  round(CAST(n_stop AS DOUBLE) / greatest(n_words, 1), 4) AS stop_ratio
       | FROM (SELECT doc_id, n_chars_m, CAST(len(toks) AS BIGINT) AS n_words,
       |  CAST(${hitsSql(Seq("the", "a", "and", "of", "to"))} AS BIGINT) AS n_stop,
       |  n_alpha, n_punct
       |  FROM (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m, $toks AS toks,
       |   CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |   CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT) AS n_punct
       |  FROM documents)))""".stripMargin

  private def hitsSql(words: Seq[String]) =
    s"""len(list_filter(toks, x -> x IN (${words.map(w => s"'$w'").mkString(",")})))"""

  // Gopher measurement relation + keep predicate — shared by the F31
  // audit and the H4 composed pipeline so both oracles judge identical
  // arithmetic. DuckDB regexp_replace needs explicit 'g' (Spark's is
  // global by default); flags evaluate on UNROUNDED ratios.
  private val gopherMeasuredSql =
    s"""SELECT doc_id, text, toks, n_words, n_stop_distinct,
       |  nonws / nw AS mwl, n_sym / nw AS sym, n_bul / n_lines AS bul,
       |  n_ell / n_lines AS ell, n_alw / nw AS alw
       |FROM (SELECT doc_id, text, toks,
       |  CAST(len(toks) AS BIGINT) AS n_words,
       |  CAST(greatest(len(toks), 1) AS DOUBLE) AS nw,
       |  CAST(len(regexp_extract_all(text, '\n')) + 1 AS DOUBLE) AS n_lines,
       |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) AS nonws,
       |  CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.'))
       |    + len(regexp_extract_all(text, '…')) AS DOUBLE) AS n_sym,
       |  CAST(len(regexp_extract_all(text, '(?m)^\\s*[-*•]')) AS DOUBLE) AS n_bul,
       |  CAST(len(regexp_extract_all(text, '(?m)(\\.\\.\\.|…)\\s*$$')) AS DOUBLE) AS n_ell,
       |  CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS n_alw,
       |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
       |    s -> list_contains(toks, s))) AS BIGINT) AS n_stop_distinct
       | FROM (SELECT doc_id, text, $toks AS toks FROM documents))""".stripMargin

  private def gopherKeepSql(minStop: Int = 2) =
    s"""n_words >= 50 AND n_words <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
      | AND sym <= 0.1 AND bul <= 0.9 AND ell <= 0.3 AND alw >= 0.8
      | AND n_stop_distinct >= $minStop""".stripMargin

  private val synthXY =
    """SELECT o_orderkey, o_orderstatus,
      | CAST(150000 + (o_orderkey * 7919) % 800001 AS DOUBLE) AS x,
      | CAST(6050000 + (o_orderkey * 104729) % 1700001 AS DOUBLE) AS y
      |FROM orders""".stripMargin

  private val jaccardPairsCte =
    """d AS (SELECT doc_id, lang, n_chars,
      |  CASE WHEN length(text) >= 3
      |   THEN list_distinct([substr(lower(text), CAST(i AS INT), 3) for i in range(1, length(text) - 1)])
      |   ELSE [] END AS sh
      | FROM documents),
      |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.lang AS lang,
      |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |    / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
      | FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  AND abs(a.n_chars - b.n_chars) <= 30)""".stripMargin

  private val evSec =
    "SELECT *, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec FROM events"

  /** F85's two-round Lloyd chain (label-mean init, 4-dec-rounded
    * centroid updates, smaller-label argmax ties), ending at the final
    * assignment `sf(vec_id, c_label, sim)` with `e` still in scope —
    * ONE text shared by the F85 report and the F89 purity oracle so
    * both replay the identical clustering. */
  private lazy val kmeansChainCtes: String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT c_label, list(round(a, 4) ORDER BY pos) AS cv
       |  FROM (SELECT label AS c_label, pos, avg(x) AS a
       |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
       |    GROUP BY 1, pos) GROUP BY 1),
       |s1 AS MATERIALIZED (SELECT vec_id, v, c_label FROM (
       |  SELECT vec_id, v, c_label, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn
       |  FROM e CROSS JOIN c0) WHERE rn = 1),
       |c1 AS (SELECT c_label, list(round(a, 4) ORDER BY pos) AS cv
       |  FROM (SELECT c_label, pos, avg(x) AS a
       |    FROM (SELECT c_label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM s1)
       |    GROUP BY 1, pos) GROUP BY 1),
       |s2 AS MATERIALIZED (SELECT vec_id, v, c_label FROM (
       |  SELECT vec_id, v, c_label, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn
       |  FROM e CROSS JOIN c1) WHERE rn = 1),
       |c2 AS (SELECT c_label, list(round(a, 4) ORDER BY pos) AS cv
       |  FROM (SELECT c_label, pos, avg(x) AS a
       |    FROM (SELECT c_label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM s2)
       |    GROUP BY 1, pos) GROUP BY 1),
       |sf AS MATERIALIZED (SELECT vec_id, c_label, sim FROM (
       |  SELECT vec_id, c_label, ${cosSql("v", "cv")} AS sim,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn
       |  FROM e CROSS JOIN c2) WHERE rn = 1)""".stripMargin

  /** The F80 floored n-gram count chain (n = 1..3, shared tokenizer,
    * count floor 5) — ONE text shared by the count-table oracle and the
    * F82 Zipf fit so both replay the identical inventory. Ends at
    * `c(gram, cnt)`. */
  private lazy val ngramCountCtes: String =
    s"""t AS (SELECT $toks AS toks FROM documents),
       |u AS (SELECT unnest(toks) AS gram FROM t
       | UNION ALL
       | SELECT unnest(CASE WHEN len(toks) >= 2
       |   THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 1 AS INT)), ' ')
       |         for i in range(1, len(toks))]
       |   ELSE [] END) FROM t
       | UNION ALL
       | SELECT unnest(CASE WHEN len(toks) >= 3
       |   THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 2 AS INT)), ' ')
       |         for i in range(1, len(toks) - 1)]
       |   ELSE [] END) FROM t),
       |c AS MATERIALIZED (SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM u
       |      GROUP BY 1 HAVING count(*) >= 5)""".stripMargin

  /** The shared-gram edge list (df-capped word 8-grams → symmetric
    * weighted pairs) every graph-family oracle builds on — ONE text so
    * F53/F71/F72 replay the identical graph. Ends at `e(src, dst, w)`
    * plus `n` (all docs). */
  private lazy val gramEdgeCtes: String =
    s"""t AS (SELECT doc_id, $toks AS toks FROM documents),
       |g0 AS (SELECT doc_id,
       |  unnest(CASE WHEN len(toks) >= 8
       |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 7 AS INT)), ' ')
       |          for i in range(1, len(toks) - 6)]
       |    ELSE [] END) AS gram
       | FROM t),
       |g AS (SELECT DISTINCT doc_id, gram FROM g0),
       |f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) BETWEEN 2 AND 32),
       |o AS (SELECT g.doc_id, g.gram FROM g JOIN f USING (gram)),
       |e AS (SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS w
       |      FROM o a JOIN o b ON a.gram = b.gram AND a.doc_id <> b.doc_id
       |      GROUP BY 1, 2),
       |n AS (SELECT doc_id FROM documents)""".stripMargin

  /** The F63/F77 within-list ranked-neighbor chain: quantizer
    * assignment + all within-list pairs ranked by (rounded cosine DESC,
    * nbr_id) — ONE text shared by the kNN-graph oracle and the LOF
    * oracle so both replay the identical neighborhoods. Ends at
    * `r(vec_id, nbr_id, list_id, cos, rank)`. */
  private lazy val knnRankedCtes: String =
    s"""e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
       |  FROM (SELECT label, pos, avg(x) AS a
       |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
       |    GROUP BY label, pos)
       |  GROUP BY label),
       |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
       |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1),
       |m AS (SELECT e.vec_id, asg.list_id, e.v FROM e
       |  JOIN asg ON e.vec_id = asg.vec_id),
       |pr AS (SELECT x.vec_id, y.vec_id AS nbr_id, x.list_id,
       |    round(${cosSql("x.v", "y.v")}, 4) AS cos
       |  FROM m x JOIN m y ON x.list_id = y.list_id AND x.vec_id <> y.vec_id),
       |r AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY cos DESC, nbr_id) AS rank FROM pr)""".stripMargin

  /** The F73/F75 BPE training chain: capped vocab, character state, and
    * six unrolled merge rounds (weighted pair argmax, island-parity
    * leftmost non-overlap apply) — ONE text shared by the merge-table
    * oracle and the tokenizer-apply oracle so both replay the identical
    * trainer. Ends at `s6` (final symbol state) over `v` (vocab). */
  private lazy val bpeChainCtes: String = {
    val roundCtes = (1 to 6).map { i =>
      s"""p$i AS MATERIALIZED (SELECT s.*,
         |  lead(sym) OVER (PARTITION BY word_id ORDER BY pos) AS nxt
         | FROM s${i - 1} s),
         |b$i AS MATERIALIZED (SELECT sym AS l, nxt AS r,
         |  CAST(sum(cnt) AS BIGINT) AS pc FROM p$i
         | WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY pc DESC, l, r LIMIT 1),
         |c$i AS MATERIALIZED (SELECT p.word_id, p.pos FROM p$i p, b$i b
         | WHERE p.sym = b.l AND p.nxt = b.r),
         |m$i AS MATERIALIZED (SELECT word_id, pos FROM (
         |  SELECT word_id, pos,
         |    row_number() OVER (PARTITION BY word_id, island ORDER BY pos) AS rn
         |  FROM (SELECT word_id, pos,
         |      sum(brk) OVER (PARTITION BY word_id ORDER BY pos) AS island
         |    FROM (SELECT word_id, pos,
         |        CASE WHEN pos - lag(pos) OVER (PARTITION BY word_id ORDER BY pos) = 1
         |             THEN 0 ELSE 1 END AS brk FROM c$i)))
         | WHERE rn % 2 = 1),
         |s$i AS MATERIALIZED (SELECT word_id, cnt,
         |  row_number() OVER (PARTITION BY word_id ORDER BY pos) AS pos, sym FROM (
         |  SELECT t.word_id, t.cnt, t.pos,
         |    CASE WHEN m.pos IS NOT NULL THEN b.l || b.r ELSE t.sym END AS sym
         |  FROM p$i t LEFT JOIN b$i b ON TRUE
         |  LEFT JOIN m$i m ON m.word_id = t.word_id AND m.pos = t.pos
         |  LEFT JOIN m$i g ON g.word_id = t.word_id AND g.pos = t.pos - 1
         |  WHERE g.pos IS NULL)),
         |r$i AS MATERIALIZED (SELECT CAST($i AS BIGINT) AS round, b.l AS lhs,
         |  b.r AS rhs, b.pc AS pair_count,
         |  (SELECT CAST(sum(cnt) AS BIGINT) FROM s$i) AS n_symbols_after
         | FROM b$i b)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |  SELECT unnest($toks) AS word FROM documents) GROUP BY 1
       |  ORDER BY cnt DESC, word LIMIT 512),
       |v AS MATERIALIZED (SELECT word, cnt,
       |  row_number() OVER (ORDER BY cnt DESC, word) AS word_id FROM v0),
       |s0 AS MATERIALIZED (SELECT word_id, cnt, pos,
       |  substr(word, CAST(pos AS INT), 1) AS sym FROM (
       |  SELECT word_id, cnt, word, unnest(range(1, len(word) + 1)) AS pos FROM v)),
       |$roundCtes""".stripMargin
  }

  /** The F67 second chain: deflate with the PUBLISHED (rounded) v1/λ1,
    * then 20 more unrolled power steps on C2 — generated like the first
    * chain so both recurrences replay number-for-number. */
  private lazy val pca2Ctes: String = {
    val iterCtes = (1 to 20).map { k =>
      s"""uw$k AS MATERIALIZED (SELECT C2.i AS pos, sum(C2.c * u.x) AS x
         | FROM C2 JOIN u${k - 1} u ON u.pos = C2.j GROUP BY 1),
         |u$k AS MATERIALIZED (SELECT pos,
         |  x / (SELECT sqrt(sum(x * x)) FROM uw$k) AS x FROM uw$k)""".stripMargin
    }.mkString(",\n")
    s"""v1r AS MATERIALIZED (SELECT v20.pos, round(sgn.s * v20.x, 4) AS x FROM v20, sgn),
       |lam1 AS MATERIALIZED (SELECT round(sqrt(sum(x * x)), 4) AS l FROM w20),
       |C2 AS MATERIALIZED (SELECT C.i, C.j,
       |   round(C.c - lam1.l * a.x * b.x, 6) AS c
       | FROM C, lam1, v1r a, v1r b WHERE a.pos = C.i AND b.pos = C.j),
       |u0 AS MATERIALIZED (SELECT pos, 0.125 AS x FROM v1r),
       |$iterCtes,
       |lam2 AS (SELECT round(sqrt(sum(x * x)), 4) AS l FROM uw20),
       |sgn2 AS (SELECT CASE WHEN (SELECT x FROM u20 ORDER BY abs(x) DESC, pos LIMIT 1) < 0
       |   THEN -1.0 ELSE 1.0 END AS s)""".stripMargin
  }

  /** The F64 greedy selection unrolled as CTEs (k rounds of: promote the
    * max-rounded-min-distance point, fold its distance into the running
    * min) — generated so the oracle replays the engine's k exactly. The
    * rounded polarization-identity d² matches [[Similarity.sqDistTo]]'s
    * IEEE arithmetic via sequential `list_inner_product`. */
  private def kcenterCtes(k: Int): String = {
    def d2(a: String, b: String) =
      s"round(list_inner_product($a,$a) - 2*list_inner_product($a,$b)" +
        s" + list_inner_product($b,$b), 4)"
    val rounds = (2 to k).map { r =>
      val prev = (1 until r).map(i => s"SELECT vec_id FROM c$i").mkString(" UNION ALL ")
      s"""c$r AS MATERIALIZED (SELECT vec_id, v, mind FROM d${r - 1}
         | WHERE vec_id NOT IN ($prev)
         | ORDER BY mind DESC, vec_id LIMIT 1),
         |d$r AS MATERIALIZED (SELECT d.vec_id, d.v,
         |  least(d.mind, ${d2("d.v", "c.v")}) AS mind
         | FROM d${r - 1} d, c$r c)""".stripMargin
    }.mkString(",\n")
    val selRows = (s"SELECT 1 AS sel_order, vec_id AS center_id," +
      " CAST(0.0 AS DOUBLE) AS sel_dist, v FROM c1") +:
      (2 to k).map(r => s"SELECT $r, vec_id, mind, v FROM c$r")
    s"""e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c1 AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
       |d1 AS MATERIALIZED (SELECT e.vec_id, e.v, ${d2("e.v", "c.v")} AS mind
       | FROM e, c1 c),
       |$rounds,
       |sel AS MATERIALIZED (${selRows.mkString(" UNION ALL ")}),
       |a AS (SELECT e.vec_id, s.sel_order, ${d2("e.v", "s.v")} AS d FROM e, sel s),
       |b AS (SELECT vec_id, min(d) AS bd FROM a GROUP BY 1),
       |asg AS (SELECT a.vec_id, b.bd, min(a.sel_order) AS sel_order
       | FROM a JOIN b ON a.vec_id = b.vec_id AND a.d = b.bd GROUP BY 1, 2)""".stripMargin
  }

  /** The C13 ray-cast crossing terms, generated from [[Geo.PipPoly]] so
    * the oracle replays the engine's exact integer edge tests. */
  private val pipTermsSql: String = {
    val edges = Geo.PipPoly.zip(Geo.PipPoly.tail :+ Geo.PipPoly.head)
    edges.collect { case ((xa, ya), (xb, yb)) if ya != yb =>
      val ((xlo, ylo), (xhi, yhi)) =
        if (ya < yb) ((xa, ya), (xb, yb)) else ((xb, yb), (xa, ya))
      s"(CASE WHEN $ylo <= yi AND yi < $yhi AND " +
        s"(xi - $xlo) * ${yhi - ylo} < ${xhi - xlo} * (yi - $ylo) " +
        "THEN 1 ELSE 0 END)"
    }.mkString(" + ")
  }

  private def cosSql(a: String, b: String) =
    s"list_inner_product($a,$b)/(sqrt(list_inner_product($a,$a))*sqrt(list_inner_product($b,$b)))"

  private val lshBucketSql: String = {
    val planes = Vec.planeWeights(Similarity.NPlanes, 64)
    planes.zipWithIndex.map { case (w, h) =>
      val wl = w.mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product(v, $wl) > 0.0 THEN ${1L << h} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** One gate's branch of the G32 scoreboard oracle: the D24 digest
    * (md5 of a canonical '|'-joined projection → first-8-hex int64 →
    * count/sum/xor fold) over that gate's own oracle SQL as a subquery.
    * The projection rules mirror [[graft.operators.Scorecard.digestOf]]
    * exactly (same tag alphabet, same NULL/bool/double images) and the
    * column specs come from the SAME `Scorecard.gateCols` list the Spark
    * side reads — one source of truth, the two sides cannot drift. */
  private def digestSql(gate: String, inner: String,
      cols: Seq[(String, Char)]): String = {
    val canon = cols.map { case (n, t) => t match {
      case 'd' => s"""COALESCE(CAST(CAST(round("$n" * 10000) AS BIGINT) AS VARCHAR), '')"""
      case 'b' => s"""COALESCE(CAST(CASE WHEN "$n" THEN 1 ELSE 0 END AS VARCHAR), '')"""
      case 's' => s"""COALESCE("$n", '')"""
      case _   => s"""COALESCE(CAST("$n" AS VARCHAR), '')"""
    }}.mkString(", ")
    s"""SELECT '$gate' AS gate, CAST(count(*) AS BIGINT) AS n_rows,
       | CAST(COALESCE(sum(h), 0) AS BIGINT) AS sum_hash,
       | CAST(COALESCE(bit_xor(h), 0) AS BIGINT) AS xor_hash
       |FROM (SELECT ('0x' || substr(md5(concat_ws('|', $canon)), 1, 8))::BIGINT AS h
       |  FROM ($inner))""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    // most stream-gate oracles live in streamGateOracleSql; a few
    // bespoke ones (outer_join, staleness) sit in baseOracleSql
    val gates = baseOracleSql ++ streamGateOracleSql
    val scorecard = graft.operators.Scorecard.gateCols
      .map { case (g, cols) => digestSql(g, gates(g), cols) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY gate")
    // D62: the drift panel composes its five members' oracle texts as
    // CTEs — one SQL per member, shared verbatim with the standalone
    // entries, so panel and constituents cannot drift
    val panel =
      s"""WITH mk_full AS (${baseOracleSql("mon_mann_kendall")}),
         |ph_full AS (${baseOracleSql("mon_page_hinkley")}),
         |cs_full AS (${baseOracleSql("mon_cusum")}),
         |hp_full AS (${baseOracleSql("mon_hampel")}),
         |ps_full AS (${baseOracleSql("mon_psi")}),
         |smk_full AS (${baseOracleSql("mon_seasonal_mk")}),
         |fe_full AS ($forecastEvalSql),
         |mk AS (SELECT source, n_days, trend AS mk_trend,
         |  coalesce(significant, 0) AS mk_significant FROM mk_full),
         |ph AS (SELECT source, CAST(sum(alarm) AS BIGINT) AS ph_alarms
         |  FROM ph_full GROUP BY 1),
         |cs AS (SELECT source, CAST(sum(alarm) AS BIGINT) AS cusum_alarms
         |  FROM cs_full GROUP BY 1),
         |hp AS (SELECT source, CAST(sum(alarm) AS BIGINT) AS hampel_alarms
         |  FROM hp_full GROUP BY 1),
         |ps AS (SELECT source, psi, alert AS psi_alert FROM ps_full),
         |smk AS (SELECT source, trend AS smk_trend,
         |  coalesce(significant, 0) AS smk_significant FROM smk_full),
         |fe AS (SELECT source, mase_x10000,
         |  skillful AS forecast_skillful FROM fe_full)
         |SELECT mk.source, n_days, mk_trend, mk_significant,
         |  smk_trend, smk_significant, ph_alarms,
         |  cusum_alarms, hampel_alarms, psi, psi_alert,
         |  mase_x10000, forecast_skillful,
         |  CAST(mk_significant = 1 OR coalesce(smk_significant, 0) = 1
         |    OR psi_alert = 1 OR ph_alarms > 0
         |    OR cusum_alarms > 0 AS INT) AS drifting
         |FROM mk JOIN ph USING (source) JOIN cs USING (source)
         |  JOIN hp USING (source) JOIN ps USING (source)
         |  LEFT JOIN smk USING (source) LEFT JOIN fe USING (source)
         |ORDER BY source""".stripMargin
    gates ++ Map("mon_stream_scorecard" -> scorecard,
      "mon_drift_panel" -> panel, "mon_forecast_eval" -> forecastEvalSql)
  }

  // D64: the forecast backtest composes D49's oracle as a CTE — shared
  // verbatim, all-integer rollup on top; hoisted so the G38 stream twin
  // shares the SAME text without recursing through oracleSql
  private lazy val forecastEvalSql: String =
      s"""WITH tr AS (${baseOracleSql("mon_forecast")}),
         |d AS (SELECT source, day, md, forecast, resid,
         |  lag(md) OVER (PARTITION BY source ORDER BY day) AS prev_md
         | FROM tr),
         |f AS (SELECT * FROM d
         | WHERE forecast IS NOT NULL AND prev_md IS NOT NULL),
         |p AS (SELECT source, md, resid,
         |  abs(resid) * 1000000 // greatest(abs(md), 1) AS pe_ppm,
         |  abs(md - prev_md) AS naive_err FROM f),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_eval,
         |  CAST(sum(abs(resid)) // count(*) AS BIGINT) AS mae_cents,
         |  CAST(sum(resid) AS BIGINT) AS bias_sum_cents,
         |  CAST(sum(pe_ppm) // count(*) AS BIGINT) AS mape_ppm,
         |  CAST(sum(naive_err) // count(*) AS BIGINT) AS mae_naive_cents,
         |  CAST(sum(abs(resid)) AS BIGINT) AS sae,
         |  CAST(sum(naive_err) AS BIGINT) AS sne FROM p GROUP BY 1)
         |SELECT source, n_eval, mae_cents, bias_sum_cents, mape_ppm,
         | mae_naive_cents,
         | CASE WHEN sne = 0 THEN NULL
         |  ELSE CAST(sae * 10000 // sne AS BIGINT) END AS mase_x10000,
         | CASE WHEN sne = 0 THEN NULL
         |  ELSE CAST(sae < sne AS INT) END AS skillful
         |FROM g ORDER BY source""".stripMargin

  private def streamGateOracleSql: Map[String, String] = Map(
    // G-family stream gates whose completed run equals a batch operator
    // reuse that operator's oracle VERBATIM (one SQL text — the two
    // entries cannot drift): G1 ≡ E13 bucketing, G19 ≡ E35 matrix,
    // G21 ≡ D40 trajectory.
    "stream_window_agg"    -> baseOracleSql("q_time_bucket"),
    "stream_markov"        -> baseOracleSql("q_markov_transitions"),
    "stream_cusum"         -> baseOracleSql("mon_cusum"),
    "stream_page_hinkley"  -> baseOracleSql("mon_page_hinkley"),
    "stream_psi"           -> baseOracleSql("mon_psi"),
    "stream_auc"           -> baseOracleSql("q_auc_roc"),
    "stream_mann_kendall"  -> baseOracleSql("mon_mann_kendall"),
    "stream_srm"           -> baseOracleSql("q_srm"),
    "stream_forecast_eval" -> forecastEvalSql,
    "stream_calibration"   -> baseOracleSql("mon_calibration"),
    "stream_constraints"   -> baseOracleSql("load_check_constraints"),
    "stream_heavy_hitters" -> baseOracleSql("q_heavy_hitters"),
    "stream_benford"       -> baseOracleSql("mon_benford"),
    "stream_holt"          -> baseOracleSql("mon_forecast"),
    "stream_seasonal"      -> baseOracleSql("mon_seasonal"),
    "stream_hampel"        -> baseOracleSql("mon_hampel"),
    "stream_top_paths"     -> baseOracleSql("q_top_paths"),
    "stream_winsorized"    -> baseOracleSql("q_winsorized"),
    // G30: E56's middle branch alone — the streamed pair
    "stream_cramers" ->
      """WITH c AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |  CAST(count(*) AS BIGINT) AS o FROM lineitem GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |  CAST(count(DISTINCT a) AS BIGINT) AS r_cats,
        |  CAST(count(DISTINCT b) AS BIGINT) AS c_cats FROM c),
        |bd AS (SELECT sum((o - e) * (o - e) / e - e) AS bd FROM (
        |  SELECT o, CAST(rt AS DOUBLE) * ct / n AS e
        |  FROM c
        |  JOIN (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1) USING (a)
        |  JOIN (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1) USING (b)
        |  CROSS JOIN t))
        |SELECT 'l_returnflag' AS col_a, 'l_linestatus' AS col_b,
        | n AS n_rows, r_cats, c_cats,
        | round(n + bd, 4) AS chi2,
        | round(sqrt(greatest(n + bd, 0)
        |   / (n * nullif(least(r_cats, c_cats) - 1, 0))), 4) AS cramers_v
        |FROM t, bd""".stripMargin,
    "stream_changelog"     -> baseOracleSql("load_changelog_apply"),
    "stream_breaker"       -> baseOracleSql("load_circuit_breaker"),
    "stream_novelty"       -> baseOracleSql("text_novelty"),
    "stream_abtest"        -> baseOracleSql("q_ab_ttest"),
    "stream_drift"         -> baseOracleSql("mon_embedding_drift"),
    "stream_decay"         -> baseOracleSql("mon_decay_avg"),
    "stream_join"          -> baseOracleSql("q_interval_join"),
    "stream_chi2"          -> baseOracleSql("mon_chi2"),
    "stream_changepoint"   -> baseOracleSql("mon_changepoint"),
    "stream_cms"           -> baseOracleSql("q_cms_sketch"),
    "stream_hll"           -> baseOracleSql("q_hll_sketch"),
    "stream_quantile"      -> baseOracleSql("q_quantile_sketch"),
    "stream_bloom"         -> baseOracleSql("q_bloom_prune_join"),
    // G11: the stateless broadcast enrichment rolled up per catalog
    // source — a plain SQL join replays it
    "stream_enrich" ->
      """SELECT n.n_name, count(*) AS n_events,
        | round(sum(e.value), 2) AS value_sum
        |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // G2: the emitted first-occurrence keys rolled up per type — exact
    // distinct (user, type) pairs regardless of the 4-batch slicing
    "stream_dedup" ->
      """WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT event_type, count(*) AS n_users,
        | CAST(sum(user_id) AS BIGINT) AS user_checksum
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // G3: E12's session rollup MINUS each user's final session (append
    // mode emits only CLOSED sessions; the last stays in the state store)
    "stream_sessionize" ->
      s"""WITH ev AS ($evSec),
         |b AS (SELECT user_id, event_id, sec, value,
         |  CASE WHEN lag(sec) OVER w IS NULL THEN 1
         |       WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
         | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |s AS (SELECT user_id, sec, value, sum(brk) OVER
         |  (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS session_id
         | FROM b),
         |g AS (SELECT user_id, session_id, count(*) AS n_events,
         |  CAST(min(sec) AS BIGINT) AS start_sec, CAST(max(sec) AS BIGINT) AS end_sec,
         |  round(sum(value), 2) AS session_value
         | FROM s GROUP BY 1, 2),
         |m AS (SELECT user_id, max(session_id) AS last_sid FROM g GROUP BY 1)
         |SELECT g.user_id, g.n_events, g.start_sec, g.end_sec, g.session_value
         |FROM g JOIN m USING (user_id) WHERE g.session_id < m.last_sid
         |ORDER BY g.user_id, g.start_sec""".stripMargin,
    // G15: F49's chunk/keeper CTEs; the report legitimately lacks
    // n_dup_chunks (a stream cannot know a chunk's future multiplicity)
    "stream_paragraph_dedup" ->
      s"""WITH tk AS (SELECT doc_id, string_split(
        |        CASE WHEN doc_id % 7 = 0
        |             THEN '${graft.operators.Dedup.ParagraphBoiler} ' || text
        |             ELSE text END, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, unnest(toks) AS word,
        |        generate_subscripts(toks, 1) AS ord FROM tk),
        |c0 AS (SELECT doc_id,
        |        CAST(floor((ord - 1) / 20.0) AS BIGINT) AS chunk_idx,
        |        string_agg(word, ' ' ORDER BY ord) AS chunk
        |      FROM w GROUP BY doc_id, floor((ord - 1) / 20.0)),
        |c AS (SELECT doc_id, chunk_idx, md5(chunk) AS h
        |      FROM c0 WHERE length(chunk) > 0),
        |s AS (SELECT h, min(doc_id * 1000000 + chunk_idx) AS keeper_key
        |      FROM c GROUP BY h),
        |j AS (SELECT c.doc_id, c.h,
        |        (c.doc_id * 1000000 + c.chunk_idx) = s.keeper_key AS kept
        |      FROM c JOIN s USING (h))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept THEN ('0x' || substr(h, 1, 8))::BIGINT ELSE 0 END)
        |    AS BIGINT) AS kept_checksum
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )

  private def baseOracleSql: Map[String, String] = Map(
    // E17/E20: the sketch estimates are engine-specific, but the exact
    // counts and the declared error-bound verdict are not — the oracle
    // pins within_bound to 1, so a sketch drifting out of its bound
    // hash-mismatches (the F4/F5 invariant-gate convention)
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        | count(*) AS n, CAST(1 AS INT) AS within_bound
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hll_sketch" ->
      """SELECT event_type AS source,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
        | CAST(1 AS INT) AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_parquet_pruned" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity >= 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // A18: the TTL cache decision replayed source-for-source — planted
    // purged-history (first_fetch) and paused (refetch) classes, 24 h TTL
    // against the corpus watermark
    "src_cache_ttl" ->
      """WITH ev AS (SELECT user_id % 25 AS source_key,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec,
        |  event_type <> 'error' AS ok FROM events),
        |w AS (SELECT max(sec) AS now FROM ev),
        |l AS (SELECT source_key, max(sec) AS last_success_sec,
        |   count(*) AS n_success
        | FROM ev, w WHERE ok AND source_key % 7 <> 3
        |   AND (source_key % 5 <> 1 OR sec <= now - 3 * 86400)
        | GROUP BY 1),
        |c AS (SELECT CAST(n_nationkey AS BIGINT) AS source_key, n_name FROM nation)
        |SELECT c.source_key, c.n_name,
        | COALESCE(l.n_success, 0) AS n_success, l.last_success_sec,
        | w.now - l.last_success_sec AS age_sec,
        | CASE WHEN l.last_success_sec IS NULL THEN 'first_fetch'
        |      WHEN w.now - l.last_success_sec <= 24 * 3600 THEN 'cache_hit'
        |      ELSE 'refetch' END AS decision
        |FROM c LEFT JOIN l USING (source_key), w
        |ORDER BY c.source_key""".stripMargin,
    "src_csv_read" ->
      "SELECT CAST(r_regionkey AS INT) AS r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "src_json_features" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS INT) AS n_regionkey FROM nation ORDER BY n_nationkey""".stripMargin,
    "src_xml_features" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        | CAST(n_regionkey AS INT) AS n_regionkey FROM nation ORDER BY n_nationkey""".stripMargin,
    // depth = max brace nesting outside double-quoted spans, quotes toggle
    // on every '"' — the exact rule of the native json_depth scan,
    // expressed as two stacked character windows
    // the diagnostics gate must recover the planted failure kind from the
    // payload alone — the oracle reconstructs the plant rule (key % 5),
    // so any misclassification (e.g. a truncated payload read as an html
    // page, an error envelope read as ok) hash-mismatches
    "etl_response_diagnose" ->
      """WITH c AS (SELECT c_custkey,
        |  CASE c_custkey % 5 WHEN 0 THEN 'ok' WHEN 1 THEN 'html_error'
        |       WHEN 2 THEN 'auth_required' WHEN 3 THEN 'empty_features'
        |       ELSE 'truncated_json' END AS failure_kind
        | FROM customer)
        |SELECT failure_kind,
        | CAST(CASE WHEN failure_kind IN ('html_error', 'truncated_json')
        |   THEN 1 ELSE 0 END AS INT) AS retryable,
        | count(*) AS n_responses, CAST(sum(c_custkey) AS BIGINT) AS key_checksum
        |FROM c GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "etl_response_validate" ->
      """WITH ch AS (SELECT event_id, unnest(cs) AS c, generate_subscripts(cs, 1) AS i
        |  FROM (SELECT event_id,
        |    [substr(props, CAST(x AS INT), 1) for x in range(1, length(props) + 1)] AS cs
        |   FROM events)),
        |q1 AS (SELECT event_id, i, c,
        |  sum(CASE WHEN c = '"' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY event_id ORDER BY i) AS q FROM ch),
        |q2 AS (SELECT event_id,
        |  sum(CASE WHEN q % 2 = 0 AND c = '{' THEN 1
        |           WHEN q % 2 = 0 AND c = '}' THEN -1 ELSE 0 END)
        |    OVER (PARTITION BY event_id ORDER BY i) AS d FROM q1),
        |dep AS (SELECT event_id, max(d) AS jd FROM q2 GROUP BY 1),
        |ev AS (SELECT e.*, coalesce(dep.jd, 0) AS jd FROM events e
        |  LEFT JOIN dep ON e.event_id = dep.event_id)
        |SELECT event_type AS source, count(*) AS n,
        | CAST(sum(CASE WHEN props LIKE '{%' AND props LIKE '%}' AND length(props) <= 64
        |   AND jd <= 4 AND regexp_matches(props, '"k":\s*[0-9]+') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        | CAST(sum(CASE WHEN NOT (props LIKE '{%' AND props LIKE '%}') THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
        | CAST(sum(CASE WHEN length(props) > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
        | CAST(sum(CASE WHEN jd > 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_too_deep
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    // same planted wire, same occurrence arithmetic, same precedence
    // (size → entity → element count → balance) as the Spark gate
    "etl_xml_validate" ->
      """WITH b AS (SELECT p_partkey, p_brand,
        |  '<part><id>' || CAST(p_partkey AS VARCHAR) || '</id><name>' || p_name ||
        |  '</name><type>' || p_type || '</type></part>' AS base FROM part),
        |w AS (SELECT p_brand AS source,
        |  CASE WHEN p_partkey % 7 = 1 THEN '<!DOCTYPE p [<!ENTITY x "boom">]>' || base
        |       WHEN p_partkey % 7 = 2 THEN base || repeat('<p>x</p>', 10)
        |       WHEN p_partkey % 7 = 3 THEN base || repeat('PAD_BYTES!', 40)
        |       WHEN p_partkey % 7 = 4 THEN regexp_replace(base, '</part>$', '')
        |       ELSE base END AS xml FROM b),
        |c AS (SELECT source, xml,
        |  length(xml) - length(replace(xml, '<', '')) AS n_lt,
        |  CAST((length(xml) - length(replace(xml, '</', ''))) / 2 AS INT) AS n_close,
        |  CAST((length(xml) - length(replace(xml, '<!', ''))) / 2 AS INT) AS n_bang
        | FROM w),
        |k AS (SELECT source,
        |  CASE WHEN length(xml) > 300 THEN 'oversize'
        |       WHEN contains(xml, '<!ENTITY') THEN 'entity_decl'
        |       WHEN n_lt > 20 THEN 'too_many_elements'
        |       WHEN (n_lt - n_close - n_bang) <> n_close THEN 'malformed'
        |       ELSE 'ok' END AS cls FROM c)
        |SELECT source, count(*) AS n,
        | CAST(sum(CASE WHEN cls = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        | CAST(sum(CASE WHEN cls = 'oversize' THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
        | CAST(sum(CASE WHEN cls = 'entity_decl' THEN 1 ELSE 0 END) AS BIGINT) AS n_entity,
        | CAST(sum(CASE WHEN cls = 'too_many_elements' THEN 1 ELSE 0 END) AS BIGINT) AS n_too_many,
        | CAST(sum(CASE WHEN cls = 'malformed' THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tfidf" ->
      s"""WITH terms AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
         |s AS (SELECT doc_id, term, tf, df,
         |  tf * ln(((SELECT count(*) FROM documents) + 1.0) / (df + 1.0)) AS score
         | FROM tf JOIN df USING (term)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM s)
         |SELECT doc_id, CAST(rn AS INT) AS rn, term, tf, df, round(score, 6) AS score
         |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    // F96: Okapi BM25 with Lucene's non-negative idf; the length term
    // folds to one division so every score is a fixed IEEE shape
    "text_bm25" ->
      s"""WITH terms AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, dl.dl,
         |  ln(1.0 + ((SELECT count(*) FROM documents) - df + 0.5) / (df + 0.5)) *
         |   (tf * 2.2) / (tf + 1.2 * (0.25 +
         |     0.75 * CAST(dl AS DOUBLE) * (SELECT count(*) FROM documents) /
         |       (SELECT CAST(sum(dl) AS BIGINT) FROM dl))) AS score
         | FROM tf JOIN df USING (term) JOIN dl USING (doc_id)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |  ORDER BY score DESC, term) AS rn FROM s)
         |SELECT doc_id, CAST(rn AS INT) AS rn, term, tf, df, dl,
         |  round(score, 6) AS score
         |FROM r WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    // F97: NDCG@10 over the F96 BM25 ranking for the 20 highest-df probe
    // terms; graded rel = min(tf, 3), order-pinned DCG/IDCG folds
    "text_ndcg" ->
      s"""WITH terms AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |probes AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 20),
         |s AS (SELECT tf.doc_id, tf.term, p.df, tf.tf, dl.dl,
         |  ln(1.0 + ((SELECT count(*) FROM documents) - p.df + 0.5) / (p.df + 0.5)) *
         |   (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 +
         |     0.75 * CAST(dl.dl AS DOUBLE) * (SELECT count(*) FROM documents) /
         |       (SELECT CAST(sum(dl) AS BIGINT) FROM dl))) AS score,
         |  least(tf.tf, 3) AS rel
         | FROM tf JOIN probes p USING (term) JOIN dl USING (doc_id)),
         |g AS (SELECT *,
         |  CAST(CASE rel WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS BIGINT) AS gain,
         |  row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank,
         |  row_number() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS irank
         | FROM s),
         |d AS (SELECT term, sum(gain / (ln(CAST(rank + 1 AS DOUBLE)) / ln(2.0))
         |    ORDER BY rank) AS rank_sum
         | FROM g WHERE rank <= 10 GROUP BY 1),
         |i AS (SELECT term, sum(gain / (ln(CAST(irank + 1 AS DOUBLE)) / ln(2.0))
         |    ORDER BY irank) AS irank_sum
         | FROM g WHERE irank <= 10 GROUP BY 1),
         |st AS (SELECT term, CAST(max(df) AS BIGINT) AS df,
         |  CAST(count(*) AS BIGINT) AS n_docs FROM g GROUP BY 1)
         |SELECT term, df, n_docs, round(rank_sum, 6) AS dcg,
         | round(irank_sum, 6) AS idcg,
         | round(rank_sum / nullif(irank_sum, 0.0), 6) AS ndcg
         |FROM st JOIN d USING (term) JOIN i USING (term)
         |ORDER BY term""".stripMargin,
    "src_rest_oid_sweep" ->
      """WITH b AS (SELECT min(l_orderkey) mn, max(l_orderkey) mx FROM lineitem),
        |ps AS (SELECT CAST(ceil((mx - mn + 1) / 16.0) AS BIGINT) v FROM b)
        |SELECT CAST(floor(l_orderkey / (SELECT v FROM ps)) AS BIGINT) AS oid_batch,
        | count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_rest_offset_paging" ->
      """WITH x AS (SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS off FROM lineitem)
        |SELECT CAST(floor(off / 1000) AS BIGINT) AS page, count(*) AS n,
        | CAST(min(off) AS BIGINT) AS first_off, CAST(max(off) AS BIGINT) AS last_off
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_oid_page_fetch" ->
      """WITH b AS (SELECT min(l_orderkey) mn, max(l_orderkey) mx FROM lineitem),
        |ps AS (SELECT CAST(ceil((mx - mn + 1) / 16.0) AS BIGINT) v FROM b)
        |SELECT count(*) AS n, min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        | CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
        |FROM lineitem WHERE floor(l_orderkey / (SELECT v FROM ps)) = 7""".stripMargin,
    "src_atom_filterable" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        | AND l_quantity BETWEEN 10 AND 40
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the feed→entries→links protocol must recover the planted link plan
    // exactly: nation key % 3 decides the class (0 → enclosure, 1 →
    // service — filter_services is on; 2 → nothing downloadable), and a
    // download-class entry lands exactly its nation's suppliers; entries
    // whose links all skipped (and link-less entries) report class 'none'
    "src_atom_feed" ->
      """WITH e AS (
        |  SELECT r_name AS authority, CAST(n_nationkey AS BIGINT) AS entry_id,
        |    n_name AS entry_title,
        |    CASE WHEN n_nationkey % 3 = 0 THEN 'enclosure'
        |         WHEN n_nationkey % 3 = 1 THEN 'service'
        |         ELSE 'none' END AS link_class
        |  FROM nation JOIN region ON n_regionkey = r_regionkey)
        |SELECT e.authority, e.entry_id, e.entry_title, e.link_class,
        | count(s_suppkey) AS n_records,
        | CAST(coalesce(sum(s_suppkey), 0) AS BIGINT) AS key_checksum
        |FROM e LEFT JOIN supplier
        |  ON s_nationkey = e.entry_id AND e.link_class <> 'none'
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,
    // the archive build+unpack round trip must reproduce the ground truth
    // tables exactly (lossless container staging)
    "src_archive_unpack" ->
      """SELECT n_regionkey AS r_regionkey, n_name AS layer_name,
        | count(*) AS n_records, CAST(sum(s_suppkey) AS BIGINT) AS key_checksum
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // complete-after-resume coverage: every range appears once, failing
    // ranges (2 mod 5) attributed to the resume run, counts match the
    // direct per-range ground truth (a double-ingest would double them)
    "src_resume_ingest" ->
      """WITH b AS (SELECT min(l_orderkey) mn, max(l_orderkey) mx FROM lineitem),
        |ps AS (SELECT CAST(ceil((mx - mn + 1) / 16.0) AS BIGINT) v FROM b),
        |r AS (SELECT CAST(floor(l_orderkey / (SELECT v FROM ps)) AS BIGINT) AS range_id,
        |  l_orderkey FROM lineitem)
        |SELECT range_id,
        | CAST(CASE WHEN range_id % 5 = 2 THEN 2 ELSE 1 END AS INT) AS ingest_run,
        | count(*) AS n_rows, CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
        |FROM r GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "src_url_filenames" ->
      """WITH u AS (SELECT p_partkey AS key, p_name,
        |  CASE WHEN p_partkey % 5 = 0 THEN 'https://host/data/file_' || p_partkey || '.zip?token=abc'
        |       WHEN p_partkey % 5 = 1 THEN 'https://host/d/very_long_export_name_' || lpad(CAST(p_partkey AS VARCHAR), 40, '0') || CASE WHEN p_partkey % 10 = 1 THEN '.json' ELSE '.tiff' END
        |       WHEN p_partkey % 5 = 2 THEN 'https://host/api/export'
        |       WHEN p_partkey % 5 = 3 THEN 'https://host/files/My%20Report' || (p_partkey % 7) || '.csv'
        |       ELSE '?list=' || p_partkey END AS url
        | FROM part),
        |n AS (SELECT key, p_name,
        |  regexp_extract(regexp_replace(split_part(url, '?', 1), '/+$', ''), '([^/]*)$', 1) AS name_enc
        | FROM u),
        |m AS (SELECT key, p_name, name_enc,
        |  CASE WHEN replace(name_enc, '%20', ' ') = '' THEN 'download'
        |       ELSE replace(name_enc, '%20', ' ') END AS name,
        |  lower(regexp_extract(name_enc, '(\.[^./]+)$', 1)) AS ext_raw FROM n),
        |x AS (SELECT *, CASE WHEN ext_raw IN ('.zip','.json','.geojson','.gdb','.gpkg','.csv','.txt','.gz')
        |    THEN ext_raw ELSE '' END AS ext,
        |  length(name) <= 50 AND name <> 'download' AS kept FROM m),
        |sl AS (SELECT *, CASE WHEN s3 = '' THEN 'unnamed' ELSE s3 END AS slugged FROM (
        |  SELECT *, substr(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(translate(regexp_replace(
        |      lower(trim(coalesce(p_name, 'unnamed'))), 'ß', 'ss', 'g'), 'åäöéü', 'aaoeu'),
        |      ' ', '_', 'g'), '[^a-z0-9_\-]+', '_', 'g'), '_+', '_', 'g'),
        |    '^_+|_+$', '', 'g'), 1, 40) AS s3 FROM x)),
        |f AS (SELECT key,
        |  CASE WHEN kept THEN 'kept_original' ELSE 'slug_fallback' END AS rule,
        |  CASE WHEN kept THEN name ELSE slugged || ext END AS fname,
        |  CASE WHEN ext_raw <> '' AND ext = '' THEN 1 ELSE 0 END AS ext_stripped FROM sl),
        |c AS (SELECT *, CASE WHEN row_number() OVER (PARTITION BY fname ORDER BY key) > 1
        |    THEN 1 ELSE 0 END AS needs_timestamp FROM f)
        |SELECT rule, count(*) AS n,
        | CAST(sum(needs_timestamp) AS BIGINT) AS n_collisions,
        | CAST(sum(ext_stripped) AS BIGINT) AS n_ext_stripped,
        | CAST(sum(key) AS BIGINT) AS key_checksum
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
        |FROM lineitem WHERE l_quantity >= 25.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_snapshot_load" ->
      """SELECT l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1 ORDER BY 1""".stripMargin,
    // Esri JSON parse: every supplier feature lands losslessly with its
    // attributes, point coords (same synthetic arithmetic per-row —
    // bitwise-identical across engines) and the response-level SR
    "src_esri_json" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS suppkey, s_name AS name,
        | 'esriGeometryPoint' AS geometry_type, 3006 AS wkid,
        | s_suppkey * 7919 % 36000 / 100.0 - 180 AS x,
        | s_suppkey * 104729 % 18000 / 100.0 - 90 AS y
        |FROM supplier ORDER BY suppkey""".stripMargin,
    // REST layer discovery: per-region MapServer docs list nations as
    // layers; include patterns ["nation_1*", "*_2"] (12 of 25 synthetic
    // layer names match — discovery, wildcard filtering, AND per-layer
    // reconcile are all on the oracle path) translate to the anchored
    // regexes below (regexp_matches, not LIKE — SQL LIKE's `_` is a
    // wildcard, fnmatch's is literal); the single-layer FeatureServer
    // contributes itself (fallback)
    "src_rest_layers" ->
      """WITH lay AS (
        | SELECT '/rest/' || lower(regexp_replace(r_name, '[^A-Za-z0-9]+', '_', 'g'))
        |   || '/MapServer' AS service_url,
        |  CAST(n_nationkey AS BIGINT) AS layer_id, n_name AS layer_name,
        |  n_nationkey AS nk
        | FROM nation JOIN region ON n_regionkey = r_regionkey
        | WHERE regexp_matches(lower(n_name), '^nation_1.*$')
        |    OR regexp_matches(lower(n_name), '^.*_2$')),
        |per AS (
        | SELECT l.service_url, l.layer_id, l.layer_name,
        |  count(c.c_custkey) AS n_features,
        |  CAST(coalesce(sum(c.c_custkey), 0) AS BIGINT) AS key_checksum
        | FROM lay l LEFT JOIN customer c ON c.c_nationkey = l.nk
        | GROUP BY 1, 2, 3),
        |fs AS (
        | SELECT '/rest/municipal/FeatureServer' AS service_url,
        |  CAST(0 AS BIGINT) AS layer_id, 'Municipal Assets' AS layer_name,
        |  count(*) AS n_features, CAST(sum(c_custkey) AS BIGINT) AS key_checksum
        | FROM customer WHERE c_custkey % 10 = 0)
        |SELECT * FROM per UNION ALL SELECT * FROM fs
        |ORDER BY service_url, layer_id""".stripMargin,
    // every discovered collection landed exactly once: per-collection item
    // counts and checksums match the ground truth, page count = ceil(n/7),
    // and the next-link chain verified. complete ⟺ pages landed: the wire
    // produces no page for a customer-less nation, and a zero-page
    // collection must reconcile incomplete (never-fetched, r4)
    "src_ogc_collections" ->
      """WITH per AS (
        | SELECT n_name AS collection_id, count(c_custkey) AS n_items,
        |  CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS key_checksum
        | FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        | GROUP BY 1)
        |SELECT collection_id, CAST(ceil(n_items / 7.0) AS BIGINT) AS n_pages,
        | n_items, key_checksum, n_items > 0 AS complete
        |FROM per ORDER BY 1""".stripMargin,

    "etl_sanitize_names" -> {
      val reserved = graft.operators.Staging.reservedNames
        .map(r => s"'$r'").mkString(", ")
      s"""WITH c AS (SELECT p_partkey,
         |  trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g'), '_') AS cn,
         |  trim(regexp_replace(lower(p_type), '[^a-z0-9]+', '_', 'g'), '_') AS ct FROM part),
         |n AS (SELECT p_partkey,
         |  CASE WHEN length(cn) = 0 THEN 'unnamed_fc' ELSE cn END AS cn,
         |  CASE WHEN length(ct) = 0 THEN 'unnamed_fc' ELSE ct END AS ct FROM c),
         |p AS (SELECT p_partkey,
         |  substr(CASE WHEN regexp_matches(substr(cn,1,1), '^[0-9]') THEN 'fc_' || cn ELSE cn END, 1, 100) AS sn,
         |  substr(CASE WHEN regexp_matches(substr(ct,1,1), '^[0-9]') THEN 'fc_' || ct ELSE ct END, 1, 100) AS st FROM n)
         |SELECT p_partkey,
         | CASE WHEN sn IN ($reserved) THEN sn || '_data' ELSE sn END AS safe_name,
         | CASE WHEN st IN ($reserved) THEN st || '_data' ELSE st END AS safe_type
         |FROM p ORDER BY p_partkey""".stripMargin
    },
    "etl_schema_normalize" ->
      """SELECT CAST(c_custkey AS BIGINT) AS custkey, upper(trim(c_name)) AS name,
        | CAST(c_nationkey AS BIGINT) AS nationkey,
        | CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        | coalesce(c_mktsegment, 'UNKNOWN') AS segment
        |FROM customer ORDER BY custkey""".stripMargin,
    "etl_geomtype_split" ->
      """WITH t AS (SELECT p_brand, CASE CAST(p_partkey % 3 AS INT)
        |   WHEN 0 THEN 'Point' WHEN 1 THEN 'LineString' ELSE 'Polygon' END AS geom_type FROM part),
        |c AS (SELECT p_brand, geom_type, count(*) AS n FROM t GROUP BY 1, 2),
        |r AS (SELECT p_brand, geom_type, n,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY n DESC, geom_type) AS rn FROM c)
        |SELECT p_brand, geom_type AS dominant_type, CAST(n AS BIGINT) AS n_features
        |FROM r WHERE rn = 1 ORDER BY p_brand""".stripMargin,
    // declared-vs-dominant geometry classification: both types collapse
    // through the GeoJSON→ArcGIS shape map; mismatch with a mappable
    // dominant type salvages via the explicit-geometry fallback (staging
    // only dominant-shape features), unmappable dominant fails
    "etl_geomtype_fallback" ->
      """WITH f AS (
        | SELECT p_brand AS source,
        |  CASE CAST(substr(p_brand, 7) AS INT) % 4
        |   WHEN 0 THEN 'Point' WHEN 1 THEN 'LineString' WHEN 2 THEN 'Polygon'
        |   ELSE 'MultiPolygon' END AS declared_type,
        |  CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'Point' WHEN 1 THEN 'MultiPoint'
        |   WHEN 2 THEN 'LineString' WHEN 3 THEN 'MultiLineString'
        |   ELSE 'Polygon' END AS geom_type
        | FROM part),
        |m AS (SELECT *, CASE WHEN geom_type = 'Point' THEN 'Point'
        |  WHEN geom_type = 'MultiPoint' THEN 'Multipoint'
        |  WHEN geom_type IN ('LineString', 'MultiLineString') THEN 'Polyline'
        |  WHEN geom_type IN ('Polygon', 'MultiPolygon') THEN 'Polygon'
        |  ELSE 'Unknown' END AS shape_type FROM f),
        |c AS (SELECT source, declared_type, geom_type, shape_type, count(*) AS n
        | FROM m GROUP BY 1, 2, 3, 4),
        |d AS (SELECT source, declared_type, geom_type AS dominant_type,
        |  shape_type AS dominant_shape,
        |  row_number() OVER (PARTITION BY source ORDER BY n DESC, geom_type) AS rn FROM c),
        |dom AS (SELECT * FROM d WHERE rn = 1),
        |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_features FROM c GROUP BY 1),
        |stg AS (SELECT c.source, CAST(sum(c.n) AS BIGINT) AS n_dominant
        | FROM c JOIN dom ON c.source = dom.source AND c.shape_type = dom.dominant_shape
        | GROUP BY 1)
        |SELECT dom.source, dom.declared_type, dom.dominant_type,
        | CASE WHEN dom.dominant_shape = 'Unknown' THEN 'failed'
        |  WHEN (CASE WHEN dom.declared_type = 'Point' THEN 'Point'
        |   WHEN dom.declared_type = 'MultiPoint' THEN 'Multipoint'
        |   WHEN dom.declared_type IN ('LineString', 'MultiLineString') THEN 'Polyline'
        |   WHEN dom.declared_type IN ('Polygon', 'MultiPolygon') THEN 'Polygon'
        |   ELSE 'Unknown' END) = dom.dominant_shape THEN 'match'
        |  ELSE 'fallback' END AS status,
        | tot.n_features,
        | CASE WHEN dom.dominant_shape = 'Unknown' THEN CAST(0 AS BIGINT)
        |  ELSE stg.n_dominant END AS n_staged
        |FROM dom JOIN tot ON dom.source = tot.source
        | JOIN stg ON dom.source = stg.source
        |ORDER BY dom.source""".stripMargin,
    "etl_best_candidate" ->
      """WITH r AS (SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
        |  row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
        | FROM supplier)
        |SELECT CAST(s_nationkey AS INT) AS nationkey, s_suppkey AS best_suppkey,
        | s_name AS best_name, s_acctbal AS best_acctbal
        |FROM r WHERE rn = 1 ORDER BY nationkey""".stripMargin,

    "etl_null_audit" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
        | CAST(sum(CASE WHEN l_returnflag IS NULL OR length(l_returnflag) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS blank_returnflag,
        | CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_quantity,
        | CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
        | CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_shipdate
        |FROM lineitem""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "geo_bbox_clip" ->
      s"""WITH c AS ($synthXY)
         |SELECT o_orderkey, x, y FROM c
         |WHERE x >= 400000 AND x <= 600000 AND y >= 6500000 AND y <= 7000000
         |ORDER BY o_orderkey""".stripMargin,
    "geo_reproject" ->
      """WITH c AS (SELECT o_orderkey,
        |  10.0 + ((o_orderkey * 7919) % 1500001) / 100000.0 AS lon,
        |  55.0 + ((o_orderkey * 104729) % 1500001) / 100000.0 AS lat
        | FROM orders WHERE o_orderkey % 20 = 0)
        |SELECT o_orderkey, lon, lat,
        | round(radians(lon) * 6378137.0, 2) AS mx,
        | round(ln(tan(pi() / 4 + radians(lat) / 2)) * 6378137.0, 2) AS my
        |FROM c ORDER BY o_orderkey""".stripMargin,
    // same Krüger series, same double literals, hyperbolics expanded to
    // exp/ln on both engines (forwardSql emits the tree from the same
    // Scala constants)
    "geo_reproject_tm" ->
      s"""WITH c AS (SELECT o_orderkey,
         |  10.0 + ((o_orderkey * 7919) % 1500001) / 100000.0 AS lon,
         |  55.0 + ((o_orderkey * 104729) % 1500001) / 100000.0 AS lat
         | FROM orders WHERE o_orderkey % 20 = 0),
         |${graft.functions.Kruger.forwardSql("c")}
         |SELECT o_orderkey, lon, lat, round(easting, 2) AS easting,
         | round(northing, 2) AS northing
         |FROM tm ORDER BY o_orderkey""".stripMargin,
    // EPSG:3010 (SWEREF99 16 30): identical series tree, zone constants
    // (cm 16.5°, k0=1, FE=150km) interpolated from the same instance
    "geo_reproject_tm3010" ->
      s"""WITH c AS (SELECT o_orderkey,
         |  10.0 + ((o_orderkey * 7919) % 1500001) / 100000.0 AS lon,
         |  55.0 + ((o_orderkey * 104729) % 1500001) / 100000.0 AS lat
         | FROM orders WHERE o_orderkey % 20 = 0),
         |${graft.functions.Sweref991630.forwardSql("c")}
         |SELECT o_orderkey, lon, lat, round(easting, 2) AS easting,
         | round(northing, 2) AS northing
         |FROM tm ORDER BY o_orderkey""".stripMargin,
    // C2d: the reprojection DECISION rule (explicit datum transformation
    // only for the 4326→3010 pair; noop on same-SR; defaults otherwise)
    "geo_transform_select" ->
      s"""WITH f AS (SELECT o_orderkey,
         |  CAST(CASE o_orderkey % 5 WHEN 0 THEN 3010 WHEN 1 THEN 4326
         |       WHEN 2 THEN 3006 WHEN 3 THEN 2400 ELSE 3857 END AS BIGINT)
         |    AS current_wkid
         | FROM orders),
         |d AS (SELECT o_orderkey, current_wkid,
         |  CASE WHEN current_wkid = 3010 THEN 'noop' ELSE 'project' END AS action,
         |  CASE WHEN current_wkid = 3010 THEN NULL
         |       WHEN current_wkid = 4326 THEN 'WGS_1984_To_SWEREF99'
         |       ELSE 'defaults' END AS transformation
         | FROM f)
         |SELECT current_wkid, action, transformation,
         | CAST(count(*) AS BIGINT) AS n,
         | min(o_orderkey) AS first_key
         |FROM d GROUP BY 1, 2, 3 ORDER BY current_wkid, action""".stripMargin,
    // C13: ray-cast parity against the SAME concave polygon — the CASE
    // terms are generated from Geo.PipPoly, so engine and oracle replay
    // one boundary in exact int64 arithmetic
    "geo_pip_raycast" ->
      s"""WITH p AS (SELECT o_orderkey,
         |  150000 + (o_orderkey * 7919) % 800001 AS xi,
         |  6050000 + (o_orderkey * 104729) % 1700001 AS yi
         | FROM orders WHERE o_orderkey % 7 = 0)
         |SELECT o_orderkey, xi, yi,
         | CAST(CASE WHEN ($pipTermsSql) % 2 = 1 THEN 1 ELSE 0 END AS INT) AS inside
         |FROM p ORDER BY o_orderkey""".stripMargin,
    // C14: first-match zone assignment (raycast polygon > bbox > outside)
    // C15: the same integer point model, a range-join neighbor search
    // (the oracle needs no grid — the grid is the ENGINE's scale
    // strategy, the semantics are pure eps-distance), core threshold,
    // recursive min-label reachability, and the min-adjacent border rule
    "geo_dbscan" ->
      """WITH RECURSIVE pts AS MATERIALIZED (SELECT o_orderkey AS id,
        |  CAST(CASE WHEN o_orderkey % 20 = 0
        |    THEN 150000 + (o_orderkey * 7919) % 800001
        |    ELSE 250000 + ((o_orderkey % 42) % 7) * 80000
        |      + (o_orderkey * 7919) % 16001 - 8000 END AS BIGINT) AS xi,
        |  CAST(CASE WHEN o_orderkey % 20 = 0
        |    THEN 6050000 + (o_orderkey * 104729) % 1700001
        |    ELSE 6200000 + ((o_orderkey % 42) // 7) * 80000
        |      + (o_orderkey * 104729) % 16001 - 8000 END AS BIGINT) AS yi
        | FROM orders WHERE o_orderkey % 5 = 0),
        |nb AS MATERIALIZED (SELECT a.id, b.id AS nid FROM pts a JOIN pts b
        | ON b.xi BETWEEN a.xi - 3000 AND a.xi + 3000
        |  AND b.yi BETWEEN a.yi - 3000 AND a.yi + 3000
        |  AND a.id <> b.id
        |  AND (a.xi - b.xi) * (a.xi - b.xi)
        |    + (a.yi - b.yi) * (a.yi - b.yi) <= 9000000),
        |core AS MATERIALIZED (SELECT id FROM nb GROUP BY id
        | HAVING count(*) >= 5),
        |ce AS MATERIALIZED (SELECT nb.id AS src, nb.nid AS dst FROM nb
        | JOIN core c1 ON c1.id = nb.id JOIN core c2 ON c2.id = nb.nid),
        |r AS (SELECT src AS node, src AS label FROM ce
        | UNION SELECT ce.dst, r.label FROM r JOIN ce ON r.node = ce.src),
        |cl AS MATERIALIZED (SELECT node, min(label) AS cluster FROM r GROUP BY 1),
        |ac AS MATERIALIZED (SELECT c.id, COALESCE(cl.cluster, c.id) AS cluster
        | FROM core c LEFT JOIN cl ON cl.node = c.id),
        |bd AS MATERIALIZED (SELECT nb.id, min(a2.cluster) AS cluster FROM nb
        | JOIN ac a2 ON a2.id = nb.nid
        | WHERE nb.id NOT IN (SELECT id FROM core)
        | GROUP BY nb.id)
        |SELECT p.id, p.xi, p.yi,
        | CASE WHEN ac.id IS NOT NULL THEN 'core'
        |      WHEN bd.id IS NOT NULL THEN 'border'
        |      ELSE 'noise' END AS role,
        | COALESCE(ac.cluster, bd.cluster) AS cluster
        |FROM pts p LEFT JOIN ac ON ac.id = p.id LEFT JOIN bd ON bd.id = p.id
        |ORDER BY p.id""".stripMargin,
    // replayed with the same generated crossing terms, one rollup
    "geo_zonal_stats" ->
      s"""WITH p AS (SELECT o_orderkey,
         |  150000 + (o_orderkey * 7919) % 800001 AS xi,
         |  6050000 + (o_orderkey * 104729) % 1700001 AS yi,
         |  o_orderkey % 1000 AS v
         | FROM orders),
         |z AS (SELECT *,
         |  CASE WHEN ($pipTermsSql) % 2 = 1 THEN 'aoi_polygon'
         |       WHEN xi BETWEEN 400000 AND 600000 AND yi BETWEEN 6500000 AND 7000000
         |        THEN 'aoi_bbox'
         |       ELSE 'outside' END AS zone
         | FROM p)
         |SELECT zone, CAST(count(*) AS BIGINT) AS n_features,
         | min(xi) AS min_x, max(xi) AS max_x,
         | min(yi) AS min_y, max(yi) AS max_y,
         | CAST(sum(v) AS BIGINT) AS sum_value,
         | min(o_orderkey) AS first_key
         |FROM z GROUP BY 1 ORDER BY zone""".stripMargin,
    "geo_sr_validate" ->
      s"""WITH c AS (SELECT *,
         |  ((o_orderkey * 31) % 400) - 200.0 AS glon,
         |  ((o_orderkey * 37) % 200) - 100.0 AS glat
         | FROM ($synthXY))
         |SELECT
         | CAST(sum(CASE WHEN x >= 200000 AND x <= 900000 AND y >= 6100000 AND y <= 7700000 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_sweref,
         | CAST(sum(CASE WHEN NOT (x >= 200000 AND x <= 900000 AND y >= 6100000 AND y <= 7700000) THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid_sweref,
         | CAST(sum(CASE WHEN glon >= -180 AND glon <= 180 AND glat >= -90 AND glat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_wgs84,
         | CAST(sum(CASE WHEN NOT (glon >= -180 AND glon <= 180 AND glat >= -90 AND glat <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid_wgs84,
         | CAST(sum(CASE WHEN glon >= 10 AND glon <= 25 AND glat >= 55 AND glat <= 70 THEN 1 ELSE 0 END) AS BIGINT) AS n_sweden_wgs84
         |FROM c""".stripMargin,
    "geo_envelope_check" ->
      s"""WITH c AS ($synthXY),
         |e AS (SELECT o_orderstatus, min(x) AS xmin, min(y) AS ymin, max(x) AS xmax, max(y) AS ymax
         | FROM c WHERE x >= 400000 AND x <= 600000 AND y >= 6500000 AND y <= 7000000
         | GROUP BY o_orderstatus)
         |SELECT o_orderstatus, xmin, ymin, xmax, ymax,
         | CAST(abs(xmin - 400000.0) <= 20000.0 AND abs(ymin - 6500000.0) <= 50000.0
         |  AND abs(xmax - 600000.0) <= 20000.0 AND abs(ymax - 7000000.0) <= 50000.0 AS INT) AS envelope_ok
         |FROM e ORDER BY o_orderstatus""".stripMargin,
    "geo_count_sanity" ->
      s"""WITH c AS ($synthXY),
         |n AS (SELECT
         |  CAST(sum(CASE WHEN x >= 450000 AND x <= 550000 AND y >= 6600000 AND y <= 6900000 THEN 1 ELSE 0 END) AS BIGINT) AS small_n,
         |  CAST(sum(CASE WHEN x >= 400000 AND x <= 600000 AND y >= 6500000 AND y <= 7000000 THEN 1 ELSE 0 END) AS BIGINT) AS large_n
         | FROM c)
         |SELECT small_n, large_n, CAST(small_n <= large_n AS INT) AS sane,
         | CAST(CAST(small_n AS DOUBLE) / large_n >= 0.1 AS INT) AS ratio_ok FROM n""".stripMargin,
    "geo_sr_infer" ->
      """WITH c AS (SELECT
        |  CASE WHEN o_orderkey % 2 = 0 THEN ((o_orderkey * 31) % 400) - 200.0
        |       ELSE CAST(150000 + (o_orderkey * 7919) % 800001 AS DOUBLE) END AS cx,
        |  CASE WHEN o_orderkey % 2 = 0 THEN ((o_orderkey * 37) % 200) - 100.0
        |       ELSE CAST(6050000 + (o_orderkey * 104729) % 1700001 AS DOUBLE) END AS cy
        | FROM orders)
        |SELECT CASE WHEN cx >= -180 AND cx <= 180 AND cy >= -90 AND cy <= 90 THEN 4326
        |  WHEN cx >= 200000 AND cx <= 900000 AND cy >= 6100000 AND cy <= 7700000 THEN 3006
        |  ELSE 0 END AS inferred_sr, count(*) AS n
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // C16: declared-CRS parse replayed on the SAME name strings with SQL
    // string ops (str_split(...)[2] = Python split('EPSG:')[1], the text
    // BETWEEN the first and second occurrence — substr-to-end would read
    // 'EPSG:12EPSG:34' as one unparseable token where the engine sees
    // '12'; then space-split, TRY_CAST = the reference's try/except int),
    // reconciled against the C6 magnitude inference on the same planted
    // coordinate regimes
    "geo_sr_declared" ->
      """WITH d AS (SELECT o_orderkey AS doc_id,
        |    CAST(o_orderkey % 24 AS INT) AS source FROM orders),
        |v AS (SELECT doc_id, source, source % 6 AS variant,
        |    (source // 6) % 3 AS regime FROM d),
        |nm AS (SELECT *, CASE variant
        |    WHEN 0 THEN 'EPSG:3006' WHEN 1 THEN 'EPSG:4326'
        |    WHEN 2 THEN 'urn:ogc:def:crs:EPSG::3006'
        |    WHEN 4 THEN 'crs84'
        |    WHEN 5 THEN 'EPSG:3006 (SWEREF99 TM)' END AS crs_name FROM v),
        |dec AS (SELECT *, CASE
        |    WHEN variant = 3 THEN 4326
        |    WHEN strpos(crs_name, 'EPSG:') > 0 THEN COALESCE(TRY_CAST(
        |      nullif(regexp_extract(COALESCE(str_split(crs_name, 'EPSG:')[2], ''),
        |        '^\s*(\S+)', 1), '') AS INT), 0)
        |    WHEN upper(crs_name) = 'CRS84' THEN 4326
        |    ELSE 0 END AS declared_sr FROM nm),
        |co AS (SELECT *,
        |    CASE regime WHEN 0 THEN (doc_id * 31) % 360 - 180
        |      WHEN 1 THEN 250000 + (doc_id * 7919) % 600001
        |      ELSE 2000000 + (doc_id * 7919) % 1000000 END AS cx,
        |    CASE regime WHEN 0 THEN (doc_id * 37) % 180 - 90
        |      WHEN 1 THEN 6200000 + (doc_id * 104729) % 1400001
        |      ELSE 1000000 + (doc_id * 104729) % 1000000 END AS cy FROM dec),
        |inf AS (SELECT *, CASE
        |    WHEN cx >= -180 AND cx <= 180 AND cy >= -90 AND cy <= 90 THEN 4326
        |    WHEN cx >= 200000 AND cx <= 900000 AND cy >= 6100000 AND cy <= 7700000 THEN 3006
        |    ELSE 0 END AS inferred_sr FROM co)
        |SELECT source, declared_sr, inferred_sr,
        |  CASE WHEN inferred_sr = 0 THEN 'uninferable'
        |    WHEN declared_sr = 0 THEN 'undeclared'
        |    WHEN declared_sr <> inferred_sr THEN 'mismatch'
        |    ELSE 'consistent' END AS sr_class,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS doc_checksum
        |FROM inf GROUP BY 1, 2, 3, 4 ORDER BY source""".stripMargin,

    "geo_polygon_clip" -> {
      val edges = {
        val vs = graft.operators.Geo.hexVerts
        vs.indices.map { i =>
          val (x1, y1) = vs(i)
          val (x2, y2) = vs((i + 1) % 6)
          s"(${x2 - x1} * (y - $y1) - ${y2 - y1} * (x - $x1)) >= 0.0"
        }.mkString(" AND ")
      }
      s"""WITH c AS ($synthXY)
         |SELECT o_orderkey, x, y FROM c WHERE $edges ORDER BY o_orderkey""".stripMargin
    },
    "geo_wkt_roundtrip" ->
      """WITH c AS (SELECT o_orderkey,
        |  150000 + (o_orderkey * 7919) % 800001 AS xi,
        |  6050000 + (o_orderkey * 104729) % 1700001 AS yi FROM orders),
        |w AS (SELECT o_orderkey,
        |  'POINT (' || CAST(xi AS VARCHAR) || ' ' || CAST(yi AS VARCHAR) || ')' AS wkt FROM c)
        |SELECT o_orderkey, wkt,
        | CAST(regexp_extract(wkt, 'POINT \(([0-9]+) ([0-9]+)\)', 1) AS DOUBLE) AS px,
        | CAST(regexp_extract(wkt, 'POINT \(([0-9]+) ([0-9]+)\)', 2) AS DOUBLE) AS py
        |FROM w ORDER BY o_orderkey""".stripMargin,
    "geo_measures" ->
      """WITH g AS (SELECT o_orderkey,
        |  CAST((o_orderkey * 7919) % 10000 AS DOUBLE) AS x1,
        |  CAST((o_orderkey * 104729) % 10000 AS DOUBLE) AS y1,
        |  CAST((o_orderkey * 131) % 10000 AS DOUBLE) AS x2,
        |  CAST((o_orderkey * 151) % 10000 AS DOUBLE) AS y2,
        |  CAST((o_orderkey * 173) % 10000 AS DOUBLE) AS x3,
        |  CAST((o_orderkey * 193) % 10000 AS DOUBLE) AS y3
        | FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey,
        | round(abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) / 2.0, 4) AS area,
        | round(sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
        |   + sqrt((x3 - x2) * (x3 - x2) + (y3 - y2) * (y3 - y2))
        |   + sqrt((x1 - x3) * (x1 - x3) + (y1 - y3) * (y1 - y3)), 4) AS perimeter
        |FROM g ORDER BY o_orderkey""".stripMargin,
    "geo_zorder_buckets" ->
      s"""WITH c AS ($synthXY),
         |${graft.operators.Geo.zorderSql}
         |SELECT bucket, count(*) AS n,
         | CAST(max(x) - min(x) AS BIGINT) AS x_extent,
         | CAST(max(y) - min(y) AS BIGINT) AS y_extent
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    // brute-force ground truth: the grid+ring+fallback plan must produce
    // the true nearest for every probe (distances are integer-exact)
    "geo_nearest_join" ->
      """WITH pts AS (SELECT o_orderkey,
        |  CAST(150000 + (o_orderkey * 7919) % 800001 AS DOUBLE) AS x,
        |  CAST(6050000 + (o_orderkey * 104729) % 1700001 AS DOUBLE) AS y FROM orders),
        |pr AS (SELECT s_suppkey,
        |  CAST(150000 + (s_suppkey * 6007) % 800001 AS DOUBLE) AS px,
        |  CAST(6050000 + (s_suppkey * 9973) % 1700001 AS DOUBLE) AS py FROM supplier),
        |d AS (SELECT s_suppkey, o_orderkey,
        |  (x - px) * (x - px) + (y - py) * (y - py) AS d2 FROM pr CROSS JOIN pts),
        |r AS (SELECT *, row_number() OVER (PARTITION BY s_suppkey ORDER BY d2, o_orderkey) AS rn
        | FROM d)
        |SELECT s_suppkey, o_orderkey AS nearest_orderkey, CAST(d2 AS BIGINT) AS dist2
        |FROM r WHERE rn = 1 ORDER BY s_suppkey""".stripMargin,
    "load_append_dedup" ->
      """SELECT o_orderpriority, count(*) AS loaded_rows,
        | round(sum(o_totalprice), 2) AS loaded_value
        |FROM orders WHERE o_orderstatus = 'O' GROUP BY 1 ORDER BY 1""".stripMargin,
    "load_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "load_cdc_merge" ->
      """WITH cur AS (SELECT o_orderkey, o_totalprice AS cur_value FROM orders
        |  WHERE o_orderkey % 3 <> 0),
        |inc AS (SELECT o_orderkey, o_totalprice + 10.0 AS new_value FROM orders
        |  WHERE o_orderkey % 2 = 0),
        |m AS (SELECT coalesce(cur.o_orderkey, inc.o_orderkey) AS k,
        |  CASE WHEN cur_value IS NOT NULL AND new_value IS NOT NULL THEN 'updated'
        |       WHEN new_value IS NOT NULL THEN 'inserted' ELSE 'retained' END AS action,
        |  coalesce(new_value, cur_value) AS value
        | FROM cur FULL OUTER JOIN inc ON cur.o_orderkey = inc.o_orderkey)
        |SELECT action, count(*) AS n, round(sum(value), 2) AS value_sum
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // the four-generation history replayed via arg_max latest-wins; the
    // D35: the oracle restates the declared predicates verbatim — one
    // conditional-agg scan, then one branch per constraint off the single
    // agg row; the SQL is GENERATED from the same (name, predicate) list
    // order the engine declares, so the two can't drift
    "load_check_constraints" -> {
      val aggCols = checkDefsSql.zipWithIndex.flatMap { case ((_, p), i) =>
        Seq(s"sum(CASE WHEN NOT ($p) THEN 1 ELSE 0 END) AS v$i",
          s"COALESCE(min(CASE WHEN NOT ($p) THEN l_orderkey END), -1) AS k$i") }
      val branches = checkDefsSql.zipWithIndex.map { case ((n, _), i) =>
        s"SELECT '$n' AS constraint_name, n_rows, CAST(v$i AS BIGINT) AS n_viol, " +
          s"CAST(v$i * 1000000 // n_rows AS BIGINT) AS viol_ppm, " +
          s"CAST(k$i AS BIGINT) AS first_bad_key FROM s" }
      s"WITH s AS (SELECT count(*) AS n_rows, ${aggCols.mkString(", ")} FROM lineitem)\n" +
        branches.mkString("\nUNION ALL\n") + "\nORDER BY constraint_name"
    },
    // H5: the composed curation pipeline replayed stage by stage — the
    // F49 chunk CTEs (fully-first-owned gate), F60 novelty at k=4 over
    // survivors, the F53 recurrence (k=4, unrolled, MATERIALIZED) with
    // the hub cap, and the F55 permutation checksum. Thresholds match
    // the engine defaults (novelty ≥ 960000 ppm, pr ≤ 1500000 ppm).
    "pipeline_curation" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""pr$i AS MATERIALIZED (SELECT n.doc_id,
           |  CAST(150000 + (850000 * COALESCE(s.infl, 0)) // 1000000 AS BIGINT) AS pr
           | FROM n LEFT JOIN (
           |   SELECT e.dst AS doc_id, sum((p.pr * e.w) // ow.tw) AS infl
           |   FROM e JOIN pr${i - 1} p ON p.doc_id = e.src
           |   JOIN ow ON ow.src = e.src GROUP BY 1) s USING (doc_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH wired AS MATERIALIZED (SELECT doc_id,
         |  CASE WHEN doc_id % 7 = 0
         |       THEN '${graft.operators.Dedup.ParagraphBoiler} ' || text
         |       ELSE text END AS text
         | FROM documents),
         |wt AS MATERIALIZED (SELECT doc_id,
         |  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0)) AS BIGINT) AS n_tok FROM wired),
         |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM wired),
         |w0 AS (SELECT doc_id, unnest(toks) AS word,
         |  generate_subscripts(toks, 1) AS ord FROM tk),
         |c0 AS (SELECT doc_id, CAST(floor((ord - 1) / 20.0) AS BIGINT) AS ci,
         |  string_agg(word, ' ' ORDER BY ord) AS chunk FROM w0 GROUP BY 1, 2),
         |c AS (SELECT doc_id, ci, md5(chunk) AS h FROM c0 WHERE length(chunk) > 0),
         |kp AS (SELECT h, min(doc_id * 1000000 + ci) AS kk FROM c GROUP BY 1),
         |pd AS (SELECT c.doc_id, count(*) AS nc,
         |  sum(CASE WHEN c.doc_id * 1000000 + c.ci = kp.kk THEN 1 ELSE 0 END) AS nk
         | FROM c JOIN kp USING (h) GROUP BY 1),
         |s2 AS MATERIALIZED (SELECT doc_id FROM pd WHERE nk = nc),
         |t2 AS MATERIALIZED (SELECT w2.doc_id, toks FROM
         |  (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
         |     x -> len(x) > 0) AS toks FROM wired) w2
         |  JOIN s2 USING (doc_id)),
         |g0 AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 4
         |  THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 3 AS INT)), ' ')
         |        for i in range(1, len(toks) - 2)]
         |  ELSE [] END) AS gram FROM t2),
         |g AS MATERIALIZED (SELECT DISTINCT doc_id, gram FROM g0),
         |own AS (SELECT gram, min(doc_id) AS ow FROM g GROUP BY 1),
         |nv AS (SELECT g.doc_id, count(*) AS nd,
         |  sum(CASE WHEN own.ow = g.doc_id THEN 1 ELSE 0 END) AS novel
         | FROM g JOIN own USING (gram) GROUP BY 1),
         |s3 AS MATERIALIZED (SELECT doc_id FROM nv
         |  WHERE novel * 1000000 // nd >= 960000),
         |g3 AS MATERIALIZED (SELECT g.doc_id, g.gram FROM g JOIN s3 USING (doc_id)),
         |f AS (SELECT gram FROM g3 GROUP BY gram HAVING count(*) BETWEEN 2 AND 32),
         |o3 AS MATERIALIZED (SELECT g3.doc_id, g3.gram FROM g3 JOIN f USING (gram)),
         |e AS MATERIALIZED (SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS w
         | FROM o3 a JOIN o3 b ON a.gram = b.gram AND a.doc_id <> b.doc_id
         | GROUP BY 1, 2),
         |ow AS MATERIALIZED (SELECT src, sum(w) AS tw FROM e GROUP BY 1),
         |n AS (SELECT doc_id FROM s3),
         |pr0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr FROM n),
         |$iterCtes,
         |s4 AS MATERIALIZED (SELECT doc_id FROM pr5 WHERE pr <= 1500000),
         |sh AS MATERIALIZED (SELECT doc_id,
         |  row_number() OVER (ORDER BY (doc_id % 1000000007) * 999999937 % 1000000007,
         |    doc_id) - 1 AS rk FROM s4),
         |agg AS (SELECT
         |  (SELECT count(*) FROM wired) AS a_docs,
         |  (SELECT CAST(sum(n_tok) AS BIGINT) FROM wt) AS a_toks,
         |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM wired) AS a_ids,
         |  (SELECT count(*) FROM s2) AS b_docs,
         |  (SELECT CAST(COALESCE(sum(n_tok), 0) AS BIGINT) FROM wt JOIN s2 USING (doc_id)) AS b_toks,
         |  (SELECT CAST(COALESCE(sum(doc_id), 0) AS BIGINT) FROM s2) AS b_ids,
         |  (SELECT count(*) FROM s3) AS c_docs,
         |  (SELECT CAST(COALESCE(sum(n_tok), 0) AS BIGINT) FROM wt JOIN s3 USING (doc_id)) AS c_toks,
         |  (SELECT CAST(COALESCE(sum(doc_id), 0) AS BIGINT) FROM s3) AS c_ids,
         |  (SELECT count(*) FROM s4) AS d_docs,
         |  (SELECT CAST(COALESCE(sum(n_tok), 0) AS BIGINT) FROM wt JOIN s4 USING (doc_id)) AS d_toks,
         |  (SELECT CAST(COALESCE(sum(doc_id), 0) AS BIGINT) FROM s4) AS d_ids,
         |  (SELECT count(DISTINCT rk % 16) FROM sh) AS sh_shards,
         |  (SELECT CAST(COALESCE(sum((rk % 16) * 1000000 + rk // 16), 0) AS BIGINT) FROM sh) AS sh_checksum)
         |SELECT * FROM (
         | SELECT CAST(1 AS INT) AS stage_ord, 'ingest' AS stage,
         |   a_docs AS units_in, a_docs AS units_out, a_toks AS tokens_out,
         |   a_ids AS id_checksum FROM agg
         | UNION ALL SELECT 2, 'para_dedup', a_docs, b_docs, b_toks, b_ids FROM agg
         | UNION ALL SELECT 3, 'novelty_gate', b_docs, c_docs, c_toks, c_ids FROM agg
         | UNION ALL SELECT 4, 'hub_cap', c_docs, d_docs, d_toks, d_ids FROM agg
         | UNION ALL SELECT 5, 'shard_order', d_docs, sh_shards, d_toks,
         |   sh_checksum FROM agg)
         |ORDER BY stage_ord""".stripMargin
    },
    // H1l: the branch life cycle's observable state at each step — main
    // and branch row counts resolved through their pointers — replayed
    // from the status slices; outcomes are the declared decisions
    "pipeline_branch" ->
      """WITH c AS (SELECT
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        | FROM orders)
        |SELECT CAST(1 AS BIGINT) AS step_ord, 'publish_main' AS step,
        |  CAST(f AS BIGINT) AS main_rows, CAST(0 AS BIGINT) AS branch_rows,
        |  'published' AS outcome FROM c
        |UNION ALL SELECT 2, 'branch_write', f, o, 'isolated' FROM c
        |UNION ALL SELECT 3, 'merge', o, 0, 'fast_forward' FROM c
        |UNION ALL SELECT 4, 'diverge', p, f, 'isolated' FROM c
        |UNION ALL SELECT 5, 'merge_diverged', p, f, 'conflict' FROM c
        |ORDER BY step_ord""".stripMargin,
    // H1k: the audit/publish decision replayed from the same constraint
    // list — attempt 1 stages the constraint-clean slice (0 violations,
    // published), attempt 2 the complement (rejected; live state frozen)
    "pipeline_wap" -> {
      val allOk = checkDefsSql.map { case (_, p) => s"($p)" }.mkString(" AND ")
      val violSum = checkDefsSql.map { case (_, p) =>
        s"sum(CASE WHEN NOT ($p) THEN 1 ELSE 0 END)" }.mkString(" + ")
      s"""WITH good AS (SELECT count(*) AS n FROM lineitem WHERE $allOk),
         |bad AS (SELECT CAST($violSum AS BIGINT) AS v, count(*) AS n
         |  FROM lineitem WHERE NOT ($allOk))
         |SELECT CAST(1 AS BIGINT) AS attempt, (SELECT n FROM good) AS staged_rows,
         |  CAST(0 AS BIGINT) AS n_viol, 'published' AS decision,
         |  CAST(1 AS BIGINT) AS live_versions, (SELECT n FROM good) AS live_rows
         |UNION ALL
         |SELECT 2, (SELECT n FROM bad), (SELECT v FROM bad), 'rejected',
         |  1, (SELECT n FROM good)
         |ORDER BY attempt""".stripMargin
    },
    // delete sentinel value keeps arg NULL semantics out of the compare
    "load_changelog_apply" ->
      """WITH log AS (
        | SELECT o_orderkey AS key, 0 AS seq, 'I' AS op, o_totalprice AS value FROM orders
        | UNION ALL SELECT o_orderkey, 1, 'U', round(o_totalprice + 10.0, 2)
        |   FROM orders WHERE o_orderkey % 2 = 0
        | UNION ALL SELECT o_orderkey, 2, 'D', 0.0 FROM orders WHERE o_orderkey % 5 = 0
        | UNION ALL SELECT o_orderkey, 3, 'I', 7.5 FROM orders WHERE o_orderkey % 10 = 0),
        |last AS (SELECT key, arg_max(op, seq) AS op, arg_max(value, seq) AS value
        | FROM log GROUP BY 1)
        |SELECT op AS final_op, count(*) AS n_keys,
        | CAST(sum(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
        | round(sum(CASE WHEN op <> 'D' THEN value END), 2) AS value_sum,
        | CAST(sum(CASE WHEN op <> 'D' THEN key ELSE 0 END) AS BIGINT) AS key_checksum
        |FROM last GROUP BY 1 ORDER BY 1""".stripMargin,
    "load_partitioned_prune" ->
      """WITH b AS (SELECT min(l_orderkey) mn, max(l_orderkey) mx FROM lineitem),
        |ps AS (SELECT CAST(ceil((mx - mn + 1) / 16.0) AS BIGINT) v FROM b),
        |r AS (SELECT CAST(floor(l_orderkey / (SELECT v FROM ps)) AS BIGINT) AS oid_batch,
        |  l_orderkey FROM lineitem)
        |SELECT oid_batch, count(*) AS n, CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
        |FROM r WHERE oid_batch IN (2, 3, 5) GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_salted_join" ->
      """WITH ev AS (SELECT *, CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END AS join_key FROM events),
        |d AS (SELECT DISTINCT join_key, (join_key * 7) % 100 AS score FROM ev)
        |SELECT event_type, count(*) AS n, CAST(sum(score) AS BIGINT) AS sum_score
        |FROM ev JOIN d USING (join_key) GROUP BY 1 ORDER BY 1""".stripMargin,
    "load_truncate_load" ->
      """SELECT o_orderpriority, count(*) AS loaded_rows,
        | round(sum(o_totalprice), 2) AS loaded_value
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1""".stripMargin,
    "mon_source_summary" ->
      """SELECT event_type AS source, count(*) AS n_runs,
        | CAST(sum(CASE WHEN value >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
        | round(CAST(sum(CASE WHEN value >= 1.0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS success_rate,
        | round(avg(value), 2) AS avg_duration,
        | round(sum(value), 2) AS total_duration,
        | CAST(sum(TRY_CAST(nullif(regexp_extract(props, 'k":\s*([0-9]+)', 1), '') AS BIGINT)) AS BIGINT) AS total_retries
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "mon_authority_rollup" ->
      """SELECT 'auth_' || upper(substr(event_type, 1, 1)) AS authority,
        | count(DISTINCT event_type) AS n_sources, count(*) AS n_runs,
        | CAST(sum(CASE WHEN value >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
        | CAST(count(*) - sum(CASE WHEN value >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
        | round(CAST(sum(CASE WHEN value >= 1.0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) * 100, 2) AS success_rate,
        | round(avg(value), 2) AS avg_duration,
        | round(sum(value), 2) AS total_duration
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "mon_error_patterns" ->
      """SELECT CASE WHEN value < 1.0 THEN 'timeout' WHEN value < 10.0 THEN 'http_4xx'
        |  WHEN value < 100.0 THEN 'http_5xx' ELSE 'transfer_limit' END AS error_class,
        | count(*) AS n, round(avg(value), 2) AS avg_magnitude
        |FROM events WHERE event_type = 'error' GROUP BY 1 ORDER BY n DESC, error_class""".stripMargin,

    "q_set_ops" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1995-01-01 00:00:00'),
        |b AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |i AS (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b),
        |ab AS (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b),
        |ba AS (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
        |SELECT set_op, n_keys, key_checksum FROM (
        | SELECT 'retained' AS set_op, count(*) AS n_keys,
        |   CAST(coalesce(sum(o_custkey), 0) AS BIGINT) AS key_checksum FROM i
        | UNION ALL SELECT 'churned', count(*),
        |   CAST(coalesce(sum(o_custkey), 0) AS BIGINT) FROM ab
        | UNION ALL SELECT 'acquired', count(*),
        |   CAST(coalesce(sum(o_custkey), 0) AS BIGINT) FROM ba)
        |ORDER BY set_op""".stripMargin,
    "mon_perf_outliers" ->
      """WITH ev AS (SELECT event_id, value,
        |  TRY_CAST(nullif(regexp_extract(props, 'k":\s*([0-9]+)', 1), '') AS BIGINT) AS k
        | FROM events),
        |m AS (SELECT event_id, value, k,
        |  CASE WHEN k % 6 = 0 THEN 'maximum recursion depth exceeded while parsing'
        |       WHEN k % 6 = 1 THEN 'request timed out after 30 seconds'
        |       WHEN k % 6 = 2 THEN 'connection reset by peer'
        |       WHEN k % 6 = 3 THEN 'failed to parse json payload'
        |       WHEN k % 6 = 4 THEN 'unexpected http status 500'
        |       ELSE NULL END AS msg FROM ev),
        |c AS (SELECT *,
        |  CASE WHEN value >= 1.0 OR msg IS NULL THEN NULL
        |       WHEN msg LIKE '%recursion%' THEN 'recursion_errors'
        |       WHEN msg LIKE '%timeout%' OR msg LIKE '%timed out%' THEN 'timeout_errors'
        |       WHEN msg LIKE '%connection%' OR msg LIKE '%network%' OR msg LIKE '%resolve%' THEN 'network_errors'
        |       WHEN msg LIKE '%parse%' OR msg LIKE '%json%' OR msg LIKE '%xml%' THEN 'parsing_errors'
        |       ELSE NULL END AS err_class,
        |  value > 30.0 AS slow, k * 200000 > 10485760 AS large FROM m),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN err_class = 'recursion_errors' THEN 1 ELSE 0 END) AS BIGINT) AS rec_n,
        |  CAST(sum(CASE WHEN err_class = 'recursion_errors' THEN event_id END) AS BIGINT) AS rec_ck,
        |  CAST(sum(CASE WHEN err_class = 'timeout_errors' THEN 1 ELSE 0 END) AS BIGINT) AS to_n,
        |  CAST(sum(CASE WHEN err_class = 'timeout_errors' THEN event_id END) AS BIGINT) AS to_ck,
        |  CAST(sum(CASE WHEN err_class = 'network_errors' THEN 1 ELSE 0 END) AS BIGINT) AS net_n,
        |  CAST(sum(CASE WHEN err_class = 'network_errors' THEN event_id END) AS BIGINT) AS net_ck,
        |  CAST(sum(CASE WHEN err_class = 'parsing_errors' THEN 1 ELSE 0 END) AS BIGINT) AS par_n,
        |  CAST(sum(CASE WHEN err_class = 'parsing_errors' THEN event_id END) AS BIGINT) AS par_ck,
        |  CAST(sum(CASE WHEN slow THEN 1 ELSE 0 END) AS BIGINT) AS slow_n,
        |  CAST(sum(CASE WHEN slow THEN event_id END) AS BIGINT) AS slow_ck,
        |  CAST(sum(CASE WHEN large THEN 1 ELSE 0 END) AS BIGINT) AS lrg_n,
        |  CAST(sum(CASE WHEN large THEN event_id END) AS BIGINT) AS lrg_ck FROM c)
        |SELECT pattern, n, id_checksum FROM (
        |  SELECT 'recursion_errors' AS pattern, rec_n AS n, rec_ck AS id_checksum FROM a
        |  UNION ALL SELECT 'timeout_errors', to_n, to_ck FROM a
        |  UNION ALL SELECT 'network_errors', net_n, net_ck FROM a
        |  UNION ALL SELECT 'parsing_errors', par_n, par_ck FROM a
        |  UNION ALL SELECT 'slow_sources', slow_n, slow_ck FROM a
        |  UNION ALL SELECT 'large_responses', lrg_n, lrg_ck FROM a)
        |ORDER BY pattern""".stripMargin,
    // B6 schema drift: the oracle recomputes the EXPECTED schema from the
    // source parquet itself (information_schema over the orders view the
    // harness registers — modern DuckDB exposes parquet schemas there),
    // maps DuckDB's type names onto Spark's StructType typeNames, injects
    // the SAME drift the wire stages (drop o_orderpriority, add
    // o_ingest_src, narrow o_orderkey), and diffs with a full outer join —
    // replaying the ok/retyped/missing/extra classes without echoing
    // engine output. (r12 judged this rows-only; no longer.)
    "etl_schema_drift" ->
      """WITH exp AS (SELECT column_name AS "column",
        |  CASE data_type WHEN 'BIGINT' THEN 'long' WHEN 'VARCHAR' THEN 'string'
        |    WHEN 'DOUBLE' THEN 'double' WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
        |    WHEN 'INTEGER' THEN 'integer' ELSE lower(data_type) END AS typ
        |  FROM information_schema.columns WHERE table_name = 'orders'),
        |act AS (
        |  SELECT "column",
        |    CASE WHEN "column" = 'o_orderkey' THEN 'integer' ELSE typ END AS typ
        |  FROM exp WHERE "column" <> 'o_orderpriority'
        |  UNION ALL SELECT 'o_ingest_src', 'string')
        |SELECT coalesce(e."column", a."column") AS "column",
        |  CASE WHEN e."column" IS NULL THEN 'extra'
        |       WHEN a."column" IS NULL THEN 'missing'
        |       WHEN e.typ = a.typ THEN 'ok' ELSE 'retyped' END AS status,
        |  coalesce(e.typ, '') AS expected_type,
        |  coalesce(a.typ, '') AS actual_type
        |FROM exp e FULL OUTER JOIN act a ON e."column" = a."column"
        |ORDER BY 1""".stripMargin,
    "etl_schema_evolve" ->
      """SELECT gen, count(*) AS n_rows,
        | CAST(sum(CASE WHEN gen = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_price,
        | round(sum(CASE WHEN gen = 2 THEN p_retailprice ELSE 0.0 END), 2) AS sum_price,
        | CAST(sum(p_partkey) AS BIGINT) AS key_checksum
        |FROM (SELECT p_partkey, p_retailprice, g.gen FROM part, (VALUES (1), (2)) g(gen))
        |GROUP BY gen ORDER BY gen""".stripMargin,
    "load_compaction" ->
      """SELECT CAST(o_orderkey % 8 AS INT) AS batch, count(*) AS n_rows,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // z-order: the oracle recomputes the identical Morton code from the
    // source (integer-only grid scale + this generated interleave, `//`
    // matching Spark's `div` on non-negative operands) — matching cells
    // certify the clustered bytes round-tripped
    "load_zorder" -> {
      val interleave = (0 until 16).map(i =>
        s"(((xs >> $i) & 1) << ${2 * i}) | (((ys >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH s AS (SELECT o_custkey, o_totalprice,
         |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
         |  FROM orders),
         |m AS (SELECT min(o_custkey) AS cklo, max(o_custkey) AS ckhi,
         |  min(day) AS daylo, max(day) AS dayhi FROM s),
         |g AS (SELECT o_custkey, day, o_totalprice,
         |  ((o_custkey - cklo) * 65535) // GREATEST(ckhi - cklo, 1) AS xs,
         |  ((day - daylo) * 65535) // GREATEST(dayhi - daylo, 1) AS ys
         |  FROM s, m)
         |SELECT CAST(($interleave) >> 24 AS INT) AS zcell,
         |  count(*) AS n_rows, min(o_custkey) AS ck_min, max(o_custkey) AS ck_max,
         |  min(day) AS day_min, max(day) AS day_max,
         |  round(sum(o_totalprice), 2) AS sum_price
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // MAD outliers: quantile_cont mirrors Spark's exact interpolated
    // percentile; counts are threshold comparisons on identical doubles
    // D38: double-floor burn arithmetic replayed exactly (rate to 1e8,
    // floor-div by n, floor-div by the 10000-ppm budget); windows anchor
    // at the global watermark day so the report is corpus-deterministic
    // D40: the whole two-sided CUSUM trajectory replayed by a recursive
    // CTE (the D33 convention) — every S value hash-checked
    // D58: the Page-Hinkley trajectory replayed with three cumulative
    // window passes — running mean in floor-divided micro-cents, PH
    // cumsum, running min; every intermediate hash-checked
    "mon_page_hinkley" ->
      """WITH d AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT source, day, md,
        |  CAST((sum(md) OVER w) * 1000000 // (count(*) OVER w) AS BIGINT) AS mean_micro
        | FROM d WINDOW w AS (PARTITION BY source ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |p AS (SELECT source, day, md, mean_micro,
        |  CAST(sum(md * 1000000 - mean_micro - 100000000) OVER w AS BIGINT) AS ph_micro
        | FROM r WINDOW w AS (PARTITION BY source ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |m AS (SELECT source, day, md, mean_micro, ph_micro,
        |  CAST(min(ph_micro) OVER w AS BIGINT) AS min_ph_micro
        | FROM p WINDOW w AS (PARTITION BY source ORDER BY day ROWS UNBOUNDED PRECEDING))
        |SELECT source, day, md, mean_micro, ph_micro, min_ph_micro,
        | CAST(CASE WHEN ph_micro - min_ph_micro > 2000000000 THEN 1 ELSE 0 END AS INT) AS alarm
        |FROM m ORDER BY source, day""".stripMargin,
    "mon_cusum" ->
      """WITH RECURSIVE d AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT source, day, md,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS rn
        | FROM d),
        |b AS (SELECT source, CAST(sum(md) // count(*) AS BIGINT) AS mu
        | FROM r WHERE rn <= 7 GROUP BY 1),
        |rec AS (
        | SELECT r.source, r.day, r.md, r.rn, b.mu,
        |  greatest(0, r.md - b.mu - 500) AS s_hi,
        |  greatest(0, b.mu - r.md - 500) AS s_lo
        | FROM r JOIN b USING (source) WHERE r.rn = 1
        | UNION ALL
        | SELECT n.source, n.day, n.md, n.rn, rec.mu,
        |  greatest(0, rec.s_hi + n.md - rec.mu - 500),
        |  greatest(0, rec.s_lo + rec.mu - n.md - 500)
        | FROM rec JOIN r n ON n.source = rec.source AND n.rn = rec.rn + 1)
        |SELECT source, day, md, mu, s_hi, s_lo,
        | CAST(CASE WHEN s_hi > 3000 OR s_lo > 3000 THEN 1 ELSE 0 END AS INT) AS alarm
        |FROM rec ORDER BY source, day""".stripMargin,
    // D43: the Holt level/trend recurrence unrolled by a recursive CTE —
    // the new level inlined twice so the trend update reads the SAME
    // truncated value the engine's step computes
    "mon_forecast" ->
      """WITH RECURSIVE d AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT source, day, md,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS rn
        | FROM d),
        |rec AS (
        | SELECT source, day, md, rn, md AS l, CAST(0 AS BIGINT) AS b,
        |  CAST(NULL AS BIGINT) AS fc, CAST(NULL AS BIGINT) AS resid
        | FROM r WHERE rn = 1
        | UNION ALL
        | SELECT n.source, n.day, n.md, n.rn,
        |  CAST((300000 * n.md + 700000 * (rec.l + rec.b)) // 1000000 AS BIGINT),
        |  CAST((100000 * ((300000 * n.md + 700000 * (rec.l + rec.b)) // 1000000
        |    - rec.l) + 900000 * rec.b) // 1000000 AS BIGINT),
        |  rec.l + rec.b,
        |  n.md - (rec.l + rec.b)
        | FROM rec JOIN r n ON n.source = rec.source AND n.rn = rec.rn + 1)
        |SELECT source, day, md, l AS level, b AS trend, fc AS forecast, resid,
        | CAST(CASE WHEN rn >= 8 AND abs(resid) > 500 THEN 1 ELSE 0 END AS INT)
        |   AS alert
        |FROM rec ORDER BY source, day""".stripMargin,
    // D44: the audit reconciliation recomputed from the raw table — per
    // bucket, the victim rows that must be gone and whether the victim
    // set touches the bucket at all
    "load_erasure" ->
      """WITH v AS (SELECT c_custkey FROM customer WHERE c_acctbal < -900.0),
        |b AS (SELECT CAST(o_custkey % 16 AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS rows_before,
        |  CAST(sum(CASE WHEN o_custkey IN (SELECT c_custkey FROM v)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_erased
        | FROM orders GROUP BY 1),
        |g AS (SELECT unnest(range(0, 16)) AS bucket)
        |SELECT CAST(g.bucket AS INT) AS bucket,
        | COALESCE(b.rows_before, 0) AS rows_before,
        | COALESCE(b.rows_before, 0) - COALESCE(b.n_erased, 0) AS rows_after,
        | COALESCE(b.n_erased, 0) AS n_erased,
        | CAST(CASE WHEN g.bucket IN (SELECT c_custkey % 16 FROM v)
        |   THEN 1 ELSE 0 END AS INT) AS rewritten
        |FROM g LEFT JOIN b ON b.bucket = g.bucket ORDER BY 1""".stripMargin,
    // D41: the cusum daily-cents CTE + a (source, weekday) training
    // rollup in the same integer arithmetic; only rows past the training
    // horizon are judged
    "mon_seasonal" ->
      """WITH d AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |m AS (SELECT min(day) AS d0 FROM d),
        |dd AS (SELECT d.*, CAST(d.day % 7 AS BIGINT) AS dow FROM d),
        |b AS (SELECT source, dow, CAST(sum(md) // count(*) AS BIGINT) AS expected
        | FROM dd, m WHERE day < d0 + 21 GROUP BY 1, 2)
        |SELECT dd.source, dd.day, dd.dow, dd.md AS md_cents,
        | b.expected AS expected_cents, dd.md - b.expected AS dev_cents,
        | CASE WHEN b.expected IS NULL THEN 'no_baseline'
        |      WHEN abs(dd.md - b.expected) > 150 THEN 'alert'
        |      ELSE 'ok' END AS status
        |FROM dd CROSS JOIN m
        |LEFT JOIN b ON b.source = dd.source AND b.dow = dd.dow
        |WHERE dd.day >= m.d0 + 21
        |ORDER BY dd.source, dd.day""".stripMargin,
    // D42: digit from the decimal rendering of |cents| (integer-exact in
    // both engines), expectations from the SAME benfordPpm literals
    "mon_benford" -> {
      val vals = LoadOps.benfordPpm
        .map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH e AS (SELECT event_type AS source,
         |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |c AS (SELECT source,
         |  CAST(substr(CAST(abs(cents) AS VARCHAR), 1, 1) AS INT) AS digit,
         |  CAST(count(*) AS BIGINT) AS n_d
         | FROM e WHERE cents <> 0 GROUP BY 1, 2),
         |x AS (SELECT * FROM (VALUES $vals) AS v(digit, exp_ppm)),
         |s AS (SELECT source, CAST(sum(n_d) AS BIGINT) AS n FROM c GROUP BY 1),
         |g AS (SELECT s.source, x.digit, s.n,
         |  CAST(COALESCE(c.n_d, 0) AS BIGINT) AS n_d,
         |  CAST(x.exp_ppm AS BIGINT) AS exp_ppm,
         |  CAST(COALESCE(c.n_d, 0) * 1000000 // s.n AS BIGINT) AS obs_ppm
         | FROM s CROSS JOIN x
         | LEFT JOIN c ON c.source = s.source AND c.digit = x.digit),
         |st AS (SELECT source,
         |  CAST(sum((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) // exp_ppm) AS BIGINT)
         |    AS benford_stat
         | FROM g GROUP BY 1)
         |SELECT g.source, g.digit, g.n, g.n_d, g.obs_ppm, g.exp_ppm,
         | st.benford_stat,
         | CAST(CASE WHEN st.benford_stat > 50000 THEN 1 ELSE 0 END AS INT) AS flagged
         |FROM g JOIN st USING (source) ORDER BY g.source, g.digit""".stripMargin
    },
    // D39: rows-per-bucket read from the landed files, then the same
    // offset-packing arithmetic (bin = cum_before div target, target =
    // max(total div 4, 1)) replayed over a window cumsum
    "load_compact_plan" ->
      s"""WITH pf AS (SELECT CAST(bucket AS INT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n_rows
         | FROM read_parquet('${Tables.oracleScratchRoot}/graft_compact/orders/*/*.parquet',
         |   hive_partitioning=true) GROUP BY 1),
         |t AS (SELECT greatest(CAST(sum(n_rows) AS BIGINT) // 4, 1) AS target FROM pf),
         |c AS (SELECT bucket, n_rows,
         |  CAST(coalesce(sum(n_rows) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         | FROM pf),
         |b AS (SELECT c.*, CAST(c.cum_before // t.target AS BIGINT) AS bin,
         |  t.target FROM c, t)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
         | CAST(sum(n_rows) AS BIGINT) AS total_rows,
         | min(bucket) AS first_bucket, max(bucket) AS last_bucket,
         | CAST(max(target) AS BIGINT) AS target_rows,
         | CAST(sum(n_rows) * 1000000 // max(target) AS BIGINT) AS fill_ppm
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,
    "mon_sla_burn" ->
      s"""WITH ev AS (SELECT event_type AS source,
         |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
         |  CASE WHEN value < 5.0 THEN 1 ELSE 0 END AS failed FROM events),
         |wm AS (SELECT max(day) AS watermark FROM ev),
         |a AS (SELECT source,
         |  CAST(sum(CASE WHEN day > watermark - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
         |  CAST(sum(CASE WHEN day > watermark - 1 THEN failed ELSE 0 END) AS BIGINT) AS fail_short,
         |  CAST(sum(CASE WHEN day > watermark - 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
         |  CAST(sum(CASE WHEN day > watermark - 7 THEN failed ELSE 0 END) AS BIGINT) AS fail_long
         | FROM ev, wm GROUP BY source),
         |b AS (SELECT *,
         |  (fail_short * 100000000 // greatest(n_short, 1)) // 10000 AS burn_short_x100,
         |  (fail_long * 100000000 // greatest(n_long, 1)) // 10000 AS burn_long_x100
         | FROM a)
         |SELECT source, n_short, fail_short, n_long, fail_long,
         | burn_short_x100, burn_long_x100,
         | CASE WHEN burn_short_x100 >= 200 AND burn_long_x100 >= 200 THEN 'page'
         |      WHEN burn_long_x100 >= 100 THEN 'ticket' ELSE 'ok' END AS alert
         |FROM b ORDER BY source""".stripMargin,
    "mon_mad_outliers" ->
      s"""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
         |  FROM events GROUP BY 1),
         |mad AS (SELECT e.event_type,
         |  quantile_cont(abs(e.value - med.med), 0.5) AS mad
         |  FROM events e JOIN med USING (event_type) GROUP BY 1)
         |SELECT e.event_type, count(*) AS n,
         | round(any_value(med.med), 4) AS med, round(any_value(mad.mad), 4) AS mad,
         | CAST(sum(CASE WHEN abs(0.6745 * (e.value - med.med) / mad.mad) > 3.5
         |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         | round(max(abs(0.6745 * (e.value - med.med) / mad.mad)), 3) AS max_abs_z
         |FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // PSI drift: identical smoothing/grid arithmetic restated in SQL;
    // only the rounded sum is float
    // D45: exact integer ECDF counts per (source, cent) cell, one window
    // cumulation, max of single-division differences — no float sums
    "mon_ks_test" ->
      s"""WITH e AS (SELECT event_type, sec,
         |  CAST(round(value * 100) AS BIGINT) AS cents FROM ($evSec)),
         |m AS (SELECT event_type,
         |  min(sec) + (max(sec) - min(sec)) // 2 AS mid FROM e GROUP BY 1),
         |cells AS (SELECT e.event_type, cents,
         |  sum(CASE WHEN sec <= mid THEN 1 ELSE 0 END) AS r,
         |  sum(CASE WHEN sec <= mid THEN 0 ELSE 1 END) AS q
         | FROM e JOIN m USING (event_type) GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(r) AS BIGINT) AS n_ref,
         |  CAST(sum(q) AS BIGINT) AS n_cur FROM cells GROUP BY 1),
         |cum AS (SELECT event_type, cents,
         |  sum(r) OVER (PARTITION BY event_type ORDER BY cents) AS cr,
         |  sum(q) OVER (PARTITION BY event_type ORDER BY cents) AS cc
         | FROM cells),
         |d AS (SELECT cum.event_type, n_ref, n_cur,
         |  round(max(abs(cr / CAST(n_ref AS DOUBLE) - cc / CAST(n_cur AS DOUBLE))), 4)
         |    AS ks_stat
         | FROM cum JOIN t USING (event_type) GROUP BY 1, 2, 3)
         |SELECT event_type, n_ref, n_cur, ks_stat,
         |  round(1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) /
         |    (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))), 4) AS critical,
         |  CAST(ks_stat > round(1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) /
         |    (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))), 4) AS INT) AS drifted
         |FROM d ORDER BY event_type""".stripMargin,
    // D46: same cell/ECDF scaffolding as D45 + the lead() gap; the
    // integral numerator is an exact long sum, ONE double division at
    // the end (single-cent supports integrate to exactly 0)
    "mon_wasserstein" ->
      s"""WITH e AS (SELECT event_type, sec,
         |  CAST(round(value * 100) AS BIGINT) AS cents FROM ($evSec)),
         |m AS (SELECT event_type,
         |  min(sec) + (max(sec) - min(sec)) // 2 AS mid FROM e GROUP BY 1),
         |cells AS (SELECT e.event_type, cents,
         |  sum(CASE WHEN sec <= mid THEN 1 ELSE 0 END) AS r,
         |  sum(CASE WHEN sec <= mid THEN 0 ELSE 1 END) AS q
         | FROM e JOIN m USING (event_type) GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(r) AS BIGINT) AS n_ref,
         |  CAST(sum(q) AS BIGINT) AS n_cur FROM cells GROUP BY 1),
         |cum AS (SELECT event_type, cents,
         |  sum(r) OVER (PARTITION BY event_type ORDER BY cents) AS cr,
         |  sum(q) OVER (PARTITION BY event_type ORDER BY cents) AS cc,
         |  lead(cents) OVER (PARTITION BY event_type ORDER BY cents) - cents
         |    AS gap
         | FROM cells),
         |s AS (SELECT cum.event_type,
         |  sum(abs(cr * n_cur - cc * n_ref) * gap) AS num
         | FROM cum JOIN t USING (event_type) WHERE gap IS NOT NULL GROUP BY 1)
         |SELECT t.event_type, n_ref, n_cur,
         |  round(CAST(COALESCE(s.num, 0) AS DOUBLE) /
         |    (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) / 100.0, 4) AS w1,
         |  CAST(round(CAST(COALESCE(s.num, 0) AS DOUBLE) /
         |    (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)) / 100.0, 4) > 0.25
         |    AS INT) AS drifted
         |FROM t LEFT JOIN s USING (event_type) ORDER BY t.event_type""".stripMargin,
    // D47: exact integer hour cells, fixed-shape expected-count and term
    // arithmetic, Wilson–Hilferty closed-form critical value
    "mon_chi2" ->
      s"""WITH e AS (SELECT event_type, sec,
         |  (sec // 3600) % 24 AS hour FROM ($evSec)),
         |m AS (SELECT event_type,
         |  min(sec) + (max(sec) - min(sec)) // 2 AS mid FROM e GROUP BY 1),
         |cells AS (SELECT e.event_type, hour,
         |  sum(CASE WHEN sec <= mid THEN 1 ELSE 0 END) AS o_r,
         |  sum(CASE WHEN sec <= mid THEN 0 ELSE 1 END) AS o_c
         | FROM e JOIN m USING (event_type) GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(sum(o_r) AS BIGINT) AS n_ref,
         |  CAST(sum(o_c) AS BIGINT) AS n_cur,
         |  CAST(count(*) AS BIGINT) AS n_cells FROM cells GROUP BY 1),
         |s AS (SELECT cells.event_type, n_ref, n_cur, n_cells,
         |  round(sum(
         |    (o_r - CAST(o_r + o_c AS DOUBLE) * n_ref / (n_ref + n_cur)) *
         |    (o_r - CAST(o_r + o_c AS DOUBLE) * n_ref / (n_ref + n_cur)) /
         |      (CAST(o_r + o_c AS DOUBLE) * n_ref / (n_ref + n_cur)) +
         |    (o_c - CAST(o_r + o_c AS DOUBLE) * n_cur / (n_ref + n_cur)) *
         |    (o_c - CAST(o_r + o_c AS DOUBLE) * n_cur / (n_ref + n_cur)) /
         |      (CAST(o_r + o_c AS DOUBLE) * n_cur / (n_ref + n_cur))), 4) AS chi2
         | FROM cells JOIN t USING (event_type)
         | WHERE n_ref > 0 AND n_cur > 0 GROUP BY 1, 2, 3, 4)
         |SELECT event_type, n_ref, n_cur, n_cells - 1 AS df, chi2,
         |  round(CAST(n_cells - 1 AS DOUBLE) *
         |    power(1.0 - 2.0 / (9.0 * (n_cells - 1)) +
         |      1.6449 * sqrt(2.0 / (9.0 * (n_cells - 1))), 3), 4) AS critical,
         |  CAST(chi2 > round(CAST(n_cells - 1 AS DOUBLE) *
         |    power(1.0 - 2.0 / (9.0 * (n_cells - 1)) +
         |      1.6449 * sqrt(2.0 / (9.0 * (n_cells - 1))), 3), 4) AS INT) AS drifted
         |FROM s ORDER BY event_type""".stripMargin,
    // D48: the D40 integer daily frame, window cumsums of md and md²,
    // one fixed-shape t expression per split, rounded-|t| argmax with
    // smaller-day ties
    "mon_changepoint" ->
      """WITH d AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t_days,
        |  CAST(sum(md) AS BIGINT) AS s_all,
        |  CAST(sum(md * md) AS BIGINT) AS ss_all FROM d GROUP BY 1),
        |c AS (SELECT source, day,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS k,
        |  CAST(sum(md) OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS cs,
        |  CAST(sum(md * md) OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS css
        | FROM d),
        |s AS (SELECT c.source, day, k, t_days,
        |  CAST(cs AS DOUBLE) / k AS ml,
        |  CAST(s_all - cs AS DOUBLE) / (t_days - k) AS mr,
        |  CAST(css AS DOUBLE) - (CAST(cs AS DOUBLE) / k) * cs
        |   + CAST(ss_all - css AS DOUBLE)
        |   - (CAST(s_all - cs AS DOUBLE) / (t_days - k)) * (s_all - cs) AS wss
        | FROM c JOIN tot USING (source) WHERE k < t_days AND t_days >= 3),
        |tt AS (SELECT source, day, t_days, round((ml - mr) /
        |  sqrt(greatest(wss / (t_days - 2), 0.25) *
        |    (1.0 / k + 1.0 / (t_days - k))), 4) AS tt
        | FROM s)
        |SELECT source, t_days AS n_days, day AS cp_day, tt AS t_stat,
        |  CAST(abs(tt) > 3.0 AS INT) AS changed
        |FROM (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY abs(tt) DESC, day) AS rn
        |  FROM tt) WHERE rn = 1
        |ORDER BY source""".stripMargin,
    // G12: the flush-sentinel outer join — the stream's eviction
    // bookkeeping must reproduce the one-shot batch LEFT JOIN exactly
    "stream_outer_join" ->
      s"""WITH e AS ($evSec),
         |a AS (SELECT event_id AS inc_id, sec AS s1 FROM e
         | WHERE event_type = 'error'),
         |b AS (SELECT event_id AS pur_id, sec AS s2 FROM e
         | WHERE event_type = 'purchase')
         |SELECT inc_id, CAST(count(pur_id) AS BIGINT) AS n_matched,
         | CAST(count(pur_id) > 0 AS INT) AS has_match
         |FROM a LEFT JOIN b ON s2 BETWEEN s1 - 300 AND s1 + 300
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // G9: the planted-quiet staleness wire — silence two sources at the
    // 60% cutoff, alert iff last_seen + 600 < the final watermark (the
    // strict event-time-timeout inequality)
    "stream_staleness" ->
      """WITH e AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec FROM events),
        |r AS (SELECT min(sec) AS mn, max(sec) AS mx FROM e),
        |f AS (SELECT source, sec FROM e, r
        | WHERE NOT (source IN ('error', 'purchase')
        |   AND sec > mn + (mx - mn) * 6 // 10)),
        |m AS (SELECT max(sec) AS wm FROM f),
        |l AS (SELECT source, max(sec) AS last_seen_sec FROM f GROUP BY 1)
        |SELECT source, last_seen_sec FROM l, m
        |WHERE last_seen_sec + 600 < wm ORDER BY source""".stripMargin,
    // E45: dollar-quantized spend cells, the E41 2×-midrank device for
    // the rank-weighted sum, one fixed-shape Gini expression
    "q_gini" ->
      """WITH sp AS (
        | SELECT c_mktsegment AS seg,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment, o_custkey),
        |cells AS (SELECT seg, v, CAST(count(*) AS BIGINT) AS cnt
        | FROM sp GROUP BY 1, 2),
        |t AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(sum(cnt * v) AS BIGINT) AS s FROM cells GROUP BY 1),
        |c2 AS (SELECT seg, v, cnt,
        |  sum(cnt) OVER (PARTITION BY seg ORDER BY v) - cnt AS cumb FROM cells),
        |g AS (SELECT c2.seg, n, s,
        |  CAST(sum(cnt * v * (2 * cumb + cnt + 1)) AS BIGINT) AS num2
        | FROM c2 JOIN t USING (seg) GROUP BY 1, 2, 3)
        |SELECT seg AS c_mktsegment, n AS n_customers, s AS total_dollars,
        | round(CAST(num2 AS DOUBLE) / (n * s) - CAST(n + 1 AS DOUBLE) / n, 4) AS gini
        |FROM g ORDER BY 1""".stripMargin,
    // E52: the E45 spend cells, cumulative count+spend windows, decile
    // rank probes with exact within-cell interpolation, integer PPM
    "q_lorenz" ->
      """WITH sp AS (
        | SELECT c_mktsegment AS seg,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment, o_custkey),
        |cells AS (SELECT seg, v, CAST(count(*) AS BIGINT) AS cnt
        | FROM sp GROUP BY 1, 2),
        |t AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(sum(cnt * v) AS BIGINT) AS s FROM cells GROUP BY 1),
        |c2 AS (SELECT seg, v, cnt,
        |  sum(cnt) OVER (PARTITION BY seg ORDER BY v) AS cum_cnt,
        |  sum(cnt * v) OVER (PARTITION BY seg ORDER BY v) AS cum_sp
        | FROM cells),
        |d AS (SELECT seg, n, s, CAST(k AS INT) AS decile, (k * n) // 10 AS r
        | FROM t CROSS JOIN (SELECT unnest(range(1, 11)) AS k))
        |SELECT d.seg AS c_mktsegment, d.decile, d.n AS n_customers,
        | CAST(coalesce(max(c2.cum_sp - c2.cnt * c2.v
        |   + (d.r - (c2.cum_cnt - c2.cnt)) * c2.v), 0) * 1000000 // d.s
        |   AS BIGINT) AS bottom_share_ppm
        |FROM d LEFT JOIN c2 ON d.seg = c2.seg
        | AND c2.cum_cnt - c2.cnt < d.r AND d.r <= c2.cum_cnt
        |GROUP BY 1, 2, 3, d.s ORDER BY 1, 2""".stripMargin,
    // E53: (priority, lag-day) cells, type-1 inverse-CDF quantile
    // picks, integer-PPM slow tail
    "q_order_latency" ->
      """WITH l AS (SELECT o_orderpriority AS priority,
        |  CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS lag
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |cells AS (SELECT priority, lag, CAST(count(*) AS BIGINT) AS cnt
        | FROM l GROUP BY 1, 2),
        |t AS (SELECT priority, CAST(sum(cnt) AS BIGINT) AS n_items,
        |  CAST(sum(CASE WHEN lag > 100 THEN cnt ELSE 0 END) AS BIGINT)
        |    AS n_slow
        | FROM cells GROUP BY 1),
        |c2 AS (SELECT priority, lag,
        |  sum(cnt) OVER (PARTITION BY priority ORDER BY lag) AS cum
        | FROM cells)
        |SELECT c2.priority, n_items,
        | min(CASE WHEN cum >= (n_items + 1) // 2 THEN lag END) AS p50_days,
        | min(CASE WHEN cum >= (9 * n_items + 9) // 10 THEN lag END) AS p90_days,
        | n_slow, n_slow * 1000000 // n_items AS slow_ppm
        |FROM c2 JOIN t USING (priority)
        |GROUP BY 1, 2, 5 ORDER BY 1""".stripMargin,
    // E47: the E44 inverse-CDF device at decile granularity over
    // event-count cells, nested integer-PPM divisions for rate and lift
    "q_decile_lift" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS conv
        | FROM events GROUP BY 1),
        |cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
        |  (SELECT count(*) FROM u) AS n
        | FROM (SELECT n_events AS v, count(*) AS cnt FROM u GROUP BY 1)),
        |b AS (SELECT min(CASE WHEN cum >= (1*n+9)//10 THEN v END) AS b1,
        |  min(CASE WHEN cum >= (2*n+9)//10 THEN v END) AS b2,
        |  min(CASE WHEN cum >= (3*n+9)//10 THEN v END) AS b3,
        |  min(CASE WHEN cum >= (4*n+9)//10 THEN v END) AS b4,
        |  min(CASE WHEN cum >= (5*n+9)//10 THEN v END) AS b5,
        |  min(CASE WHEN cum >= (6*n+9)//10 THEN v END) AS b6,
        |  min(CASE WHEN cum >= (7*n+9)//10 THEN v END) AS b7,
        |  min(CASE WHEN cum >= (8*n+9)//10 THEN v END) AS b8,
        |  min(CASE WHEN cum >= (9*n+9)//10 THEN v END) AS b9 FROM cum),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(conv) AS BIGINT) AS conv_total FROM u),
        |d AS (SELECT conv, 1 + CAST(n_events > b.b1 AS INT)
        |  + CAST(n_events > b.b2 AS INT) + CAST(n_events > b.b3 AS INT)
        |  + CAST(n_events > b.b4 AS INT) + CAST(n_events > b.b5 AS INT)
        |  + CAST(n_events > b.b6 AS INT) + CAST(n_events > b.b7 AS INT)
        |  + CAST(n_events > b.b8 AS INT) + CAST(n_events > b.b9 AS INT) AS decile
        | FROM u, b),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(conv) AS BIGINT) AS n_converted FROM d GROUP BY 1)
        |SELECT decile, n_users, n_converted,
        | n_converted * 1000000 // n_users AS conv_ppm,
        | (n_converted * 1000000 // n_users) * 1000000
        |   // (conv_total * 1000000 // n_total) AS lift_ppm
        |FROM g, t ORDER BY decile""".stripMargin,
    // D54: the four member signals re-derived with their own oracle
    // fragments (age, D51 uptime, D53 Fano, the D40 recursive CUSUM),
    // joined per source with the integer flag sum
    "mon_scorecard" ->
      """WITH RECURSIVE ev AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec, value FROM events),
        |age AS (SELECT source, (SELECT max(sec) FROM ev) - max(sec) AS age_sec
        | FROM ev GROUP BY 1),
        |eb AS (SELECT DISTINCT source, sec // 3600 AS b FROM ev),
        |spn AS (SELECT min(b) AS blo, max(b) AS bhi
        | FROM (SELECT sec // 3600 AS b FROM ev)),
        |gp AS (SELECT source, b,
        |  lead(b) OVER (PARTITION BY source ORDER BY b) AS nxt FROM eb),
        |upt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_active,
        |  coalesce(max(nxt - b - 1), 0) AS gap_in,
        |  min(b) AS first_b, max(b) AS last_b FROM gp GROUP BY 1),
        |up2 AS (SELECT source,
        |  n_active * 1000000 // (bhi - blo + 1) AS uptime_ppm,
        |  greatest(gap_in, first_b - blo, bhi - last_b) AS longest_gap
        | FROM upt, spn),
        |dc AS (SELECT source, sec // 86400 AS day, CAST(count(*) AS BIGINT) AS c
        | FROM ev GROUP BY 1, 2),
        |bu AS (SELECT source,
        |  (CAST(count(*) AS BIGINT) * CAST(sum(c * c) AS BIGINT)
        |    - CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) * 1000000
        |    // (CAST(count(*) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS fano_ppm
        | FROM dc GROUP BY 1 HAVING sum(c) > 0),
        |d AS (SELECT source, sec // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM ev GROUP BY 1, 2),
        |r AS (SELECT source, day, md,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS rn
        | FROM d),
        |bl AS (SELECT source, CAST(sum(md) // count(*) AS BIGINT) AS mu
        | FROM r WHERE rn <= 7 GROUP BY 1),
        |rec AS (
        | SELECT r.source, r.day, r.md, r.rn, bl.mu,
        |  greatest(0, r.md - bl.mu - 500) AS s_hi,
        |  greatest(0, bl.mu - r.md - 500) AS s_lo
        | FROM r JOIN bl USING (source) WHERE r.rn = 1
        | UNION ALL
        | SELECT n.source, n.day, n.md, n.rn, rec.mu,
        |  greatest(0, rec.s_hi + n.md - rec.mu - 500),
        |  greatest(0, rec.s_lo + rec.mu - n.md - 500)
        | FROM rec JOIN r n ON n.source = rec.source AND n.rn = rec.rn + 1),
        |al AS (SELECT source,
        |  CAST(sum(CASE WHEN s_hi > 3000 OR s_lo > 3000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_alarms FROM rec GROUP BY 1),
        |j AS (SELECT age.source, age_sec, uptime_ppm, longest_gap, fano_ppm,
        |  n_alarms,
        |  CAST(age_sec >= 86400 AS INT) + CAST(uptime_ppm < 900000 AS INT)
        |   + CAST(fano_ppm > 2000000 AS INT) + CAST(n_alarms > 0 AS INT) AS n_flags
        | FROM age JOIN up2 USING (source) JOIN bu USING (source)
        |  JOIN al USING (source))
        |SELECT source, age_sec, uptime_ppm, longest_gap, fano_ppm, n_alarms,
        | n_flags, CAST(n_flags = 0 AS INT) AS healthy
        |FROM j ORDER BY source""".stripMargin,
    // D53: daily count cells, exact ΣC/ΣC² population variance, one
    // fixed-shape integer-PPM Fano factor
    "mon_burstiness" ->
      """WITH d AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(count(*) AS BIGINT) AS c
        | FROM events GROUP BY 1, 2),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
        | FROM d GROUP BY 1)
        |SELECT source, n_days, s // n_days AS mean_per_day,
        | (n_days * ss - s * s) * 1000000 // (n_days * s) AS fano_ppm,
        | CAST((n_days * ss - s * s) * 1000000 // (n_days * s) > 2000000 AS INT)
        |   AS bursty
        |FROM a WHERE s > 0 ORDER BY source""".stripMargin,
    // E51: (sec, event_id) row-ordered touch paths before the first
    // purchase, min/max-struct first/last touches, floor-PPM linear
    // credits, full-outer channel rollup
    "q_attribution" ->
      s"""WITH e AS ($evSec),
         |cv AS (SELECT user_id, sec AS cs, event_id AS ce FROM (
         |  SELECT user_id, sec, event_id, row_number() OVER (
         |    PARTITION BY user_id ORDER BY sec, event_id) AS rn
         |  FROM e WHERE event_type = 'purchase') WHERE rn = 1),
         |t AS (SELECT e.user_id, e.event_type, e.sec, e.event_id
         | FROM e JOIN cv USING (user_id)
         | WHERE (e.sec, e.event_id) < (cs, ce)),
         |per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_t
         | FROM t GROUP BY 1),
         |fl AS (SELECT user_id, event_type,
         |  row_number() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rf,
         |  row_number() OVER (PARTITION BY user_id
         |    ORDER BY sec DESC, event_id DESC) AS rl FROM t),
         |lin AS (SELECT t.event_type AS channel,
         |  CAST(sum(1000000 // n_t) AS BIGINT) AS linear_ppm
         | FROM t JOIN per USING (user_id) GROUP BY 1),
         |fst AS (SELECT event_type AS channel, CAST(count(*) AS BIGINT) AS n_first
         | FROM fl WHERE rf = 1 GROUP BY 1),
         |lst AS (SELECT event_type AS channel, CAST(count(*) AS BIGINT) AS n_last
         | FROM fl WHERE rl = 1 GROUP BY 1)
         |SELECT channel, coalesce(linear_ppm, 0) AS linear_ppm,
         | coalesce(n_first, 0) AS n_first, coalesce(n_last, 0) AS n_last
         |FROM lin FULL JOIN fst USING (channel) FULL JOIN lst USING (channel)
         |ORDER BY channel""".stripMargin,
    // E50: the E33 user-week machinery, new ⇔ week = first week,
    // integer-PPM returning share
    "q_new_vs_returning" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 // 7 AS week
        | FROM events),
        |f AS (SELECT user_id, min(week) AS first_week FROM uw GROUP BY 1),
        |g AS (SELECT week, CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        | FROM uw JOIN f USING (user_id) GROUP BY 1)
        |SELECT week, n_active, n_new, n_active - n_new AS n_returning,
        | (n_active - n_new) * 1000000 // n_active AS returning_ppm
        |FROM g ORDER BY week""".stripMargin,
    // D52: the D40 daily frame, a trailing integer-range join (≤7 cells
    // per day), lower median in (md, day) total order, residual readout
    "mon_rolling_median" ->
      """WITH d AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |p AS (SELECT a.source, a.day, a.md, b.day AS d2, b.md AS m2
        | FROM d a JOIN d b ON b.source = a.source
        |  AND b.day <= a.day AND b.day > a.day - 7),
        |r AS (SELECT source, day, md, m2,
        |  CAST(row_number() OVER (PARTITION BY source, day ORDER BY m2, d2)
        |    AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY source, day) AS BIGINT) AS n_win
        | FROM p)
        |SELECT source, day, md, n_win, m2 AS smooth_md, md - m2 AS residual
        |FROM r WHERE rn = (n_win + 1) // 2
        |ORDER BY source, day""".stripMargin,
    // E48: distinct (order, brand) incidence, basket-bounded pair join,
    // nested integer-PPM lift, support floor 20
    "q_basket_lift" ->
      """WITH inc AS (SELECT DISTINCT l_orderkey, p_brand
        | FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM inc),
        |per AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_one
        | FROM inc GROUP BY 1),
        |pr AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |  CAST(count(*) AS BIGINT) AS n_ab
        | FROM inc a JOIN inc b
        |  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        | GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT brand_a, brand_b, n_ab, x.n_one AS n_a, y.n_one AS n_b,
        | n_ab * 1000000 // x.n_one * n_orders // y.n_one AS lift_ppm
        |FROM pr JOIN per x ON x.p_brand = pr.brand_a
        | JOIN per y ON y.p_brand = pr.brand_b, n
        |ORDER BY 1, 2""".stripMargin,
    // E49: exact epoch-week lifetimes, reverse-cumsum at-risk sets over
    // lifetime cells, integer-PPM hazard
    "q_churn_hazard" ->
      """WITH l AS (SELECT user_id,
        |  max(CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 // 7)
        |  - min(CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 // 7)
        |    AS lifetime
        | FROM events GROUP BY 1),
        |c AS (SELECT lifetime AS k, CAST(count(*) AS BIGINT) AS n_churned
        | FROM l GROUP BY 1)
        |SELECT k, n_at_risk, n_churned,
        | n_churned * 1000000 // n_at_risk AS hazard_ppm
        |FROM (SELECT k, n_churned,
        |  CAST(sum(n_churned) OVER (ORDER BY k DESC) AS BIGINT) AS n_at_risk
        | FROM c)
        |ORDER BY k""".stripMargin,
    // E54: first-touch channel via rn=1 over (sec, event_id), E49's
    // lifetime cells per channel, recursive-CTE replay of the integer-PPM
    // product-limit fold (the D43 convention)
    "q_survival_km" ->
      """WITH RECURSIVE ev AS (SELECT user_id, event_id, event_type,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec FROM events),
        |ft AS (SELECT user_id, event_type AS channel FROM (
        |  SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id ORDER BY sec, event_id) AS rn
        |  FROM ev) WHERE rn = 1),
        |lt AS (SELECT user_id,
        |  max(sec // 86400 // 7) - min(sec // 86400 // 7) AS k
        | FROM ev GROUP BY 1),
        |c AS (SELECT channel, k, CAST(count(*) AS BIGINT) AS d
        | FROM ft JOIN lt USING (user_id) GROUP BY 1, 2),
        |r0 AS (SELECT channel, k, d,
        |  CAST(sum(d) OVER (PARTITION BY channel ORDER BY k DESC) AS BIGINT) AS r,
        |  CAST(row_number() OVER (PARTITION BY channel ORDER BY k) AS BIGINT) AS rn
        | FROM c),
        |rec AS (
        | SELECT channel, k, r, d, rn,
        |  CAST(1000000 * (r - d) // r AS BIGINT) AS s
        | FROM r0 WHERE rn = 1
        | UNION ALL
        | SELECT n.channel, n.k, n.r, n.d, n.rn,
        |  CAST(rec.s * (n.r - n.d) // n.r AS BIGINT)
        | FROM rec JOIN r0 n ON n.channel = rec.channel AND n.rn = rec.rn + 1)
        |SELECT channel, k, r AS n_at_risk, d AS n_churned,
        | d * 1000000 // r AS hazard_ppm, s AS survival_ppm
        |FROM rec ORDER BY channel, k""".stripMargin,
    // E55: doubled average ranks from value cells (2·below + cnt + 1),
    // corr over the identical integers rounded 4 (the E34 convention)
    "q_spearman" ->
      """WITH rows0 AS (SELECT l_returnflag AS flag,
        |  CAST(l_quantity AS BIGINT) AS x,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem),
        |cx AS (SELECT flag, x, CAST(count(*) AS BIGINT) AS cnt
        | FROM rows0 GROUP BY 1, 2),
        |rx AS (SELECT flag, x,
        |  2 * (CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY x) AS BIGINT)
        |    - cnt) + cnt + 1 AS r_x FROM cx),
        |cy AS (SELECT flag, y, CAST(count(*) AS BIGINT) AS cnt
        | FROM rows0 GROUP BY 1, 2),
        |ry AS (SELECT flag, y,
        |  2 * (CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY y) AS BIGINT)
        |    - cnt) + cnt + 1 AS r_y FROM cy)
        |SELECT flag AS l_returnflag, count(*) AS n_rows,
        | round(corr(r_x, r_y), 4) AS spearman_rho,
        | round(corr(x, y), 4) AS pearson_r
        |FROM rows0 JOIN rx USING (flag, x) JOIN ry USING (flag, y)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // E56: per pair — exact contingency cells, broadcast marginals,
    // χ² = n + Σ_observed((o−e)²/e − e) (absent cells contribute e and
    // Σe = n), V = sqrt(χ²/(n·(min(r,c)−1))) rounded 4
    "q_cramers_v" -> {
      val pairs = Seq(
        ("c_mktsegment", "o_orderpriority",
          "SELECT c_mktsegment AS a, o_orderpriority AS b " +
            "FROM orders JOIN customer ON o_custkey = c_custkey"),
        ("l_returnflag", "l_linestatus",
          "SELECT l_returnflag AS a, l_linestatus AS b FROM lineitem"),
        ("p_brand", "p_type",
          "SELECT p_brand AS a, p_type AS b FROM part"))
      val ctes = pairs.zipWithIndex.map { case ((_, _, src), i) =>
        s"""c$i AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM ($src) GROUP BY 1, 2),
           |t$i AS (SELECT CAST(sum(o) AS BIGINT) AS n,
           |  CAST(count(DISTINCT a) AS BIGINT) AS r_cats,
           |  CAST(count(DISTINCT b) AS BIGINT) AS c_cats FROM c$i),
           |bd$i AS (SELECT sum((o - e) * (o - e) / e - e) AS bd FROM (
           |  SELECT o, CAST(rt AS DOUBLE) * ct / n AS e
           |  FROM c$i
           |  JOIN (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM c$i GROUP BY 1) USING (a)
           |  JOIN (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM c$i GROUP BY 1) USING (b)
           |  CROSS JOIN t$i))""".stripMargin
      }.mkString(",\n")
      val sels = pairs.zipWithIndex.map { case ((na, nb, _), i) =>
        s"""SELECT '$na' AS col_a, '$nb' AS col_b, n AS n_rows, r_cats, c_cats,
           | round(n + bd, 4) AS chi2,
           | round(sqrt(greatest(n + bd, 0)
           |   / (n * nullif(least(r_cats, c_cats) - 1, 0))), 4) AS cramers_v
           |FROM t$i, bd$i""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH $ctes\n$sels\nORDER BY col_a, col_b"
    },
    // D55: trailing integer-range window pairs, lower-median and
    // lower-MAD row_number picks, one integer Hampel comparison
    "mon_hampel" ->
      """WITH d AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |p AS (SELECT a.source, a.day, a.md, b.day AS d2, b.md AS m2
        | FROM d a JOIN d b ON a.source = b.source
        |  AND b.day <= a.day AND b.day > a.day - 7),
        |med AS (SELECT source, day, md, n_win, m2 AS med FROM (
        |  SELECT source, day, md, m2,
        |   row_number() OVER (PARTITION BY source, day ORDER BY m2, d2) AS rn,
        |   CAST(count(*) OVER (PARTITION BY source, day) AS BIGINT) AS n_win
        |  FROM p) WHERE rn = (n_win + 1) // 2),
        |mad AS (SELECT source, day, dev2 AS mad FROM (
        |  SELECT p.source, p.day, abs(p.m2 - med.med) AS dev2,
        |   row_number() OVER (PARTITION BY p.source, p.day
        |     ORDER BY abs(p.m2 - med.med), p.d2) AS rn,
        |   CAST(count(*) OVER (PARTITION BY p.source, p.day) AS BIGINT) AS n_win
        |  FROM p JOIN med ON p.source = med.source AND p.day = med.day)
        | WHERE rn = (n_win + 1) // 2)
        |SELECT med.source, med.day, med.md, med.n_win, med.med, mad.mad,
        | abs(med.md - med.med) AS deviation,
        | CAST(med.n_win >= 5 AND abs(med.md - med.med) * 10000 > 44478 * mad.mad
        |   AS INT) AS alarm
        |FROM med JOIN mad ON med.source = mad.source AND med.day = mad.day
        |ORDER BY 1, 2""".stripMargin,
    // E57: E45's spend cells filtered to v>0, per-segment Σcnt·v·ln v
    // moments, fixed-shape Theil terms rounded 4, integer-PPM shares
    "q_theil" ->
      """WITH sp AS (
        | SELECT c_mktsegment AS seg,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment, o_custkey),
        |cells AS (SELECT seg, v, CAST(count(*) AS BIGINT) AS cnt
        | FROM sp WHERE v > 0 GROUP BY 1, 2),
        |g AS (SELECT seg, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(sum(cnt * v) AS BIGINT) AS x,
        |  sum(CAST(cnt AS DOUBLE) * v * ln(CAST(v AS DOUBLE))) AS sxlnx
        | FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |  CAST(sum(x) AS BIGINT) AS xx FROM g)
        |SELECT seg AS c_mktsegment, n AS n_customers, x AS total_dollars,
        | x * 1000000 // xx AS share_ppm,
        | round(sxlnx / x - ln(CAST(x AS DOUBLE) / n), 4) AS theil_g,
        | round((CAST(x AS DOUBLE) / xx)
        |   * ln((CAST(x AS DOUBLE) / n) / (CAST(xx AS DOUBLE) / nn)), 4)
        |   AS between_term,
        | round((CAST(x AS DOUBLE) / xx)
        |   * (sxlnx / x - ln(CAST(x AS DOUBLE) / n)), 4) AS within_term
        |FROM g CROSS JOIN t ORDER BY 1""".stripMargin,
    // E58: cent-value cells, type-1 p5/p95 boundary picks over the cell
    // CDF, winsorize = clamp / trim = value-boundary filter, exact
    // integer div means
    "q_winsorized" ->
      """WITH cells AS (SELECT l_returnflag AS flag,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY 1, 2),
        |c2 AS (SELECT flag, v, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY flag ORDER BY v) AS BIGINT) AS cum
        | FROM cells),
        |t AS (SELECT flag, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1),
        |b AS (SELECT c2.flag, n,
        |  min(CASE WHEN cum >= (n + 19) // 20 THEN v END) AS lo,
        |  min(CASE WHEN cum >= (19 * n + 19) // 20 THEN v END) AS hi
        | FROM c2 JOIN t USING (flag) GROUP BY 1, 2)
        |SELECT cells.flag AS l_returnflag, n AS n_rows,
        | lo AS lo_cents, hi AS hi_cents,
        | CAST(sum(v * cnt) // n AS BIGINT) AS mean_cents,
        | CAST(sum(greatest(least(v, hi), lo) * cnt) // n AS BIGINT)
        |   AS winsor_mean_cents,
        | CAST(sum(CASE WHEN v BETWEEN lo AND hi THEN v * cnt ELSE 0 END)
        |   // sum(CASE WHEN v BETWEEN lo AND hi THEN cnt ELSE 0 END)
        |   AS BIGINT) AS trim_mean_cents,
        | CAST(n - sum(CASE WHEN v BETWEEN lo AND hi THEN cnt ELSE 0 END)
        |   AS BIGINT) AS n_trimmed
        |FROM cells JOIN b ON cells.flag = b.flag
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    // E60: value cells, mean PINNED to round(Σx/n, 6), central-moment
    // folds over cells with the pinned μ (m2·sqrt(m2), never pow —
    // sqrt is correctly-rounded IEEE on both engines), rounded 4
    "q_shape_stats" ->
      """WITH cells AS (SELECT event_type AS g,
        |  CAST(round(value * 100) AS BIGINT) AS v,
        |  CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |mu AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(sum(cnt * v) // sum(cnt) AS BIGINT) AS mean_cents,
        |  round(CAST(sum(cnt * v) AS DOUBLE) / sum(cnt), 6) AS mu
        | FROM cells GROUP BY 1),
        |m AS (SELECT g, n, mean_cents,
        |  sum(cnt * (v - mu) * (v - mu)) AS s2,
        |  sum(cnt * (v - mu) * (v - mu) * (v - mu)) AS s3,
        |  sum(cnt * (v - mu) * (v - mu) * (v - mu) * (v - mu)) AS s4
        | FROM cells JOIN mu USING (g) GROUP BY 1, 2, 3)
        |SELECT g AS event_type, n, mean_cents,
        | round(s3 / n / nullif((s2 / n) * sqrt(s2 / n), 0), 4) AS skewness,
        | round(s4 / n / nullif((s2 / n) * (s2 / n), 0) - 3.0, 4)
        |   AS kurtosis_excess
        |FROM m ORDER BY 1""".stripMargin,
    // F95: stopword-island phrases (string_agg ORDER BY pos — the
    // position-sorted reassembly), RAKE degree/freq in integer PPM,
    // per-occurrence word-score sums normalized by occurrence count
    "text_rake" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS w,
         |  generate_subscripts($toks, 1) AS pos FROM documents),
         |ns AS (SELECT doc_id, pos, w,
         |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
         | FROM tk WHERE w NOT IN ('the', 'a', 'and', 'of', 'to')),
         |ph AS (SELECT string_agg(w, ' ' ORDER BY pos) AS phrase,
         |  CAST(count(*) AS BIGINT) AS len
         | FROM ns GROUP BY doc_id, island),
         |ph2 AS (SELECT phrase, len FROM ph WHERE len <= 4),
         |wd AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
         |  CAST(sum(len) AS BIGINT) AS degree
         | FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len FROM ph2)
         | GROUP BY 1),
         |ws AS (SELECT w, degree * 1000000 // freq AS w_score FROM wd),
         |sc AS (SELECT phrase, CAST(sum(w_score) AS BIGINT) AS score_sum
         | FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM ph2) t
         | JOIN ws USING (w) GROUP BY 1),
         |cells AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
         | FROM ph2 GROUP BY 1)
         |SELECT rank, phrase, n_occurrences, score_ppm FROM (
         | SELECT cells.phrase, n_occurrences,
         |  CAST(score_sum // n_occurrences AS BIGINT) AS score_ppm,
         |  CAST(row_number() OVER (ORDER BY score_sum // n_occurrences DESC,
         |    cells.phrase) AS BIGINT) AS rank
         | FROM cells JOIN sc ON cells.phrase = sc.phrase)
         |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    // E61: distinct (user, week) cells, class membership via week-1
    // self-joins (set logic, zero float), churn via the week+1 anti join
    "q_growth_accounting" ->
      """WITH c AS (SELECT DISTINCT user_id,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 // 7 AS week
        | FROM events),
        |f AS (SELECT user_id, min(week) AS fw FROM c GROUP BY 1),
        |cl AS (SELECT c.week, CAST(count(*) AS BIGINT) AS wau,
        |  CAST(sum(CASE WHEN c.week = f.fw THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_retained,
        |  CAST(sum(CASE WHEN c.week <> f.fw AND p.user_id IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        | FROM c JOIN f USING (user_id)
        | LEFT JOIN c p ON p.user_id = c.user_id AND p.week = c.week - 1
        | GROUP BY 1),
        |ch AS (SELECT p.week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
        | FROM c p LEFT JOIN c n ON n.user_id = p.user_id AND n.week = p.week + 1
        | WHERE n.user_id IS NULL GROUP BY 1)
        |SELECT cl.week, wau, n_new, n_retained, n_resurrected,
        | coalesce(ch.n_churned, 0) AS n_churned
        |FROM cl LEFT JOIN ch ON cl.week = ch.week
        |ORDER BY cl.week""".stripMargin,
    // D56: (source, week) cells, the two most recent weeks full-outer
    // joined, signed integer-PPM shares (both engines truncate toward
    // zero), |delta| rank with source tie-breaks
    "mon_delta_attribution" ->
      """WITH c AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 // 7 AS week,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT max(week) AS wt FROM c),
        |cur AS (SELECT source, n AS n_cur FROM c, t WHERE week = wt),
        |prv AS (SELECT source, n AS n_prev FROM c, t WHERE week = wt - 1),
        |d AS (SELECT coalesce(cur.source, prv.source) AS source,
        |  coalesce(n_prev, 0) AS n_prev, coalesce(n_cur, 0) AS n_cur,
        |  coalesce(n_cur, 0) - coalesce(n_prev, 0) AS delta
        | FROM cur FULL OUTER JOIN prv ON cur.source = prv.source),
        |tt AS (SELECT CAST(sum(delta) AS BIGINT) AS total_delta FROM d)
        |SELECT CAST(row_number() OVER (ORDER BY abs(delta) DESC, source)
        |   AS BIGINT) AS rank,
        | source, n_prev, n_cur, delta, total_delta,
        | delta * 1000000 // nullif(total_delta, 0) AS share_ppm
        |FROM d, tt ORDER BY rank""".stripMargin,
    // E46: descending dollar-cell CDF, exact integer 80/95 boundaries
    // (5·cumb < 4·S, 20·cumb < 19·S), integer-PPM shares
    "q_abc" ->
      """WITH sp AS (
        | SELECT c_mktsegment AS seg,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS v
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY c_mktsegment, o_custkey),
        |cells AS (SELECT seg, v, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(count(*) AS BIGINT) * v AS dollars FROM sp GROUP BY 1, 2),
        |t AS (SELECT seg, CAST(sum(dollars) AS BIGINT) AS s FROM cells GROUP BY 1),
        |c2 AS (SELECT seg, v, cnt, dollars,
        |  sum(dollars) OVER (PARTITION BY seg ORDER BY v DESC) - dollars AS cumb
        | FROM cells),
        |cl AS (SELECT c2.seg, cnt, dollars, s,
        |  CASE WHEN 5 * cumb < 4 * s THEN 'A'
        |    WHEN 20 * cumb < 19 * s THEN 'B' ELSE 'C' END AS abc_class
        | FROM c2 JOIN t USING (seg))
        |SELECT seg AS c_mktsegment, abc_class,
        | CAST(sum(cnt) AS BIGINT) AS n_customers,
        | CAST(sum(dollars) AS BIGINT) AS class_dollars,
        | CAST(sum(dollars) AS BIGINT) * 1000000 // s AS share_ppm
        |FROM cl GROUP BY 1, 2, s ORDER BY 1, 2""".stripMargin,
    // D51: (source, hour-bucket) cells, one lead() gap window, exact
    // integer PPM uptime, lead/tail silence counted in the worst outage
    "mon_uptime" ->
      """WITH e AS (SELECT DISTINCT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 3600 AS b FROM events),
        |sp AS (SELECT min(b) AS blo, max(b) AS bhi
        | FROM (SELECT CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 3600 AS b
        |   FROM events)),
        |g AS (SELECT source, b, lead(b) OVER (PARTITION BY source ORDER BY b) AS nxt
        | FROM e),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_active,
        |  coalesce(max(nxt - b - 1), 0) AS gap_in,
        |  min(b) AS first_b, max(b) AS last_b FROM g GROUP BY 1)
        |SELECT source, bhi - blo + 1 AS n_expected, n_active,
        | n_active * 1000000 // (bhi - blo + 1) AS uptime_ppm,
        | greatest(gap_in, first_b - blo, bhi - last_b) AS longest_gap
        |FROM a, sp ORDER BY source""".stripMargin,
    // D49: the D40 integer daily frame, pairs via an rn self-join per
    // lag, one fixed-shape IEEE ACF expression over exact bigint stats
    "mon_autocorr" ->
      """WITH d AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |r AS (SELECT source, md,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY day) AS BIGINT) AS rn
        | FROM d),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(md) AS BIGINT) AS s_all,
        |  CAST(sum(md * md) AS BIGINT) AS ss_all FROM r GROUP BY 1),
        |p AS (SELECT a.source, g.lag, a.md AS x, b.md AS y
        | FROM r a CROSS JOIN range(1, 8) g(lag)
        | JOIN r b ON b.source = a.source AND b.rn = a.rn + g.lag),
        |st AS (SELECT source, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(x * y) AS BIGINT) AS pxy, CAST(sum(x) AS BIGINT) AS hx,
        |  CAST(sum(y) AS BIGINT) AS ty FROM p GROUP BY 1, 2)
        |SELECT source, CAST(lag AS INT) AS lag, n_days, n_pairs,
        |  CASE WHEN CAST(ss_all AS DOUBLE)
        |      - (CAST(s_all AS DOUBLE) / n_days) * s_all = 0.0 THEN NULL
        |    ELSE round((CAST(pxy AS DOUBLE)
        |      - (CAST(s_all AS DOUBLE) / n_days) * (hx + ty)
        |      + n_pairs * (CAST(s_all AS DOUBLE) / n_days)
        |        * (CAST(s_all AS DOUBLE) / n_days))
        |      / (CAST(ss_all AS DOUBLE)
        |        - (CAST(s_all AS DOUBLE) / n_days) * s_all), 4) END AS acf
        |FROM st JOIN tot USING (source)
        |ORDER BY source, lag""".stripMargin,
    // D50: pairwise slopes over the daily cells, one correctly-rounded
    // division each, lower median in (slope, d1, d2) total order
    "mon_theilsen" ->
      """WITH d AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT) AS md
        | FROM events GROUP BY 1, 2),
        |p AS (SELECT a.source, a.day AS d1, b.day AS d2,
        |  round((b.md - a.md) / CAST(b.day - a.day AS DOUBLE), 4) AS slope
        | FROM d a JOIN d b ON b.source = a.source AND b.day > a.day),
        |r AS (SELECT source, slope,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY slope, d1, d2) AS BIGINT) AS rn,
        |  CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_pairs
        | FROM p),
        |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_days FROM d GROUP BY 1)
        |SELECT source, n_days, n_pairs, slope AS ts_slope,
        |  CAST(abs(slope) > 50.0 AS INT) AS trending
        |FROM r JOIN t USING (source) WHERE rn = (n_pairs + 1) // 2
        |ORDER BY source""".stripMargin,
    // F88: shared tokenizer, vowel-group syllable proxy (floor 1/word),
    // terminator-run sentences (floor 1), one fixed-shape Flesch
    "text_readability" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks, text FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT))
         |    AS n_sentences,
         |  CAST(list_sum([greatest(1, len(regexp_extract_all(x, '[aeiouy]+')))
         |    for x in toks]) AS BIGINT) AS n_syllables
         | FROM t WHERE len(toks) > 0)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         | round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4) AS flesch
         |FROM m ORDER BY doc_id""".stripMargin,
    // F84: floored unigram/bigram counts via the shared tokenizer, the
    // fixed-order six-log PMI sum over exact integers
    "text_pmi" ->
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
         |tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS n_uni,
         |  CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS n_bi FROM t),
         |uc AS (SELECT w, count(*) AS cw
         |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1
         |  HAVING count(*) >= 5),
         |bc AS (SELECT g, count(*) AS c_xy
         |  FROM (SELECT unnest(CASE WHEN len(toks) >= 2
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 1 AS INT)), ' ')
         |          for i in range(1, len(toks))]
         |    ELSE [] END) AS g FROM t) GROUP BY 1 HAVING count(*) >= 5),
         |p AS (SELECT string_split(g, ' ')[1] AS w1,
         |  string_split(g, ' ')[2] AS w2, c_xy FROM bc)
         |SELECT w1, w2, c_xy, x.cw AS c_x, y.cw AS c_y,
         |  round(ln(c_xy) + ln(n_uni) + ln(n_uni) - ln(n_bi) - ln(x.cw)
         |    - ln(y.cw), 4) AS pmi
         |FROM p JOIN uc x ON p.w1 = x.w JOIN uc y ON p.w2 = y.w, tot
         |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    "mon_value_drift" ->
      s"""WITH e AS ($evSec),
         |m AS (SELECT min(sec) AS slo, max(sec) AS shi,
         |  min(value) AS vlo, max(value) AS vhi FROM e),
         |b AS (SELECT event_type,
         |  CASE WHEN sec <= slo + (shi - slo) // 2 THEN 'ref' ELSE 'cur' END AS win,
         |  LEAST(9, CAST(floor((value - vlo) / ((vhi - vlo) / 10)) AS INT)) AS bucket
         |  FROM e, m),
         |c AS (SELECT event_type, win, bucket, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
         |spine AS (SELECT DISTINCT e.event_type, g.bucket, w.win
         |  FROM e, range(0, 10) g(bucket), (VALUES ('ref'), ('cur')) w(win)),
         |f AS (SELECT s.event_type, s.win, s.bucket, COALESCE(c.cnt, 0) AS cnt
         |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type
         |    AND s.win = c.win AND s.bucket = c.bucket),
         |p AS (SELECT event_type, win, bucket, cnt, (cnt + 0.5) /
         |  (sum(cnt) OVER (PARTITION BY event_type, win) + 5.0) AS p FROM f),
         |bb AS (SELECT event_type, bucket,
         |  max(CASE WHEN win = 'ref' THEN p END) AS pr,
         |  max(CASE WHEN win = 'cur' THEN p END) AS pc,
         |  sum(CASE WHEN win = 'ref' THEN cnt ELSE 0 END) AS nr,
         |  sum(CASE WHEN win = 'cur' THEN cnt ELSE 0 END) AS nc
         |  FROM p GROUP BY 1, 2),
         |r AS (SELECT event_type, CAST(sum(nr) AS BIGINT) AS n_ref,
         |  CAST(sum(nc) AS BIGINT) AS n_cur,
         |  round(sum((pc - pr) * ln(pc / pr)), 4) AS psi FROM bb GROUP BY 1)
         |SELECT event_type, n_ref, n_cur, psi,
         |  CAST(psi > 0.2 AS INT) AS drifted
         |FROM r ORDER BY event_type""".stripMargin,
    // one-scan ANALYZE profile: per-column stats restated column by
    // column; typed extrema keep doubles and strings apart
    "load_analyze_stats" -> {
      val cols = Seq("o_orderkey" -> true, "o_custkey" -> true,
        "o_totalprice" -> true, "o_orderstatus" -> false, "o_orderpriority" -> false)
      cols.map { case (c, num) =>
        val (mn, mx, ms, xs) =
          if (num) (s"round(CAST(min($c) AS DOUBLE), 2)",
            s"round(CAST(max($c) AS DOUBLE), 2)", "NULL", "NULL")
          else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"min($c)", s"max($c)")
        s"""SELECT '$c' AS column_name, count(*) AS n_total,
           | count($c) AS n_notnull, count(DISTINCT $c) AS ndv,
           | $mn AS min_num, $mx AS max_num, $ms AS min_str, $xs AS max_str
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
    },
    // quarantine: the oracle replays the first-match rule chain from
    // source — matching the file-derived rollup certifies the routing
    "etl_quarantine" ->
      """WITH r AS (SELECT l_orderkey, l_quantity,
        |  CASE WHEN l_tax > 0.06 THEN 'tax_above_cap'
        |       WHEN l_discount > 0.08 THEN 'discount_above_cap'
        |       WHEN l_quantity > 45.0 THEN 'quantity_outlier'
        |       ELSE 'clean' END AS reason
        |  FROM lineitem)
        |SELECT reason, count(*) AS n_rows,
        | CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        | round(sum(l_quantity), 2) AS qty_sum
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // dynamic overwrite: the restated target equals source with the
    // batch months' bump applied — the oracle replays the restatement
    "load_dyn_overwrite" ->
      """WITH s AS (SELECT o_orderkey, o_totalprice,
        |  date_trunc('month', CAST(o_orderdate AS DATE)) AS m FROM orders)
        |SELECT strftime(m, '%Y-%m-%d') AS month, count(*) AS n_rows,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        | round(sum(o_totalprice + CASE
        |   WHEN (year(m) * 12 + month(m)) % 17 = 3 THEN 1000.0 ELSE 0 END), 2)
        |   AS sum_price
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // backfill: the healed target must equal the source exactly — the
    // oracle is the straight per-month rollup, blind to the planted gap
    "load_backfill" ->
      """SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month,
        | count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // merge-on-read: the oracle replays the delete-set algebra from the
    // source table — live rows = base minus both delete batches
    "load_mor_delete" ->
      """SELECT o_orderpriority, count(*) AS n_live,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        | round(sum(o_totalprice), 2) AS sum_price
        |FROM orders WHERE NOT (o_orderkey % 97 = 0 OR o_orderkey % 89 = 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // circuit breaker: a recursive CTE carries the automaton state
    // (consec, open_until) attempt-by-attempt through the SAME transition
    // table as the Spark replay — threshold 5, cooldown 14400 s, planted
    // weekly outage days; per-source rollup of every decision class
    "load_circuit_breaker" ->
      """WITH RECURSIVE b AS (
        | SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec, event_id,
        |  CASE WHEN CAST(floor(extract(epoch FROM ts)) AS BIGINT) % 604800 < 86400
        |   THEN 1 ELSE 0 END AS failed,
        |  CAST(row_number() OVER (PARTITION BY event_type
        |   ORDER BY CAST(floor(extract(epoch FROM ts)) AS BIGINT), event_id) AS BIGINT) AS seq
        | FROM events),
        |rec AS (
        | SELECT source, seq, sec, failed,
        |  CASE WHEN failed = 1 AND 1 >= 5 THEN 'tripped'
        |       WHEN failed = 1 THEN 'fail' ELSE 'ok' END AS decision,
        |  CASE WHEN failed = 1 AND 1 < 5 THEN 1 ELSE 0 END AS consec,
        |  CASE WHEN failed = 1 AND 1 >= 5 THEN sec + 14400 ELSE 0 END AS open_until
        | FROM b WHERE seq = 1
        | UNION ALL
        | SELECT n.source, n.seq, n.sec, n.failed,
        |  CASE WHEN r.open_until > 0 AND n.sec < r.open_until THEN 'skipped'
        |       WHEN r.open_until > 0 AND n.failed = 1 THEN 'trial_fail'
        |       WHEN r.open_until > 0 THEN 'trial_ok'
        |       WHEN n.failed = 1 AND r.consec + 1 >= 5 THEN 'tripped'
        |       WHEN n.failed = 1 THEN 'fail' ELSE 'ok' END,
        |  CASE WHEN r.open_until > 0 AND n.sec < r.open_until THEN r.consec
        |       WHEN r.open_until > 0 THEN 0
        |       WHEN n.failed = 1 AND r.consec + 1 >= 5 THEN 0
        |       WHEN n.failed = 1 THEN r.consec + 1 ELSE 0 END,
        |  CASE WHEN r.open_until > 0 AND n.sec < r.open_until THEN r.open_until
        |       WHEN r.open_until > 0 AND n.failed = 1 THEN n.sec + 14400
        |       WHEN r.open_until > 0 THEN 0
        |       WHEN n.failed = 1 AND r.consec + 1 >= 5 THEN n.sec + 14400
        |       ELSE 0 END
        | FROM rec r JOIN b n ON n.source = r.source AND n.seq = r.seq + 1)
        |SELECT source, count(*) AS n_attempts,
        | CAST(sum(CASE WHEN decision = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        | CAST(sum(CASE WHEN decision = 'fail' THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_closed,
        | CAST(sum(CASE WHEN decision = 'tripped' THEN 1 ELSE 0 END) AS BIGINT) AS n_tripped,
        | CAST(sum(CASE WHEN decision = 'skipped' THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        | CAST(sum(CASE WHEN decision = 'trial_fail' THEN 1 ELSE 0 END) AS BIGINT) AS n_trial_fail,
        | CAST(sum(CASE WHEN decision = 'trial_ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_trial_ok,
        | min(CASE WHEN decision = 'tripped' THEN sec END) AS first_trip_sec,
        | max(CASE WHEN decision IN ('tripped', 'trial_fail') THEN sec END) AS last_trip_sec
        |FROM rec GROUP BY source ORDER BY source""".stripMargin,
    // bloom-index point lookups: no false negatives, so the pruned-scan
    // result must equal the straight lookup (the absent probe key is
    // absent from BOTH sides); partition-pruning telemetry is spec-side
    "load_bloom_index" ->
      """SELECT l_orderkey, count(*) AS n_rows,
        | CAST(sum(l_suppkey + l_linenumber) AS BIGINT) AS key_checksum
        |FROM lineitem WHERE l_orderkey IN (42, 7777, 9988, 1000000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // order-independent table fingerprint: both rows recomputed from the
    // SOURCE — matching the copy row certifies the round-tripped bytes
    "load_table_checksum" ->
      """WITH h AS (SELECT ('0x' || substr(md5(
        |   o_orderkey || '|' || o_custkey || '|' || o_orderstatus
        |     || '|' || o_orderpriority), 1, 8))::BIGINT AS h FROM orders)
        |SELECT 'copy' AS side, count(*) AS n_rows,
        | CAST(sum(h) AS BIGINT) AS sum_hash, bit_xor(h) AS xor_hash FROM h
        |UNION ALL
        |SELECT 'source', count(*), CAST(sum(h) AS BIGINT), bit_xor(h) FROM h
        |ORDER BY side""".stripMargin,
    // observe()-collected QC riding the write pass: the oracle recomputes
    // the same aggregates from source — matching proves the observed pass
    // saw every written row
    "load_observed_qc" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        | round(sum(o_totalprice), 2) AS price_sum
        |FROM orders""".stripMargin,
    // incremental view maintenance: the oracle is the full recompute the
    // summary+delta merge replaces — outputs must be identical
    "load_incremental_view" ->
      s"""WITH ev AS ($evSec)
         |SELECT CAST(floor(sec / 86400) AS BIGINT) AS day, event_type,
         | count(*) AS n, round(sum("value"), 2) AS value_sum
         |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // fuzzy linkage: same trigram blocking + levenshtein verify + best
    // match per record (row_number stands in for Spark's min_by)
    "etl_fuzzy_match" ->
      """WITH dirty AS (SELECT CAST(p_partkey AS BIGINT) AS key,
        |  CASE WHEN p_partkey % 3 = 0 THEN substr(p_name, 2)
        |       WHEN p_partkey % 3 = 1 THEN p_name || substr(p_name, length(p_name), 1)
        |       ELSE replace(p_name, ' ', '_') END AS dirty_name FROM part),
        |clean AS (SELECT DISTINCT p_name AS clean_name FROM part),
        |cg AS (SELECT clean_name, unnest(list_distinct(CASE WHEN length(clean_name) >= 3
        |  THEN [substr(clean_name, CAST(i AS INT), 3) for i in range(1, length(clean_name) - 1)]
        |  ELSE [clean_name] END)) AS g FROM clean),
        |dg AS (SELECT key, dirty_name, unnest(list_distinct(CASE WHEN length(dirty_name) >= 3
        |  THEN [substr(dirty_name, CAST(i AS INT), 3) for i in range(1, length(dirty_name) - 1)]
        |  ELSE [dirty_name] END)) AS g FROM dirty),
        |cand AS (SELECT DISTINCT key, dirty_name, clean_name FROM dg JOIN cg USING (g)),
        |sc AS (SELECT key, clean_name, levenshtein(dirty_name, clean_name) AS dist
        |  FROM cand WHERE levenshtein(dirty_name, clean_name) <= 2),
        |best AS (SELECT key, clean_name AS matched_name, dist,
        |  row_number() OVER (PARTITION BY key ORDER BY dist, clean_name) AS rn FROM sc)
        |SELECT coalesce(b.matched_name, 'UNMATCHED') AS matched_name,
        | count(*) AS n_records,
        | CAST(coalesce(sum(b.dist), 0) AS BIGINT) AS total_dist,
        | CAST(sum(d.key) AS BIGINT) AS key_checksum
        |FROM dirty d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (key)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // file stats: the oracle reads the exact files the op wrote (same
    // verify run), so per-file attribution and bounds must agree. The
    // path resolves through the SAME conf root the op writes to
    // (Tables.oracleScratchRoot reads the active session's
    // graft.scratch.root) — a redirected-scratch verify run stays in
    // lockstep instead of reading stale files from the default root.
    "load_file_stats" ->
      s"""SELECT CAST(batch AS INT) AS batch,
        | regexp_extract(filename, '([^/]+)$$', 1) AS file,
        | count(*) AS n_rows, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
        |FROM read_parquet('${Tables.oracleScratchRoot}/graft_filestats/orders/*/*.parquet',
        |  filename=true, hive_partitioning=true)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mon_decay_avg" ->
      """WITH runs AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  sum(value) AS duration FROM events GROUP BY 1, 2)
        |SELECT t.source, t.day, count(*) AS n_in_window,
        | round(max(t.duration), 2) AS duration,
        | round(sum(p.duration * pow(0.5, t.day - p.day))
        |   / sum(pow(0.5, t.day - p.day)), 4) AS smoothed,
        | round(max(t.duration) / (sum(p.duration * pow(0.5, t.day - p.day))
        |   / sum(pow(0.5, t.day - p.day))), 4) AS anomaly_ratio
        |FROM runs t JOIN runs p ON t.source = p.source
        |  AND p.day <= t.day AND p.day > t.day - 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "geo_hotspot" ->
      s"""WITH c AS ($synthXY),
         |cl AS (SELECT CAST(floor(x / 100000) AS BIGINT) AS cx,
         |  CAST(floor(y / 100000) AS BIGINT) AS cy, count(*) AS n
         | FROM c GROUP BY 1, 2),
         |o AS (SELECT a.dx, b.dy FROM (VALUES (-1), (0), (1)) a(dx),
         |  (VALUES (-1), (0), (1)) b(dy)),
         |r AS (SELECT c2.cx + o.dx AS ncx, c2.cy + o.dy AS ncy,
         |  c2.cx AS ocx, c2.cy AS ocy FROM cl c2, o),
         |ring AS (SELECT r.ocx AS cx, r.ocy AS cy,
         |  CAST(sum(cl.n) AS BIGINT) AS ring_sum,
         |  CAST(count(*) AS BIGINT) AS ring_cells
         | FROM r JOIN cl ON r.ncx = cl.cx AND r.ncy = cl.cy GROUP BY 1, 2),
         |g AS (SELECT CAST(count(*) AS DOUBLE) AS nc, avg(n) AS mean,
         |  sqrt(CAST(sum(n * n) AS DOUBLE) / count(*) - avg(n) * avg(n)) AS sd
         | FROM cl)
         |SELECT cl.cx, cl.cy, cl.n, ring_sum, ring_cells,
         | round((ring_sum - ring_cells * mean) / (sd * sqrt(CAST(ring_cells AS DOUBLE)
         |   * (nc - ring_cells) / (nc - 1.0))), 4) AS gi_z,
         | CAST((ring_sum - ring_cells * mean) / (sd * sqrt(CAST(ring_cells AS DOUBLE)
         |   * (nc - ring_cells) / (nc - 1.0))) > 2.0 AS INT) AS hot,
         | CAST((ring_sum - ring_cells * mean) / (sd * sqrt(CAST(ring_cells AS DOUBLE)
         |   * (nc - ring_cells) / (nc - 1.0))) < -2.0 AS INT) AS cold
         |FROM cl JOIN ring USING (cx, cy), g ORDER BY cx, cy""".stripMargin,
    "mon_run_gaps" ->
      """WITH runs AS (SELECT DISTINCT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day FROM events),
        |kept AS (SELECT source, day FROM runs WHERE (day + length(source)) % 7 <> 0),
        |b AS (SELECT source, min(day) AS mn, max(day) AS mx FROM kept GROUP BY 1),
        |spine AS (SELECT source, unnest(generate_series(mn, mx)) AS day FROM b)
        |SELECT s.source, count(*) AS span_days,
        | CAST(sum(CASE WHEN k.day IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
        | CAST(coalesce(sum(CASE WHEN k.day IS NULL THEN s.day END), 0) AS BIGINT)
        |   AS gap_day_checksum
        |FROM spine s LEFT JOIN kept k ON s.source = k.source AND s.day = k.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // gap fill: the generated dense spine left-joined to aggregated
    // counts — zeros materialized for every absent (source, hour) cell
    "mon_gap_fill" ->
      """WITH ev AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 3600 AS hour, value
        | FROM events),
        |b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM ev),
        |grid AS (SELECT source, unnest(generate_series(mn, mx)) AS hour
        |  FROM (SELECT DISTINCT source FROM ev), b),
        |c AS (SELECT source, hour, count(*) AS n, sum(value) AS v
        |  FROM ev GROUP BY 1, 2)
        |SELECT g.source, g.hour, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events,
        | round(coalesce(c.v, 0), 2) AS value_sum
        |FROM grid g LEFT JOIN c ON g.source = c.source AND g.hour = c.hour
        |ORDER BY 1, 2""".stripMargin,
    "load_fk_validate" ->
      """WITH dim AS (SELECT c_custkey FROM customer WHERE c_custkey % 11 <> 0)
        |SELECT o_orderpriority, count(*) AS n_orders,
        | CAST(sum(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        | CAST(coalesce(sum(CASE WHEN d.c_custkey IS NULL THEN o_orderkey END), 0) AS BIGINT)
        |   AS orphan_checksum
        |FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "mon_freshness" ->
      """WITH runs AS (SELECT event_type AS source,
        |  max(CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400) AS last_run_day,
        |  count(*) AS n_runs
        | FROM events GROUP BY 1),
        |wm AS (SELECT max(last_run_day) AS watermark FROM runs)
        |SELECT source, n_runs, last_run_day,
        | CAST(watermark - last_run_day AS BIGINT) AS age_days,
        | CAST(watermark - last_run_day >= 3 AS INT) AS stale
        |FROM runs, wm ORDER BY source""".stripMargin,
    // SCD2 merge: full-outer classification + per-key row expansion as
    // UNION ALL branches; 9999999999 is the open-row high-date sentinel
    "load_scd2" ->
      """WITH cur AS (SELECT c_custkey AS key, c_mktsegment AS cur_attr
        |  FROM customer WHERE c_custkey % 7 <> 0),
        |b AS (SELECT c_custkey AS key,
        |  CASE WHEN c_custkey % 6 = 0 THEN c_mktsegment || '_V2'
        |       ELSE c_mktsegment END AS new_attr
        |  FROM customer WHERE c_custkey % 2 = 0),
        |j AS (SELECT coalesce(cur.key, b.key) AS key, cur_attr, new_attr
        |  FROM cur FULL OUTER JOIN b ON cur.key = b.key)
        |SELECT key, attr, CAST(valid_from AS BIGINT) AS valid_from,
        | CAST(valid_to AS BIGINT) AS valid_to,
        | CAST(is_current AS INT) AS is_current, row_status FROM (
        |  SELECT key, new_attr AS attr, 100 AS valid_from,
        |    9999999999 AS valid_to, 1 AS is_current, 'new_key' AS row_status
        |  FROM j WHERE cur_attr IS NULL
        |  UNION ALL
        |  SELECT key, cur_attr, 0, 9999999999, 1, 'active'
        |  FROM j WHERE cur_attr IS NOT NULL
        |    AND (new_attr IS NULL OR new_attr = cur_attr)
        |  UNION ALL
        |  SELECT key, cur_attr, 0, 100, 0, 'closed'
        |  FROM j WHERE cur_attr IS NOT NULL AND new_attr IS NOT NULL
        |    AND new_attr <> cur_attr
        |  UNION ALL
        |  SELECT key, new_attr, 100, 9999999999, 1, 'new_version'
        |  FROM j WHERE cur_attr IS NOT NULL AND new_attr IS NOT NULL
        |    AND new_attr <> cur_attr
        |) ORDER BY key, valid_from""".stripMargin,
    "mon_run_drift" ->
      """WITH runs AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS run_day,
        |  count(*) AS n_features, round(sum(value), 2) AS duration
        | FROM events GROUP BY 1, 2),
        |l AS (SELECT *, lag(n_features) OVER w AS pf, lag(duration) OVER w AS pd
        | FROM runs WINDOW w AS (PARTITION BY source ORDER BY run_day))
        |SELECT source, run_day, CAST(n_features AS BIGINT) AS n_features,
        | round(CAST(n_features - pf AS DOUBLE) / pf * 100, 2) AS feature_drift_pct,
        | round((duration - pd) / pd * 100, 2) AS duration_drift_pct,
        | CAST(pf IS NOT NULL AND n_features < pf * 0.5 AS INT) AS shrink_alert
        |FROM l ORDER BY source, run_day""".stripMargin,
    "mon_key_skew" ->
      """WITH k AS (SELECT CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END AS join_key
        |  FROM events),
        |h AS (SELECT join_key, count(*) AS n FROM k GROUP BY 1),
        |t AS (SELECT join_key, n, row_number() OVER (ORDER BY n DESC, join_key) AS rn FROM h),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |  CAST(max(n) AS BIGINT) AS top_n FROM h)
        |SELECT a.n_rows, a.n_keys, t.join_key AS top_key, a.top_n,
        | round(CAST(a.top_n AS DOUBLE) / a.n_rows, 4) AS top_share,
        | round(CAST(a.top_n AS DOUBLE) * a.n_keys / a.n_rows, 2) AS skew_ratio,
        | CAST(round(CAST(a.top_n AS DOUBLE) * a.n_keys / a.n_rows, 2) >= 10.0 AS INT) AS needs_salting
        |FROM a, t WHERE t.rn = 1""".stripMargin,
    "mon_failure_streaks" ->
      s"""WITH ev AS (SELECT *, CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS sec,
         |  CASE WHEN value < 1.0 THEN 1 ELSE 0 END AS failed FROM events),
         |i AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY sec, event_id)
         |  - row_number() OVER (PARTITION BY event_type, failed ORDER BY sec, event_id) AS grp
         | FROM ev),
         |s AS (SELECT event_type AS source, grp, count(*) AS len FROM i
         | WHERE failed = 1 GROUP BY 1, 2)
         |SELECT source, count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak,
         | CAST(sum(len) AS BIGINT) AS n_failed_runs,
         | CAST(max(len) >= 3 AS INT) AS alert
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        | AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 495000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderpriority = '1-URGENT' AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_topk" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |SELECT o_custkey, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_topk_pergroup" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice FROM r WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        | count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderstatus,
        | CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        | CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        | CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        | CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
        | CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low,
        | round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // unpivot keeps zero cells — the oracle rebuilds absent combos with a
    // status × priority cross join over the re-aggregated base
    "q_unpivot" ->
      """SELECT s.o_orderstatus, p.o_orderpriority,
        | CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
        |FROM (SELECT DISTINCT o_orderstatus FROM orders) s
        |CROSS JOIN (VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'),
        |  ('4-NOT SPECIFIED'), ('5-LOW')) p(o_orderpriority)
        |LEFT JOIN (SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2) c
        | ON s.o_orderstatus = c.o_orderstatus
        |  AND p.o_orderpriority = c.o_orderpriority
        |ORDER BY 1, 2""".stripMargin,
    // deterministic hash sample: the oracle recomputes the exact same
    // md5-bucket sample; integrity and nesting columns must be 0
    "sample_hash" ->
      """WITH b AS (SELECT o_orderkey,
        |  ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100
        |    AS bk FROM orders),
        |lb AS (SELECT l_orderkey,
        |  ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100
        |    AS bk FROM lineitem)
        |SELECT r.rate_pct,
        | (SELECT count(*) FROM b WHERE bk < r.rate_pct) AS n_orders,
        | (SELECT count(*) FROM lb WHERE bk < r.rate_pct) AS n_lineitems,
        | (SELECT count(*) FROM lb WHERE bk < r.rate_pct AND l_orderkey NOT IN
        |    (SELECT o_orderkey FROM b WHERE bk < r.rate_pct)) AS n_orphan_lineitems,
        | (SELECT count(*) FROM b WHERE bk < r.rate_pct AND NOT bk < 10)
        |    AS n_escaping_nested
        |FROM (VALUES (5), (10)) r(rate_pct) ORDER BY r.rate_pct""".stripMargin,
    "q_skyline" ->
      """WITH pts AS (SELECT l_returnflag AS flag, l_linestatus AS mode,
        |  l_extendedprice AS price, l_discount AS disc, count(*) AS n_rows
        |  FROM lineitem GROUP BY 1, 2, 3, 4)
        |SELECT flag, mode, price, disc, n_rows FROM pts a
        |WHERE NOT EXISTS (SELECT 1 FROM pts b
        |  WHERE b.flag = a.flag AND b.mode = a.mode
        |    AND b.price <= a.price AND b.disc >= a.disc
        |    AND (b.price < a.price OR b.disc > a.disc))
        |ORDER BY flag, mode, price""".stripMargin,
    "q_union_dedup" ->
      """SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        |UNION SELECT CAST(s_nationkey AS INT) FROM supplier ORDER BY nk""".stripMargin,
    "q_asof_join" ->
      s"""WITH ev AS ($evSec),
         |c AS (SELECT user_id, sec, max(value) AS click_value FROM ev
         |  WHERE event_type = 'click' GROUP BY 1, 2),
         |p AS (SELECT event_id, user_id, sec, value FROM ev WHERE event_type = 'purchase')
         |SELECT p.event_id, p.user_id, p.sec AS purchase_sec, p.value AS purchase_value,
         | c.sec AS last_click_sec, round(c.click_value, 2) AS last_click_value
         |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.sec >= c.sec
         |ORDER BY p.event_id""".stripMargin,
    "q_sessionize" ->
      s"""WITH ev AS ($evSec),
         |b AS (SELECT user_id, event_id, sec, value,
         |  CASE WHEN lag(sec) OVER w IS NULL THEN 1
         |       WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
         | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |s AS (SELECT user_id, sec, value, sum(brk) OVER
         |  (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS session_id
         | FROM b)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
         | CAST(min(sec) AS BIGINT) AS start_sec, CAST(max(sec) AS BIGINT) AS end_sec,
         | round(sum(value), 2) AS session_value
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // E62: the shared session chain with the entry type via rn=1, then
    // type-1 CDF picks over (entry, duration) and (entry, size) cells
    "q_session_stats" ->
      s"""WITH ev AS ($evSec),
         |b AS (SELECT user_id, event_id, sec, event_type,
         |  CASE WHEN lag(sec) OVER w IS NULL THEN 1
         |       WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS brk
         | FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |s AS (SELECT user_id, sec, event_id, event_type, sum(brk) OVER
         |  (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING)
         |    AS session_id
         | FROM b),
         |agg AS (SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(max(sec) - min(sec) AS BIGINT) AS dur
         | FROM s GROUP BY 1, 2),
         |ent AS (SELECT user_id, session_id, event_type AS entry_type FROM (
         |  SELECT user_id, session_id, event_type, row_number() OVER (
         |   PARTITION BY user_id, session_id ORDER BY sec, event_id) AS rn FROM s)
         | WHERE rn = 1),
         |sess AS (SELECT entry_type, dur, n_events
         | FROM agg JOIN ent USING (user_id, session_id)),
         |base AS (SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
         |  CAST(sum(n_events) AS BIGINT) AS total_events
         | FROM sess GROUP BY 1),
         |dc AS (SELECT entry_type, dur AS v, CAST(count(*) AS BIGINT) AS cnt
         | FROM sess GROUP BY 1, 2),
         |dp AS (SELECT entry_type,
         |  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50_duration_sec
         | FROM (SELECT entry_type, v,
         |   CAST(sum(cnt) OVER (PARTITION BY entry_type ORDER BY v) AS BIGINT) AS cum,
         |   CAST(sum(cnt) OVER (PARTITION BY entry_type) AS BIGINT) AS n FROM dc)
         | GROUP BY 1),
         |ec AS (SELECT entry_type, n_events AS v, CAST(count(*) AS BIGINT) AS cnt
         | FROM sess GROUP BY 1, 2),
         |ep AS (SELECT entry_type,
         |  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS p50_events
         | FROM (SELECT entry_type, v,
         |   CAST(sum(cnt) OVER (PARTITION BY entry_type ORDER BY v) AS BIGINT) AS cum,
         |   CAST(sum(cnt) OVER (PARTITION BY entry_type) AS BIGINT) AS n FROM ec)
         | GROUP BY 1)
         |SELECT base.entry_type, n_sessions, n_bounce,
         | n_bounce * 1000000 // n_sessions AS bounce_ppm,
         | p50_duration_sec, p50_events,
         | total_events // n_sessions AS mean_events
         |FROM base JOIN dp USING (entry_type) JOIN ep USING (entry_type)
         |ORDER BY 1""".stripMargin,
    // the oracle is the naive range join; the banded plan must produce
    // each qualifying pair exactly once
    "q_band_join" ->
      s"""WITH ev AS ($evSec),
         |c AS (SELECT user_id, sec AS cs FROM ev WHERE event_type = 'click'),
         |v AS (SELECT user_id, sec AS vs FROM ev WHERE event_type = 'view')
         |SELECT user_id, count(*) AS n_pairs,
         | CAST(min(abs(cs - vs)) AS BIGINT) AS min_gap,
         | CAST(sum(cs - vs) AS BIGINT) AS gap_sum
         |FROM c JOIN v USING (user_id) WHERE abs(cs - vs) <= 3600
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact heavy hitters: the oracle is the full-shuffle plan the
    // Misra-Gries candidate screen replaces — outputs must be identical
    "q_heavy_hitters" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id, count(*) AS n
        |FROM events GROUP BY 1
        |HAVING count(*) > (SELECT count(*) FROM events) / 150.0
        |ORDER BY 1""".stripMargin,
    // keyless overlap join: the oracle states the quadratic predicate
    // directly; the Spark plan must produce the SAME pairs through the
    // grid-cell equi rewrite (each pair counted once, in its canonical cell)
    "q_interval_join" ->
      s"""WITH ev AS ($evSec),
         |i AS (SELECT event_id AS inc_id, CAST(sec AS BIGINT) AS s1,
         |  CAST(sec + 600 AS BIGINT) AS e1 FROM ev WHERE event_type = 'error'),
         |p AS (SELECT event_id AS pur_id, CAST(sec AS BIGINT) AS s2,
         |  CAST(sec + 120 AS BIGINT) AS e2 FROM ev WHERE event_type = 'purchase')
         |SELECT inc_id, pur_id, greatest(s1, s2) AS ov_start, least(e1, e2) AS ov_end,
         | least(e1, e2) - greatest(s1, s2) AS ov_sec
         |FROM i JOIN p ON s1 <= e2 AND s2 <= e1
         |ORDER BY inc_id, pur_id""".stripMargin,
    "q_funnel" ->
      s"""WITH ev AS ($evSec),
         |c AS (SELECT user_id, CAST(min(sec) AS BIGINT) AS first_click FROM ev
         |  WHERE event_type = 'click' GROUP BY 1),
         |p AS (SELECT user_id, sec FROM ev WHERE event_type = 'purchase'),
         |j AS (SELECT c.user_id, first_click,
         |  min(CASE WHEN p.sec >= first_click THEN p.sec END) AS fp
         | FROM c LEFT JOIN p ON c.user_id = p.user_id GROUP BY 1, 2)
         |SELECT count(*) AS n_clickers,
         | CAST(sum(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
         | CAST(sum(CASE WHEN fp IS NOT NULL THEN fp - first_click ELSE 0 END) AS BIGINT) AS delay_sum
         |FROM j""".stripMargin,
    // weeks are epoch-week integers on both sides — identical integer
    // division, so the cohort matrix matches cell-for-cell
    "q_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  (CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400) // 7 AS week
        | FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
        |s AS (SELECT cohort_week, count(*) AS cohort_size FROM c GROUP BY 1)
        |SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
        | count(*) AS n_active, s.cohort_size,
        | round(CAST(count(*) AS DOUBLE) / s.cohort_size, 4) AS retention
        |FROM uw JOIN c USING (user_id) JOIN s ON s.cohort_week = c.cohort_week
        |GROUP BY 1, 2, 4 ORDER BY 1, 2""".stripMargin,
    // E43: distinct (user, day) cells, the day − row_number island key,
    // exact integer rollups to the streak-length histogram
    "q_gaps_islands" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day
        | FROM events),
        |i AS (SELECT user_id, day
        |  - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS BIGINT)
        |  AS island FROM a),
        |g AS (SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
        | FROM i GROUP BY 1, 2),
        |u AS (SELECT user_id, max(len) AS longest_streak,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(len) AS BIGINT) AS active_days FROM g GROUP BY 1)
        |SELECT longest_streak, CAST(count(*) AS BIGINT) AS n_users,
        | CAST(sum(n_islands) AS BIGINT) AS sum_islands,
        | max(active_days) AS max_active_days
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // E44: exact-integer metrics, inverse-CDF quintile boundaries over
    // value cells with integer ceil ((k·n+4) div 5), pure integer
    // comparisons for every score, boundary ties to the lower bucket
    "q_rfm" ->
      """WITH c AS (SELECT o_custkey,
        |  max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_day,
        |  CAST(count(*) AS BIGINT) AS freq,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |s0 AS (SELECT o_custkey, freq, cents,
        |  (SELECT max(last_day) FROM c) - last_day AS rec,
        |  cents // 100 AS dollars FROM c),
        |rcum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
        |  (SELECT count(*) FROM s0) AS n
        | FROM (SELECT rec AS v, count(*) AS cnt FROM s0 GROUP BY 1)),
        |rb AS (SELECT min(CASE WHEN cum >= (1*n+4)//5 THEN v END) AS b1,
        |  min(CASE WHEN cum >= (2*n+4)//5 THEN v END) AS b2,
        |  min(CASE WHEN cum >= (3*n+4)//5 THEN v END) AS b3,
        |  min(CASE WHEN cum >= (4*n+4)//5 THEN v END) AS b4 FROM rcum),
        |fcum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
        |  (SELECT count(*) FROM s0) AS n
        | FROM (SELECT freq AS v, count(*) AS cnt FROM s0 GROUP BY 1)),
        |fb AS (SELECT min(CASE WHEN cum >= (1*n+4)//5 THEN v END) AS b1,
        |  min(CASE WHEN cum >= (2*n+4)//5 THEN v END) AS b2,
        |  min(CASE WHEN cum >= (3*n+4)//5 THEN v END) AS b3,
        |  min(CASE WHEN cum >= (4*n+4)//5 THEN v END) AS b4 FROM fcum),
        |mcum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
        |  (SELECT count(*) FROM s0) AS n
        | FROM (SELECT dollars AS v, count(*) AS cnt FROM s0 GROUP BY 1)),
        |mb AS (SELECT min(CASE WHEN cum >= (1*n+4)//5 THEN v END) AS b1,
        |  min(CASE WHEN cum >= (2*n+4)//5 THEN v END) AS b2,
        |  min(CASE WHEN cum >= (3*n+4)//5 THEN v END) AS b3,
        |  min(CASE WHEN cum >= (4*n+4)//5 THEN v END) AS b4 FROM mcum),
        |sc AS (SELECT cents,
        |  6 - (1 + CAST(rec > rb.b1 AS INT) + CAST(rec > rb.b2 AS INT)
        |    + CAST(rec > rb.b3 AS INT) + CAST(rec > rb.b4 AS INT)) AS r_score,
        |  1 + CAST(freq > fb.b1 AS INT) + CAST(freq > fb.b2 AS INT)
        |    + CAST(freq > fb.b3 AS INT) + CAST(freq > fb.b4 AS INT) AS f_score,
        |  1 + CAST(dollars > mb.b1 AS INT) + CAST(dollars > mb.b2 AS INT)
        |    + CAST(dollars > mb.b3 AS INT) + CAST(dollars > mb.b4 AS INT) AS m_score
        | FROM s0, rb, fb, mb)
        |SELECT r_score, f_score, m_score,
        | CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champions'
        |   WHEN r_score <= 2 AND f_score >= 4 THEN 'lapsed_loyal'
        |   WHEN r_score >= 4 AND f_score <= 2 THEN 'recent_light'
        |   ELSE 'mid' END AS segment,
        | CAST(count(*) AS BIGINT) AS n_customers,
        | CAST(sum(cents) AS BIGINT) AS segment_cents
        |FROM sc GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3""".stripMargin,
    // E35: deterministic per-user ordering (sec, event_id) — event_id is
    // unique, so lead() sees one sequence in both engines; PPM division
    // is exact integer on both sides
    "q_markov_transitions" ->
      s"""WITH ev AS ($evSec),
         |nx AS (SELECT event_type,
         |  lead(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id)
         |    AS next_type FROM ev),
         |m AS (SELECT event_type AS state, next_type AS next_state,
         |  CAST(count(*) AS BIGINT) AS n
         | FROM nx WHERE next_type IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT state, next_state, n,
         |  CAST(sum(n) OVER (PARTITION BY state) AS BIGINT) AS state_total
         | FROM m)
         |SELECT state, next_state, n, state_total,
         | (n * 1000000) // state_total AS p_ppm
         |FROM t ORDER BY state, next_state""".stripMargin,
    // E41: exact-integer midranks in 2× units over value-bounded cent
    // cells; one fixed-shape z from exact bigint (U, tie-sum) state
    "q_mannwhitney" ->
      """WITH e AS (SELECT event_type, user_id % 2 = 0 AS a,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |cells AS (SELECT event_type, cents,
        |  sum(CASE WHEN a THEN 1 ELSE 0 END) AS na,
        |  sum(CASE WHEN a THEN 0 ELSE 1 END) AS nb
        | FROM e GROUP BY 1, 2),
        |r AS (SELECT event_type, na, nb, na + nb AS cnt,
        |  coalesce(sum(na + nb) OVER (PARTITION BY event_type ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        | FROM cells),
        |g AS (SELECT event_type,
        |  CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b,
        |  CAST(sum(na * (2 * cb + cnt + 1)) AS BIGINT) AS r2,
        |  CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ts
        | FROM r GROUP BY 1),
        |s AS (SELECT *, n_a + n_b AS n, r2 - n_a * (n_a + 1) AS u2 FROM g),
        |z AS (SELECT *, round(
        |  (CAST(u2 AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b) /
        |  nullif(2.0 * sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0 *
        |    (CAST(n + 1 AS DOUBLE) - CAST(ts AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * (n - 1)))), 0.0), 4) AS z FROM s)
        |SELECT event_type, n_a, n_b, CAST(u2 AS DOUBLE) / 2.0 AS u, z,
        |  CAST(abs(z) >= 1.96 AS INT) AS significant
        |FROM z ORDER BY event_type""".stripMargin,
    // E63: AUC by the rank identity U/(n+ n-) over the E41 integer
    // midrank cells; label = calendar weekend of the epoch day
    "q_auc_roc" ->
      """WITH e AS (SELECT event_type AS source,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CAST(((CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400) + 4)
        |    % 7 IN (0, 6) AS BIGINT) AS pos FROM events),
        |cells AS (SELECT source, cents, CAST(sum(pos) AS BIGINT) AS np,
        |  CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
        |r AS (SELECT source, np, cnt,
        |  coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        | FROM cells),
        |g AS (SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(cnt - np) AS BIGINT) AS n_neg,
        |  CAST(sum(np * (2 * cb + cnt + 1)) AS BIGINT) AS r2
        | FROM r GROUP BY 1),
        |s AS (SELECT source, n_pos, n_neg,
        |  r2 - n_pos * (n_pos + 1) AS u2 FROM g),
        |a AS (SELECT source, n_pos, n_neg, round(CAST(u2 AS DOUBLE) /
        |  nullif(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE), 0.0),
        |  6) AS auc FROM s)
        |SELECT source, n_pos, n_neg, auc,
        |  CAST(abs(auc - 0.5) >= 0.02 AS INT) AS separates
        |FROM a ORDER BY source""".stripMargin,
    // D59: reliability diagram on the same cells — exact midrank
    // percentile micros, decile bins, floor-divided per-bin means
    "mon_calibration" ->
      """WITH e AS (SELECT event_type AS source,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  CAST(((CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400) + 4)
        |    % 7 IN (0, 6) AS BIGINT) AS pos FROM events),
        |cells AS (SELECT source, cents, CAST(sum(pos) AS BIGINT) AS np,
        |  CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
        |r AS (SELECT source, np, cnt,
        |  coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
        |  sum(cnt) OVER (PARTITION BY source) AS n
        | FROM cells),
        |p AS (SELECT source, np, cnt,
        |  (2 * cb + cnt) * 500000 // n AS p_micro FROM r),
        |b AS (SELECT source, CAST(p_micro // 100000 AS BIGINT) AS bin,
        |  CAST(sum(cnt) AS BIGINT) AS n_bin, CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(cnt * p_micro) // sum(cnt) AS BIGINT) AS mean_p_micro
        | FROM p GROUP BY 1, 2)
        |SELECT source, bin, n_bin, n_pos, mean_p_micro,
        |  CAST(n_pos * 1000000 // n_bin AS BIGINT) AS frac_pos_micro,
        |  CAST(abs(mean_p_micro - n_pos * 1000000 // n_bin) AS BIGINT)
        |    AS gap_micro
        |FROM b ORDER BY source, bin""".stripMargin,
    // D60: S from the daily pair join, tie-corrected var18 integral,
    // significance by cross-multiplied integers, z one IEEE shape
    "mon_mann_kendall" ->
      """WITH d AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT)
        |    AS md
        | FROM events GROUP BY 1, 2),
        |s AS (SELECT a.source, CAST(sum(CASE WHEN b.md > a.md THEN 1
        |    WHEN b.md < a.md THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        | FROM d a JOIN d b ON a.source = b.source AND a.day < b.day
        | GROUP BY 1),
        |t AS (SELECT source, md, count(*) AS t FROM d GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(t) AS BIGINT) AS n_days,
        |  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        | FROM t GROUP BY 1),
        |v AS (SELECT g.source, n_days, s_stat,
        |  CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS BIGINT)
        |    AS var18
        | FROM g JOIN s USING (source))
        |SELECT source, n_days, s_stat, var18,
        | round((CAST(s_stat AS DOUBLE) - CAST(sign(s_stat) AS DOUBLE)) /
        |   nullif(sqrt(CAST(var18 AS DOUBLE) / 18.0), 0.0), 4) AS z,
        | CAST(sign(s_stat) AS INT) AS trend,
        | CASE WHEN var18 = 0 THEN NULL ELSE CAST(abs(s_stat) > 0 AND
        |   10000 * 18 * (abs(s_stat) - 1) * (abs(s_stat) - 1)
        |     > 38416 * var18 AS INT) END AS significant
        |FROM v ORDER BY source""".stripMargin,
    // D63: Hirsch–Slack seasonal MK — the D60 machinery keyed on
    // (source, dow); independent seasons' S and var18 sum exactly
    "mon_seasonal_mk" ->
      """WITH d AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*) AS BIGINT)
        |    AS md
        | FROM events GROUP BY 1, 2),
        |dd AS (SELECT source, day, (day + 4) % 7 AS dow, md FROM d),
        |s AS (SELECT a.source, CAST(sum(CASE WHEN b.md > a.md THEN 1
        |    WHEN b.md < a.md THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        | FROM dd a JOIN dd b ON a.source = b.source AND a.dow = b.dow
        |  AND a.day < b.day
        | GROUP BY 1),
        |t AS (SELECT source, dow, md, count(*) AS t FROM dd GROUP BY 1, 2, 3),
        |gs AS (SELECT source, dow, CAST(sum(t) AS BIGINT) AS nd,
        |  CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        | FROM t GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(nd) AS BIGINT) AS n_days,
        |  CAST(count(*) AS BIGINT) AS n_seasons,
        |  CAST(sum(nd * (nd - 1) * (2 * nd + 5) - tie18) AS BIGINT) AS var18
        | FROM gs GROUP BY 1)
        |SELECT g.source, n_days, n_seasons, s_stat, var18,
        | round((CAST(s_stat AS DOUBLE) - CAST(sign(s_stat) AS DOUBLE)) /
        |   nullif(sqrt(CAST(var18 AS DOUBLE) / 18.0), 0.0), 4) AS z,
        | CAST(sign(s_stat) AS INT) AS trend,
        | CASE WHEN var18 = 0 THEN NULL ELSE CAST(abs(s_stat) > 0 AND
        |   10000 * 18 * (abs(s_stat) - 1) * (abs(s_stat) - 1)
        |     > 38416 * var18 AS INT) END AS significant
        |FROM g JOIN s USING (source) ORDER BY g.source""".stripMargin,
    // D61: fixed-width global bins, +1 Laplace smoothing, one-division
    // integer-ratio ln, bin-ordered float fold on both engines
    "mon_psi" ->
      """WITH e AS (SELECT event_type AS source,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1,
        |  min(cents) AS c0, max(cents) AS c1 FROM e),
        |b AS (SELECT source,
        |  CAST(day >= d0 + (d1 - d0 + 1) // 2 AS BIGINT) AS cur,
        |  least(9, (cents - c0) * 10 // (c1 - c0 + 1)) AS bin
        | FROM e, bounds),
        |cells AS (SELECT source, bin, CAST(sum(1 - cur) AS BIGINT) AS nb,
        |  CAST(sum(cur) AS BIGINT) AS nc FROM b GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(nb) AS BIGINT) AS n_base,
        |  CAST(sum(nc) AS BIGINT) AS n_cur FROM cells GROUP BY 1),
        |grid AS (SELECT t.source, t.n_base, t.n_cur,
        |  CAST(r.range AS BIGINT) AS bin FROM tot t, range(10) r),
        |j AS (SELECT g.source, g.n_base, g.n_cur, g.bin,
        |  coalesce(c.nb, 0) AS nb, coalesce(c.nc, 0) AS nc
        | FROM grid g LEFT JOIN cells c ON g.source = c.source
        |   AND g.bin = c.bin),
        |p AS (SELECT source, n_base, n_cur, bin,
        |  (CAST(nb + 1 AS DOUBLE) / CAST(n_base + 10 AS DOUBLE) -
        |   CAST(nc + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE)) *
        |  ln(CAST((nb + 1) * (n_cur + 10) AS DOUBLE) /
        |     CAST((nc + 1) * (n_base + 10) AS DOUBLE)) AS term
        | FROM j)
        |SELECT source, n_base, n_cur,
        | round(sum(term ORDER BY bin), 4) AS psi,
        | CAST(round(sum(term ORDER BY bin), 4) >= 0.1 AS INT) AS alert
        |FROM p GROUP BY 1, 2, 3 ORDER BY source""".stripMargin,
    // E64: all-integer SRM guardrail — χ² by floor division, verdict by
    // the cross-multiplied inequality
    "q_srm" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |g AS (SELECT event_type,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        | FROM u GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        | CAST((n_a - n_b) * (n_a - n_b) * 10000 // (n_a + n_b) AS BIGINT)
        |   AS chi2_x10000,
        | CAST((n_a - n_b) * (n_a - n_b) * 100 > 384 * (n_a + n_b) AS INT)
        |   AS mismatch
        |FROM g ORDER BY event_type""".stripMargin,
    // E66: MDE from exact integer user-cell moments; mean/sd/MDE one
    // fixed IEEE shape each, textbook 1.96 + 0.8416 constants
    "q_power_mde" ->
      """WITH u AS (SELECT event_type, user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        | FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(x * x) AS BIGINT) AS sxx
        | FROM u GROUP BY 1),
        |m AS (SELECT event_type, n_a, n_b,
        |  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_u,
        |  sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
        |    nullif(CAST(n * (n - 1) AS DOUBLE), 0.0)) AS sd_u
        | FROM g),
        |d AS (SELECT event_type, n_a, n_b, mean_u, sd_u,
        |  2.8016 * sd_u * sqrt(2.0 / nullif(CAST(least(n_a, n_b) AS DOUBLE),
        |    0.0)) AS mde_u
        | FROM m)
        |SELECT event_type, n_a, n_b, round(mean_u, 4) AS mean_cents,
        | round(sd_u, 4) AS sd_cents, round(mde_u, 4) AS mde_cents,
        | round(mde_u / nullif(mean_u, 0.0), 6) AS mde_rel
        |FROM d ORDER BY event_type""".stripMargin,
    // E65: CUPED from exact integer user-cell moments; θ/ρ² one-division
    // integer ratios, reported numbers one fixed IEEE shape each
    "q_cuped" ->
      """WITH e AS (SELECT event_type, user_id,
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |cells AS (SELECT event_type, user_id,
        |  CAST(sum(cents * (1 - CAST(day >= d0 + (d1 - d0 + 1) // 2 AS BIGINT)))
        |    AS BIGINT) AS pre,
        |  CAST(sum(cents * CAST(day >= d0 + (d1 - d0 + 1) // 2 AS BIGINT))
        |    AS BIGINT) AS post
        | FROM e, bounds GROUP BY 1, 2),
        |am AS (SELECT event_type, CAST(user_id % 2 = 0 AS INT) AS arm,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(pre) AS BIGINT) AS sx,
        |  CAST(sum(post) AS BIGINT) AS sy,
        |  CAST(sum(pre * pre) AS BIGINT) AS sxx,
        |  CAST(sum(post * post) AS BIGINT) AS syy,
        |  CAST(sum(pre * post) AS BIGINT) AS sxy
        | FROM cells GROUP BY 1, 2),
        |p AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
        |  CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sy) AS BIGINT) AS sy,
        |  CAST(sum(sxx) AS BIGINT) AS sxx, CAST(sum(syy) AS BIGINT) AS syy,
        |  CAST(sum(sxy) AS BIGINT) AS sxy FROM am GROUP BY 1),
        |t AS (SELECT event_type,
        |  n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
        |  n * syy - sy * sy AS deny FROM p),
        |a AS (SELECT event_type, n AS n_a, sx AS sx_a, sy AS sy_a,
        |  sxx AS sxx_a, syy AS syy_a, sxy AS sxy_a FROM am WHERE arm = 1),
        |b AS (SELECT event_type, n AS n_b, sx AS sx_b, sy AS sy_b,
        |  sxx AS sxx_b, syy AS syy_b, sxy AS sxy_b FROM am WHERE arm = 0),
        |j AS (SELECT t.event_type, n_a, n_b,
        |  sx_a, sy_a, sxx_a, syy_a, sxy_a, sx_b, sy_b, sxx_b, syy_b, sxy_b,
        |  CAST(num AS DOUBLE) / nullif(CAST(den AS DOUBLE), 0.0) AS theta_u,
        |  CAST(sy_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |   CAST(sy_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS diff_raw,
        |  CAST(sx_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |   CAST(sx_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pre_diff,
        |  (CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) /
        |   nullif(CAST(den AS DOUBLE) * CAST(deny AS DOUBLE), 0.0) AS rho2
        | FROM t JOIN a USING (event_type) JOIN b USING (event_type)),
        |w AS (SELECT *, diff_raw - theta_u * pre_diff AS diff_adj,
        |  sy_a / n_a - theta_u * (sx_a / n_a) AS ma,
        |  sy_b / n_b - theta_u * (sx_b / n_b) AS mb
        | FROM j),
        |v AS (SELECT *,
        |  ((syy_a - 2.0 * theta_u * sxy_a + theta_u * theta_u * sxx_a) -
        |    n_a * (ma * ma)) / (n_a - 1) AS va,
        |  ((syy_b - 2.0 * theta_u * sxy_b + theta_u * theta_u * sxx_b) -
        |    n_b * (mb * mb)) / (n_b - 1) AS vb
        | FROM w),
        |f AS (SELECT *, CASE WHEN n_a <= 1 OR n_b <= 1 THEN NULL
        |  ELSE diff_adj / nullif(sqrt(va / n_a + vb / n_b), 0.0) END AS t_adj
        | FROM v)
        |SELECT event_type, n_a, n_b, round(theta_u, 6) AS theta,
        | round(diff_raw, 4) AS diff_raw_cents,
        | round(diff_adj, 4) AS diff_adj_cents,
        | round(rho2, 6) AS rho2, round(t_adj, 4) AS t_adj,
        | CAST(abs(round(t_adj, 4)) >= 1.96 AS INT) AS significant
        |FROM f ORDER BY event_type""".stripMargin,
    // E42: the E41 integer midrank machinery with four conditional arm
    // counts; H from exact bigint rank sums in one fixed shape
    "q_kruskal_wallis" ->
      """WITH e AS (SELECT event_type, CAST(user_id % 4 AS INT) AS arm,
        |  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |cells AS (SELECT event_type, cents,
        |  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
        |  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
        |  sum(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS n2,
        |  sum(CASE WHEN arm = 3 THEN 1 ELSE 0 END) AS n3
        | FROM e GROUP BY 1, 2),
        |r AS (SELECT *, n0 + n1 + n2 + n3 AS cnt,
        |  coalesce(sum(n0 + n1 + n2 + n3) OVER (PARTITION BY event_type
        |    ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) AS cb
        | FROM cells),
        |g AS (SELECT event_type,
        |  CAST(sum(n0) AS BIGINT) AS m0, CAST(sum(n1) AS BIGINT) AS m1,
        |  CAST(sum(n2) AS BIGINT) AS m2, CAST(sum(n3) AS BIGINT) AS m3,
        |  CAST(sum(n0 * (2 * cb + cnt + 1)) AS BIGINT) AS r0,
        |  CAST(sum(n1 * (2 * cb + cnt + 1)) AS BIGINT) AS r1,
        |  CAST(sum(n2 * (2 * cb + cnt + 1)) AS BIGINT) AS r2,
        |  CAST(sum(n3 * (2 * cb + cnt + 1)) AS BIGINT) AS r3,
        |  CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS ts
        | FROM r GROUP BY 1),
        |s AS (SELECT *, m0 + m1 + m2 + m3 AS n FROM g),
        |h AS (SELECT *, round(
        |  (12.0 / (CAST(n AS DOUBLE) * (n + 1)) *
        |   (CASE WHEN m0 > 0 THEN CAST(r0 AS DOUBLE) * r0 / (4.0 * m0) ELSE 0.0 END
        |    + CASE WHEN m1 > 0 THEN CAST(r1 AS DOUBLE) * r1 / (4.0 * m1) ELSE 0.0 END
        |    + CASE WHEN m2 > 0 THEN CAST(r2 AS DOUBLE) * r2 / (4.0 * m2) ELSE 0.0 END
        |    + CASE WHEN m3 > 0 THEN CAST(r3 AS DOUBLE) * r3 / (4.0 * m3) ELSE 0.0 END)
        |   - 3.0 * (n + 1)) /
        |  nullif(1.0 - CAST(ts AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - n),
        |    0.0), 4) AS h FROM s)
        |SELECT event_type, m0 AS n_0, m1 AS n_1, m2 AS n_2, m3 AS n_3, h,
        |  CAST(h > 7.8147 AS INT) AS significant
        |FROM h ORDER BY event_type""".stripMargin,
    // E36: Welch t from ROUNDED arm moments (the D36 rounded-verdict
    // convention) — both engines fold floats their own way but judge
    // identical 4-dec inputs through one fixed expression shape
    "q_ab_ttest" ->
      """WITH m AS (SELECT event_type,
        |  CAST(count(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_a,
        |  CAST(count(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS BIGINT) AS n_b,
        |  round(avg(CASE WHEN user_id % 2 = 0 THEN value END), 4) AS mean_a,
        |  round(avg(CASE WHEN user_id % 2 <> 0 THEN value END), 4) AS mean_b,
        |  round(var_samp(CASE WHEN user_id % 2 = 0 THEN value END), 4) AS var_a,
        |  round(var_samp(CASE WHEN user_id % 2 <> 0 THEN value END), 4) AS var_b
        | FROM events GROUP BY 1),
        |t AS (SELECT *, round((mean_a - mean_b) /
        |   sqrt(var_a / n_a + var_b / n_b), 4) AS t_stat FROM m)
        |SELECT event_type, n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
        | CAST(CASE WHEN abs(t_stat) >= 1.96 THEN 1 ELSE 0 END AS INT) AS significant
        |FROM t ORDER BY event_type""".stripMargin,
    // E40: the genuine SQL ALL-variants over the same slices, rolled up
    // to deterministic multiplicities
    "q_set_ops_all" ->
      """WITH a AS (SELECT o_orderstatus AS status, o_orderpriority AS priority
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |b AS (SELECT o_orderstatus, o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
        |ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |SELECT * FROM (
        |SELECT 'intersect_all' AS op, status, priority,
        |  CAST(count(*) AS BIGINT) AS n FROM ia GROUP BY 2, 3
        |UNION ALL
        |SELECT 'except_all', status, priority, count(*) FROM ea GROUP BY 2, 3)
        |ORDER BY op, status, priority""".stripMargin,
    // E38: the E36 rounded-moments convention applied to the OLS fit —
    // slope/intercept/R² derived from 4-dec moments in one fixed shape
    "q_regression" ->
      """WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(l_quantity), 4) AS mean_x,
        |  round(avg(l_extendedprice), 4) AS mean_y,
        |  round(var_samp(l_quantity), 4) AS var_x,
        |  round(var_samp(l_extendedprice), 4) AS var_y,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_xy
        | FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n, mean_x, mean_y,
        | round(cov_xy / nullif(var_x, 0), 4) AS slope,
        | round(mean_y - (cov_xy / nullif(var_x, 0)) * mean_x, 4) AS intercept,
        | round(cov_xy * cov_xy / (nullif(var_x, 0) * nullif(var_y, 0)), 4) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // E37: the windowed funnel chain replayed with the same
    // conditional-min-within-window rule at each step
    "q_funnel_windowed" ->
      s"""WITH ev AS ($evSec),
         |v AS (SELECT user_id, min(sec) AS v_sec FROM ev
         |  WHERE event_type = 'view' GROUP BY 1),
         |c AS (SELECT v.user_id, v.v_sec,
         |  min(CASE WHEN e.sec >= v.v_sec AND e.sec <= v.v_sec + 86400
         |      THEN e.sec END) AS c_sec
         | FROM v LEFT JOIN ev e
         |  ON e.user_id = v.user_id AND e.event_type = 'click'
         | GROUP BY 1, 2),
         |p AS (SELECT c.user_id, c.v_sec, c.c_sec,
         |  min(CASE WHEN c.c_sec IS NOT NULL AND e.sec >= c.c_sec
         |      AND e.sec <= c.c_sec + 86400 THEN e.sec END) AS p_sec
         | FROM c LEFT JOIN ev e
         |  ON e.user_id = c.user_id AND e.event_type = 'purchase'
         | GROUP BY 1, 2, 3),
         |one AS (SELECT CAST(count(*) AS BIGINT) AS n_view,
         |  CAST(sum(CASE WHEN c_sec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         |  CAST(sum(CASE WHEN p_sec IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         |  CAST(sum(CASE WHEN c_sec IS NOT NULL THEN c_sec - v_sec ELSE 0 END) AS BIGINT)
         |    AS cds,
         |  CAST(sum(CASE WHEN p_sec IS NOT NULL THEN p_sec - c_sec ELSE 0 END) AS BIGINT)
         |    AS pds
         | FROM p)
         |SELECT 1::BIGINT AS step_ord, 'view' AS step, n_view AS n_users,
         |  1000000::BIGINT AS conv_ppm, 0::BIGINT AS delay_sum FROM one
         |UNION ALL SELECT 2, 'click', n_click,
         |  n_click * 1000000 // greatest(n_view, 1), cds FROM one
         |UNION ALL SELECT 3, 'purchase', n_purchase,
         |  n_purchase * 1000000 // greatest(n_click, 1), pds FROM one
         |ORDER BY step_ord""".stripMargin,
    "q_histogram" ->
      """SELECT event_type,
        | CAST(CASE WHEN value < 0.0 THEN -1 WHEN value >= 200.0 THEN 10
        |   ELSE floor((value - 0.0) / 20.0) END AS BIGINT) AS bucket,
        | count(*) AS n, round(min(value), 2) AS bucket_min,
        | round(max(value), 2) AS bucket_max
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_pii_scrub" ->
      """WITH w AS (SELECT doc_id,
        | 'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-01'
        |  || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
        |  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 :: ' || text AS raw
        | FROM documents),
        |s AS (SELECT doc_id, raw,
        |  regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{4}-[0-9]{4}', '<PHONE>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS scrubbed
        | FROM w)
        |SELECT doc_id,
        | CAST(len(string_split_regex(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS BIGINT) AS n_emails,
        | CAST(len(string_split_regex(raw, '[0-9]{3}-[0-9]{4}-[0-9]{4}')) - 1 AS BIGINT) AS n_phones,
        | CAST(len(string_split_regex(raw, '([0-9]{1,3}\.){3}[0-9]{1,3}')) - 1 AS BIGINT) AS n_ips,
        | md5(scrubbed) AS scrubbed_md5,
        | CAST(regexp_matches(scrubbed, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        |   OR regexp_matches(scrubbed, '([0-9]{1,3}\.){3}[0-9]{1,3}') AS INT) AS residual_pii
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_time_bucket" ->
      """SELECT CAST(floor(floor(extract(epoch FROM ts)) / 3600) * 3600 AS BIGINT) AS bucket_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_running_agg" ->
      s"""WITH ev AS ($evSec)
         |SELECT user_id, event_id, sec,
         | round(sum(value) OVER (PARTITION BY user_id ORDER BY sec, event_id
         |   ROWS UNBOUNDED PRECEDING), 2) AS running_value
         |FROM ev ORDER BY user_id, sec, event_id""".stripMargin,
    "q_sliding_distinct" ->
      """WITH du AS (SELECT DISTINCT
        |  CAST(floor(extract(epoch FROM ts)) AS BIGINT) // 86400 AS day,
        |  user_id FROM events),
        |d AS (SELECT DISTINCT day FROM du)
        |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS n_distinct_users,
        | count(*) AS n_user_days
        |FROM d JOIN du u ON u.day <= d.day AND u.day > d.day - 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // E34: the oracle is GENERATED from the same ordered column list as
    // the engine's pair loop (one branch per unordered pair)
    "q_corr_matrix" -> {
      val cs = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      val branches = for { i <- cs.indices; j <- cs.indices if i < j } yield
        s"SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b, " +
          s"round(corr(${cs(i)}, ${cs(j)}), 4) AS pearson_r, " +
          s"count(*) AS n_rows FROM lineitem"
      branches.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
    },
    "q_stats" ->
      """SELECT event_type, count(*) AS n,
        | round(stddev_samp(value), 4) AS sd_value,
        | round(var_samp(value), 4) AS var_value,
        | round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_user
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bloom prune is transparent (no false negatives): the oracle is
    // simply the plain join — if pruning ever dropped a joinable row the
    // hash comparison would catch it
    "q_bloom_prune_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cms_sketch" ->
      s"""WITH src AS (SELECT event_type AS grp, user_id AS k FROM events),
         |${graft.functions.CmsAggregate.estimateSql("src", 0L until 10L)}
         |SELECT grp AS source, CAST(key AS BIGINT) AS key, CAST(est AS BIGINT) AS est
         |FROM est ORDER BY 1, 2""".stripMargin,
    // identical fixed-bin arithmetic from raw rows: same domain (global
    // min/max), same clamped floor binning, same ceil(q*N) rank walk
    "q_quantile_sketch" -> {
      import graft.functions.QuantileAggregate
      s"""WITH p AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
         |src AS (SELECT l_returnflag AS grp, l_extendedprice AS v FROM lineitem),
         |${QuantileAggregate.estimateSql("src", "(SELECT lo FROM p)", "(SELECT hi FROM p)",
            Seq(0.25, 0.5, 0.75, 0.95))}
         |SELECT grp AS l_returnflag, q, round((SELECT lo FROM p) +
         |  qbin * (((SELECT hi FROM p) - (SELECT lo FROM p)) / ${QuantileAggregate.NBins}), 4) AS est
         |FROM est ORDER BY 1, 2""".stripMargin
    },
    "pipeline_e2e" ->
      """SELECT 'customer_seg' AS source, count(*) AS rows_loaded, 'ok' AS status
        | FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL SELECT 'lineitem_swept', count(*), 'ok' FROM lineitem WHERE l_quantity >= 45
        |UNION ALL SELECT 'orders_f', count(*), 'ok' FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY source""".stripMargin,
    // H1q run filter: FM+parquet sources load; the NVV / csv-typed /
    // untagged sources surface as skipped rows (0 loaded); the disabled
    // source is absent — the oracle replays the subset from the source
    "pipeline_run_filter" ->
      """SELECT 'customer_seg' AS source, count(*) AS rows_loaded, 'ok' AS status
        | FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL SELECT 'lineitem_nvv', CAST(0 AS BIGINT), 'skipped'
        |UNION ALL SELECT 'nation_untagged', CAST(0 AS BIGINT), 'skipped'
        |UNION ALL SELECT 'orders_f', count(*), 'ok'
        | FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL SELECT 'region_csv', CAST(0 AS BIGINT), 'skipped'
        |ORDER BY source""".stripMargin,
    // manifest-commit publish: the writer's reconcile AND the count a
    // reader resolves through the manifest must both match the source
    "pipeline_manifest" ->
      """SELECT 'customer_seg' AS source, count(*) AS rows_loaded,
        | count(*) AS rows_resolved
        | FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL SELECT 'orders_f', count(*), count(*)
        | FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY source""".stripMargin,
    // time travel: generation 2 ('O' orders) is live, generation 1 ('F'
    // orders) resolves through the _GRAFT_PREV ledger — both stat rows are
    // computed from the RESOLVED parquet, so they must equal the source
    // at each publish point
    "pipeline_time_travel" ->
      """SELECT 'current' AS generation, count(*) AS n_rows,
        | count(DISTINCT o_orderkey) AS n_keys,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        | FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT 'previous', count(*), count(DISTINCT o_orderkey),
        | min(o_orderkey), max(o_orderkey)
        | FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY generation""".stripMargin,
    // shallow clone: the clone resolves the PINNED 'F' generation after
    // the source evolved to 'O' — both rows from resolved parquet
    "pipeline_clone" ->
      """SELECT 'clone_pinned' AS view_name, count(*) AS n_rows,
        | count(DISTINCT o_orderkey) AS n_keys,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        | FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'source_live', count(*), count(DISTINCT o_orderkey),
        | min(o_orderkey), max(o_orderkey)
        | FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY view_name""".stripMargin,
    // vacuum: after sweeping the planted orphan, the live ('P') and
    // previous ('O') generations must still resolve to the full source
    // slices; kept=2 (live+prev version dirs), deleted=1 (the orphan) —
    // structural constants of the three-publish-one-orphan wire
    // H1m: restore = manifest swing back to the 'F' generation; the 'O'
    // generation becomes the retained previous; the second restore
    // reverts it — all three rows read through the reader path
    "pipeline_restore" ->
      """SELECT 'live_restored' AS generation, count(*) AS n_rows,
        | count(DISTINCT o_orderkey) AS n_keys,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        | FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'live_reverted', count(*), count(DISTINCT o_orderkey),
        | min(o_orderkey), max(o_orderkey)
        | FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT 'superseded', count(*), count(DISTINCT o_orderkey),
        | min(o_orderkey), max(o_orderkey)
        | FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY generation""".stripMargin,
    // H1n: expire deletes exactly the one retained previous generation;
    // live bytes untouched, time travel ends, restore refuses
    "pipeline_expire" ->
      """SELECT 'live' AS generation, count(*) AS n_rows,
        | count(DISTINCT o_orderkey) AS n_keys,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | CAST(1 AS BIGINT) AS n_expired,
        | CAST(0 AS BIGINT) AS prev_versions_left,
        | CAST(1 AS BIGINT) AS restore_refused
        | FROM orders WHERE o_orderstatus = 'O'""".stripMargin,
    // H1o: the three diff classes recomputed from the raw table's key
    // slices; version counts are fixed by construction (one dir per
    // truncate generation, zero shared)
    "pipeline_diff" ->
      """SELECT * FROM (
        |SELECT 'added' AS change, CAST(1 AS BIGINT) AS n_versions,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        | FROM orders WHERE o_orderkey % 3 = 2
        |UNION ALL
        |SELECT 'removed', CAST(1 AS BIGINT), count(*),
        |  min(o_orderkey), max(o_orderkey)
        | FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT 'unchanged', CAST(0 AS BIGINT), count(*),
        |  min(o_orderkey), max(o_orderkey)
        | FROM orders WHERE o_orderkey % 3 = 1)
        |ORDER BY change""".stripMargin,
    // H1p: consumed row counts recomputed from the appended slices; the
    // third call proves the cursor is exhausted
    "pipeline_incremental" ->
      """WITH s0 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM orders
        |  WHERE o_orderkey % 4 = 0),
        |s1 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM orders
        |  WHERE o_orderkey % 4 = 1),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS c FROM orders
        |  WHERE o_orderkey % 4 = 2)
        |SELECT * FROM (
        |SELECT CAST(1 AS BIGINT) AS call, CAST(2 AS BIGINT) AS n_new_versions,
        |  s0.c + s1.c AS n_new_rows, s0.c + s1.c AS n_rows_seen_total
        | FROM s0, s1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT), s2.c, s0.c + s1.c + s2.c
        | FROM s0, s1, s2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  s0.c + s1.c + s2.c
        | FROM s0, s1, s2)
        |ORDER BY call""".stripMargin,
    "pipeline_vacuum" ->
      """SELECT 'live' AS generation, count(*) AS n_rows,
        | count(DISTINCT o_orderkey) AS n_keys,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | CAST(2 AS BIGINT) AS n_dirs_kept, CAST(1 AS BIGINT) AS n_orphans_deleted
        | FROM orders WHERE o_orderstatus = 'P'
        |UNION ALL
        |SELECT 'previous', count(*), count(DISTINCT o_orderkey),
        | min(o_orderkey), max(o_orderkey), CAST(2 AS BIGINT), CAST(1 AS BIGINT)
        | FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY generation""".stripMargin,
    // config-staged container: one summary row per DISCOVERED layer under
    // its sanitized feature-class name, counts = that nation's suppliers
    // (lossless layer staging, each layer loaded exactly once)
    "pipeline_archive" ->
      """SELECT 'regional_archives/' ||
        |  trim(regexp_replace(lower(n_name), '[^a-z0-9]+', '_', 'g'), '_') AS source,
        | count(*) AS rows_loaded, 'ok' AS status
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // config-staged OGC sweep: one summary row per discovered collection
    // under its sanitized name, counts = that nation's customers (every
    // chain intact on this wire, so every collection lands completely)
    "pipeline_ogc" ->
      """SELECT 'ogc_collections/' ||
        |  trim(regexp_replace(lower(n_name), '[^a-z0-9]+', '_', 'g'), '_') AS source,
        | count(*) AS rows_loaded, 'ok' AS status
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // config-staged REST sweep: layers discovered from the service docs,
    // filtered by the config's wildcard include patterns ["nation_1*",
    // "*_2"] (12 matching layers stage + reconcile per-layer — regexes,
    // not LIKE: SQL LIKE's `_` is a wildcard, fnmatch's is literal); the
    // single-layer FeatureServer doc falls back to itself (its layer list
    // is empty)
    "pipeline_rest" ->
      """SELECT 'rest_layers/' ||
        |  trim(regexp_replace(lower(n_name), '[^a-z0-9]+', '_', 'g'), '_') AS source,
        | count(*) AS rows_loaded, 'ok' AS status
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE regexp_matches(lower(n_name), '^nation_1.*$')
        |   OR regexp_matches(lower(n_name), '^.*_2$')
        |GROUP BY 1
        |UNION ALL
        |SELECT 'rest_layers/municipal_assets', count(*), 'ok'
        |FROM customer WHERE c_custkey % 10 = 0
        |ORDER BY source""".stripMargin,
    // config-staged Atom feed: one summary row per entry that classified
    // a download-class link (key % 3 = 0 enclosures always; % 3 = 1
    // service links because the config sets filterServices), staged under
    // the entry's sanitized title; skipped/link-less entries stage
    // nothing, and a download entry whose nation has no suppliers leaves
    // no layer behind (empty partitioned writes are dropped)
    "pipeline_atom" ->
      """SELECT 'atom_feed/' ||
        |  trim(regexp_replace(lower(n_name), '[^a-z0-9]+', '_', 'g'), '_') AS source,
        | count(*) AS rows_loaded, 'ok' AS status
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_nationkey % 3 < 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // config-listed typename sweep: one row per requested typed layer
    "pipeline_wfs" ->
      """SELECT 'wfs_segments/' || lower(c_mktsegment) AS source,
        | count(*) AS rows_loaded, 'ok' AS status
        |FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS grp, count(*) AS n_copies, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // F49: chunk = 20 consecutive words; keeper = min (doc_id, chunk_idx)
    // occurrence via the combined occ key; checksum folds kept hashes
    "dedup_paragraph" ->
      s"""WITH tk AS (SELECT doc_id, string_split(
        |        CASE WHEN doc_id % 7 = 0
        |             THEN '${graft.operators.Dedup.ParagraphBoiler} ' || text
        |             ELSE text END, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, unnest(toks) AS word,
        |        generate_subscripts(toks, 1) AS ord FROM tk),
        |c0 AS (SELECT doc_id,
        |        CAST(floor((ord - 1) / 20.0) AS BIGINT) AS chunk_idx,
        |        string_agg(word, ' ' ORDER BY ord) AS chunk
        |      FROM w GROUP BY doc_id, floor((ord - 1) / 20.0)),
        |c AS (SELECT doc_id, chunk_idx, md5(chunk) AS h
        |      FROM c0 WHERE length(chunk) > 0),
        |s AS (SELECT h, count(*) AS n_copies,
        |        min(doc_id * 1000000 + chunk_idx) AS keeper_key
        |      FROM c GROUP BY h),
        |j AS (SELECT c.doc_id, c.h, s.n_copies,
        |        (c.doc_id * 1000000 + c.chunk_idx) = s.keeper_key AS kept
        |      FROM c JOIN s USING (h))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN kept THEN ('0x' || substr(h, 1, 8))::BIGINT ELSE 0 END)
        |    AS BIGINT) AS kept_checksum
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // F50: same chunk CTEs as F49; weight = mean inverse multiplicity in
    // exact integer PPM (floor division on both engines, no float folds)
    "dedup_soft" ->
      s"""WITH tk AS (SELECT doc_id, string_split(
        |        CASE WHEN doc_id % 7 = 0
        |             THEN '${graft.operators.Dedup.ParagraphBoiler} ' || text
        |             ELSE text END, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, unnest(toks) AS word,
        |        generate_subscripts(toks, 1) AS ord FROM tk),
        |c0 AS (SELECT doc_id,
        |        CAST(floor((ord - 1) / 20.0) AS BIGINT) AS chunk_idx,
        |        string_agg(word, ' ' ORDER BY ord) AS chunk
        |      FROM w GROUP BY doc_id, floor((ord - 1) / 20.0)),
        |c AS (SELECT doc_id, chunk_idx, md5(chunk) AS h
        |      FROM c0 WHERE length(chunk) > 0),
        |s AS (SELECT h, count(*) AS n_copies FROM c GROUP BY h),
        |j AS (SELECT c.doc_id, 1000000 // s.n_copies AS inv
        |      FROM c JOIN s USING (h))
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(inv) // count(*) AS BIGINT) AS weight_ppm,
        |  CAST(count(*) * (sum(inv) // count(*)) AS BIGINT) AS eff_chunks_ppm
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_fingerprint" ->
      s"""WITH f AS (SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fp
         | FROM documents)
         |SELECT fp AS fingerprint, count(*) AS n_docs, min(doc_id) AS keeper
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    // same F2 fingerprint, same batch/corpus split, same first-wins rule
    "dedup_incremental" ->
      s"""WITH f AS (SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fp
         | FROM documents),
         |c AS (SELECT DISTINCT fp FROM f WHERE doc_id % 5 <> 0),
         |b AS (SELECT f.doc_id, f.fp, (c.fp IS NOT NULL) AS in_corpus,
         |  row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) AS rn
         | FROM f LEFT JOIN c ON f.fp = c.fp WHERE f.doc_id % 5 = 0),
         |s AS (SELECT doc_id,
         |  CASE WHEN in_corpus THEN 'dup_of_corpus'
         |       WHEN rn > 1 THEN 'dup_in_batch' ELSE 'novel' END AS status FROM b)
         |SELECT status, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS doc_checksum
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical corpus-order running token sum → fixed-capacity packs
    "text_pack_chunks" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         |s AS (SELECT doc_id, n_tok,
         |  sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS start
         | FROM d)
         |SELECT CAST(floor(start / 2048) AS BIGINT) AS pack_id, count(*) AS n_docs,
         | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         | min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // same word-5-gram sets, same benchmark split, per-benchmark-item report
    // Gopher rules: integer counts over identical regexes, identical
    // division shapes, flags from UNROUNDED ratios — exact parity.
    "text_gopher_rules" ->
      s"""WITH r AS ($gopherMeasuredSql)
         |SELECT doc_id, n_words,
         | round(mwl, 4) AS mean_word_len, round(sym, 4) AS symbol_ratio,
         | round(bul, 4) AS bullet_frac, round(ell, 4) AS ellipsis_line_frac,
         | round(alw, 4) AS alpha_word_frac, n_stop_distinct,
         | CAST(${gopherKeepSql()} AS INT) AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    // composed training-data pipeline: every stage reuses the standalone
    // operator's oracle fragments (gopher measures, F2 fingerprint, F26
    // 5-gram construction), counts/sums CAST off HUGEINT
    "pipeline_traindata" ->
      s"""WITH r AS ($gopherMeasuredSql),
         |g AS (SELECT doc_id, text, toks, n_words AS n_tok FROM r WHERE ${gopherKeepSql(1)}),
         |f AS (SELECT doc_id, toks, n_tok, row_number() OVER (
         |   PARTITION BY md5(array_to_string(list_sort(list_distinct(toks)), ' '))
         |   ORDER BY doc_id) AS rn FROM g),
         |d AS (SELECT doc_id, toks, n_tok FROM f WHERE rn = 1),
         |bg AS (SELECT DISTINCT gram FROM (
         |  SELECT unnest(CASE WHEN len(toks) >= 5
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')
         |          for i in range(1, len(toks) - 3)]
         |    ELSE [] END) AS gram
         |  FROM (SELECT $toks AS toks FROM documents WHERE doc_id % 97 = 0))),
         |pool AS (SELECT * FROM d WHERE doc_id % 97 <> 0),
         |hit AS (SELECT DISTINCT p.doc_id FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')
         |          for i in range(1, len(toks) - 3)]
         |    ELSE [] END) AS gram FROM pool) p JOIN bg USING (gram)),
         |c AS (SELECT doc_id, n_tok FROM pool
         |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
         |a0 AS (SELECT count(*) AS docs,
         |  CAST(coalesce(sum(CAST(len($toks) AS BIGINT)), 0) AS BIGINT) AS tk,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS ids FROM documents),
         |a1 AS (SELECT count(*) AS docs, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tk,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS ids FROM g),
         |a2 AS (SELECT count(*) AS docs, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tk,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS ids FROM d),
         |a3 AS (SELECT count(*) AS docs, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS tk,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS ids FROM c)
         |SELECT * FROM (
         | SELECT 1 AS stage_ord, 'ingest' AS stage, a0.docs AS units_in,
         |   a0.docs AS units_out, a0.tk AS tokens_out, a0.ids AS id_checksum FROM a0
         | UNION ALL SELECT 2, 'gopher_filter', a0.docs, a1.docs, a1.tk, a1.ids FROM a0, a1
         | UNION ALL SELECT 3, 'dedup_fingerprint', a1.docs, a2.docs, a2.tk, a2.ids FROM a1, a2
         | UNION ALL SELECT 4, 'decontaminate', a2.docs, a3.docs, a3.tk, a3.ids FROM a2, a3
         | UNION ALL SELECT 5, 'pack_chunks', a3.docs,
         |   CAST(CASE WHEN a3.tk = 0 THEN 0 ELSE (a3.tk - 1) // 2048 + 1 END AS BIGINT),
         |   a3.tk, a3.ids FROM a3
         |) ORDER BY stage_ord""".stripMargin,
    // URL dedup: the oracle rebuilds the SAME wire and canonicalization
    // pipeline (fragment → scheme → host case/www/port → trailing slash →
    // tracking-param filter + sort) with DuckDB's string/list functions
    "dedup_url" ->
      """WITH w AS (SELECT s_suppkey AS key,
        |  CAST(s_suppkey // 3 AS VARCHAR) AS g, s_suppkey % 6 AS m FROM supplier),
        |u AS (SELECT key, CASE m
        |  WHEN 0 THEN 'https://data' || g || '.example.org/files/set' || g || '/item'
        |  WHEN 1 THEN 'HTTP://DATA' || g || '.EXAMPLE.ORG:80/files/set' || g || '/item/'
        |  WHEN 2 THEN 'https://www.data' || g || '.example.org/files/set' || g
        |    || '/item?utm_source=feed&utm_campaign=x'
        |  WHEN 3 THEN 'https://data' || g || '.example.org/files/set' || g || '/item#section-2'
        |  WHEN 4 THEN 'https://data' || g || '.example.org/files/set' || g || '/item?b=2&a=1'
        |  ELSE 'http://data' || g || '.example.org/files/set' || g
        |    || '/item?a=1&utm_medium=email&b=2' END AS url FROM w),
        |a AS (SELECT key,
        |  regexp_replace(regexp_replace(url, '#.*$', ''),
        |    '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS after FROM u),
        |c AS (SELECT key,
        |  regexp_replace(regexp_replace(
        |    lower(regexp_extract(after, '^([^/?]+)', 1)), '^www\.', ''),
        |    ':(80|443)$', '')
        |  || regexp_replace(regexp_extract(after, '^[^/?]+([^?]*)', 1), '/+$', '')
        |  || CASE WHEN len(array_to_string(list_sort(list_filter(
        |       str_split(regexp_extract(after, '\?(.*)$', 1), '&'),
        |       x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)=')
        |            AND len(x) > 0)), '&')) > 0
        |     THEN '?' || array_to_string(list_sort(list_filter(
        |       str_split(regexp_extract(after, '\?(.*)$', 1), '&'),
        |       x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)=')
        |            AND len(x) > 0)), '&')
        |     ELSE '' END AS canonical_url FROM a)
        |SELECT canonical_url, count(*) AS n_variants,
        | CAST(min(key) AS BIGINT) AS keeper_key,
        | CAST(sum(key) AS BIGINT) AS key_checksum
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // duplicated-substring spans: grams keyed by their raw text in the
    // oracle (Spark groups the same strings), 1-based word positions,
    // identical island arithmetic — integer outputs, exact parity
    // F60: gram equality classes on the STRING (the dedup_substring
    // argument), first owner = min doc_id, integer-PPM fraction
    "text_novelty" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |g0 AS (SELECT doc_id,
         |  unnest(CASE WHEN len(toks) >= 8
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 7 AS INT)), ' ')
         |          for i in range(1, len(toks) - 6)]
         |    ELSE [] END) AS gram
         | FROM t),
         |g AS (SELECT DISTINCT doc_id, gram FROM g0),
         |o AS (SELECT gram, min(doc_id) AS owner FROM g GROUP BY gram)
         |SELECT g.doc_id, count(*) AS n_distinct,
         |  CAST(sum(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END) * 1000000
         |    // greatest(count(*), 1) AS BIGINT) AS novelty_ppm
         |FROM g JOIN o USING (gram) GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    // F80: the unigram/bigram/trigram union replayed with the shared
    // tokenizer; n recovered from the gram's space count, count floor 5
    "text_ngram_counts" ->
      s"""WITH $ngramCountCtes
         |SELECT CAST(len(string_split(gram, ' ')) AS BIGINT) AS n, gram, cnt
         |FROM c ORDER BY n, cnt DESC, gram""".stripMargin,
    // F82: the SAME gram-count chain, ranked per order, then the E38
    // rounded-moment OLS assembly over the (ln rank, ln count) pairs
    "text_zipf_fit" ->
      s"""WITH $ngramCountCtes,
         |rk AS (SELECT CAST(len(string_split(gram, ' ')) AS BIGINT) AS n,
         |  cnt, row_number() OVER (PARTITION BY len(string_split(gram, ' '))
         |    ORDER BY cnt DESC, gram) AS rank
         | FROM c),
         |pts AS (SELECT n, ln(CAST(rank AS DOUBLE)) AS x,
         |  ln(CAST(cnt AS DOUBLE)) AS y FROM rk WHERE rank <= 200),
         |m AS (SELECT n, CAST(count(*) AS BIGINT) AS n_grams,
         |  round(avg(x), 4) AS mx, round(avg(y), 4) AS my,
         |  round(var_samp(x), 4) AS vx, round(var_samp(y), 4) AS vy,
         |  round(covar_samp(x, y), 4) AS cxy
         | FROM pts GROUP BY 1)
         |SELECT n, n_grams,
         |  round(cxy / nullif(vx, 0), 4) AS slope,
         |  round(my - (cxy / nullif(vx, 0)) * mx, 4) AS intercept,
         |  round((cxy * cxy) / (nullif(vx, 0) * nullif(vy, 0)), 4) AS r2
         |FROM m ORDER BY n""".stripMargin,
    // F83: the F60 gram equality classes + df screen, directional
    // overlap over the smaller doc, rounded-threshold verdicts
    "dedup_containment" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |g0 AS (SELECT doc_id,
         |  unnest(CASE WHEN len(toks) >= 8
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 7 AS INT)), ' ')
         |          for i in range(1, len(toks) - 6)]
         |    ELSE [] END) AS gram
         | FROM t),
         |g AS MATERIALIZED (SELECT DISTINCT doc_id, gram FROM g0),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng FROM g GROUP BY 1),
         |f AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) BETWEEN 2 AND 32),
         |o AS MATERIALIZED (SELECT g.doc_id, g.gram FROM g JOIN f USING (gram)),
         |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(count(*) AS BIGINT) AS shared
         | FROM o a JOIN o b ON a.gram = b.gram AND a.doc_id < b.doc_id
         | GROUP BY 1, 2),
         |j AS (SELECT d1, d2, s1.ng AS n1, s2.ng AS n2, shared,
         |  round(shared / CAST(least(s1.ng, s2.ng) AS DOUBLE), 4) AS containment,
         |  round(shared / CAST(s1.ng + s2.ng - shared AS DOUBLE), 4) AS jaccard
         | FROM p JOIN sz s1 ON s1.doc_id = p.d1
         | JOIN sz s2 ON s2.doc_id = p.d2)
         |SELECT d1, d2, n1, n2, shared, containment, jaccard
         |FROM j WHERE containment >= 0.5 ORDER BY d1, d2""".stripMargin,
    // F53: the gram/edge CTEs restate the graph construction (equality
    // classes on the gram STRING — identical to the engine's 64-bit gram
    // hashes absent a collision, the dedup_substring argument); the K
    // power-iteration rounds are unrolled as chained CTEs replaying the
    // EXACT integer-PPM recurrence — per-edge floor `(pr*w)//W` before
    // the sum, then `150000 + (850000*inflow)//1000000` — so both
    // engines agree bit-for-bit with zero float folding
    "graph_pagerank" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""pr$i AS (SELECT n.doc_id,
           |  CAST(150000 + (850000 * COALESCE(s.infl, 0)) // 1000000 AS BIGINT) AS pr
           | FROM n LEFT JOIN (
           |   SELECT e.dst AS doc_id, sum((p.pr * e.w) // ow.tw) AS infl
           |   FROM e JOIN pr${i - 1} p ON p.doc_id = e.src
           |   JOIN ow ON ow.src = e.src GROUP BY 1) s USING (doc_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $gramEdgeCtes,
         |ow AS (SELECT src, sum(w) AS tw FROM e GROUP BY 1),
         |pr0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS pr FROM n),
         |$iterCtes,
         |deg AS (SELECT src AS doc_id, count(*) AS n_neighbors,
         |        sum(w) AS out_weight FROM e GROUP BY 1)
         |SELECT n.doc_id,
         |  CAST(COALESCE(deg.n_neighbors, 0) AS BIGINT) AS n_neighbors,
         |  CAST(COALESCE(deg.out_weight, 0) AS BIGINT) AS out_weight,
         |  pr5.pr AS pr_ppm
         |FROM n LEFT JOIN deg USING (doc_id) JOIN pr5 USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    // F71: the shared gram-edge CTEs + the SAME (deg, id) total-order
    // orientation — each triangle materializes once at its min-order
    // corner, then credits all three
    "graph_triangles" ->
      s"""WITH $gramEdgeCtes,
         |und AS (SELECT src AS a, dst AS b FROM e WHERE src < dst),
         |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS d FROM (
         |  SELECT a AS doc_id FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
         |ord_e AS (SELECT
         |  CASE WHEN da.d < db.d OR (da.d = db.d AND und.a < und.b)
         |       THEN und.a ELSE und.b END AS u,
         |  CASE WHEN da.d < db.d OR (da.d = db.d AND und.a < und.b)
         |       THEN und.b ELSE und.a END AS v
         | FROM und JOIN deg da ON da.doc_id = und.a
         | JOIN deg db ON db.doc_id = und.b),
         |tri AS (SELECT e1.u AS ta, e1.v AS tb, e2.v AS tc
         | FROM ord_e e1 JOIN ord_e e2 ON e1.u = e2.u AND e1.v <> e2.v
         | JOIN deg d1 ON d1.doc_id = e1.v JOIN deg d2 ON d2.doc_id = e2.v
         | WHERE (d1.d < d2.d OR (d1.d = d2.d AND e1.v < e2.v))
         |  AND EXISTS (SELECT 1 FROM ord_e cl WHERE cl.u = e1.v AND cl.v = e2.v)),
         |pn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
         |  SELECT ta AS doc_id FROM tri UNION ALL SELECT tb FROM tri
         |  UNION ALL SELECT tc FROM tri) GROUP BY 1)
         |SELECT n.doc_id, CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree,
         | CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
         | CAST(CASE WHEN COALESCE(deg.d, 0) >= 2
         |   THEN COALESCE(pn.n_triangles, 0) * 2000000 // (deg.d * (deg.d - 1))
         |   ELSE 0 END AS BIGINT) AS clustering_ppm
         |FROM n LEFT JOIN deg USING (doc_id) LEFT JOIN pn USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin,
    // F72: the gram-edge CTEs + 4 unrolled synchronous vote rounds,
    // argmax by (sum weight DESC, label ASC) — the engine's exact
    // tie-break — isolated nodes carried by the COALESCE
    "graph_label_prop" -> {
      val roundCtes = (1 to 4).map { i =>
        s"""lp$i AS (SELECT n.doc_id, COALESCE(w$i.lbl, p.lbl) AS lbl
           | FROM n JOIN lp${i - 1} p USING (doc_id)
           | LEFT JOIN (SELECT node AS doc_id, lbl FROM (
           |   SELECT e.src AS node, p2.lbl, sum(e.w) AS vw,
           |     row_number() OVER (PARTITION BY e.src
           |       ORDER BY sum(e.w) DESC, p2.lbl) AS rn
           |   FROM e JOIN lp${i - 1} p2 ON p2.doc_id = e.dst
           |   GROUP BY e.src, p2.lbl) WHERE rn = 1) w$i USING (doc_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH $gramEdgeCtes,
         |lp0 AS (SELECT doc_id, doc_id AS lbl FROM n),
         |$roundCtes,
         |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS community_size
         | FROM lp4 GROUP BY 1)
         |SELECT l.doc_id, l.lbl AS label, sz.community_size
         |FROM lp4 l JOIN sz USING (lbl) ORDER BY l.doc_id""".stripMargin
    },
    // F81: the gram-edge CTEs + 12 unrolled synchronous peel rounds
    // (extra rounds past the fixpoint are no-ops, matching the engine's
    // early stop); isolated docs peel in round 1 via the COALESCE
    "graph_kcore" -> {
      // every CTE is MATERIALIZED: a_{i-1} is referenced three times per
      // round, so inlined expansion would be exponential in rounds
      val peelCtes = (1 to 12).map { i =>
        s"""d$i AS MATERIALIZED (SELECT em.src AS doc_id, count(*) AS d FROM em
           | JOIN a${i - 1} s ON s.doc_id = em.src
           | JOIN a${i - 1} t2 ON t2.doc_id = em.dst GROUP BY 1),
           |r$i AS MATERIALIZED (SELECT a.doc_id FROM a${i - 1} a
           | LEFT JOIN d$i USING (doc_id) WHERE COALESCE(d$i.d, 0) < 3),
           |a$i AS MATERIALIZED (SELECT doc_id FROM a${i - 1}
           | EXCEPT SELECT doc_id FROM r$i)""".stripMargin
      }.mkString(",\n")
      val removedUnion = (1 to 12)
        .map(i => s"SELECT doc_id, $i AS removed_round FROM r$i")
        .mkString(" UNION ALL ")
      s"""WITH $gramEdgeCtes,
         |em AS MATERIALIZED (SELECT src, dst FROM e),
         |a0 AS MATERIALIZED (SELECT doc_id FROM n),
         |deg0 AS (SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS degree
         |         FROM em GROUP BY 1),
         |$peelCtes,
         |rr AS ($removedUnion)
         |SELECT n.doc_id, COALESCE(deg0.degree, 0) AS degree,
         |  CAST(COALESCE(rr.removed_round, 0) AS BIGINT) AS removed_round,
         |  CAST(rr.doc_id IS NULL AS INT) AS in_core
         |FROM n LEFT JOIN deg0 USING (doc_id) LEFT JOIN rr USING (doc_id)
         |ORDER BY n.doc_id""".stripMargin
    },
    // F86: the shared kNN-neighborhood CTEs symmetrized into an edge
    // list + 4 Bellman-Ford relaxation steps (min over prior dists ∪
    // neighbor dist+1) — after K materialized steps the min equals the
    // BFS hop count capped at K
    "graph_bfs" -> {
      val hopCtes = (1 to 4).map { i =>
        s"""h$i AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
           | SELECT id, dist FROM h${i - 1}
           | UNION ALL
           | SELECT ed.dst AS id, p.dist + 1 AS dist
           | FROM ed JOIN h${i - 1} p ON p.id = ed.src) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $knnRankedCtes,
         |k3 AS MATERIALIZED (SELECT vec_id, nbr_id FROM r WHERE rank <= 3),
         |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT vec_id AS src, nbr_id AS dst FROM k3
         |  UNION ALL SELECT nbr_id, vec_id FROM k3)),
         |h0 AS MATERIALIZED (SELECT vec_id AS id, CAST(0 AS BIGINT) AS dist
         | FROM e WHERE vec_id % 47 = 0),
         |$hopCtes
         |SELECT e.vec_id, CAST(COALESCE(h4.dist, -1) AS BIGINT) AS hops,
         |  CAST(e.vec_id % 47 = 0 AS INT) AS is_seed
         |FROM e LEFT JOIN h4 ON h4.id = e.vec_id
         |ORDER BY e.vec_id""".stripMargin
    },
    // F87: the F86 symmetrized kNN edge list, wedge-join shared-neighbor
    // counts, broadcast degrees, one rounded division, direct-edge flag
    "graph_jaccard" ->
      s"""WITH $knnRankedCtes,
         |k3 AS MATERIALIZED (SELECT vec_id, nbr_id FROM r WHERE rank <= 3),
         |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT vec_id AS src, nbr_id AS dst FROM k3
         |  UNION ALL SELECT nbr_id, vec_id FROM k3)),
         |dg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         | FROM ed GROUP BY 1),
         |sh AS (SELECT a.dst AS u, b.dst AS v, CAST(count(*) AS BIGINT) AS n_shared
         | FROM ed a JOIN ed b ON a.src = b.src AND a.dst < b.dst GROUP BY 1, 2),
         |j AS (SELECT u AS vec_a, v AS vec_b, n_shared,
         |  x.deg AS deg_a, y.deg AS deg_b,
         |  round(CAST(n_shared AS DOUBLE) / (x.deg + y.deg - n_shared), 4) AS jaccard,
         |  CAST(e2.src IS NOT NULL AS INT) AS is_edge
         | FROM sh JOIN dg x ON x.id = sh.u JOIN dg y ON y.id = sh.v
         | LEFT JOIN ed e2 ON e2.src = sh.u AND e2.dst = sh.v)
         |SELECT * FROM j WHERE jaccard >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,
    // F94: the F63 within-list pair chain with labels joined on, hardest
    // positive = (cos ASC, id ASC) pick, hardest negative = (cos DESC,
    // id DESC) pick — the struct-min/max total orders
    "emb_triplet_mine" ->
      s"""WITH $knnRankedCtes,
         |pp AS (SELECT pr.vec_id, pr.list_id, pr.nbr_id, pr.cos,
         |  ea.label AS al, eb.label AS bl
         | FROM pr JOIN e ea ON ea.vec_id = pr.vec_id
         | JOIN e eb ON eb.vec_id = pr.nbr_id),
         |pos AS (SELECT vec_id, list_id, al, nbr_id AS pos_id,
         |  cos AS pos_cos FROM (SELECT *, row_number() OVER (
         |   PARTITION BY vec_id ORDER BY cos, nbr_id) AS rn
         |  FROM pp WHERE al = bl) WHERE rn = 1),
         |neg AS (SELECT vec_id, nbr_id AS neg_id, cos AS neg_cos
         | FROM (SELECT *, row_number() OVER (
         |   PARTITION BY vec_id ORDER BY cos DESC, nbr_id DESC) AS rn
         |  FROM pp WHERE al <> bl) WHERE rn = 1)
         |SELECT pos.vec_id, pos.al AS label,
         | CAST(pos.list_id AS BIGINT) AS list_id,
         | pos.pos_id, pos.pos_cos, neg.neg_id, neg.neg_cos,
         | CAST(neg.neg_cos + 0.05 > pos.pos_cos AS INT) AS violation
         |FROM pos JOIN neg ON pos.vec_id = neg.vec_id
         |ORDER BY pos.vec_id""".stripMargin,
    // E59: per-user (sec, event_id)-ordered 3-grams, path cells, rank
    // window with path-string tie-breaks, integer-PPM corpus share
    "q_top_paths" ->
      """WITH tr AS (SELECT event_type AS e1,
        |  lead(event_type, 1) OVER w AS e2,
        |  lead(event_type, 2) OVER w AS e3
        | FROM events WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(extract(epoch FROM ts)) AS BIGINT), event_id)),
        |c AS (SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
        |  CAST(count(*) AS BIGINT) AS n FROM tr WHERE e3 IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT rank, path, n AS n_occurrences,
        | n * 1000000 // total AS share_ppm
        |FROM (SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path)
        |   AS BIGINT) AS rank FROM c) CROSS JOIN t
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // F90: the F87 kNN edge CTEs, per-neighbor weight quantized ONCE to
    // floor(1e6/ln deg) so the pair score is an order-independent
    // integer sum
    "graph_adamic_adar" ->
      s"""WITH $knnRankedCtes,
         |k3 AS MATERIALIZED (SELECT vec_id, nbr_id FROM r WHERE rank <= 3),
         |ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT vec_id AS src, nbr_id AS dst FROM k3
         |  UNION ALL SELECT nbr_id, vec_id FROM k3)),
         |dg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         | FROM ed GROUP BY 1),
         |wt AS (SELECT id, CAST(floor(1000000.0 / ln(CAST(deg AS DOUBLE)))
         |   AS BIGINT) AS w_ppm FROM dg WHERE deg >= 2),
         |sc AS (SELECT a.dst AS u, b.dst AS v,
         |  CAST(count(*) AS BIGINT) AS n_shared,
         |  CAST(sum(w.w_ppm) AS BIGINT) AS aa_ppm
         | FROM ed a JOIN ed b ON a.src = b.src AND a.dst < b.dst
         | JOIN wt w ON w.id = a.src GROUP BY 1, 2)
         |SELECT u AS vec_a, v AS vec_b, n_shared, aa_ppm,
         | CAST(e2.src IS NOT NULL AS INT) AS is_edge
         |FROM sc LEFT JOIN ed e2 ON e2.src = sc.u AND e2.dst = sc.v
         |WHERE aa_ppm >= 1500000
         |ORDER BY vec_a, vec_b""".stripMargin,
    // F92: bigrams replayed 1-based, the shared FNV-1a HUGEINT fold per
    // bigram, green = bit 40 (see the engine scaladoc for why low/
    // carry-fed bits are unusable), one fixed-shape z rounded 4 (flag
    // reads the ROUNDED z)
    "text_watermark" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
         |bg AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i + 1])) AS g
         | FROM tk WHERE len(toks) >= 2),
         |h AS (SELECT doc_id, ${fnvFold(
             "list_transform(range(1, length(g) + 1), i -> CAST(ord(substr(g, i, 1)) AS HUGEINT))")} AS hu
         | FROM bg),
         |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN (hu // 1099511627776) % 2 = 0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_green
         | FROM h GROUP BY 1)
         |SELECT doc_id, n_pairs, n_green,
         | n_green * 1000000 // n_pairs AS green_ppm,
         | round((2.0 * n_green - n_pairs) / sqrt(CAST(n_pairs AS DOUBLE)), 4)
         |   AS z_score,
         | CAST(n_pairs >= 20 AND
         |  round((2.0 * n_green - n_pairs) / sqrt(CAST(n_pairs AS DOUBLE)), 4)
         |    > 4.0 AS INT) AS watermarked
         |FROM a ORDER BY doc_id""".stripMargin,
    // F93: 1-based bigram replay to (source, w1, w2) cells, context
    // totals, fixed-shape Σcnt·ln terms rounded 4
    "text_bigram_entropy" ->
      s"""WITH tk AS (SELECT source, $toks AS toks FROM documents),
         |bg AS (SELECT source, toks[i] AS w1, toks[i + 1] AS w2 FROM (
         |  SELECT source, toks, unnest(range(1, len(toks))) AS i FROM tk)),
         |cells AS (SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS cnt
         | FROM bg GROUP BY 1, 2, 3),
         |ctx AS (SELECT source, w1, CAST(sum(cnt) AS BIGINT) AS c1
         | FROM cells GROUP BY 1, 2),
         |a AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         |  CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
         |  CAST(count(DISTINCT cells.w1) AS BIGINT) AS n_contexts,
         |  sum(CAST(cnt AS DOUBLE) * ln(CAST(c1 AS DOUBLE) / cnt)) AS hc,
         |  sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS slnc
         | FROM cells JOIN ctx USING (source, w1) GROUP BY 1)
         |SELECT source, n_bigrams, n_distinct_bigrams, n_contexts,
         | round(hc / n_bigrams, 4) AS cond_entropy,
         | round(ln(CAST(n_bigrams AS DOUBLE)) - slnc / n_bigrams, 4)
         |   AS bigram_entropy
         |FROM a ORDER BY source""".stripMargin,
    // F91: the shared tokenizer to (doc, term) cells, exact-integer PPM
    // ratios, one fixed-shape double each for root-TTR / Herdan C
    "text_lexical_diversity" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS w FROM documents),
         |tc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
         | FROM tk GROUP BY 1, 2),
         |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         | FROM tc GROUP BY 1)
         |SELECT doc_id, n_tokens, n_types, n_hapax,
         | n_types * 1000000 // n_tokens AS ttr_ppm,
         | round(n_types / sqrt(CAST(n_tokens AS DOUBLE)), 4) AS root_ttr,
         | round(ln(CAST(n_types AS DOUBLE))
         |   / nullif(ln(CAST(n_tokens AS DOUBLE)), 0), 4) AS herdan_c,
         | n_hapax * 1000000 // n_types AS hapax_ppm
         |FROM a ORDER BY doc_id""".stripMargin,
    // F74: the stub spectrogram model restated in SQL (list-comprehension
    // bands, peak energies), then the same landmark hashes, df screen,
    // and offset-histogram vote
    "mm_audio_fingerprint" ->
      """WITH d AS MATERIALIZED (SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |d2 AS (SELECT doc_id, n // 7 AS r, n % 7 AS p,
        |  (n // 7) % 24 + 12 AS nf FROM d),
        |pk AS MATERIALIZED (SELECT doc_id, t,
        |  list_aggregate([(r * 31 + (t + p) * 17 + bb * bb * 29) % 1009
        |    for bb in range(0, 8)], 'max') AS peak
        | FROM (SELECT doc_id, r, p, unnest(range(0, nf)) AS t FROM d2)),
        |lm AS MATERIALIZED (SELECT a.doc_id, a.t,
        |  a.peak * 4036 + b.peak * 4 + (b.t - a.t) AS h
        | FROM pk a JOIN pk b ON a.doc_id = b.doc_id
        |  AND b.t - a.t BETWEEN 1 AND 3),
        |good AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS c
        |  FROM lm GROUP BY 1) WHERE c <= 64),
        |lmk AS MATERIALIZED (SELECT lm.* FROM lm JOIN good USING (h)),
        |m AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  x.t - y.t AS t_offset, CAST(count(*) AS BIGINT) AS score
        | FROM lmk x JOIN lmk y ON x.h = y.h AND x.doc_id < y.doc_id
        | GROUP BY 1, 2, 3),
        |s AS (SELECT *, row_number() OVER (PARTITION BY doc_a, doc_b
        |  ORDER BY score DESC, t_offset) AS rn FROM m)
        |SELECT doc_a, doc_b, t_offset, score FROM s
        |WHERE rn = 1 AND score >= 20 ORDER BY doc_a, doc_b""".stripMargin,
    // F73: full BPE replay — the vocab cap, the weighted pair argmax
    // with the (count DESC, pair ASC) tie-break, and the island-parity
    // leftmost-non-overlap merge, all as unrolled per-round CTEs; every
    // learned merge and the compression trajectory hash-check
    "text_bpe_train" -> {
      val unionAll = (1 to 6).map(i => s"SELECT * FROM r$i").mkString(" UNION ALL ")
      s"""WITH $bpeChainCtes
         |SELECT * FROM ($unionAll) ORDER BY round""".stripMargin
    },
    // F75: the SAME chain, then the per-word segmentation lengths from
    // the final state and the corpus apply join with the OOV
    // char-length fallback
    "text_bpe_tokens" ->
      s"""WITH $bpeChainCtes,
         |seg AS MATERIALIZED (SELECT v.word, CAST(count(*) AS BIGINT) AS n_toks
         | FROM s6 JOIN v USING (word_id) GROUP BY 1),
         |wpd AS (SELECT doc_id, unnest($toks) AS word FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         | CAST(sum(coalesce(seg.n_toks, len(word))) AS BIGINT) AS n_tokens,
         | CAST(sum(CASE WHEN seg.n_toks IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |FROM wpd LEFT JOIN seg USING (word)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // F62: the F30 span CTEs + a position-level NOT EXISTS cut + the
    // ordered rebuild; the md5 pins the exact surviving byte stream
    "text_trim_spans" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |w AS (SELECT doc_id, unnest(toks) AS word,
         |  generate_subscripts(toks, 1) AS p FROM t),
         |g AS (SELECT doc_id,
         |  unnest(CASE WHEN len(toks) >= 8
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 7 AS INT)), ' ')
         |          for i in range(1, len(toks) - 6)]
         |    ELSE [] END) AS gram,
         |  unnest(CASE WHEN len(toks) >= 8 THEN range(1, len(toks) - 6) ELSE [] END) AS p
         | FROM t),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |h AS (SELECT g.doc_id, g.p FROM g JOIN d USING (gram)),
         |i AS (SELECT doc_id, p,
         |  CASE WHEN lag(p) OVER win IS NULL OR p > lag(p) OVER win + 8 THEN 1 ELSE 0 END AS brk
         | FROM h WINDOW win AS (PARTITION BY doc_id ORDER BY p)),
         |s AS (SELECT doc_id, p,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island FROM i),
         |spn AS (SELECT doc_id, min(p) AS s0, max(p) + 7 AS e0
         |  FROM s GROUP BY doc_id, island),
         |kept AS (SELECT w.doc_id, w.p, w.word FROM w
         |  WHERE NOT EXISTS (SELECT 1 FROM spn
         |    WHERE spn.doc_id = w.doc_id AND w.p BETWEEN spn.s0 AND spn.e0)),
         |ka AS (SELECT doc_id, count(*) AS n_after,
         |  md5(string_agg(word, ' ' ORDER BY p)) AS trimmed_md5
         | FROM kept GROUP BY doc_id),
         |nb AS (SELECT doc_id, count(*) AS n_before FROM w GROUP BY doc_id)
         |SELECT nb.doc_id, nb.n_before,
         |  nb.n_before - COALESCE(ka.n_after, 0) AS n_trimmed,
         |  COALESCE(ka.n_after, 0) AS n_after,
         |  COALESCE(ka.trimmed_md5, 'd41d8cd98f00b204e9800998ecf8427e') AS trimmed_md5
         |FROM nb LEFT JOIN ka USING (doc_id) ORDER BY nb.doc_id""".stripMargin,
    // F63: the dedup_semantic assignment CTEs + within-list ranked pairs
    // on the ROUNDED cosine (ties to the smaller neighbor id)
    "emb_knn_graph" ->
      s"""WITH $knnRankedCtes
         |SELECT vec_id, CAST(rank AS BIGINT) AS rank, nbr_id,
         |  CAST(list_id AS BIGINT) AS list_id, cos
         |FROM r WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,
    // F78: the same integer feature arithmetic and literal weights; //
    // truncates toward zero exactly like Spark's div, signs included
    "text_quality_model" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(len(text) AS BIGINT) AS n_chars,
         |  CAST(len(list_filter(toks,
         |    x -> x IN ('the','a','and','of','to'))) AS BIGINT) AS n_stop,
         |  CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha
         | FROM t),
         |g AS (SELECT doc_id, n_words,
         |  n_stop * 1000000 // greatest(n_words, 1) AS stop_ppm,
         |  n_alpha * 1000000 // greatest(n_chars, 1) AS alpha_ppm,
         |  n_alpha * 100 // greatest(n_words, 1) AS wlen_x100
         | FROM f),
         |h AS (SELECT *, -700000 + least(n_words, 200) * 5000 + stop_ppm * 3
         |   + (alpha_ppm - 800000) - abs(wlen_x100 - 450) * 2000 AS logit_micro
         | FROM g)
         |SELECT doc_id, n_words, stop_ppm, alpha_ppm, wlen_x100, logit_micro,
         | CAST(greatest(-4, least(4, logit_micro // 200000)) AS BIGINT) AS bucket,
         | CAST(CASE WHEN logit_micro > 0 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM h ORDER BY doc_id""".stripMargin,
    // F79: brute truth vs the quantizer-probed top-k, per probe query;
    // both rankings on the 4-dec rounded cosine with vec_id ties; the
    // probe set is the FIXED-SIZE md5-top-10 draw (never a fraction)
    "ann_recall" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 10),
         |tr AS MATERIALIZED (SELECT qid, vec_id FROM (
         |  SELECT q.qid, e.vec_id, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(${cosSql("e.v", "q.qv")}, 4) DESC, e.vec_id) AS rn
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid) WHERE rn <= 10),
         |prq AS MATERIALIZED (SELECT qid, c_label FROM (
         |  SELECT q.qid, c.c_label, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY ${cosSql("c.cv", "q.qv")} DESC, c.c_label) AS rn
         |  FROM c CROSS JOIN q) WHERE rn <= 5),
         |aa AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS MATERIALIZED (SELECT vec_id, c_label AS list_id FROM aa WHERE rn = 1),
         |an AS MATERIALIZED (SELECT qid, vec_id FROM (
         |  SELECT q.qid, e.vec_id, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(${cosSql("e.v", "q.qv")}, 4) DESC, e.vec_id) AS rn
         |  FROM q JOIN prq ON prq.qid = q.qid
         |  JOIN asg ON asg.list_id = prq.c_label
         |  JOIN e ON e.vec_id = asg.vec_id
         |  WHERE e.vec_id <> q.qid) WHERE rn <= 10),
         |h AS (SELECT tr.qid, CAST(count(*) AS BIGINT) AS n_hits
         | FROM tr JOIN an USING (qid, vec_id) GROUP BY 1)
         |SELECT q.qid, COALESCE(h.n_hits, 0) AS n_hits,
         | CAST(COALESCE(h.n_hits, 0) * 1000000 // 10 AS BIGINT) AS recall_ppm
         |FROM q LEFT JOIN h ON h.qid = q.qid ORDER BY q.qid""".stripMargin,
    // F29b: the PQ sub-code tuning curve — the ann_pq_adc encode/ADC
    // chain swept over nSub ∈ {4,8,16} (subspace width 64/nSub); per
    // point, exact-cosine top-10 retention inside the rounded-ADC top-30
    // candidate heap; probe set and truth shared with the F79 family
    "ann_pq_curve" -> {
      val pts = Seq(4, 8, 16)
      val per = pts.map { n =>
        val sd = 64 / n
        s"""d$n AS MATERIALIZED (SELECT xp.vec_id, cb.c_label,
           |  CAST((xp.pos - 1) // $sd AS INT) AS m,
           |  sum((xp.x - cb.a) * (xp.x - cb.a)) AS d2
           | FROM xp JOIN cb USING (pos) GROUP BY 1, 2, 3),
           |enc$n AS (SELECT vec_id, m, c_label, row_number() OVER (
           |   PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn FROM d$n),
           |code$n AS MATERIALIZED (SELECT vec_id, m, c_label AS cl
           | FROM enc$n WHERE rn = 1),
           |ad$n AS (SELECT qd.vec_id AS qid, code.vec_id,
           |  round(sum(qd.d2), 6) AS approx
           | FROM d$n qd JOIN q10 ON q10.qid = qd.vec_id
           | JOIN code$n code ON code.m = qd.m AND code.cl = qd.c_label
           | WHERE code.vec_id <> qd.vec_id GROUP BY 1, 2),
           |cd$n AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
           |   row_number() OVER (PARTITION BY qid ORDER BY approx, vec_id) AS rn
           |  FROM ad$n) WHERE rn <= 30),
           |h$n AS (SELECT tr.qid, CAST(count(*) AS BIGINT) AS n_hits
           | FROM tr JOIN cd$n USING (qid, vec_id) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val sel = pts.map { n =>
        s"""SELECT CAST($n AS INT) AS nsub, q10.qid,
           | COALESCE(h$n.n_hits, 0) AS n_hits,
           | CAST(COALESCE(h$n.n_hits, 0) * 1000000 // 10 AS BIGINT) AS recall_ppm
           |FROM q10 LEFT JOIN h$n ON h$n.qid = q10.qid""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |xp AS MATERIALIZED (SELECT vec_id, generate_subscripts(v, 1) AS pos,
         |  unnest(v) AS x FROM e),
         |cb AS MATERIALIZED (SELECT label AS c_label, pos, avg(x) AS a
         |  FROM (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e)
         |  GROUP BY label, pos),
         |q10 AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 10),
         |tr AS MATERIALIZED (SELECT qid, vec_id FROM (
         |  SELECT q10.qid, e.vec_id, row_number() OVER (PARTITION BY q10.qid
         |    ORDER BY round(${cosSql("e.v", "q10.qv")}, 4) DESC, e.vec_id) AS rn
         |  FROM e CROSS JOIN q10 WHERE e.vec_id <> q10.qid) WHERE rn <= 10),
         |$per
         |$sel
         |ORDER BY nsub, qid""".stripMargin
    },
    // F79b: the nprobe-vs-recall tuning curve — the F79 chain with the
    // probed-list cut swept over nprobe ∈ {1,2,3,5,8}; truth, probe set
    // and candidate fetch shared verbatim with ann_recall
    "ann_recall_curve" -> {
      val pts = Seq(1, 2, 3, 5, 8)
      val perP = pts.map { p =>
        s"""an$p AS MATERIALIZED (SELECT qid, vec_id FROM (
           |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
           |    ORDER BY score DESC, vec_id) AS rn
           |  FROM cand WHERE crn <= $p) WHERE rn <= 10),
           |h$p AS (SELECT tr.qid, CAST(count(*) AS BIGINT) AS n_hits
           | FROM tr JOIN an$p USING (qid, vec_id) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val sel = pts.map { p =>
        s"""SELECT CAST($p AS INT) AS nprobe, q.qid,
           | COALESCE(h$p.n_hits, 0) AS n_hits,
           | CAST(COALESCE(h$p.n_hits, 0) * 1000000 // 10 AS BIGINT) AS recall_ppm
           |FROM q LEFT JOIN h$p ON h$p.qid = q.qid""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 10),
         |tr AS MATERIALIZED (SELECT qid, vec_id FROM (
         |  SELECT q.qid, e.vec_id, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY round(${cosSql("e.v", "q.qv")}, 4) DESC, e.vec_id) AS rn
         |  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid) WHERE rn <= 10),
         |prq AS MATERIALIZED (SELECT qid, c_label, rn AS crn FROM (
         |  SELECT q.qid, c.c_label, row_number() OVER (PARTITION BY q.qid
         |    ORDER BY ${cosSql("c.cv", "q.qv")} DESC, c.c_label) AS rn
         |  FROM c CROSS JOIN q) WHERE rn <= ${pts.max}),
         |aa AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS MATERIALIZED (SELECT vec_id, c_label AS list_id FROM aa WHERE rn = 1),
         |cand AS MATERIALIZED (SELECT q.qid, prq.crn, e.vec_id,
         |  round(${cosSql("e.v", "q.qv")}, 4) AS score
         | FROM q JOIN prq ON prq.qid = q.qid
         | JOIN asg ON asg.list_id = prq.c_label
         | JOIN e ON e.vec_id = asg.vec_id
         | WHERE e.vec_id <> q.qid),
         |$perP
         |$sel
         |ORDER BY nprobe, qid""".stripMargin
    },
    // F77: the SAME ranked-pairs chain at k=5, distances as exact 1e-4
    // integers (10000 - round(cos*1e4)), then the textbook LOF chain —
    // k-distance, reachability, local reachability density, LOF ratio —
    // entirely in integer PPM
    "emb_lof" ->
      s"""WITH $knnRankedCtes,
         |knn AS MATERIALIZED (SELECT vec_id, nbr_id, list_id,
         |  10000 - CAST(round(cos * 10000) AS BIGINT) AS d
         | FROM r WHERE rank <= 5),
         |kd AS MATERIALIZED (SELECT vec_id, max(d) AS kdist,
         |  CAST(count(*) AS BIGINT) AS m FROM knn GROUP BY 1),
         |rch AS MATERIALIZED (SELECT knn.vec_id,
         |  greatest(kb.kdist, knn.d) AS reach
         | FROM knn JOIN kd kb ON kb.vec_id = knn.nbr_id),
         |lrd AS MATERIALIZED (SELECT rch.vec_id,
         |  CAST(kd.m * 1000000 // greatest(sum(rch.reach), 1) AS BIGINT) AS lrd
         | FROM rch JOIN kd ON kd.vec_id = rch.vec_id
         | GROUP BY rch.vec_id, kd.m),
         |lof AS (SELECT knn.vec_id,
         |  CAST(sum(lb.lrd) * 1000000 // (kd.m * greatest(la.lrd, 1)) AS BIGINT) AS lof
         | FROM knn JOIN lrd lb ON lb.vec_id = knn.nbr_id
         | JOIN lrd la ON la.vec_id = knn.vec_id
         | JOIN kd ON kd.vec_id = knn.vec_id
         | GROUP BY knn.vec_id, kd.m, la.lrd)
         |SELECT kd.vec_id, kd.m, kd.kdist, lrd.lrd AS lrd_ppm,
         | lof.lof AS lof_ppm,
         | CAST(CASE WHEN lof.lof > 1300000 THEN 1 ELSE 0 END AS INT) AS outlier
         |FROM kd JOIN lrd ON lrd.vec_id = kd.vec_id
         |JOIN lof ON lof.vec_id = kd.vec_id
         |ORDER BY kd.vec_id""".stripMargin,
    "dedup_substring" ->
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         |g AS (SELECT doc_id,
         |  unnest(CASE WHEN len(toks) >= 8
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 7 AS INT)), ' ')
         |          for i in range(1, len(toks) - 6)]
         |    ELSE [] END) AS gram,
         |  unnest(CASE WHEN len(toks) >= 8 THEN range(1, len(toks) - 6) ELSE [] END) AS p
         | FROM t),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |h AS (SELECT g.doc_id, g.p FROM g JOIN d USING (gram)),
         |i AS (SELECT doc_id, p,
         |  CASE WHEN lag(p) OVER w IS NULL OR p > lag(p) OVER w + 8 THEN 1 ELSE 0 END AS brk
         | FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
         |s AS (SELECT doc_id, p,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS island FROM i)
         |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
         | CAST(max(p) + 7 AS BIGINT) AS span_end,
         | CAST(max(p) + 7 - min(p) + 1 AS BIGINT) AS span_words,
         | count(*) AS n_dup_grams
         |FROM s GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,
    "text_contamination" ->
      s"""WITH q AS (SELECT doc_id, $toks AS toks FROM documents),
         |g AS (SELECT DISTINCT doc_id, gram FROM (
         |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 4 AS INT)), ' ')
         |          for i in range(1, len(toks) - 3)]
         |    ELSE [] END) AS gram FROM q)),
         |b AS (SELECT doc_id AS bench_doc, gram FROM g WHERE doc_id % 97 = 0),
         |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0),
         |h AS (SELECT bench_doc, count(DISTINCT c.doc_id) AS n_contaminated_docs,
         |  count(*) AS n_gram_hits FROM b JOIN c USING (gram) GROUP BY 1)
         |SELECT bd.bench_doc,
         | CAST(coalesce(n_contaminated_docs, 0) AS BIGINT) AS n_contaminated_docs,
         | CAST(coalesce(n_gram_hits, 0) AS BIGINT) AS n_gram_hits
         |FROM (SELECT DISTINCT bench_doc FROM b) bd LEFT JOIN h USING (bench_doc)
         |ORDER BY 1""".stripMargin,
    // same planted wire (every 10th doc self-concatenated), same 3-gram
    // construction, same dup-fraction arithmetic per row
    "text_repetition" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |  CASE WHEN doc_id % 10 = 0 THEN text || ' ' || text ELSE text END AS text
         | FROM documents),
         |q AS (SELECT doc_id, lang, $toks AS toks FROM w),
         |g AS (SELECT doc_id, lang, CASE WHEN len(toks) >= 3
         |    THEN [array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 2 AS INT)), ' ')
         |          for i in range(1, len(toks) - 1)]
         |    ELSE [] END AS gs FROM q),
         |m AS (SELECT doc_id, lang, CAST(len(gs) AS BIGINT) AS n_grams,
         |  CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct FROM g),
         |r AS (SELECT doc_id, lang, n_grams, n_distinct,
         |  round(CASE WHEN n_grams > 0
         |    THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_grams ELSE 0.0 END, 4) AS dup_ratio
         | FROM m)
         |SELECT doc_id, lang, n_grams, n_distinct, dup_ratio,
         | CAST(CASE WHEN dup_ratio >= 0.2 THEN 1 ELSE 0 END AS INT) AS flagged
         |FROM r ORDER BY doc_id""".stripMargin,
    // F5 SimHash: full replay — FNV-1a per token, 64 bit votes, banded
    // candidates (any 16-bit band agreement), exact hamming verify. The
    // simhash VALUES themselves are compared, not just the rollup.
    "dedup_simhash" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS tok FROM documents),
         |th AS (SELECT doc_id, ${fnvFold(
             "list_transform(range(1, length(tok) + 1), i -> CAST(ord(substr(tok, i, 1)) AS HUGEINT))")} AS hu
         | FROM tk),
         |bits AS (SELECT doc_id, b,
         |  sum(CASE WHEN (hu // (2::HUGEINT ^ b)::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS vote
         | FROM th, range(0, 64) r(b) GROUP BY 1, 2),
         |sh0 AS (SELECT doc_id,
         |  sum(CASE WHEN vote > 0 THEN (2::HUGEINT ^ b)::HUGEINT ELSE 0::HUGEINT END) AS shu
         | FROM bits GROUP BY 1),
         |sh AS (SELECT doc_id, ${u2s("shu")} AS simhash, shu FROM sh0),
         |banded AS (SELECT doc_id, simhash, b AS band,
         |  CAST((shu // (2::HUGEINT ^ (16 * b))::HUGEINT) % 65536 AS BIGINT) AS bh
         | FROM sh, range(0, 4) r(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
         |  x.simhash AS s1, y.simhash AS s2
         | FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |pairs AS (SELECT d1, d2, bit_count(xor(s1, s2)) AS hamming FROM cand
         | WHERE bit_count(xor(s1, s2)) <= 3),
         |perdoc AS (SELECT doc_id, count(*) AS n_neardups, min(hamming) AS min_hamming
         | FROM (SELECT d1 AS doc_id, hamming FROM pairs
         |       UNION ALL SELECT d2, hamming FROM pairs) GROUP BY 1)
         |SELECT s.doc_id, s.simhash, coalesce(p.n_neardups, 0) AS n_neardups,
         | CAST(coalesce(p.min_hamming, 64) AS BIGINT) AS min_hamming
         |FROM sh s LEFT JOIN perdoc p USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    // F4 MinHash-LSH: full replay — FNV-1a char-3-gram shingles (distinct),
    // 32 permutations (a=2p+1, b=1000003p+12345 mod 2^31-1), 8 bands of 4;
    // candidates join on the RAW band slice (Spark buckets via xxhash64 of
    // the slice — same partition of pairs, collisions aside), estimated
    // similarity = agreeing components / 32, threshold 0.5
    "dedup_minhash_lsh" ->
      s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         |sg0 AS (SELECT doc_id, unnest(list_transform(
         |   range(1, greatest(length(t) - 1, 1)),
         |   i -> ${fnvFold("list_transform([0, 1, 2], j -> CAST(ord(substr(t, i + j, 1)) AS HUGEINT))")})) AS hu
         | FROM d),
         |sb AS (SELECT DISTINCT doc_id,
         |  ((${u2s("hu")} % 2147483647) + 2147483647) % 2147483647 AS hp FROM sg0),
         |sig AS (SELECT doc_id, p,
         |  min((hp * (2 * p + 1) + (1000003 * p + 12345)) % 2147483647) AS comp
         | FROM sb, range(0, 32) r(p) GROUP BY 1, 2),
         |sigl AS (SELECT doc_id, list(comp ORDER BY p) AS sig FROM sig GROUP BY 1),
         |banded AS (SELECT doc_id, b AS band, sig[b * 4 + 1 : b * 4 + 4] AS bh, sig
         | FROM sigl, range(0, 8) r(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2, x.sig AS s1, y.sig AS s2
         | FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |kept AS (SELECT d1, d2,
         |  round(CAST(len(list_filter(range(1, 33), i -> s1[i] = s2[i])) AS DOUBLE) / 32, 4) AS est_sim
         | FROM cand
         | WHERE round(CAST(len(list_filter(range(1, 33), i -> s1[i] = s2[i])) AS DOUBLE) / 32, 4) >= 0.5),
         |perdoc AS (SELECT doc_id, count(*) AS n_candidates, max(est_sim) AS max_est_sim
         | FROM (SELECT d1 AS doc_id, est_sim FROM kept
         |       UNION ALL SELECT d2, est_sim FROM kept) GROUP BY 1)
         |SELECT s.doc_id, coalesce(p.n_candidates, 0) AS n_candidates,
         | coalesce(p.max_est_sim, 0.0) AS max_est_sim
         |FROM sigl s LEFT JOIN perdoc p USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    // F98: LSH recall — the minhash signature replay (F2's CTEs) plus a
    // fixed md5-top-N probe draw; truth and found are exact integer
    // agreement rules, recall exact PPM
    "dedup_lsh_recall" ->
      s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         |sg0 AS (SELECT doc_id, unnest(list_transform(
         |   range(1, greatest(length(t) - 1, 1)),
         |   i -> ${fnvFold("list_transform([0, 1, 2], j -> CAST(ord(substr(t, i + j, 1)) AS HUGEINT))")})) AS hu
         | FROM d),
         |sb AS (SELECT DISTINCT doc_id,
         |  ((${u2s("hu")} % 2147483647) + 2147483647) % 2147483647 AS hp FROM sg0),
         |sig AS (SELECT doc_id, p,
         |  min((hp * (2 * p + 1) + (1000003 * p + 12345)) % 2147483647) AS comp
         | FROM sb, range(0, 32) r(p) GROUP BY 1, 2),
         |sigl AS MATERIALIZED (SELECT doc_id, list(comp ORDER BY p) AS sig
         | FROM sig GROUP BY 1),
         |probes AS MATERIALIZED (SELECT doc_id AS qid, sig AS qsig FROM sigl
         | ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 20),
         |truth AS MATERIALIZED (SELECT p.qid, s.doc_id
         | FROM sigl s CROSS JOIN probes p
         | WHERE s.doc_id <> p.qid
         |  AND len(list_filter(range(1, 33), i -> s.sig[i] = p.qsig[i])) >= 16),
         |bp AS (SELECT qid, b AS band, qsig[b * 4 + 1 : b * 4 + 4] AS bh
         | FROM probes, range(0, 8) r(b)),
         |ba AS (SELECT doc_id, b AS band, sig[b * 4 + 1 : b * 4 + 4] AS bh
         | FROM sigl, range(0, 8) r(b)),
         |f0 AS (SELECT DISTINCT p.qid, a.doc_id
         | FROM bp p JOIN ba a ON p.band = a.band AND p.bh = a.bh
         |  AND p.qid <> a.doc_id),
         |found AS (SELECT f.qid, f.doc_id FROM f0 f
         | JOIN sigl s ON s.doc_id = f.doc_id
         | JOIN probes pr ON pr.qid = f.qid
         | WHERE len(list_filter(range(1, 33), i -> s.sig[i] = pr.qsig[i])) >= 16),
         |tc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_true
         | FROM truth GROUP BY 1),
         |h AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits
         | FROM truth t JOIN found USING (qid, doc_id) GROUP BY 1)
         |SELECT p.qid, COALESCE(tc.n_true, 0) AS n_true,
         | COALESCE(h.n_hits, 0) AS n_hits,
         | CASE WHEN COALESCE(tc.n_true, 0) = 0 THEN NULL
         |  ELSE CAST(COALESCE(h.n_hits, 0) * 1000000 // tc.n_true AS BIGINT)
         | END AS recall_ppm
         |FROM probes p LEFT JOIN tc ON tc.qid = p.qid
         | LEFT JOIN h ON h.qid = p.qid ORDER BY p.qid""".stripMargin,
    // F98b: the bands-vs-recall tuning curve — the F98 chain with the
    // banding swept over bands ∈ {4,8,16} (width = 32/bands); signatures,
    // probe set and ground truth shared verbatim with dedup_lsh_recall
    "dedup_lsh_recall_curve" -> {
      val pts = Seq(4, 8, 16)
      val perB = pts.map { b =>
        val w = 32 / b
        s"""bp$b AS (SELECT qid, b AS band, qsig[b * $w + 1 : b * $w + $w] AS bh
           | FROM probes, range(0, $b) r(b)),
           |ba$b AS (SELECT doc_id, b AS band, sig[b * $w + 1 : b * $w + $w] AS bh
           | FROM sigl, range(0, $b) r(b)),
           |f0$b AS (SELECT DISTINCT p.qid, a.doc_id
           | FROM bp$b p JOIN ba$b a ON p.band = a.band AND p.bh = a.bh
           |  AND p.qid <> a.doc_id),
           |found$b AS (SELECT f.qid, f.doc_id FROM f0$b f
           | JOIN sigl s ON s.doc_id = f.doc_id
           | JOIN probes pr ON pr.qid = f.qid
           | WHERE len(list_filter(range(1, 33), i -> s.sig[i] = pr.qsig[i])) >= 16),
           |h$b AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS n_hits
           | FROM truth t JOIN found$b USING (qid, doc_id) GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val sel = pts.map { b =>
        s"""SELECT CAST($b AS INT) AS bands, p.qid,
           | COALESCE(tc.n_true, 0) AS n_true,
           | COALESCE(h$b.n_hits, 0) AS n_hits,
           | CASE WHEN COALESCE(tc.n_true, 0) = 0 THEN NULL
           |  ELSE CAST(COALESCE(h$b.n_hits, 0) * 1000000 // tc.n_true AS BIGINT)
           | END AS recall_ppm
           |FROM probes p LEFT JOIN tc ON tc.qid = p.qid
           | LEFT JOIN h$b ON h$b.qid = p.qid""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         |sg0 AS (SELECT doc_id, unnest(list_transform(
         |   range(1, greatest(length(t) - 1, 1)),
         |   i -> ${fnvFold("list_transform([0, 1, 2], j -> CAST(ord(substr(t, i + j, 1)) AS HUGEINT))")})) AS hu
         | FROM d),
         |sb AS (SELECT DISTINCT doc_id,
         |  ((${u2s("hu")} % 2147483647) + 2147483647) % 2147483647 AS hp FROM sg0),
         |sig AS (SELECT doc_id, p,
         |  min((hp * (2 * p + 1) + (1000003 * p + 12345)) % 2147483647) AS comp
         | FROM sb, range(0, 32) r(p) GROUP BY 1, 2),
         |sigl AS MATERIALIZED (SELECT doc_id, list(comp ORDER BY p) AS sig
         | FROM sig GROUP BY 1),
         |probes AS MATERIALIZED (SELECT doc_id AS qid, sig AS qsig FROM sigl
         | ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 20),
         |truth AS MATERIALIZED (SELECT p.qid, s.doc_id
         | FROM sigl s CROSS JOIN probes p
         | WHERE s.doc_id <> p.qid
         |  AND len(list_filter(range(1, 33), i -> s.sig[i] = p.qsig[i])) >= 16),
         |tc AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_true
         | FROM truth GROUP BY 1),
         |$perB
         |$sel
         |ORDER BY bands, qid""".stripMargin
    },
    // F18 winnowing: full replay — FNV-1a char-5-grams, sliding-window
    // (w=8) minima via a frame window (n<=w collapses to the global min:
    // the i=1 window covers everything), distinct fingerprints, df-cap 64,
    // >=15 shared fingerprints. Signed (Java) ordering for the minima.
    "dedup_winnow" ->
      s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
         |hl AS (SELECT doc_id, list_transform(range(1, greatest(length(t) - 3, 1)),
         |   i -> ${u2s(fnvFold("list_transform([0, 1, 2, 3, 4], j -> CAST(ord(substr(t, i + j, 1)) AS HUGEINT))"))}) AS hs
         | FROM d),
         |kg AS (SELECT doc_id, unnest(hs) AS h, unnest(range(1, len(hs) + 1)) AS i FROM hl),
         |mins AS (SELECT doc_id, i,
         |  min(h) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS m,
         |  count(*) OVER (PARTITION BY doc_id) AS n
         | FROM kg),
         |fp AS (SELECT DISTINCT doc_id, m AS fp FROM mins WHERE i <= greatest(n - 7, 1)),
         |nf AS (SELECT h.doc_id, coalesce(count(f.fp), 0) AS n_fingerprints
         | FROM hl h LEFT JOIN fp f ON h.doc_id = f.doc_id GROUP BY 1),
         |dfc AS (SELECT fp, count(*) AS df FROM fp GROUP BY 1),
         |kept AS (SELECT f.doc_id, f.fp FROM fp f JOIN dfc USING (fp) WHERE df <= 64),
         |pairs AS (SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS n_shared
         | FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
         | GROUP BY 1, 2 HAVING count(*) >= 15),
         |perdoc AS (SELECT doc_id, count(*) AS n_candidates, max(n_shared) AS max_shared
         | FROM (SELECT d1 AS doc_id, n_shared FROM pairs
         |       UNION ALL SELECT d2, n_shared FROM pairs) GROUP BY 1)
         |SELECT n.doc_id, CAST(n.n_fingerprints AS BIGINT) AS n_fingerprints,
         | coalesce(p.n_candidates, 0) AS n_candidates,
         | CAST(coalesce(p.max_shared, 0) AS BIGINT) AS max_shared
         |FROM nf n LEFT JOIN perdoc p USING (doc_id) ORDER BY n.doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $jaccardPairsCte
         |SELECT d1, d2, lang, jaccard FROM p WHERE jaccard >= 0.82 ORDER BY d1, d2""".stripMargin,
    // transitive near-dup clusters: min-label reachability over the same
    // pair graph, via a recursive CTE (matches the Spark label-propagation
    // fixpoint exactly)
    // F69: the F19 CC chain + keep-the-longest (lowest-id tie) survivor
    "dedup_select_rep" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
         |p2 AS (SELECT d1, d2 FROM p WHERE jaccard >= 0.82),
         |e AS (SELECT d1 AS src, d2 AS dst FROM p2 UNION ALL SELECT d2, d1 FROM p2),
         |r AS (SELECT src AS node, src AS label FROM e
         |  UNION
         |  SELECT e.dst, r.label FROM r JOIN e ON r.node = e.src),
         |c AS (SELECT node, min(label) AS component FROM r GROUP BY 1),
         |len AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_chars FROM documents),
         |m AS (SELECT c.component, CAST(count(*) AS BIGINT) AS n_docs,
         |   max(len.n_chars) AS rep_chars
         |  FROM c JOIN len ON len.doc_id = c.node GROUP BY 1 HAVING count(*) >= 2)
         |SELECT m.component, m.n_docs, min(c.node) AS rep_doc, m.rep_chars,
         | m.n_docs - 1 AS n_dropped
         |FROM m JOIN c ON c.component = m.component
         | JOIN len ON len.doc_id = c.node AND len.n_chars = m.rep_chars
         |GROUP BY 1, 2, 4 ORDER BY m.component""".stripMargin,
    "dedup_components" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
         |p2 AS (SELECT d1, d2 FROM p WHERE jaccard >= 0.82),
         |e AS (SELECT d1 AS src, d2 AS dst FROM p2 UNION ALL SELECT d2, d1 FROM p2),
         |r AS (SELECT src AS node, src AS label FROM e
         |  UNION
         |  SELECT e.dst, r.label FROM r JOIN e ON r.node = e.src),
         |c AS (SELECT node, min(label) AS component FROM r GROUP BY 1)
         |SELECT component, count(*) AS n_docs, max(node) AS max_doc
         |FROM c GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin,
    // SemDeDup: same label-mean quantizer CTEs as neardup_ivf_gated, then
    // the paper's one-pass dominance rule (drop x iff a same-cluster
    // duplicate y has lower rounded centroid-similarity, ties to lower id)
    // F55: the oracle states the global permutation directly (one window
    // over the bijective modular hash); the engine must reach the SAME
    // per-row (shard, pos) through the chunked prefix-sum rank
    "sample_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  (doc_id % 1000000007) * 999999937 % 1000000007 AS h FROM documents),
        |r AS (SELECT doc_id, h,
        |  row_number() OVER (ORDER BY h, doc_id) - 1 AS rk FROM h)
        |SELECT doc_id, CAST(h AS BIGINT) AS h,
        |  CAST(rk % 16 AS BIGINT) AS shard,
        |  CAST(rk // 16 AS BIGINT) AS pos
        |FROM r ORDER BY doc_id""".stripMargin,
    // D36: one conditional per-dimension avg pass replayed; drift verdict
    // compared on the ROUNDED centroid cosine in both engines
    "mon_embedding_drift" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
         |  vec_id % 5 = 0 AS is_cur FROM embeddings),
         |u AS (SELECT label, is_cur, unnest(v) AS x,
         |  generate_subscripts(v, 1) AS pos FROM e),
         |d AS (SELECT label, pos,
         |  avg(CASE WHEN NOT is_cur THEN x END) AS rc,
         |  avg(CASE WHEN is_cur THEN x END) AS cc
         | FROM u GROUP BY label, pos),
         |c AS (SELECT label, list(rc ORDER BY pos) AS ref_cv,
         |  list(cc ORDER BY pos) AS cur_cv FROM d GROUP BY label),
         |n AS (SELECT label,
         |  sum(CASE WHEN NOT is_cur THEN 1 ELSE 0 END) AS n_ref,
         |  sum(CASE WHEN is_cur THEN 1 ELSE 0 END) AS n_cur
         | FROM e GROUP BY label),
         |j AS (SELECT n.label, n.n_ref, n.n_cur,
         |  round(${cosSql("ref_cv", "cur_cv")}, 4) AS centroid_cos
         | FROM n JOIN c ON n.label = c.label)
         |SELECT CAST(label AS BIGINT) AS label, CAST(n_ref AS BIGINT) AS n_ref,
         |  CAST(n_cur AS BIGINT) AS n_cur, centroid_cos,
         |  centroid_cos < 0.8 AS drifted
         |FROM j ORDER BY label""".stripMargin,
    // F57: the oracle replays the WHOLE deterministic recurrence — 6-dec
    // rounded covariance (population, /n), v0 = 1/8 (= 1/√64 exactly),
    // 20 unrolled (w = C·v, normalize) CTE pairs, λ = ‖w20‖, the
    // largest-|loading| sign rule, 4-dec outputs
    "emb_pca_power" ->
      s"""WITH $pcaCtes
         |SELECT CAST(v20.pos AS BIGINT) AS pos,
         |  round(sgn.s * v20.x, 4) AS pc1_loading,
         |  round(lam.l, 4) AS eigenvalue
         |FROM v20, sgn, lam ORDER BY pos""".stripMargin,
    // F67: both chains + the deflation replayed; PC2 sign-fixed by its
    // own largest-|loading| rule
    "emb_pca_top2" ->
      s"""WITH $pcaCtes,
         |$pca2Ctes
         |SELECT CAST(v1r.pos AS BIGINT) AS pos,
         |  v1r.x AS pc1_loading,
         |  round(sgn2.s * u20.x, 4) AS pc2_loading,
         |  lam1.l AS eigenvalue1, lam2.l AS eigenvalue2
         |FROM v1r JOIN u20 ON u20.pos = v1r.pos, sgn2, lam1, lam2
         |ORDER BY pos""".stripMargin,
    // F59: the F57 chain fits; the apply CTEs center each vector,
    // project it onto the ROUNDED loadings (exactly what the engine
    // applies), and report the removed energy as norm before/after
    "emb_all_but_top" ->
      s"""WITH $pcaCtes,
         |pc AS MATERIALIZED (SELECT v20.pos, round(sgn.s * v20.x, 4) AS l
         | FROM v20, sgn),
         |p AS MATERIALIZED (SELECT cen.vec_id, sum(cen.xc * pc.l) AS proj
         | FROM cen JOIN pc USING (pos) GROUP BY 1),
         |nb AS (SELECT vec_id, sqrt(sum(xc * xc)) AS n0 FROM cen GROUP BY 1),
         |na AS (SELECT cen.vec_id,
         |   sqrt(sum((cen.xc - p.proj * pc.l) * (cen.xc - p.proj * pc.l))) AS n1
         | FROM cen JOIN pc USING (pos) JOIN p ON p.vec_id = cen.vec_id GROUP BY 1)
         |SELECT p.vec_id, round(p.proj, 4) AS pc1_projection,
         |  round(nb.n0, 4) AS norm_before, round(na.n1, 4) AS norm_after
         |FROM p JOIN nb ON nb.vec_id = p.vec_id JOIN na ON na.vec_id = p.vec_id
         |ORDER BY p.vec_id""".stripMargin,
    // F56: frozen-centroid delta assignment — the label-mean quantizer
    // CTE over the FULL corpus (= the persisted refine=0 centroids), the
    // deterministic reversed-embedding delta, and the same argmax rule
    // (cos DESC, smaller label) as listAssignments
    "ann_ivf_append" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |d AS (SELECT vec_id + 1000000 AS vec_id, list_reverse(v) AS v FROM e),
         |a AS (SELECT d.vec_id, c.c_label,
         |    round(${cosSql("d.v", "c.cv")}, 4) AS csim,
         |    row_number() OVER (PARTITION BY d.vec_id
         |      ORDER BY ${cosSql("d.v", "c.cv")} DESC, c_label) AS rn
         |  FROM d CROSS JOIN c)
         |SELECT vec_id, CAST(c_label AS BIGINT) AS list_id, csim
         |FROM a WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // F54: same e/c/asg/w CTEs as dedup_semantic (the refine=0 label-mean
    // quantizer replay), then the per-cluster density rank and the
    // all-integer drop quota — kept ⇔ rank > floor(n/4) on the ROUNDED
    // centroid similarity, so the verdict is engine-portable
    "sample_density_prune" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1),
         |w AS (SELECT e.vec_id, asg.list_id,
         |    round(${cosSql("e.v", "c.cv")}, 4) AS csim
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |   JOIN c ON c.c_label = asg.list_id),
         |r AS (SELECT vec_id, list_id, csim,
         |    row_number() OVER (PARTITION BY list_id ORDER BY csim DESC, vec_id) AS rnk,
         |    count(*) OVER (PARTITION BY list_id) AS n
         |  FROM w)
         |SELECT vec_id, CAST(list_id AS BIGINT) AS list_id, csim,
         |  CAST(rnk AS BIGINT) AS density_rank,
         |  CAST(n AS BIGINT) AS cluster_size,
         |  rnk > (n * 1) // 4 AS kept
         |FROM r ORDER BY vec_id""".stripMargin,
    // E39: the oracle is the genuine WITH RECURSIVE parent walk — a
    // different algorithm from the engine's pointer doubling, same answer
    "q_hierarchy_rollup" ->
      """WITH RECURSIVE n AS (SELECT c_custkey AS id,
        |  CASE WHEN c_custkey < 16 THEN c_custkey ELSE c_custkey // 2 END AS parent,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
        |w AS (SELECT id, parent AS cur,
        |  CAST(CASE WHEN parent = id THEN 0 ELSE 1 END AS BIGINT) AS d FROM n
        | UNION ALL
        | SELECT w.id, n2.parent, w.d + 1
        | FROM w JOIN n n2 ON n2.id = w.cur WHERE n2.parent <> n2.id),
        |f AS (SELECT w.id, w.cur AS root, w.d FROM w
        | JOIN n r ON r.id = w.cur WHERE r.parent = r.id)
        |SELECT f.root, CAST(count(*) AS BIGINT) AS n_nodes,
        | CAST(max(f.d) AS BIGINT) AS max_depth,
        | CAST(sum(n.cents) AS BIGINT) AS sum_cents
        |FROM f JOIN n ON n.id = f.id GROUP BY 1 ORDER BY f.root""".stripMargin,
    // F76: the shared quantizer CTEs + a per-vector rank over centroid
    // F85: two Lloyd rounds with centroids rounded to 4 decimals after
    // every update (the engine's portability device), argmax ties to the
    // smaller centroid id, final per-cluster report
    "emb_kmeans" ->
      s"""WITH $kmeansChainCtes
         |SELECT CAST(c_label AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
         |  round(avg(sim), 4) AS mean_sim
         |FROM sf GROUP BY 1 ORDER BY 1""".stripMargin,
    // F89: the SAME Lloyd chain (sf), joined back to the stored labels —
    // majority by (count DESC, smaller label), exact integer PPM purity
    "emb_purity" ->
      s"""WITH $kmeansChainCtes,
         |lc AS (SELECT sf.c_label AS cluster, e.label,
         |  CAST(count(*) AS BIGINT) AS cnt
         | FROM sf JOIN e ON e.vec_id = sf.vec_id GROUP BY 1, 2),
         |m AS (SELECT cluster, label, cnt,
         |  row_number() OVER (PARTITION BY cluster ORDER BY cnt DESC, label) AS rn,
         |  CAST(sum(cnt) OVER (PARTITION BY cluster) AS BIGINT) AS n FROM lc)
         |SELECT CAST(cluster AS BIGINT) AS cluster, n,
         | CAST(label AS BIGINT) AS majority_label, cnt AS n_majority,
         | cnt * 1000000 // n AS purity_ppm
         |FROM m WHERE rn = 1 ORDER BY 1""".stripMargin,
    // cosines; margins/flags judge 4-dec-rounded values in one shape
    "emb_silhouette" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |s AS (SELECT vec_id, c_label, ${cosSql("v", "cv")} AS sim,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn
         | FROM e CROSS JOIN c),
         |p AS (SELECT vec_id,
         |  max(CASE WHEN rn = 1 THEN c_label END) AS cluster,
         |  max(CASE WHEN rn = 1 THEN round(sim, 4) END) AS cos_own,
         |  max(CASE WHEN rn = 2 THEN round(sim, 4) END) AS cos_next
         | FROM s WHERE rn <= 2 GROUP BY 1)
         |SELECT vec_id, CAST(cluster AS INT) AS cluster, cos_own, cos_next,
         | round(cos_own - cos_next, 4) AS margin,
         | CAST(CASE WHEN round(cos_own - cos_next, 4) >= 0.05
         |   THEN 1 ELSE 0 END AS INT) AS confident
         |FROM p ORDER BY vec_id""".stripMargin,
    "dedup_semantic" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1),
         |w AS (SELECT e.vec_id, asg.list_id, e.v,
         |    round(${cosSql("e.v", "c.cv")}, 4) AS csim
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |   JOIN c ON c.c_label = asg.list_id),
         |dom AS (SELECT DISTINCT x.vec_id FROM w x JOIN w y
         |  ON x.list_id = y.list_id AND x.vec_id <> y.vec_id
         |  WHERE round(${cosSql("x.v", "y.v")}, 4) >= 0.4
         |   AND (y.csim < x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id)))
         |SELECT w.vec_id, CAST(w.list_id AS BIGINT) AS list_id, w.csim,
         |  (w.vec_id NOT IN (SELECT vec_id FROM dom)) AS kept
         |FROM w ORDER BY w.vec_id""".stripMargin,
    "neardup_cosine" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, CAST(a.label AS INT) AS label,
         |  round(${cosSql("a.v", "b.v")}, 4) AS cos
         | FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id1, id2, label, cos FROM p WHERE cos >= 0.35 ORDER BY id1, id2""".stripMargin,
    // the scale path for near-dup: candidates only meet inside an IVF
    // inverted list; deterministic end-to-end, so the oracle checks the
    // full gate+rescore pipeline exactly
    "neardup_ivf_gated" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1),
         |p AS (SELECT x.vec_id AS id1, y.vec_id AS id2, CAST(xa.list_id AS BIGINT) AS list_id,
         |  round(${cosSql("x.v", "y.v")}, 4) AS cos
         | FROM e x JOIN asg xa ON x.vec_id = xa.vec_id
         |  JOIN asg ya ON xa.list_id = ya.list_id AND xa.vec_id < ya.vec_id
         |  JOIN e y ON y.vec_id = ya.vec_id)
         |SELECT id1, id2, list_id, cos FROM p WHERE cos >= 0.35 ORDER BY id1, id2""".stripMargin,
    // MMR: the greedy trajectory replayed step by step — every score is
    // HALF_UP-rounded to 4 with vec_id tie-breaks on BOTH engines, so
    // the unrolled CTE chain selects the identical sequence
    "ann_mmr_diverse" -> {
      val k = 5
      val steps = (2 to k).map { i =>
        val prev = (1 until i).map(j => s"SELECT vec_id, v FROM s$j")
          .mkString(" UNION ALL ")
        s"""s$i AS (SELECT c.vec_id, c.simq, c.v,
           |  round(0.7 * c.simq - 0.3 * (SELECT max(round(${cosSql("c.v", "p.v")}, 4))
           |    FROM ($prev) p), 4) AS score
           |  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM ($prev) p2)
           |  ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val unions = (1 to k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, vec_id, simq, score AS mmr_score FROM s$i")
        .mkString("\nUNION ALL\n")
      s"""WITH cand AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  round(${cosSql("embedding::DOUBLE[]", "qv")}, 4) AS simq
         |  FROM embeddings,
         |    (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) q
         |  WHERE vec_id <> 0 ORDER BY simq DESC, vec_id LIMIT 20),
         |s1 AS (SELECT vec_id, simq, v, simq AS score FROM cand
         |  ORDER BY simq DESC, vec_id LIMIT 1),
         |$steps
         |$unions
         |ORDER BY rank""".stripMargin
    },
    "ann_topk" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT vec_id, CAST(label AS INT) AS label,
         |  round(${cosSql("embedding::DOUBLE[]", "qv")}, 4) AS score
         | FROM embeddings, q WHERE vec_id <> 0)
         |SELECT vec_id, label, score FROM s ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,
    // Matryoshka-prefix ANN: prefix-cosine top-C (rounded, id tie-break),
    // then exact full-dim rescore of the survivors
    "ann_matryoshka" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |c AS (SELECT vec_id, round(${cosSql("(e.v[1:32])", "(q.qv[1:32])")}, 4) AS pre_score
         |  FROM e, q WHERE vec_id <> 0
         |  ORDER BY pre_score DESC, vec_id LIMIT 100),
         |r AS (SELECT c.vec_id, c.pre_score, round(${cosSql("e.v", "q.qv")}, 4) AS score
         |  FROM c JOIN e ON c.vec_id = e.vec_id, q)
         |SELECT vec_id, pre_score, score FROM r ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,
    "ann_lsh_bucketed" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, $lshBucketSql AS bucket FROM e)
         |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n, min(vec_id) AS min_vec_id
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_lsh_multiprobe" -> {
      val probes = (0 until Similarity.NPlanes).map(h => s"xor(qb, ${1L << h})")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, CAST($lshBucketSql AS BIGINT) AS bucket, v FROM e),
         |q AS (SELECT bucket AS qb, v AS qv FROM b WHERE vec_id = 0),
         |pr AS (SELECT unnest([qb${probes.map(", " + _).mkString}]) AS pb FROM q)
         |SELECT vec_id, bucket, round(${cosSql("b.v", "q.qv")}, 4) AS score
         |FROM b, q WHERE bucket IN (SELECT pb FROM pr) AND vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin
    },
    // IVF is deterministic arithmetic end-to-end: label-mean centroids,
    // nearest-centroid lists (ties -> smaller label), nprobe=5 probes (F79b curve policy, graft.ivf.nprobe),
    // cosine re-score rounded like ann_topk. Assignment margins (min gap
    // best-vs-2nd centroid ~2.7e-5 at sf0.1) dwarf cross-engine fp noise
    // (~1e-14 from avg accumulation order), so the oracle is stable.
    "ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |pr AS (SELECT c_label, row_number() OVER (
         |    ORDER BY ${cosSql("cv", "qv")} DESC, c_label) AS rn FROM c, q),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1)
         |SELECT e.vec_id, CAST(asg.list_id AS BIGINT) AS list_id,
         | round(${cosSql("e.v", "q.qv")}, 4) AS score
         |FROM e JOIN asg ON e.vec_id = asg.vec_id, q
         |WHERE asg.list_id IN (SELECT c_label FROM pr WHERE rn <= 5) AND e.vec_id <> 0
         |ORDER BY score DESC, e.vec_id LIMIT 20""".stripMargin,
    // F51: the radius twin of ann_ivf — identical quantizer/probe CTEs,
    // the rounded-score threshold replaces the LIMIT
    "ann_range" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |pr AS (SELECT c_label, row_number() OVER (
         |    ORDER BY ${cosSql("cv", "qv")} DESC, c_label) AS rn FROM c, q),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1)
         |SELECT e.vec_id, CAST(asg.list_id AS BIGINT) AS list_id,
         | round(${cosSql("e.v", "q.qv")}, 4) AS score
         |FROM e JOIN asg ON e.vec_id = asg.vec_id, q
         |WHERE asg.list_id IN (SELECT c_label FROM pr WHERE rn <= 5) AND e.vec_id <> 0
         |  AND round(${cosSql("e.v", "q.qv")}, 4) >= 0.2
         |ORDER BY score DESC, e.vec_id""".stripMargin,
    // batch form: same quantizer/assignment CTEs; probe pairs per query
    // (top-nprobe lists), one candidate join, top-k per query
    "ann_ivf_batch" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
         |pr AS (SELECT qid, qv, c_label, row_number() OVER (PARTITION BY qid
         |    ORDER BY ${cosSql("cv", "qv")} DESC, c_label) AS rn FROM c, qs),
         |prob AS (SELECT qid, qv, c_label AS list_id FROM pr WHERE rn <= 2),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1),
         |cand AS (SELECT prob.qid, e.vec_id, asg.list_id,
         |   round(${cosSql("e.v", "prob.qv")}, 4) AS score
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN prob ON asg.list_id = prob.list_id
         |  WHERE e.vec_id <> prob.qid),
         |rk AS (SELECT qid, vec_id, list_id, score, row_number() OVER (
         |  PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM cand)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id,
         | CAST(list_id AS BIGINT) AS list_id, score
         |FROM rk WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // hard negatives: the ann_ivf_batch CTEs with the different-label
    // predicate applied at candidate time (the index carries labels)
    // F70: the same planted wire + symbol-alphabet strip + exact PPM
    // threshold — the classifier must separate exactly the planted class
    "text_code_detect" ->
      """WITH w AS (SELECT doc_id,
        | CASE WHEN doc_id % 6 = 0
        |  THEN 'def f(x): return {x: [1, 2]}; // y = a && b | c ' || text
        |  ELSE text END AS raw FROM documents),
        |m AS (SELECT doc_id, CAST(strlen(raw) AS BIGINT) AS n_chars,
        | CAST(strlen(regexp_replace(raw, '[^{}\[\]();:=<>&|/*+-]', '', 'g'))
        |   AS BIGINT) AS n_sym FROM w),
        |c AS (SELECT doc_id,
        | n_sym * 1000000 // greatest(n_chars, 1) AS sym_ppm FROM m)
        |SELECT CAST(CASE WHEN sym_ppm >= 10000 THEN 1 ELSE 0 END AS INT) AS is_code,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | min(sym_ppm) AS min_sym_ppm, max(sym_ppm) AS max_sym_ppm,
        | CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM c GROUP BY 1 ORDER BY is_code""".stripMargin,
    // F68: the 5-round multiplicative-weights trajectory unrolled —
    // every floor division replayed, weights renormalize each round
    "sample_doremi" -> {
      val rounds = (1 to 5).map { k =>
        s"""a$k AS (SELECT e.domain,
           |  w${k - 1}.w * (1000000 + (e.excess_ppm * 100000) // 1000000) // 1000000 AS w
           | FROM w${k - 1} JOIN e USING (domain)),
           |t$k AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM a$k),
           |w$k AS (SELECT domain, w * 1000000 // t AS w FROM a$k, t$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH s AS (SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(strlen(text)) AS BIGINT) AS len_sum FROM documents GROUP BY 1),
         |c AS (SELECT CAST(sum(len_sum) AS BIGINT) // CAST(sum(n_docs) AS BIGINT)
         |   AS cmean FROM s),
         |e AS (SELECT domain, n_docs, len_sum // n_docs AS mean_len,
         |  greatest((len_sum // n_docs) * 1000000 // c.cmean - 1000000, 0) AS excess_ppm
         | FROM s, c),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
         |w0 AS (SELECT domain, 1000000 // nd.n AS w FROM e, nd),
         |$rounds
         |SELECT e.domain, e.n_docs, e.mean_len, e.excess_ppm,
         | w0.w AS w0_ppm, w5.w AS w_final_ppm
         |FROM e JOIN w0 USING (domain) JOIN w5 USING (domain)
         |ORDER BY e.domain""".stripMargin
    },
    // F64: the greedy promotion replayed round by round (generated CTEs);
    // assignment ties break to the earliest-selected center on both sides
    "sample_kcenter" ->
      s"""WITH ${kcenterCtes(6)}
         |SELECT CAST(g.sel_order AS BIGINT) AS sel_order, s.center_id, s.sel_dist,
         | CAST(count(*) AS BIGINT) AS n_assigned,
         | max(g.bd) AS cluster_radius
         |FROM asg g JOIN sel s USING (sel_order)
         |GROUP BY 1, 2, 3 ORDER BY sel_order""".stripMargin,
    "sample_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT label AS c_label, list(a ORDER BY pos) AS cv
         |  FROM (SELECT label, pos, avg(x) AS a
         |    FROM (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
         |    GROUP BY label, pos)
         |  GROUP BY label),
         |qs AS (SELECT vec_id AS qid, label AS q_label, v AS qv FROM e WHERE vec_id % 100 = 0),
         |pr AS (SELECT qid, q_label, qv, c_label, row_number() OVER (PARTITION BY qid
         |    ORDER BY ${cosSql("cv", "qv")} DESC, c_label) AS rn FROM c, qs),
         |prob AS (SELECT qid, q_label, qv, c_label AS list_id FROM pr WHERE rn <= 2),
         |a AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cv")} DESC, c_label) AS rn FROM e CROSS JOIN c),
         |asg AS (SELECT vec_id, c_label AS list_id FROM a WHERE rn = 1),
         |cand AS (SELECT prob.qid, e.vec_id, e.label AS neg_label,
         |   round(${cosSql("e.v", "prob.qv")}, 4) AS score
         |  FROM e JOIN asg ON e.vec_id = asg.vec_id
         |  JOIN prob ON asg.list_id = prob.list_id
         |  WHERE e.vec_id <> prob.qid AND e.label <> prob.q_label),
         |rk AS (SELECT qid, vec_id, neg_label, score, row_number() OVER (
         |  PARTITION BY qid ORDER BY score DESC, vec_id) AS rank FROM cand)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id,
         | CAST(neg_label AS INT) AS neg_label, score
         |FROM rk WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // PQ-ADC: label-mean codewords per 8-dim subspace, first-argmin
    // encode (ties -> smaller label), ADC candidate cut at rounded approx
    // distance with vec_id tie-break, exact cosine rescore rounded like
    // ann_topk. Same stability argument as ann_ivf: assignment and
    // boundary margins dwarf cross-engine summation noise (~1e-15).
    "ann_pq_adc" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |xp AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
         |cb AS (SELECT label AS c_label, pos, avg(x) AS a
         |  FROM (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e)
         |  GROUP BY label, pos),
         |d AS (SELECT xp.vec_id, cb.c_label, CAST((xp.pos - 1) // 8 AS INT) AS m,
         |   sum((xp.x - cb.a) * (xp.x - cb.a)) AS d2
         |  FROM xp JOIN cb USING (pos) GROUP BY 1, 2, 3),
         |enc AS (SELECT vec_id, m, c_label,
         |   row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn FROM d),
         |code AS (SELECT vec_id, m, c_label AS cl FROM enc WHERE rn = 1),
         |qd AS (SELECT c_label, m, d2 AS qd2 FROM d WHERE vec_id = 0),
         |ad AS (SELECT code.vec_id, sum(qd.qd2) AS approx FROM code
         |  JOIN qd ON code.m = qd.m AND code.cl = qd.c_label GROUP BY 1),
         |cand AS (SELECT vec_id, round(approx, 6) AS approx_dist FROM ad
         |  WHERE vec_id <> 0 ORDER BY approx_dist, vec_id LIMIT 60),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
         |SELECT c.vec_id, c.approx_dist, round(${cosSql("e.v", "q.qv")}, 4) AS score
         |FROM cand c JOIN e ON c.vec_id = e.vec_id, q
         |ORDER BY score DESC, c.vec_id LIMIT 20""".stripMargin,
    // IVF-PQ: the ann_ivf probe/assignment CTEs composed with the
    // ann_pq_adc encode/ADC CTEs — candidates restricted to the probed
    // lists, ADC cut at rounded approx distance, exact rescore. Stability
    // by the same margins argument both parents already passed with.
    "ann_ivfpq" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |xp AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
         |cb AS (SELECT label AS c_label, pos, avg(x) AS a
         |  FROM (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e)
         |  GROUP BY label, pos),
         |cv AS (SELECT c_label, list(a ORDER BY pos) AS cvec FROM cb GROUP BY c_label),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |pr AS (SELECT c_label, row_number() OVER (
         |    ORDER BY ${cosSql("cvec", "qv")} DESC, c_label) AS rn FROM cv, q),
         |asg0 AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cvec")} DESC, c_label) AS rn FROM e CROSS JOIN cv),
         |asg AS (SELECT vec_id, c_label AS list_id FROM asg0 WHERE rn = 1),
         |d AS (SELECT xp.vec_id, cb.c_label, CAST((xp.pos - 1) // 8 AS INT) AS m,
         |   sum((xp.x - cb.a) * (xp.x - cb.a)) AS d2
         |  FROM xp JOIN cb USING (pos) GROUP BY 1, 2, 3),
         |enc AS (SELECT vec_id, m, c_label,
         |   row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn FROM d),
         |code AS (SELECT vec_id, m, c_label AS cl FROM enc WHERE rn = 1),
         |qd AS (SELECT c_label, m, d2 AS qd2 FROM d WHERE vec_id = 0),
         |ad AS (SELECT code.vec_id, sum(qd.qd2) AS approx FROM code
         |  JOIN qd ON code.m = qd.m AND code.cl = qd.c_label GROUP BY 1),
         |cand AS (SELECT a.vec_id, round(ad.approx, 6) AS approx_dist
         |  FROM asg a JOIN ad ON a.vec_id = ad.vec_id
         |  WHERE a.list_id IN (SELECT c_label FROM pr WHERE rn <= 5) AND a.vec_id <> 0
         |  ORDER BY approx_dist, a.vec_id LIMIT 60)
         |SELECT c.vec_id, CAST(asg.list_id AS BIGINT) AS list_id, c.approx_dist,
         | round(${cosSql("e.v", "q.qv")}, 4) AS score
         |FROM cand c JOIN e ON c.vec_id = e.vec_id JOIN asg ON c.vec_id = asg.vec_id, q
         |ORDER BY score DESC, c.vec_id LIMIT 20""".stripMargin,
    // batch IVF-PQ: the ann_ivfpq CTEs with a query SET; every vector's
    // codeword distance table (d) doubles as each query's ADC table
    "ann_ivfpq_batch" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |xp AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
         |cb AS (SELECT label AS c_label, pos, avg(x) AS a
         |  FROM (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e)
         |  GROUP BY label, pos),
         |cv AS (SELECT c_label, list(a ORDER BY pos) AS cvec FROM cb GROUP BY c_label),
         |qs AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
         |pr AS (SELECT qid, c_label, row_number() OVER (PARTITION BY qid
         |    ORDER BY ${cosSql("cvec", "qv")} DESC, c_label) AS rn FROM cv, qs),
         |prob AS (SELECT qid, c_label AS list_id FROM pr WHERE rn <= 2),
         |asg0 AS (SELECT vec_id, c_label, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosSql("v", "cvec")} DESC, c_label) AS rn FROM e CROSS JOIN cv),
         |asg AS (SELECT vec_id, c_label AS list_id FROM asg0 WHERE rn = 1),
         |d AS (SELECT xp.vec_id, cb.c_label, CAST((xp.pos - 1) // 8 AS INT) AS m,
         |   sum((xp.x - cb.a) * (xp.x - cb.a)) AS d2
         |  FROM xp JOIN cb USING (pos) GROUP BY 1, 2, 3),
         |enc AS (SELECT vec_id, m, c_label,
         |   row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, c_label) AS rn FROM d),
         |code AS (SELECT vec_id, m, c_label AS cl FROM enc WHERE rn = 1),
         |qd AS (SELECT vec_id AS qid, c_label, m, d2 FROM d
         |  WHERE vec_id % 100 = 0),
         |ad AS (SELECT qd.qid, code.vec_id, sum(qd.d2) AS approx FROM code
         |  JOIN qd ON code.m = qd.m AND code.cl = qd.c_label GROUP BY 1, 2),
         |candr AS (SELECT ad.qid, ad.vec_id, round(ad.approx, 6) AS approx_dist,
         |   row_number() OVER (PARTITION BY ad.qid
         |     ORDER BY round(ad.approx, 6), ad.vec_id) AS crn
         |  FROM ad JOIN asg ON ad.vec_id = asg.vec_id
         |  JOIN prob ON prob.qid = ad.qid AND prob.list_id = asg.list_id
         |  WHERE ad.vec_id <> ad.qid),
         |cand AS (SELECT qid, vec_id, approx_dist FROM candr WHERE crn <= 15),
         |sc AS (SELECT c.qid, c.vec_id, c.approx_dist,
         |   round(${cosSql("e.v", "qs.qv")}, 4) AS score
         |  FROM cand c JOIN e ON c.vec_id = e.vec_id
         |  JOIN qs ON c.qid = qs.qid),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
         |   ORDER BY score DESC, vec_id) AS rank FROM sc)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id, approx_dist, score
         |FROM rk WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // int8 quantization audit: min/max aggregates are exact (no fp
    // accumulation), the grid arithmetic has the identical IEEE op shape
    // on both engines, and the audit uses only order-free aggregates
    // (integer sums/extrema, MAX error) — exact cross-engine parity.
    "emb_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e),
        |d AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM x GROUP BY pos),
        |q AS (SELECT x.vec_id, x.x, d.mn, d.mx,
        |  CASE WHEN d.mx = d.mn THEN 0
        |       ELSE greatest(-127, least(127,
        |         CAST(floor((x.x - d.mn) * 254.0 / (d.mx - d.mn) + 0.5) AS BIGINT) - 127)) END AS code
        | FROM x JOIN d USING (pos)),
        |r AS (SELECT vec_id, code,
        |  mn + CAST(code + 127 AS DOUBLE) * (mx - mn) / 254.0 AS xh, x FROM q)
        |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_checksum,
        | CAST(min(code) AS BIGINT) AS code_min, CAST(max(code) AS BIGINT) AS code_max,
        | round(max(abs(x - xh)), 6) AS max_abs_err
        |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "text_quality" ->
      s"""SELECT * FROM ($qualityScoredSql) ORDER BY doc_id""".stripMargin,
    // curriculum buckets: the F9 score CTE + DuckDB's native ntile; the
    // Spark side reproduces standard ntile fill as integer math over a
    // chunked-prefix-sum global rank (no single-task window)
    "sample_curriculum" ->
      s"""WITH s AS ($qualityScoredSql),
         |n AS (SELECT doc_id, n_words, quality_score,
         |  ntile(10) OVER (ORDER BY quality_score DESC, doc_id) AS bucket FROM s)
         |SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_docs,
         | round(max(quality_score), 4) AS max_score,
         | round(min(quality_score), 4) AS min_score,
         | CAST(sum(n_words) AS BIGINT) AS n_tokens,
         | CAST(sum(doc_id) AS BIGINT) AS id_checksum
         |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_langid" ->
      s"""WITH q AS (SELECT lang, $toks AS toks FROM documents),
         |h AS (SELECT lang,
         |  ${hitsSql(TextAnalysis.langStops(0)._2)} AS h_en,
         |  ${hitsSql(TextAnalysis.langStops(1)._2)} AS h_de,
         |  ${hitsSql(TextAnalysis.langStops(2)._2)} AS h_es,
         |  ${hitsSql(TextAnalysis.langStops(3)._2)} AS h_fr FROM q)
         |SELECT lang,
         | CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
         |      WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
         |      WHEN h_es >= h_fr THEN 'es' ELSE 'fr' END AS predicted,
         | count(*) AS n
         |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
         | CAST(len($toks) AS BIGINT) AS ws_tokens,
         | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    // same corpus-trained bigram LM: counts are exact integers, the only
    // float is the final avg(ln) — rounded to 3 (sum order differs across
    // engines by ~1e-12)
    "text_lm_score" ->
      """WITH bi AS (SELECT doc_id, unnest(
        |   CASE WHEN length(text) >= 2
        |    THEN [substr(lower(text), CAST(i AS INT), 2) for i in range(1, length(text))]
        |    ELSE [] END) AS bg FROM documents),
        |db AS (SELECT doc_id, bg, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |bc AS (SELECT bg, CAST(sum(cnt) AS BIGINT) AS c2 FROM db GROUP BY 1),
        |fc AS (SELECT substr(bg, 1, 1) AS c1, CAST(sum(c2) AS BIGINT) AS c1n
        |  FROM bc GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM fc)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        | round(sum(cnt * ln((c2 + 1.0) / (c1n + v))) / sum(cnt), 3) AS avg_logprob
        |FROM db JOIN bc USING (bg) JOIN fc ON substr(bg, 1, 1) = fc.c1, v
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_topterms" ->
      s"""WITH q AS (SELECT doc_id, list_distinct($toks) AS toks FROM documents),
         |u AS (SELECT doc_id, unnest(toks) AS term FROM q)
         |SELECT term, count(*) AS doc_freq FROM u
         |GROUP BY term ORDER BY doc_freq DESC, term LIMIT 25""".stripMargin,
    "sample_split" ->
      """WITH s AS (SELECT *, CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |  WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val' ELSE 'test' END AS split
        | FROM documents)
        |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "sample_stratified" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn FROM documents)
        |SELECT lang, doc_id, n_chars FROM r WHERE rn % 10 = 1 ORDER BY lang, doc_id""".stripMargin,
    "mm_contrastive_pairs" ->
      """WITH n AS (SELECT count(*) AS n_corpus FROM embeddings),
        |p AS (SELECT d.doc_id, g.pair_rank,
        |  (d.doc_id + g.pair_rank * 97) % n.n_corpus AS vec_id
        |  FROM documents d, n, range(0, 4) g(pair_rank))
        |SELECT pair_rank, count(*) AS n_pairs,
        | CAST(sum(CASE WHEN p.vec_id = p.doc_id AND pair_rank > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_self_collisions,
        | CAST(sum(e.label) AS BIGINT) AS label_checksum,
        | CAST(sum(p.vec_id) AS BIGINT) AS vec_checksum
        |FROM p JOIN embeddings e USING (vec_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sample_balanced" ->
      """WITH m AS (SELECT min(n) AS n_target FROM
        |  (SELECT lang, count(*) AS n FROM documents GROUP BY 1)),
        |r AS (SELECT lang, doc_id, n_chars, row_number() OVER (PARTITION BY lang
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM documents)
        |SELECT lang, rk, doc_id, n_chars FROM r, m
        |WHERE rk <= n_target ORDER BY lang, rk""".stripMargin,
    "sample_weighted" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |  pow((((doc_id * 2654435761) % 1000000) + 0.5) / 1000000.0, 1.0 / n_chars) AS skey
        | FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars, round(skey, 6) AS sample_key FROM s
        |ORDER BY skey DESC, doc_id LIMIT 50""".stripMargin,
    // char entropy: H = ln(n) − Σ cnt·ln(cnt)/n over the per-doc char
    // histogram — integer-derived terms, only the rounded sum is float
    "text_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(
        |   CASE WHEN length(text) > 0
        |    THEN [substr(lower(text), CAST(i AS INT), 1) for i in range(1, length(text) + 1)]
        |    ELSE [] END) AS ch FROM documents),
        |dc AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2),
        |h AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  sum(cnt * ln(CAST(cnt AS DOUBLE))) AS s FROM dc GROUP BY 1)
        |SELECT doc_id, n AS n_chars_m, n_distinct,
        | round((ln(CAST(n AS DOUBLE)) - s / n) / ln(2.0), 4) AS entropy_bits,
        | CAST((ln(CAST(n AS DOUBLE)) - s / n) / ln(2.0) < 1.5
        |   OR (ln(CAST(n AS DOUBLE)) - s / n) / ln(2.0) > 4.8 AS INT) AS flag_junk
        |FROM h ORDER BY doc_id""".stripMargin,
    // domain JSD: present-terms sum + the closed-form absent-terms mass,
    // identical expression order; round(,4) absorbs sum-order noise
    "text_domain_divergence" ->
      s"""WITH tc AS (SELECT source, term, count(*) AS c
         |  FROM (SELECT source, unnest($toks) AS term FROM documents)
         |  GROUP BY 1, 2),
         |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM tc GROUP BY 1),
         |tt AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM tc GROUP BY 1),
         |n AS (SELECT CAST(sum(c) AS DOUBLE) AS nt FROM tc)
         |SELECT source, max(ns) AS n_tokens, count(*) AS n_terms,
         | round((sum((c / CAST(ns AS DOUBLE)) * ln((c / CAST(ns AS DOUBLE))
         |     / ((c / CAST(ns AS DOUBLE) + ct / nt) / 2.0))
         |   + (ct / nt) * ln((ct / nt)
         |     / ((c / CAST(ns AS DOUBLE) + ct / nt) / 2.0)))
         |  + (1.0 - sum(ct / nt)) * ln(2.0)) / (2.0 * ln(2.0)), 4) AS jsd_bits
         |FROM tc JOIN tt USING (term) JOIN st USING (source), n
         |GROUP BY source ORDER BY source""".stripMargin,
    // domain mixture: identical IEEE op order (share = tokens/total, then
    // weight = (1/n)/share) so the unrounded doubles match bit-for-bit
    "sample_domain_mix" ->
      s"""WITH s AS (SELECT source, CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         |p AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM s GROUP BY 1),
         |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
         |  CAST(count(*) AS BIGINT) AS ns FROM p)
         |SELECT source, n_docs, n_tokens,
         | round(n_tokens / tot, 6) AS actual_share,
         | round(least(1.0, (1.0 / ns) / (n_tokens / tot)), 6) AS weight,
         | CAST(floor(n_tokens * least(1.0, (1.0 / ns) / (n_tokens / tot))) AS BIGINT)
         |   AS expected_tokens
         |FROM p, t ORDER BY source""".stripMargin,
    // temperature mixing: q_i = n_i^0.3 / Σ n_j^0.3 (tot cancels);
    // expected tokens from the ROUNDED probability so floor is bit-stable
    "sample_temperature" ->
      s"""WITH s AS (SELECT source, CAST(len($toks) AS BIGINT) AS n_tok FROM documents),
         |p AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM s GROUP BY 1),
         |w AS (SELECT *, power(CAST(n_tokens AS DOUBLE), 0.3) AS pw FROM p),
         |t AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot, sum(pw) AS pw_sum FROM w)
         |SELECT source, n_docs, n_tokens,
         | round(n_tokens / tot, 6) AS actual_share,
         | round(pw / pw_sum, 6) AS sample_prob,
         | round((pw / pw_sum) / (n_tokens / tot), 6) AS boost,
         | CAST(floor(tot * round(pw / pw_sum, 6)) AS BIGINT) AS expected_tokens
         |FROM w, t ORDER BY source""".stripMargin,
    // DSIR: unigram+bigram features md5-hashed into 4096 buckets,
    // Laplace-smoothed target/raw log-ratio, per-doc weighted sum; the
    // flag tests the ROUNDED weight so both engines decide identically
    "sample_dsir" ->
      s"""WITH f AS (
         | SELECT doc_id, is_tgt,
         |   ('0x' || substr(md5(term), 1, 8))::BIGINT % 4096 AS bucket,
         |   count(*) AS c
         | FROM (
         |  SELECT doc_id, (source = 'src0') AS is_tgt,
         |    unnest(list_concat(toks,
         |      list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])))
         |      AS term
         |  FROM (SELECT doc_id, source, $toks AS toks FROM documents))
         | GROUP BY 1, 2, 3),
         |dist AS (SELECT bucket, sum(c) AS c_raw,
         |   sum(CASE WHEN is_tgt THEN c ELSE 0 END) AS c_tgt FROM f GROUP BY 1),
         |tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM dist),
         |lw AS (SELECT bucket,
         |   ln((c_tgt + 1)::DOUBLE / (t_tgt + 4096))
         |     - ln((c_raw + 1)::DOUBLE / (t_raw + 4096)) AS lr
         | FROM dist, tot)
         |SELECT f.doc_id, CAST(sum(f.c) AS BIGINT) AS n_feats,
         | round(sum(f.c * lw.lr), 4) AS dsir_logw,
         | CAST(round(sum(f.c * lw.lr), 4) > 0 AS INT) AS flag_target_like
         |FROM f JOIN lw USING (bucket) GROUP BY 1 ORDER BY 1""".stripMargin,
    // CCNet terciles: the text_lm_score model verbatim, then the SQL
    // ntile the chunked scheme reproduces bit-identically
    "text_ccnet_buckets" ->
      """WITH bi AS (SELECT doc_id, unnest(
        |   CASE WHEN length(text) >= 2
        |    THEN [substr(lower(text), CAST(i AS INT), 2) for i in range(1, length(text))]
        |    ELSE [] END) AS bg FROM documents),
        |db AS (SELECT doc_id, bg, count(*) AS cnt FROM bi GROUP BY 1, 2),
        |bc AS (SELECT bg, CAST(sum(cnt) AS BIGINT) AS c2 FROM db GROUP BY 1),
        |fc AS (SELECT substr(bg, 1, 1) AS c1, CAST(sum(c2) AS BIGINT) AS c1n
        |  FROM bc GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM fc),
        |lm AS (SELECT doc_id,
        |  round(sum(cnt * ln((c2 + 1.0) / (c1n + v))) / sum(cnt), 3) AS alp
        | FROM db JOIN bc USING (bg) JOIN fc ON substr(bg, 1, 1) = fc.c1, v
        | GROUP BY 1),
        |s AS (SELECT d.lang, lm.doc_id, lm.alp
        |  FROM lm JOIN documents d USING (doc_id)),
        |r AS (SELECT lang, doc_id, alp,
        |  ntile(3) OVER (PARTITION BY lang ORDER BY alp DESC, doc_id) AS bucket FROM s)
        |SELECT lang, CAST(bucket AS INT) AS bucket, count(*) AS n_docs,
        | round(max(alp), 3) AS max_score, round(min(alp), 3) AS min_score,
        | CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // F61: the F39 fan-out CTEs + the exact cross-multiplied energy gate
    // and the per-payload islands merge
    "mm_audio_vad" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |h AS (SELECT doc_id, n,
        |  CASE WHEN n % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
        |  500 + (n * 13) % 9501 AS dur FROM m),
        |w AS (SELECT *, CASE WHEN dur < 1000 THEN 0
        |    ELSE (dur - 1000) // 500 + 1 END AS nfull FROM h),
        |k AS (SELECT *, greatest(1, nfull +
        |    CASE WHEN nfull >= 1 AND dur - nfull * 500 >= 500
        |    THEN 1 ELSE 0 END) AS chunks FROM w),
        |f AS (SELECT doc_id, n, dur, sample_rate, CAST(i AS BIGINT) AS c,
        |  CAST(i * 500 AS BIGINT) AS start_ms,
        |  CAST(least(i * 500 + 1000, dur) AS BIGINT) AS end_ms,
        |  CAST(100 + (n * 31 + i * 17 + sample_rate // 1000) % 9973 AS BIGINT) AS e
        |  FROM k, range(0, 100) r(i) WHERE i < chunks),
        |st AS (SELECT doc_id, count(*) AS nch, sum(e) AS esum FROM f GROUP BY 1),
        |act AS (SELECT f.* FROM f JOIN st USING (doc_id)
        |  WHERE f.e * st.nch * 10 >= st.esum * 9),
        |b AS (SELECT doc_id, c, start_ms, end_ms, e,
        |  CASE WHEN lag(c) OVER w IS NULL THEN 1
        |       WHEN c > lag(c) OVER w + 1 THEN 1 ELSE 0 END AS brk
        |  FROM act WINDOW w AS (PARTITION BY doc_id ORDER BY c)),
        |s AS (SELECT doc_id, c, start_ms, end_ms, e,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY c) AS seg_idx FROM b)
        |SELECT doc_id, CAST(seg_idx AS BIGINT) AS seg_idx,
        |  min(start_ms) AS seg_start_ms, max(end_ms) AS seg_end_ms,
        |  count(*) AS n_chunks, CAST(sum(e) AS BIGINT) AS energy_sum
        |FROM s GROUP BY doc_id, seg_idx ORDER BY doc_id, seg_idx""".stripMargin,
    "mm_audio_chunks" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |h AS (SELECT doc_id, n,
        |  CASE WHEN n % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate,
        |  500 + (n * 13) % 9501 AS dur FROM m),
        |w AS (SELECT *, CASE WHEN dur < 1000 THEN 0
        |    ELSE (dur - 1000) // 500 + 1 END AS nfull FROM h),
        |k AS (SELECT *, greatest(1, nfull +
        |    CASE WHEN nfull >= 1 AND dur - nfull * 500 >= 500
        |    THEN 1 ELSE 0 END) AS chunks FROM w),
        |f AS (SELECT doc_id, n, sample_rate, dur, CAST(i AS BIGINT) AS c
        |  FROM k, range(0, 100) r(i) WHERE i < chunks)
        |SELECT doc_id, c AS chunk_idx, CAST(sample_rate AS BIGINT) AS sample_rate,
        | CAST(dur AS BIGINT) AS duration_ms, CAST(c * 500 AS BIGINT) AS start_ms,
        | CAST(least(c * 500 + 1000, dur) AS BIGINT) AS end_ms,
        | CAST(100 + (n * 31 + c * 17 + sample_rate // 1000) % 9973 AS BIGINT) AS energy_stub
        |FROM f ORDER BY doc_id, chunk_idx""".stripMargin,
    // ViT patch grid: full 64px tiles of the stub-decoded dimensions,
    // row-major (px fastest), deterministic stand-in patch features
    "mm_image_patches" ->
      """WITH g AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS nb,
        |  (64 + strlen(text) % 1024) // 64 AS gw,
        |  (64 + (strlen(text) * 7) % 1024) // 64 AS gh FROM documents),
        |p AS (SELECT doc_id, nb, gw, gh, CAST(i AS BIGINT) AS idx
        |  FROM g, range(0, 256) r(i) WHERE i < gw * gh)
        |SELECT doc_id, idx AS patch_idx, CAST(idx % gw AS BIGINT) AS px,
        | CAST(idx // gw AS BIGINT) AS py, CAST(gw AS BIGINT) AS grid_w,
        | CAST(gh AS BIGINT) AS grid_h,
        | CAST(23 + (nb * 31 + (idx % gw) * 7 + (idx // gw) * 13) % 99991 AS BIGINT) AS patch_feature
        |FROM p ORDER BY doc_id, patch_idx""".stripMargin,
    "mm_frame_sample" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |f AS (SELECT doc_id, n, CAST(i AS BIGINT) AS frame_idx
        |  FROM m, range(0, 3) t(i) WHERE i <= n % 3)
        |SELECT doc_id, frame_idx,
        | CAST(64 + (n * 31 + frame_idx * 7) % 997 AS BIGINT) AS frame_feature
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // F52: lag/cumulative-break replay of the deterministic frame model
    // F58: the F52 scene CTEs + the centered-window integer math
    // F65: the stub pixel model + cross-multiplied mean bits replayed in
    // HUGEINT (the F5 u2s convention), then F5's banded/verify SQL verbatim
    "mm_ahash_dedup" ->
      s"""WITH px AS (SELECT doc_id, k,
         |  CASE WHEN doc_id % 4 = 3 AND k = 0
         |   THEN ((xor(doc_id // 4, k * 104729) * 2654435761) % 256 + 128) % 256
         |   ELSE (xor(doc_id // 4, k * 104729) * 2654435761) % 256 END AS p
         | FROM documents, range(0, 64) r(k)),
         |sm AS (SELECT doc_id, sum(p) AS s FROM px GROUP BY 1),
         |ah0 AS (SELECT px.doc_id,
         |  sum(CASE WHEN px.p * 64 > sm.s
         |   THEN (2::HUGEINT ^ px.k)::HUGEINT ELSE 0::HUGEINT END) AS shu
         | FROM px JOIN sm USING (doc_id) GROUP BY 1),
         |sh AS (SELECT doc_id, ${u2s("shu")} AS ahash, shu FROM ah0),
         |banded AS (SELECT doc_id, ahash, b AS band,
         |  CAST((shu // (2::HUGEINT ^ (16 * b))::HUGEINT) % 65536 AS BIGINT) AS bh
         | FROM sh, range(0, 4) r(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
         |  x.ahash AS s1, y.ahash AS s2
         | FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |pairs AS (SELECT d1, d2, bit_count(xor(s1, s2)) AS hamming FROM cand
         | WHERE bit_count(xor(s1, s2)) <= 3),
         |perdoc AS (SELECT doc_id, count(*) AS n_neardups, min(hamming) AS min_hamming
         | FROM (SELECT d1 AS doc_id, hamming FROM pairs
         |       UNION ALL SELECT d2, hamming FROM pairs) GROUP BY 1)
         |SELECT s.doc_id, s.ahash, coalesce(p.n_neardups, 0) AS n_neardups,
         | CAST(coalesce(p.min_hamming, 64) AS BIGINT) AS min_hamming
         |FROM sh s LEFT JOIN perdoc p USING (doc_id) ORDER BY s.doc_id""".stripMargin,
    "mm_clip_sample" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |f AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |        CAST((n * 31 + i * i * 13) % 997 AS BIGINT) AS feat
        |      FROM m, range(0, 40) t(i) WHERE i < n % 24 + 8),
        |d AS (SELECT doc_id, frame_idx, feat,
        |        CASE WHEN lag(feat) OVER w IS NULL THEN 1
        |             WHEN abs(feat - lag(feat) OVER w) > 400 THEN 1 ELSE 0 END AS brk
        |      FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        |s AS (SELECT doc_id, frame_idx,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene_idx
        |      FROM d),
        |sc AS (SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        |  min(frame_idx) AS start_frame, CAST(count(*) AS BIGINT) AS n_frames
        |  FROM s GROUP BY doc_id, scene_idx),
        |c AS (SELECT doc_id, scene_idx,
        |  CASE WHEN n_frames < 4 THEN n_frames ELSE 4 END AS clip_frames,
        |  start_frame + (n_frames - CASE WHEN n_frames < 4 THEN n_frames ELSE 4 END) // 2
        |    AS clip_start
        |  FROM sc)
        |SELECT doc_id, scene_idx, clip_start,
        |  clip_start + clip_frames - 1 AS clip_end, clip_frames
        |FROM c ORDER BY doc_id, scene_idx""".stripMargin,
    // D37: the oracle replays the generation split and the evolved
    // reader's union semantics straight off the raw table
    "load_partition_evolution" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus AS status, o_totalprice,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CASE WHEN o_orderkey % 7 < 5 THEN 1 ELSE 2 END AS gen FROM orders)
        |SELECT status, yr,
        |  CAST(sum(CASE WHEN gen = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gen1,
        |  CAST(sum(CASE WHEN gen = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_gen2,
        |  count(*) AS n_total,
        |  round(sum(o_totalprice), 2) AS price_sum
        |FROM o GROUP BY status, yr ORDER BY status, yr""".stripMargin,
    "mm_scene_cut" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |f AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |        CAST((n * 31 + i * i * 13) % 997 AS BIGINT) AS feat
        |      FROM m, range(0, 40) t(i) WHERE i < n % 24 + 8),
        |d AS (SELECT doc_id, frame_idx, feat,
        |        CASE WHEN lag(feat) OVER w IS NULL THEN 1
        |             WHEN abs(feat - lag(feat) OVER w) > 400 THEN 1 ELSE 0 END AS brk
        |      FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        |s AS (SELECT doc_id, frame_idx,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene_idx
        |      FROM d)
        |SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        |  min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames
        |FROM s GROUP BY doc_id, scene_idx
        |ORDER BY doc_id, scene_idx""".stripMargin,
    // H6: the whole media composition replayed — aHash bits → banded
    // pairs → keep-first drop set → scene/keyframe/clip chains over the
    // survivors, five lineage rows with integer checksums
    "pipeline_media_curation" ->
      s"""WITH px AS (SELECT doc_id, k,
         |  CASE WHEN doc_id % 4 = 3 AND k = 0
         |   THEN ((xor(doc_id // 4, k * 104729) * 2654435761) % 256 + 128) % 256
         |   ELSE (xor(doc_id // 4, k * 104729) * 2654435761) % 256 END AS p
         | FROM documents, range(0, 64) r(k)),
         |smx AS (SELECT doc_id, sum(p) AS s FROM px GROUP BY 1),
         |ah0 AS (SELECT px.doc_id,
         |  sum(CASE WHEN px.p * 64 > smx.s
         |   THEN (2::HUGEINT ^ px.k)::HUGEINT ELSE 0::HUGEINT END) AS shu
         | FROM px JOIN smx USING (doc_id) GROUP BY 1),
         |shh AS (SELECT doc_id, ${u2s("shu")} AS ahash, shu FROM ah0),
         |banded AS (SELECT doc_id, ahash, b AS band,
         |  CAST((shu // (2::HUGEINT ^ (16 * b))::HUGEINT) % 65536 AS BIGINT) AS bh
         | FROM shh, range(0, 4) r(b)),
         |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
         |  x.ahash AS s1, y.ahash AS s2
         | FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
         |pairs AS (SELECT d1, d2 FROM cand WHERE bit_count(xor(s1, s2)) <= 3),
         |drops AS (SELECT DISTINCT d2 AS doc_id FROM pairs),
         |s2 AS (SELECT d.doc_id, d.text FROM documents d
         | WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)),
         |mm AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM s2),
         |fr AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         |  CAST((n * 31 + i * i * 13) % 997 AS BIGINT) AS feat
         | FROM mm, range(0, 40) t(i) WHERE i < n % 24 + 8),
         |dk AS (SELECT doc_id, frame_idx, feat,
         |  CASE WHEN lag(feat) OVER w IS NULL THEN 1
         |       WHEN abs(feat - lag(feat) OVER w) > 400 THEN 1 ELSE 0 END AS brk
         | FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
         |sx AS (SELECT doc_id, frame_idx, feat,
         |  sum(brk) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene_idx
         | FROM dk),
         |scenes AS (SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
         |  min(frame_idx) AS start_frame, CAST(count(*) AS BIGINT) AS n_frames,
         |  max(feat) AS mx FROM sx GROUP BY 1, 2),
         |keyf AS (SELECT sc.doc_id, sc.scene_idx,
         |  min(sx.frame_idx) AS keyframe_idx
         | FROM scenes sc JOIN sx ON sx.doc_id = sc.doc_id
         |  AND sx.scene_idx = sc.scene_idx AND sx.feat = sc.mx GROUP BY 1, 2),
         |clips AS (SELECT doc_id, scene_idx,
         |  start_frame + (n_frames - least(n_frames, 4)) // 2 AS clip_start
         | FROM scenes),
         |n0 AS (SELECT CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(doc_id) AS BIGINT) AS s FROM documents),
         |n2 AS (SELECT CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(doc_id) AS BIGINT) AS s FROM s2),
         |n3 AS (SELECT CAST(count(*) AS BIGINT) AS c,
         |  CAST(sum(doc_id * 100 + scene_idx) AS BIGINT) AS s FROM scenes),
         |n4 AS (SELECT CAST(sum(doc_id * 1000 + keyframe_idx) AS BIGINT) AS s FROM keyf),
         |n5 AS (SELECT CAST(sum(doc_id * 10000 + clip_start) AS BIGINT) AS s FROM clips)
         |SELECT 1::BIGINT AS stage_ord, 'ingest' AS stage,
         |  n0.c AS units_in, n0.c AS units_out, n0.s AS checksum FROM n0
         |UNION ALL SELECT 2, 'image_dedup', n0.c, n2.c, n2.s FROM n0, n2
         |UNION ALL SELECT 3, 'scene_cut', n2.c, n3.c, n3.s FROM n2, n3
         |UNION ALL SELECT 4, 'keyframe', n3.c, n3.c, n4.s FROM n3, n4
         |UNION ALL SELECT 5, 'clip', n3.c, n3.c, n5.s FROM n3, n5
         |ORDER BY stage_ord""".stripMargin,
    // F66: same scene CTEs as F52, then keyframe = lowest frame index
    // among the scene's max-feature frames (the engine's max_by tie rule)
    "mm_video_keyframe" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n FROM documents),
        |f AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |        CAST((n * 31 + i * i * 13) % 997 AS BIGINT) AS feat
        |      FROM m, range(0, 40) t(i) WHERE i < n % 24 + 8),
        |d AS (SELECT doc_id, frame_idx, feat,
        |        CASE WHEN lag(feat) OVER w IS NULL THEN 1
        |             WHEN abs(feat - lag(feat) OVER w) > 400 THEN 1 ELSE 0 END AS brk
        |      FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        |s AS (SELECT doc_id, frame_idx, feat,
        |        sum(brk) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS scene_idx
        |      FROM d),
        |g AS (SELECT doc_id, CAST(scene_idx AS BIGINT) AS scene_idx,
        |        max(feat) AS keyframe_feat, CAST(count(*) AS BIGINT) AS n_frames
        |      FROM s GROUP BY 1, 2)
        |SELECT g.doc_id, g.scene_idx, min(s.frame_idx) AS keyframe_idx,
        |  g.keyframe_feat, g.n_frames
        |FROM g JOIN s ON s.doc_id = g.doc_id AND s.scene_idx = g.scene_idx
        |  AND s.feat = g.keyframe_feat
        |GROUP BY 1, 2, 4, 5 ORDER BY g.doc_id, g.scene_idx""".stripMargin,
    "mm_resize" ->
      """WITH g AS (SELECT doc_id,
        |  64 + strlen(text) % 1024 AS src_w, 64 + (strlen(text) * 7) % 1024 AS src_h,
        |  CAST(strlen(text) AS BIGINT) AS nb FROM documents),
        |s AS (SELECT *, greatest(1, src_w // 32) AS stride_x,
        |  greatest(1, src_h // 32) AS stride_y FROM g),
        |o AS (SELECT *, (src_w + stride_x - 1) // stride_x AS out_w,
        |  (src_h + stride_y - 1) // stride_y AS out_h FROM s)
        |SELECT doc_id, CAST(src_w AS BIGINT) AS src_w, CAST(src_h AS BIGINT) AS src_h,
        | CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
        | CAST(stride_x AS BIGINT) AS stride_x, CAST(stride_y AS BIGINT) AS stride_y,
        | CAST(out_w * out_h AS BIGINT) AS n_sampled,
        | CAST(17 + (nb * 31 + stride_x * 7 + stride_y * 13) % 100003 AS BIGINT) AS sample_feature
        |FROM o ORDER BY doc_id""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS checksum,
        | CAST(CASE WHEN length(text) = 0 THEN 0 ELSE ascii(text) END AS BIGINT) AS first_cp,
        | CAST(64 + strlen(text) % 1024 AS BIGINT) AS fake_width,
        | CAST(64 + (strlen(text) * 7) % 1024 AS BIGINT) AS fake_height,
        | CAST(3 AS BIGINT) AS fake_channels
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
