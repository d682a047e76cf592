package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2.5 for the declared query
  * inventory. Every query is deterministic (total ORDER BY, pinned
  * timestamps, exact-fold numerics) so the DuckDB oracle hash-matches.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinBroadcastDim(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reference-parity (§2.5 table 1 — operators B1-B5, C1-C18, A8/A9/A15)
    "q_scan_projection"     -> (Parity.scanProjection _),
    "q_filter_tenant_eq"    -> (Parity.filterTenantEq _),
    "q_filter_incremental"  -> (Parity.filterIncremental _),
    "q_limit_topk"          -> (Parity.limitTopk _),
    "q_cast_standard"       -> (Parity.castStandard _),
    "q_concat_partition_key" -> (Parity.concatPartitionKey _),
    "q_coalesce_prefix"     -> (Parity.coalescePrefix _),
    "q_suffix_tag"          -> (Parity.suffixTag _),
    "q_arith_scale"         -> (Parity.arithScale _),
    "q_timestamp_replace"   -> (Parity.timestampReplace _),
    "q_cte_stage_chain"     -> (Parity.cteStageChain _),
    "q_groupby_count"       -> (Parity.groupbyCount _),
    "q_mode_full_snapshot"  -> (PipelineOps.modeFullSnapshot _),
    "q_partition_backfill"  -> (PipelineOps.partitionBackfill _),
    "q_mode_watermark_append" -> (PipelineOps.modeWatermarkAppend _),
    "q_mode_merge_upsert"   -> (PipelineOps.modeMergeUpsert _),
    "q_mode_merge_partitioned" -> (PipelineOps.modeMergePartitioned _),
    "q_delete_predicate"    -> (Parity.deletePredicate _),
    "q_delete_partitioned"  -> (PipelineOps.deletePartitioned _),
    "q_empty_result_schema" -> (Parity.emptyResultSchema _),
    // Capability (§2.5 table 2 — §2.D decisions)
    "q_join_equi"           -> (Relational.joinEqui _),
    "q_join_broadcast_dim"  -> (Relational.joinBroadcastDim _),
    "q_join_semi_anti"      -> (Relational.joinSemiAnti _),
    "q_window_latest_by_pk" -> (Relational.windowLatestByPk _),
    "q_window_running_agg"  -> (Relational.windowRunningAgg _),
    "q_sort_topk_per_group" -> (Relational.sortTopkPerGroup _),
    "q_union_two_tenants"   -> (Relational.unionTwoTenants _),
    "q_except_intersect"    -> (Relational.exceptIntersect _),
    "q_rollup_agg"          -> (Relational.rollupAgg _),
    "q_distinct_exact"      -> (Relational.distinctExact _),
    "q_approx_distinct"     -> (Relational.approxDistinct _),
    "q_profile_columns"     -> (Relational.profileOrders _),
    "q_profile_documents"   -> (Relational.profileDocuments _),
    "q_profile_embeddings"  -> (VectorOps.profileEmbeddings _),
    "q_percentile_status"   -> (Relational.percentileByStatus _),
    "q_scalar_datetime_math" -> (Relational.scalarDatetimeMath _),
    "q_cube_agg"            -> (Relational.cubeAgg _),
    "q_grouping_sets"       -> (Relational.groupingSets _),
    "q_multimodal_meta"     -> (MultimodalOps.multimodalMeta _),
    "q_multimodal_header"   -> (MultimodalOps.multimodalHeader _),
    "q_png_pixel_stats"     -> (MultimodalOps.pngPixelStats _),
    "q_vp8l_pixel_stats"    -> (MultimodalOps.vp8lPixelStats _),
    "q_av_meta"             -> (MultimodalOps.avMeta _),
    "q_pivot_status"        -> (Relational.pivotStatus _),
    "q_json_extract"        -> (EventOps.jsonExtract _),
    "q_asof_last_click"     -> (EventOps.asofLastClick _),
    "q_join_range"          -> (EventOps.rangeJoinFollowups _),
    "q_groupby_salted"      -> (Relational.saltedGroupAgg _),
    "q_event_tumbling_window" -> (EventOps.eventTumblingWindow _),
    "q_session_window"      -> (EventOps.sessionWindow _),
    // North-star LLM-pipeline ops (documents / embeddings)
    "q_text_stats"          -> (TextOps.textStats _),
    "q_token_count_bpe"     -> (TextOps.tokenCountBpe _),
    "q_token_count_cjk"     -> (TextOps.tokenCountCjk _),
    "q_top_terms_cjk"       -> (TextOps.topTermsCjk _),
    "q_repeated_spans"      -> (TextOps.repeatedSpans _),
    "q_length_histogram"    -> (TextOps.lengthHistogram _),
    "q_top_terms_per_lang"  -> (TextOps.topTermsPerLang _),
    "q_quality_score"       -> (TextOps.qualityScore _),
    "q_lang_id"             -> (TextOps.langId _),
    "q_lang_id_script"      -> (TextOps.langIdScript _),
    "q_lang_id_nb"          -> (DomainOps.langIdNbClassify _),
    "q_dedup_exact_text"    -> (TextOps.dedupExactText _),
    "q_dedup_clusters"      -> (GraphOps.dedupClusters _),
    "q_dedup_minhash"       -> (TextOps.dedupMinhash _),
    "q_dedup_survivors"     -> (TextOps.dedupSurvivors _),
    "q_dedup_clusters_incremental" -> (graft.ops.IncrementalClusters.dedupClustersIncremental _),
    "q_dedup_best_of_cluster" -> (TextOps.dedupBestOfCluster _),
    "q_simhash"             -> (TextOps.simhash _),
    "q_simhash_near_dup"    -> (TextOps.simhashNearDup _),
    "q_ngram_jaccard"       -> (TextOps.ngramJaccard _),
    "q_doc_fingerprint"     -> (TextOps.docFingerprint _),
    "q_doc_chunking"        -> (TextOps.docChunks _),
    "q_corpus_clean"        -> (TextOps.corpusClean _),
    "q_redact_pii"          -> (TextOps.redactPii _),
    "q_contamination"       -> (TextOps.contamination _),
    "q_unicode_nfc"         -> (TextOps.unicodeNfc _),
    "q_sample_stratified"   -> ((s: SparkSession, d: String) => SamplingOps.stratifiedSample(s, d)),
    "q_split_assign"        -> (SamplingOps.splitAssign _),
    "q_mix_weighted"        -> (SamplingOps.weightedMix _),
    "q_pack_sequences"      -> ((s: SparkSession, d: String) => SamplingOps.packSequences(s, d)),
    "q_binary_meta"         -> (TextOps.binaryMeta _),
    "q_image_resize_stats"  -> ((s: SparkSession, d: String) =>
      graft.ops.MultimodalOps.pngThumbnailStats(s, d)),
    "q_audio_features"      -> (graft.ops.MultimodalOps.audioFeatures _),
    "q_image_dedup_phash"   -> (graft.ops.MultimodalOps.imageDedupPhash _),
    "q_gif_pixel_stats"     -> (graft.ops.MultimodalOps.gifPixelStats _),
    "q_image_near_dup"      -> (graft.ops.MultimodalOps.imageNearDup _),
    "q_embed_norm"          -> (VectorOps.embedNorm _),
    "q_label_centroid"      -> (VectorOps.labelCentroid _),
    "q_knn_cosine_topk"     -> (VectorOps.knnCosineTopk _),
    "q_lsh_cosine_buckets"  -> (VectorOps.lshCosineBuckets _),
    "q_ivf_cosine_topk"     -> (VectorOps.ivfCosineTopk _),
    "q_pq_cosine_topk"      -> (VectorOps.pqCosineTopk _),
    "q_sq_cosine_topk"      -> (VectorOps.sqCosineTopk _),
    "q_ivfpq_cosine_topk"   -> (VectorOps.ivfPqCosineTopk _),
    "q_ivfsq_cosine_topk"   -> (VectorOps.ivfSqCosineTopk _),
    "q_ivf_semantic_dedup"  -> ((s: SparkSession, d: String) => VectorOps.ivfSemanticDedup(s, d)),
    "q_embedding_near_dup"  -> ((s: SparkSession, d: String) => VectorOps.nearDupCosine(s, d)),
    "q_semantic_survivors"  -> ((s: SparkSession, d: String) => VectorOps.semanticSurvivors(s, d)),
    "q_repetition_stats"    -> (TextOps.repetitionStats _),
    "q_mix_temperature"     -> (SamplingOps.temperatureMix _),
    "q_export_shuffle"      -> (SamplingOps.exportShuffle _),
    "q_decontaminate_ngram" -> ((s: SparkSession, d: String) => TextOps.decontaminateNgram(s, d)),
    "q_blocklist_bloom"     -> (BlocklistOps.bloomBlocklistClean _),
    "q_join_bucketed"       -> (Relational.joinBucketed _),
    "q_salient_terms"       -> ((s: SparkSession, d: String) => TextOps.salientTermsPerSource(s, d)),
    "q_salient_terms_cjk"   -> ((s: SparkSession, d: String) => TextOps.salientTermsCjk(s, d)),
    "q_decontaminate_cjk"   -> ((s: SparkSession, d: String) => TextOps.decontaminateCjk(s, d)),
    "q_mean_token_freq"     -> (TextOps.meanTokenFreq _),
    "q_perplexity_filter"   -> ((s: SparkSession, d: String) => TextOps.perplexityFilter(s, d)),
    "q_perplexity_serve"    -> ((s: SparkSession, d: String) => {
      TextOps.buildLmModel(graft.Tables.t(s, d, "documents"), "graft_lm_q")
      TextOps.perplexityFilterFromModel(s, d, "graft_lm_q")
    }),
    "q_corpus_clean_ppx"    -> ((s: SparkSession, d: String) => TextOps.corpusCleanPerplexity(s, d)),
    "q_bpe_tokenize"        -> (graft.ops.BpeOps.bpeTokenize _),
    "q_quality_classifier"  -> (TextOps.qualityClassifier _),
    "q_pack_sequences_bpe"  -> ((s: SparkSession, d: String) => SamplingOps.packSequencesBpe(s, d)),
    "q_corpus_clean_qc"     -> (TextOps.corpusCleanClassified _),
    "q_span_coverage"       -> ((s: SparkSession, d: String) => TextOps.spanCoverage(s, d)),
    "q_substring_dedup"     -> (TextOps.substringDedup _),
    "q_substring_dedup_incremental" -> (TextOps.substringDedupIncrement _),
    "q_corpus_clean_spans"  -> (TextOps.corpusCleanSpans _),
    "q_gopher_quality"      -> (WebTextOps.gopherQuality _),
    "q_line_dedup"          -> (WebTextOps.lineDedup _),
    "q_split_leakage_safe"  -> (WebTextOps.leakageSafeSplit _),
    "q_html_extract"        -> (WebTextOps.htmlExtract _),
    "q_url_normalize"       -> (UrlOps.urlNormalize _),
    "q_domain_stats"        -> (UrlOps.domainStats _),
    "q_link_extract"        -> (graft.ops.LinkOps.linkExtract _),
    "q_anchor_text"         -> (graft.ops.LinkOps.anchorText _),
    "q_pagerank_domains"    -> (graft.ops.LinkOps.pagerankDomains _),
    "q_hits_domains"        -> (graft.ops.LinkOps.hitsDomains _),
    "q_authority_mix"       -> (graft.ops.LinkOps.authorityMix _),
    "q_link_graph_incremental" -> (graft.ops.LinkOps.linkGraphIncrement _),
    "q_zorder_key"          -> (graft.ops.LayoutOps.zOrderKey _),
    "q_frame_sample"        -> (graft.ops.MultimodalOps.frameSample _),
    "q_keyframe_sample"     -> (graft.ops.MultimodalOps.keyframeSample _),
    "q_bm25_topk"           -> (RetrievalOps.bm25TopK _),
    "q_domain_classify"     -> (DomainOps.domainClassify _),
    "q_heavy_ngrams"        -> (SketchOps.heavyNgramsSketch _),
    "q_approx_percentile"   -> (SketchOps.approxPercentile _),
    "q_theta_sketch"        -> (graft.ops.ThetaOps.thetaSketchOverlap _),
    "q_dsir_select"         -> (graft.ops.DsirOps.dsirSelect _),
    "q_kneser_ney"          -> ((s: SparkSession, d: String) => TextOps.kneserNeyScore(s, d)),
    "q_curriculum_order"    -> (graft.ops.CurriculumOps.curriculumOrder _),
    "q_ac_scan"             -> (BlocklistOps.acScanSpans _),
    "q_split_proportional"  -> ((s: SparkSession, d: String) => SamplingOps.proportionalSplit(s, d)),
    "q_collocations"        -> ((s: SparkSession, d: String) => TextOps.collocations(s, d)),
    "q_session_sequences"   -> (EventOps.sessionSequences _),
    "q_pii_luhn"            -> (PrivacyOps.luhnScan _),
    "q_triangle_count"      -> (graft.ops.LinkOps.triangleCount _),
    "q_survival_km"         -> (EventOps.kaplanMeier _),
    "q_communities_lpa"     -> (graft.ops.LinkOps.communitiesLpa _),
    "q_ab_chisquare"        -> (EventOps.abChiSquare _),
    "q_theta_daily"         -> (graft.ops.ThetaOps.thetaDaily _),
    "q_containment_join"    -> (SetJoinOps.containmentJoin _),
    "q_ols_trend"           -> (graft.ops.TimeSeriesOps.olsTrend _),
    "q_cusum_changepoint"   -> (graft.ops.TimeSeriesOps.cusumChangepoint _),
    "q_ewma_smooth"         -> (graft.ops.TimeSeriesOps.ewmaSmooth _),
    "q_assoc_rules"         -> (BasketOps.assocRules _),
    "q_skyline"             -> (SkylineOps.skylineParts _),
    "q_attribution_linear"  -> (EventOps.attributionLinear _),
    "q_entity_resolution"   -> (EntityOps.entityResolution _),
    "q_reservoir_daily"     -> (ReservoirOps.reservoirDaily _),
    "q_reservoir_incremental" -> (ReservoirOps.reservoirIncremental _),
    "q_cohort_ltv"          -> (EventOps.cohortLtv _),
    "q_kcore_domains"       -> (graft.ops.LinkOps.kcoreDomains _),
    "q_interval_concurrency" -> (EventOps.intervalConcurrency _),
    "q_funnel_windowed"     -> (EventOps.funnelWindowed _),
    "q_id_islands"          -> (Relational.idIslands _),
    "q_skyline_incremental" -> (SkylineOps.skylineIncremental _),
    "q_classifier_auc"      -> (TextOps.classifierAuc _),
    "q_classifier_prf"      -> (TextOps.classifierPrf _),
    "q_time_weighted_avg"   -> (graft.ops.TimeSeriesOps.timeWeightedAvg _),
    "q_period_over_period"  -> (graft.ops.TimeSeriesOps.periodOverPeriod _),
    "q_sliding_rate"        -> (EventOps.slidingRate _),
    "q_trailing_wau"        -> (EventOps.trailingWau _),
    "q_abc_classification"  -> (Relational.abcClassification _),
    "q_snapshot_diff"       -> (Relational.snapshotDiff _),
    "q_frequent_triples"    -> (BasketOps.frequentTriples _),
    "q_mask_spans"          -> (TextOps.maskSpans _),
    "q_ann_recall"          -> (VectorOps.annRecall _),
    "q_weighted_paths"      -> (graft.ops.LinkOps.weightedPaths _),
    "q_vocab_stats"         -> (TextOps.vocabStats _),
    "q_key_skew"            -> (Relational.keySkew _),
    "q_pagerank_seeded"     -> (graft.ops.LinkOps.pagerankSeededDomains _),
    "q_drop_reasons"        -> (TextOps.dropReasons _),
    "q_calibration_bins"    -> (TextOps.calibrationBins _),
    "q_event_debounce"      -> (EventOps.eventDebounce _),
    "q_trending_brands"     -> (BasketOps.trendingBrands _),
    "q_minhash_recall"      -> (TextOps.minhashRecall _),
    "q_bot_periodicity"     -> (EventOps.botPeriodicity _),
    "q_gapfill_interp"      -> (graft.ops.TimeSeriesOps.gapfillInterpQuery _),
    "q_langid_agreement"    -> (TextOps.langIdAgreement _),
    "q_histogram_drift"     -> (EventOps.histogramDrift _),
    "q_session_funnel"      -> (EventOps.sessionFunnel _),
    "q_trending_incremental" -> (BasketOps.trendingIncremental _),
    "q_dedup_cluster_stats" -> (GraphOps.dedupClusterStats _),
    "q_event_trigrams"      -> (EventOps.eventTrigrams _),
    "q_spearman"            -> (Relational.spearmanSizePrice _),
    "q_benford"             -> (Relational.benfordOrders _),
    "q_bm25_decontam"       -> (RetrievalOps.bm25Decontam _),
    "q_domain_mix"          -> (DomainOps.domainMixTemperature _),
    "q_cdc_chunks"          -> (ChunkOps.cdcChunkStats _),
    "q_cdc_dedup_rewrite"   -> (ChunkOps.cdcDedupRewrite _),
    "q_cdc_rewrite_incremental" -> (ChunkOps.cdcRewriteIncrement _),
    "q_phrase_search"       -> (RetrievalOps.phraseSearch _),
    "q_hybrid_search"       -> (RetrievalOps.hybridSearch _),
    "q_semantic_decontam"   -> ((s: SparkSession, d: String) => VectorOps.semanticDecontam(s, d)),
    "q_token_budget_select" -> ((s: SparkSession, d: String) => SamplingOps.tokenBudgetSelect(s, d)),
    "q_dedup_incremental"   -> (IncrementalDedup.dedupIncrement _),
    "q_cluster_sample"      -> ((s: SparkSession, d: String) => VectorOps.clusterBalancedSample(s, d)),
    "q_budget_mix"          -> ((s: SparkSession, d: String) => SamplingOps.budgetMix(s, d)),
    "q_corpus_pipeline"     -> (graft.pipeline.CorpusPipeline.query _),
    "q_corpus_increment"    -> (graft.pipeline.CorpusPipeline.queryIncrement _),
    "q_expectations"        -> (ExpectationOps.expectations _),
    "q_jaccard_join_exact"  -> (SetJoinOps.jaccardJoinExact _),
    "q_hashed_tfidf"        -> (TfidfOps.hashedTfidf _),
    "q_tfidf_knn"           -> (TfidfOps.tfidfKnnQuery _),
    "q_authority_survivors" -> (graft.ops.LinkOps.authoritySurvivors _),
    "q_robots_filter"       -> (graft.ops.RobotsOps.robotsFilter _),
    "q_priority_sample"     -> (SamplingOps.prioritySample _),
    "q_dataset_card"        -> (TextOps.datasetCard _),
    "q_card_drift"          -> (TextOps.cardDrift _),
    "q_sitemap_coverage"    -> (graft.ops.UrlOps.sitemapCoverage _),
    "q_retention_cohorts"   -> (EventOps.retentionCohorts _),
    "q_funnel_steps"        -> (EventOps.funnelSteps _),
    "q_jaccard_join_incremental" -> (SetJoinOps.jaccardJoinIncrement _),
    "q_scd2_history"        -> (graft.ops.ScdOps.scd2History _),
    "q_scd2_incremental"    -> (graft.ops.ScdOps.scd2Incremental _),
    "q_fuzzy_vocab_edit1"   -> (graft.ops.FuzzyOps.fuzzyVocabEdit1 _),
    "q_winnow_fingerprint"  -> (graft.ops.WinnowOps.winnowFingerprint _),
    "q_copy_candidates"     -> (graft.ops.WinnowOps.copyCandidatesQuery _),
    "q_gapfill_locf"        -> (graft.ops.TimeSeriesOps.gapfillLocfQuery _),
    "q_outlier_mad"         -> (graft.ops.TimeSeriesOps.madOutliersQuery _),
    "q_power_direction"     -> (graft.ops.SpectralOps.powerDirectionQuery _),
    "q_spectral_order"      -> (graft.ops.SpectralOps.spectralOrderQuery _),
    "q_rag_chunks"          -> (graft.ops.ChunkOps.ragChunksQuery _),
    "q_outlier_mad_incremental" -> (graft.ops.TimeSeriesOps.outlierMadIncremental _),
    "q_mojibake_repair"     -> (graft.ops.WebTextOps.mojibakeRepair _),
    "q_copy_incremental"    -> (graft.ops.WinnowOps.copyIncremental _),
    "q_event_transitions"   -> (EventOps.eventTransitions _),
    "q_vocab_normalize"     -> (graft.ops.FuzzyOps.vocabNormalize _),
    "q_domain_hops"         -> (graft.ops.LinkOps.domainHops _),
    "q_pseudonymize_pii"    -> (TextOps.pseudonymizePii _),
    "q_hard_negatives"      -> (RetrievalOps.hardNegatives _),
    "q_tokenizer_health"    -> (graft.ops.BpeOps.tokenizerHealth _),
    "q_rr_privatize"        -> (graft.ops.PrivacyOps.rrPrivatize _),
    "q_k_anonymity"         -> (graft.ops.PrivacyOps.kAnonymize _),
    // round-12 additions
    "q_theil_sen"           -> (graft.ops.TimeSeriesOps.theilSenTrend _),
    "q_kendall_tau"         -> (Relational.kendallTauSizePrice _),
    "q_rfm_segments"        -> (BasketOps.rfmSegments _),
    "q_readability"         -> (TextOps.readability _),
    "q_kwic"                -> (TextOps.kwicConcordance _),
    "q_line_quality"        -> (WebTextOps.lineQuality _),
    "q_harmonic_centrality" -> (graft.ops.LinkOps.harmonicCentrality _),
    "q_acf_lags"            -> (graft.ops.TimeSeriesOps.acfLags _),
    "q_c4_filters"          -> (WebTextOps.c4Filters _),
    "q_stress_centrality"   -> (graft.ops.LinkOps.stressCentrality _),
    "q_retrieval_mrr"       -> (graft.ops.RetrievalOps.retrievalMrr _),
    "q_isotonic_calibration" -> (TextOps.isotonicCalibration _),
    "q_trimmed_stats"       -> (Relational.trimmedStats _),
  )

  /** DuckDB-dialect oracle SQL per query — since round 8, EVERY query has
    * one (99/99 oracle-gated, no rows-only remainder). The last two
    * holdouts closed by re-basing the sketches on oracle-computable
    * primitives: q_simhash's per-token hash is now the upper 64 bits of
    * MD5 (bit-identical in DuckDB — the oracle rebuilds the whole sketch
    * from raw text via hex-nibble bit extraction), and
    * q_lsh_cosine_buckets' oracle replays the fixed-point hyperplane dot
    * products against the engine's own inlined plane-weight constants
    * (deterministic splitmix64-derived doubles — engine constants like
    * the '[계획용] ' literal, not engine outputs).
    * q_multimodal_meta left the omitted list in round 7: the decode stub
    * never fires on its fixture, so its whole projection is oracle
    * arithmetic (and q_png_pixel_stats gates the REAL pixel decode
    * end-to-end).
    * The rest of the hash/ANN family runs a SPLIT gate through
    * [[graft.OracleInputs]]: the hash-family front half (candidate pairs /
    * probed top-k sets — not reproducible in DuckDB) is materialized as
    * parquet and stays rows-only + property-tested, while the
    * deterministic back half is hash-gated — recursive-CTE closure →
    * cluster-min canon for q_dedup_survivors / q_semantic_survivors,
    * banding + cap + hamming/cosine replay for q_dedup_minhash /
    * q_simhash_near_dup / q_embedding_near_dup, exact cosine + threshold
    * over the pair set for q_ivf_semantic_dedup, and cosine + rank-order
    * recompute for q_ivf_cosine_topk.
    */
  /** Per-family DuckDB oracle SQL (graft.oracle.*Oracles) — the
    * driver runs each statement and hash-compares (see Verify).
    */
  def oracleSql: Map[String, String] =
    oracle.TextOracles.sql ++
      oracle.CorpusOracles.sql ++
      oracle.VectorOracles.sql ++
      oracle.RelationalOracles.sql ++
      oracle.ParityOracles.sql ++
      oracle.EventOracles.sql ++
      oracle.WebOracles.sql ++
      oracle.MultimodalOracles.sql
}
