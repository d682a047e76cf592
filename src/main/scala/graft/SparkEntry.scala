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

  /** DuckDB rendering of the Luhn digit fold over expression `x` — the
    * q_pii_luhn oracle needs it twice (check-digit crafting + candidate
    * validation), single-sourced so the copies can't drift.
    */
  private def duckLuhn(x: String): String = {
    def d = s"(ascii(substr($x, length($x) + 1 - i, 1)) - 48)"
    s"list_sum(list_transform(range(1, length($x) + 1), i -> " +
      s"CASE WHEN i % 2 = 0 THEN CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 " +
      s"ELSE $d * 2 END ELSE $d END))"
  }

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
  /** The one-pass profiler's oracle shape for any source projection: one
    * UNION ALL block per profiled column, numeric columns (`true`) CAST
    * their bounds to VARCHAR to match the engine's uniform stringified
    * schema.
    */
  private def profileOracle(srcSql: String,
                            cols: Seq[(String, Boolean)]): String = {
    val blocks = cols.map { case (c, numeric) =>
      val mn = if (numeric) s"CAST(MIN($c) AS VARCHAR)" else s"MIN($c)"
      val mx = if (numeric) s"CAST(MAX($c) AS VARCHAR)" else s"MAX($c)"
      s"""    SELECT '$c' AS col_name,
         |           t.total - COUNT($c) AS n_nulls,
         |           COUNT(DISTINCT $c) AS n_distinct,
         |           $mn AS min_value,
         |           $mx AS max_value
         |    FROM src, t GROUP BY t.total""".stripMargin
    }.mkString("\n    UNION ALL\n")
    s"""WITH src AS (
       |$srcSql
       |), t AS (SELECT COUNT(*) AS total FROM src)
       |SELECT * FROM (
       |$blocks
       |)
       |ORDER BY col_name""".stripMargin
  }

  /** Learned-BPE application replay: the oracle reads the ENGINE-trained
    * merge table (materialized by the query) and re-applies the merges in
    * rank order as a recursive CTE — each step one `replace` of the
    * wrapped pair `[l][r]` with `[lr]`, whose left-to-right non-
    * overlapping scan is the same greedy order Spark's `aggregate` fold
    * executes. Training itself is spec-gated (hand-computed merges on
    * crafted corpora); this gate hash-compares the full per-document
    * piece stream.
    */
  private def bpeAppliedCte: String = bpeAppliedCteFrom("bpe_merges")

  private def bpeAppliedCteFrom(ckpt: String): String = {
    val path = OracleInputs.sqlPath(ckpt)
    s"""m AS (SELECT rank, l, r FROM read_parquet('$path/*.parquet')),
       |base AS (
       |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |    FROM documents
       |), words AS (
       |    SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i,
       |           unnest(toks) AS w
       |    FROM base
       |), app(doc_id, i, s, k) AS (
       |    SELECT doc_id, i,
       |           array_to_string(list_transform(range(1, length(w) + 1),
       |               j -> chr(2) || substring(w, j, 1) || chr(3)), ''),
       |           0
       |    FROM words
       |    UNION ALL
       |    SELECT app.doc_id, app.i,
       |           replace(app.s,
       |                   chr(2) || m.l || chr(3) || chr(2) || m.r || chr(3),
       |                   chr(2) || m.l || m.r || chr(3)),
       |           app.k + 1
       |    FROM app JOIN m ON m.rank = app.k + 1
       |), fin AS (
       |    SELECT doc_id, i,
       |           replace(replace(replace(s, chr(3) || chr(2), ' '),
       |                   chr(2), ''), chr(3), '') AS pieces
       |    FROM app WHERE k = (SELECT COUNT(*) FROM m)
       |), agg AS (
       |    SELECT doc_id,
       |           array_to_string(list(pieces ORDER BY i), ' ') AS pieces
       |    FROM fin GROUP BY doc_id
       |)""".stripMargin
  }

  private def bpeTokenizeOracle: String =
    s"""WITH RECURSIVE
       |$bpeAppliedCte
       |SELECT b.doc_id, CAST(len(b.toks) AS BIGINT) AS n_words,
       |       CAST(CASE WHEN length(a.pieces) = 0 THEN 0
       |            ELSE len(string_split(a.pieces, ' ')) END AS BIGINT)
       |           AS n_bpe_tokens,
       |       md5(a.pieces) AS pieces_md5
       |FROM base b JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Sequence packing re-based on LEARNED BPE counts (the budgets the
    * packer fills are finally real token budgets, not a chars/4 proxy):
    * the applied-pieces CTE feeds the same prefix-sum packing arithmetic
    * as q_pack_sequences.
    */
  private def packSequencesBpeOracle: String =
    s"""WITH RECURSIVE
       |$bpeAppliedCte
       |, tokb AS (
       |    SELECT doc_id,
       |           GREATEST(CASE WHEN length(pieces) = 0 THEN 0
       |               ELSE len(string_split(pieces, ' ')) END, 1) AS tokens
       |    FROM agg
       |), c AS (
       |    SELECT doc_id, tokens,
       |           SUM(tokens) OVER (ORDER BY doc_id
       |               ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM tokb
       |)
       |SELECT doc_id, CAST(tokens AS BIGINT) AS tokens,
       |       CAST((cum - tokens) // 512 AS BIGINT) AS seq_id
       |FROM c ORDER BY doc_id""".stripMargin

  /** Shared CTE chain of the Naive Bayes quality classifier oracle —
    * retrains the add-one-smoothed class-rate ratios (positive class =
    * the eval-convention doc_id % 100 = 7 slice) and derives `qckept`,
    * the kept doc_id set under the cross-multiplied corpus-mean rule.
    * Used by q_quality_classifier and the corpus-clean composition.
    */
  /** Shared CTE chain of the CDC oracles — replays the rolling window
    * hash (the q_doc_fingerprint polynomial), the mod-residue cut rule
    * and the boundary segmentation, ending at the per-occurrence chunk
    * CTE `cchunks` (doc_id, chunk_pos, chunk).
    */
  private val cdcCtes: String =
    """WITH cbase AS (
      |    SELECT doc_id, text, len(text) AS n FROM documents
      |), cpos AS (
      |    SELECT doc_id, unnest(range(8, n + 1)) AS i
      |    FROM cbase WHERE n >= 8
      |), chash AS (
      |    SELECT p.doc_id, p.i,
      |           list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(p.i - 7, p.i + 1),
      |               j -> CAST(ascii(b.text[j]) AS BIGINT))),
      |             (a, c) -> (a * 31 + c) % 1000000007) AS hv
      |    FROM cpos p JOIN cbase b USING (doc_id)
      |), bnd AS (
      |    SELECT DISTINCT doc_id, b FROM (
      |        SELECT doc_id, 0 AS b FROM cbase
      |        UNION ALL SELECT doc_id, i AS b FROM chash WHERE hv % 16 = 7
      |        UNION ALL SELECT doc_id, n AS b FROM cbase)
      |), seg AS (
      |    SELECT doc_id, b AS st,
      |           lead(b) OVER (PARTITION BY doc_id ORDER BY b) AS en
      |    FROM bnd
      |), cchunks AS (
      |    SELECT s.doc_id, s.st AS chunk_pos,
      |           substr(b.text, s.st + 1, s.en - s.st) AS chunk
      |    FROM seg s JOIN cbase b USING (doc_id)
      |    WHERE s.en IS NOT NULL AND s.en > s.st
      |)""".stripMargin

  /** Shared CTE chain of the K-class NB domain-classifier oracles —
    * retrains the per-class add-one-smoothed token rates (class = source)
    * and ranks classes per document, ending at the argmax CTE `drk`.
    */
  private val dcCtes: String =
    """WITH tokd AS (
      |    SELECT doc_id, source,
      |           unnest(string_split_regex(trim(text), '\s+')) AS w
      |    FROM documents
      |), dcnt AS (
      |    SELECT source AS c, w, CAST(COUNT(*) AS BIGINT) AS cnt
      |    FROM tokd GROUP BY 1, 2
      |), dtot AS (
      |    SELECT c, CAST(SUM(cnt) AS BIGINT) AS t_c FROM dcnt GROUP BY c
      |), dvoc AS (
      |    SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM dcnt
      |), psc AS (
      |    SELECT t.doc_id, t.source, tc.c,
      |           CAST(SUM((1000000000 * (COALESCE(c2.cnt, 0) + 1))
      |                    // (tc.t_c + (SELECT v FROM dvoc)))
      |                AS BIGINT) AS s_sum,
      |           CAST(COUNT(*) AS BIGINT) AS n
      |    FROM tokd t
      |    CROSS JOIN dtot tc
      |    LEFT JOIN dcnt c2 ON c2.c = tc.c AND c2.w = t.w
      |    GROUP BY 1, 2, 3
      |), ssc AS (
      |    SELECT doc_id, source, c, s_sum // n AS dc_score FROM psc
      |), drk AS (
      |    SELECT doc_id, source, c, dc_score,
      |           row_number() OVER (PARTITION BY doc_id
      |               ORDER BY dc_score DESC, c ASC) AS rn
      |    FROM ssc
      |)""".stripMargin

  /** Shared CTE chain of the BM25 oracles — re-derives postings, doclen,
    * df and totals declaratively and replays the staged fixed-point
    * scoring (RetrievalOps constants) over `probeFilter`-selected queries
    * against `candFilter`-restricted candidates, ending at the ranked
    * top-k CTE `rk`.
    */
  private def bm25Ctes(probeFilter: String, candFilter: String): String =
    raw"""WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), tok AS (
        |    SELECT doc_id, unnest(toks) AS w,
        |           unnest(range(1, len(toks) + 1)) AS pos
        |    FROM base
        |), tfx AS (
        |    SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        |    FROM tok GROUP BY 1, 2
        |), dlx AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        |    FROM tok GROUP BY 1
        |), dfx AS (
        |    SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY w
        |), tot AS (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |           CAST(SUM(dl) AS BIGINT) AS total_len
        |    FROM dlx
        |), qt AS (
        |    SELECT query_id, w FROM (
        |        SELECT query_id, w,
        |               row_number() OVER (PARTITION BY query_id
        |                   ORDER BY fp ASC, w ASC) AS rn
        |        FROM (SELECT doc_id AS query_id, w, MIN(pos) AS fp
        |              FROM tok WHERE $probeFilter GROUP BY 1, 2))
        |    WHERE rn <= 4
        |), sc AS (
        |    SELECT q.query_id, f.doc_id,
        |           CAST(COUNT(*) AS BIGINT) AS n_hit,
        |           CAST(SUM(
        |             (((10000 * (2 * t.n_docs - 2 * d.df + 1))
        |                  // (2 * d.df + 1))
        |              * ((22000000000 * f.tf)
        |                  // (10000 * f.tf + 3000
        |                     + 9 * ((1000 * l.dl * t.n_docs)
        |                            // t.total_len))))
        |             // 1000000) AS BIGINT) AS score
        |    FROM qt q
        |    JOIN tfx f ON f.w = q.w $candFilter
        |    JOIN dlx l ON l.doc_id = f.doc_id
        |    JOIN dfx d ON d.w = q.w
        |    CROSS JOIN tot t
        |    GROUP BY 1, 2
        |), rk AS (
        |    SELECT query_id, doc_id, n_hit, score,
        |           CAST(row_number() OVER (PARTITION BY query_id
        |               ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rnk
        |    FROM sc
        |)""".stripMargin

  private val qcKeptCte: String =
    """tokq AS (
      |    SELECT doc_id, CASE WHEN doc_id % 100 = 7 THEN 1 ELSE 0 END AS pos,
      |           unnest(string_split_regex(trim(text), '\s+')) AS w
      |    FROM documents
      |), qcnt AS (
      |    SELECT w, CAST(SUM(pos) AS BIGINT) AS c_pos,
      |           CAST(SUM(1 - pos) AS BIGINT) AS c_neg
      |    FROM tokq GROUP BY w
      |), qtot AS (
      |    SELECT SUM(c_pos) AS t_pos, SUM(c_neg) AS t_neg,
      |           COUNT(*) AS v
      |    FROM qcnt
      |), qsc AS (
      |    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |           CAST(SUM((1000000 * (COALESCE(c.c_pos, 0) + 1)
      |                     * ((SELECT t_neg FROM qtot) + (SELECT v FROM qtot)))
      |               // ((COALESCE(c.c_neg, 0) + 1)
      |                     * ((SELECT t_pos FROM qtot) + (SELECT v FROM qtot))))
      |             AS BIGINT) AS q_sum
      |    FROM tokq t LEFT JOIN qcnt c USING (w)
      |    GROUP BY t.doc_id
      |), qsc2 AS (
      |    SELECT doc_id, n_tokens, q_sum // n_tokens AS q_score FROM qsc
      |), qthr AS (
      |    SELECT CAST(SUM(q_score) AS BIGINT) AS tot, COUNT(*) AS n FROM qsc2
      |), qckept AS (
      |    SELECT doc_id FROM qsc2
      |    WHERE q_score * (SELECT n FROM qthr) >= (SELECT tot FROM qthr)
      |)""".stripMargin

  private def qualityClassifierOracle: String =
    s"""WITH $qcKeptCte
      |SELECT q.doc_id, q.n_tokens, CAST(q.q_score AS BIGINT) AS q_score,
      |       CAST(CASE WHEN q.doc_id IN (SELECT doc_id FROM qckept)
      |            THEN 1 ELSE 0 END AS INTEGER) AS keep
      |FROM qsc2 q ORDER BY doc_id""".stripMargin

  /** Recursive-CTE closure over a materialized pair set → (id, cluster-min
    * canon, survives) — the shared oracle shape of both survivor queries.
    */
  private def survivorOracle(pairsName: String, table: String,
                             idCol: String, outId: String): String = {
    val path = OracleInputs.sqlPath(pairsName)
    s"""WITH RECURSIVE
       |e AS (SELECT src, dst FROM read_parquet('$path/*.parquet')),
       |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
       |reach(id, r) AS (
       |    SELECT $idCol, $idCol FROM $table
       |    UNION
       |    SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id
       |)
       |SELECT id AS $outId, MIN(r) AS canonical_id,
       |       CAST(CASE WHEN id = MIN(r) THEN 1 ELSE 0 END AS INTEGER)
       |           AS survives
       |FROM reach GROUP BY id ORDER BY $outId""".stripMargin
  }

  /** The deterministic crafted multi-line view shared by every line-family
    * oracle — replays [[graft.ops.WebTextOps.craftedLines]] exactly: the
    * per-source header, the every-8th-space line break (same regex, RE2
    * 'g' flag = Java replace-all), the modular bullet/ellipsis/newsletter
    * lines and the global footer; concat_ws skips the NULL optional
    * pieces in both engines.
    */
  private def craftedLinesCte: String =
    """crafted AS (
      |    SELECT doc_id, lang, source,
      |           concat_ws(chr(10),
      |             'home about contact ' || source,
      |             regexp_replace(trim(text), '(\S+( \S+){7}) ',
      |                            '\1' || chr(10), 'g'),
      |             CASE WHEN doc_id % 4 = 0 THEN '- related links' END,
      |             CASE WHEN doc_id % 3 = 0 THEN 'read more ...' END,
      |             CASE WHEN doc_id % 5 = 0 THEN
      |               'subscribe to our newsletter' || chr(10) ||
      |               'subscribe to our newsletter' END,
      |             'copyright 2024 all rights reserved') AS crafted
      |    FROM documents
      |)""".stripMargin

  /** Shared oracle fragments for the link-graph gates: crafted page url +
    * link html (LinkOps.craftedLinkHtml replayed), regex anchor
    * extraction, relative-reference resolution and the full UrlOps
    * normalization chain per link — ending in `lx`, one row per link with
    * (doc_id, href, anchor, link_url, target_domain, page_domain,
    * is_external).
    */
  private def linkCtes: String =
    """lp AS (
      |    SELECT doc_id, source,
      |           CASE WHEN doc_id % 7 = 0 THEN
      |             'https://Sub.' || source || '.CO.UK/Path/'
      |               || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&id='
      |               || CAST(doc_id AS VARCHAR) || '#top'
      |           ELSE
      |             'HTTPS://WWW.' || source || '.COM:443/Path/'
      |               || CAST(doc_id AS VARCHAR) || '?id='
      |               || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
      |               || CASE WHEN doc_id % 3 = 0 THEN '&ref=promo'
      |                  ELSE '' END
      |           END AS url,
      |           '<html><body><p>read more</p><a href="/about">About '
      |           || source || '</a>'
      |           || CASE WHEN doc_id % 7 <> 0 THEN
      |                '<a href="HTTPS://WWW.Src'
      |                || CAST((doc_id * 3 + 1) % 20 AS VARCHAR)
      |                || '.COM:443/p/' || CAST(doc_id AS VARCHAR)
      |                || '?utm_source=l&x=' || CAST(doc_id AS VARCHAR)
      |                || '">jump src'
      |                || CAST((doc_id * 3 + 1) % 20 AS VARCHAR) || '</a>'
      |                || '<a href="https://Sub.src'
      |                || CAST((doc_id + 11) % 20 AS VARCHAR)
      |                || '.CO.UK/t/' || CAST(doc_id AS VARCHAR)
      |                || '/#s">uk story src'
      |                || CAST((doc_id + 11) % 20 AS VARCHAR) || '</a>'
      |              ELSE '' END
      |           || CASE WHEN doc_id % 5 = 0 THEN
      |                '<a href="https://src'
      |                || CAST((doc_id * 7 + 3) % 20 AS VARCHAR)
      |                || '.com/x?ref=promo">promo offer src'
      |                || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) || '</a>'
      |              ELSE '' END
      |           || '</body></html>' AS html
      |    FROM documents
      |), lm AS (
      |    SELECT doc_id, url,
      |           CASE WHEN doc_id % 7 = 0 THEN source || '.co.uk'
      |                ELSE source || '.com' END AS page_domain,
      |           unnest(regexp_extract_all(html,
      |             '<a href="[^"]*"[^>]*>[^<]*</a>')) AS m
      |    FROM lp
      |), la AS (
      |    SELECT doc_id, page_domain,
      |           regexp_extract(m, '<a href="([^"]*)"', 1) AS href,
      |           regexp_extract(m, '>([^<]*)</a>', 1) AS anchor,
      |           CASE WHEN starts_with(
      |                  regexp_extract(m, '<a href="([^"]*)"', 1), '/') THEN
      |             regexp_extract(url, '^([A-Za-z]+://[^/?#]*)', 1)
      |               || regexp_extract(m, '<a href="([^"]*)"', 1)
      |           ELSE regexp_extract(m, '<a href="([^"]*)"', 1) END AS aurl
      |    FROM lm
      |), ln AS (
      |    SELECT doc_id, page_domain, href, anchor,
      |           lower(regexp_extract(aurl, '^([A-Za-z]+)://', 1)) AS scheme,
      |           regexp_replace(regexp_replace(
      |             lower(regexp_extract(aurl, '^[A-Za-z]+://([^/?#]*)', 1)),
      |             ':443$', ''), '^www\.', '') AS host,
      |           regexp_extract(aurl, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1)
      |               AS path,
      |           COALESCE(regexp_extract(aurl, '\?([^#]*)', 1), '')
      |               AS query
      |    FROM la
      |), lq AS (
      |    SELECT doc_id, page_domain, href, anchor, scheme, host,
      |           CASE WHEN path = '' THEN '/'
      |                ELSE regexp_replace(path, '(.)/$', '\1') END
      |               AS path_norm,
      |           COALESCE(array_to_string(
      |             list_filter(string_split(query, '&'),
      |               x -> NOT (starts_with(x, 'utm_')
      |                         OR starts_with(x, 'ref=') OR x = '')), '&'),
      |             '') AS query_norm,
      |           string_split(host, '.') AS labels,
      |           CASE WHEN host LIKE '%.co.uk' THEN 3 ELSE 2 END AS k
      |    FROM ln
      |), lx AS MATERIALIZED (
      |    SELECT doc_id, href, anchor,
      |           scheme || '://' || host || path_norm ||
      |             CASE WHEN query_norm = '' THEN ''
      |                  ELSE '?' || query_norm END AS link_url,
      |           array_to_string(labels[len(labels)-k+1:len(labels)], '.')
      |               AS target_domain,
      |           page_domain,
      |           CAST(CASE WHEN
      |                  array_to_string(labels[len(labels)-k+1:len(labels)],
      |                                  '.') <> page_domain
      |                THEN 1 ELSE 0 END AS INT) AS is_external
      |    FROM lq
      |)""".stripMargin

  /** PageRank oracle: replays GraphOps.pagerank's exact integer recurrence
    * (base + (85·(contrib + dang div n)) div 100 at 1e12 total mass) as
    * `iters` unrolled CTE stages over the crafted domain graph — all
    * truncating BIGINT division, so the declarative replay lands on
    * identical fixed-point values.
    */
  private def pagerankOracle(iters: Int): String =
    pagerankCtes(iters) +
      s"""
         |SELECT r.v AS domain,
         |       CAST(COALESCE(o.outdeg, 0) AS BIGINT) AS n_out,
         |       CAST(COALESCE(i.indeg, 0) AS BIGINT) AS n_in,
         |       r.r AS rank_fp
         |FROM r$iters r
         |LEFT JOIN outd o ON o.src = r.v
         |LEFT JOIN ind i ON i.dst = r.v
         |ORDER BY rank_fp DESC, domain""".stripMargin

  /** DuckDB-operator flavor of LayoutOps.mortonExpr — same 16-term
    * shift/mask sum, spelled with `>> << &` (DuckDB has no shiftleft
    * function).
    */
  private def mortonSqlDuck(x: String, y: String): String =
    (0 until graft.ops.LayoutOps.Bits).map { b =>
      s"(((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1}))"
    }.mkString(" + ")

  /** Link CTEs + the domain graph (distinct external edges + the vertex
    * union) — shared by both iterative-walk oracles.
    */
  private def domainGraphCtes: String =
    "WITH " + linkCtes +
      """, edges AS MATERIALIZED (
        |    SELECT DISTINCT page_domain AS src, target_domain AS dst
        |    FROM lx WHERE is_external = 1
        |), verts AS MATERIALIZED (
        |    -- explicit outer DISTINCT, not bare UNION dedup: under a
        |    -- WITH RECURSIVE header (the authority-survivors composition)
        |    -- DuckDB runs a CTE-level UNION without cross-side dedup,
        |    -- silently doubling every shared vertex
        |    SELECT DISTINCT v FROM (
        |        SELECT page_domain AS v FROM lx
        |        UNION ALL
        |        SELECT dst AS v FROM edges
        |    )
        |)""".stripMargin

  /** HITS oracle: replays GraphOps.hits' exact integer half-steps
    * (sum-in, renormalize to 1e6, sum-out, renormalize) as `iters`
    * unrolled MATERIALIZED CTE stages.
    */
  private def hitsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", har$i AS MATERIALIZED (
         |    SELECT e.dst AS v, CAST(SUM(h.h) AS BIGINT) AS raw
         |    FROM edges e JOIN hh${i - 1} h ON h.v = e.src GROUP BY 1
         |), has$i AS MATERIALIZED (
         |    SELECT CAST(SUM(raw) AS BIGINT) AS s FROM har$i
         |), ha$i AS MATERIALIZED (
         |    SELECT t.v,
         |           CAST((COALESCE(r.raw, 0) * 1000000) // has$i.s AS BIGINT)
         |               AS a
         |    FROM verts t CROSS JOIN has$i LEFT JOIN har$i r ON r.v = t.v
         |), hhr$i AS MATERIALIZED (
         |    SELECT e.src AS v, CAST(SUM(a.a) AS BIGINT) AS raw
         |    FROM edges e JOIN ha$i a ON a.v = e.dst GROUP BY 1
         |), hhs$i AS MATERIALIZED (
         |    SELECT CAST(SUM(raw) AS BIGINT) AS s FROM hhr$i
         |), hh$i AS MATERIALIZED (
         |    SELECT t.v,
         |           CAST((COALESCE(r.raw, 0) * 1000000) // hhs$i.s AS BIGINT)
         |               AS h
         |    FROM verts t CROSS JOIN hhs$i LEFT JOIN hhr$i r ON r.v = t.v
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, hh0 AS MATERIALIZED (
        |    SELECT v, CAST(1000000 AS BIGINT) AS h FROM verts
        |)""".stripMargin + steps +
      s"""
         |SELECT hh.v AS domain, hh.h AS hub_fp, ha.a AS auth_fp
         |FROM hh$iters hh JOIN ha$iters ha ON ha.v = hh.v
         |ORDER BY auth_fp DESC, hub_fp DESC, domain""".stripMargin
  }

  /** LPA oracle: symmetrized simple graph, `iters` unrolled synchronous
    * rounds (neighbor-label counts → per-vertex majority pick with the
    * count-desc/label-asc tie-break), community sizes joined last.
    */
  private def lpaOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", lpn$i AS MATERIALIZED (
         |    SELECT s.dst AS id, l.label, CAST(COUNT(*) AS BIGINT) AS c
         |    FROM lsy s JOIN lp${i - 1} l ON l.id = s.src GROUP BY 1, 2
         |), lpp$i AS MATERIALIZED (
         |    SELECT id, label AS new_label FROM (
         |        SELECT id, label, row_number() OVER (PARTITION BY id
         |            ORDER BY c DESC, label) AS rk FROM lpn$i) WHERE rk = 1
         |), lp$i AS MATERIALIZED (
         |    SELECT l.id, COALESCE(p.new_label, l.label) AS label
         |    FROM lp${i - 1} l LEFT JOIN lpp$i p USING (id)
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, lsy AS MATERIALIZED (
        |    SELECT DISTINCT src, dst FROM (
        |        SELECT src, dst FROM edges WHERE src <> dst
        |        UNION ALL
        |        SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
        |    )
        |), lp0 AS MATERIALIZED (
        |    SELECT v AS id, v AS label FROM verts
        |)""".stripMargin + steps +
      s"""
         |SELECT l.id AS domain, l.label AS community,
         |       CAST(z.community_size AS BIGINT) AS community_size
         |FROM lp$iters l JOIN (
         |    SELECT label, COUNT(*) AS community_size
         |    FROM lp$iters GROUP BY 1) z ON z.label = l.label
         |ORDER BY domain""".stripMargin
  }

  /** k-core oracle: symmetrized simple graph, `rounds` unrolled peel
    * stages (degree → condemned set → surviving edges), then removal
    * records + rounds-survivors with their final in-subgraph degree.
    */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""", kdg$i AS MATERIALIZED (
         |    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
         |    FROM kce${i - 1} GROUP BY 1
         |), kdd$i AS MATERIALIZED (
         |    SELECT a.id, COALESCE(g.deg, 0) AS deg
         |    FROM kal${i - 1} a LEFT JOIN kdg$i g USING (id)
         |), krm$i AS MATERIALIZED (
         |    SELECT id, CAST($i AS BIGINT) AS removed_round,
         |           CAST(deg AS BIGINT) AS final_deg
         |    FROM kdd$i WHERE deg < $k
         |), kal$i AS MATERIALIZED (
         |    SELECT id FROM kdd$i WHERE deg >= $k
         |), kce$i AS MATERIALIZED (
         |    SELECT e.src, e.dst FROM kce${i - 1} e
         |    JOIN kal$i x ON x.id = e.src
         |    JOIN kal$i y ON y.id = e.dst
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, kce0 AS MATERIALIZED (
        |    SELECT DISTINCT src, dst FROM (
        |        SELECT src, dst FROM edges WHERE src <> dst
        |        UNION ALL
        |        SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
        |    )
        |), kal0 AS MATERIALIZED (SELECT v AS id FROM verts)""".stripMargin +
      steps +
      s"""
         |SELECT id AS domain, removed_round, final_deg FROM (
         |    ${(1 to rounds).map(i => s"SELECT * FROM krm$i")
             .mkString(" UNION ALL ")}
         |    UNION ALL
         |    SELECT a.id, CAST(-1 AS BIGINT) AS removed_round,
         |           CAST(COALESCE(g.deg, 0) AS BIGINT) AS final_deg
         |    FROM kal$rounds a LEFT JOIN (
         |        SELECT src AS id, COUNT(*) AS deg
         |        FROM kce$rounds GROUP BY 1) g USING (id)
         |)
         |ORDER BY domain""".stripMargin
  }

  /** BFS hop-distance oracle: seeds = the `.co.uk` page domains, `iters`
    * unrolled min-fold rounds (`dist' = min(dist, min over in-edges
    * dist+1)`) over the crafted domain graph — min is order-independent,
    * so the declarative replay lands on GraphOps.bfsHops' exact Longs.
    */
  private def bfsHopsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", bh$i AS MATERIALIZED (
         |    SELECT v, CAST(MIN(dist) AS BIGINT) AS dist FROM (
         |        SELECT v, dist FROM bh${i - 1}
         |        UNION ALL
         |        SELECT e.dst AS v, h.dist + 1 AS dist
         |        FROM bh${i - 1} h JOIN edges e ON e.src = h.v
         |    ) GROUP BY 1
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, bh0 AS MATERIALIZED (
        |    SELECT DISTINCT page_domain AS v, CAST(0 AS BIGINT) AS dist
        |    FROM lx WHERE page_domain LIKE '%.co.uk'
        |)""".stripMargin + steps +
      s"""
         |SELECT t.v AS domain, CAST(COALESCE(h.dist, -1) AS BIGINT) AS dist
         |FROM verts t LEFT JOIN bh$iters h ON h.v = t.v
         |ORDER BY domain""".stripMargin
  }

  /** Weighted-paths oracle: per-pair link-count costs, `iters` unrolled
    * min-plus relaxations — min is order-independent, so the replay
    * lands on GraphOps.weightedHops' exact Longs.
    */
  private def weightedPathsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", wh$i AS MATERIALIZED (
         |    SELECT v, CAST(MIN(dist) AS BIGINT) AS dist FROM (
         |        SELECT v, dist FROM wh${i - 1}
         |        UNION ALL
         |        SELECT e.dst AS v, h.dist + e.w AS dist
         |        FROM wh${i - 1} h JOIN wce e ON e.src = h.v
         |    ) GROUP BY 1
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, wce AS MATERIALIZED (
        |    SELECT page_domain AS src, target_domain AS dst,
        |           CAST(1000000 // COUNT(*) AS BIGINT) AS w
        |    FROM lx WHERE is_external = 1 GROUP BY 1, 2
        |), wh0 AS MATERIALIZED (
        |    SELECT DISTINCT page_domain AS v, CAST(0 AS BIGINT) AS dist
        |    FROM lx WHERE page_domain LIKE '%.co.uk'
        |)""".stripMargin + steps +
      s"""
         |SELECT t.v AS domain, CAST(COALESCE(h.dist, -1) AS BIGINT) AS cost
         |FROM verts t LEFT JOIN wh$iters h ON h.v = t.v
         |ORDER BY domain""".stripMargin
  }

  /** Personalized-PageRank oracle: seed-conditional teleport/dangling
    * mass, `iters` unrolled exact-integer rounds.
    */
  private def pprOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", pc$i AS MATERIALIZED (
         |    SELECT e.dst AS v, CAST(SUM(r.r // o.outdeg) AS BIGINT)
         |               AS contrib
         |    FROM edges e
         |    JOIN pr${i - 1} r ON e.src = r.v
         |    JOIN outd o ON o.src = e.src
         |    GROUP BY 1
         |), pd$i AS MATERIALIZED (
         |    SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dang
         |    FROM pr${i - 1} r LEFT JOIN outd o ON o.src = r.v
         |    WHERE o.src IS NULL
         |), pr$i AS MATERIALIZED (
         |    SELECT t.v,
         |           CAST(t.is_seed * nsv.base
         |                + (85 * (COALESCE(c.contrib, 0)
         |                   + t.is_seed * (pd$i.dang // nsv.ns))) // 100
         |                AS BIGINT) AS r
         |    FROM fverts t CROSS JOIN nsv CROSS JOIN pd$i
         |    LEFT JOIN pc$i c ON c.v = t.v
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, outd AS MATERIALIZED (
        |    SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
        |    FROM edges GROUP BY 1
        |), sd AS MATERIALIZED (
        |    SELECT DISTINCT page_domain AS v FROM lx
        |    WHERE page_domain LIKE '%.co.uk'
        |), nsv AS MATERIALIZED (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS ns,
        |           CAST(150000000000 // COUNT(*) AS BIGINT) AS base,
        |           CAST(1000000000000 // COUNT(*) AS BIGINT) AS r_init
        |    FROM sd
        |), fverts AS MATERIALIZED (
        |    SELECT t.v, CASE WHEN s.v IS NOT NULL THEN 1 ELSE 0 END
        |               AS is_seed
        |    FROM verts t LEFT JOIN sd s ON s.v = t.v
        |), pr0 AS MATERIALIZED (
        |    SELECT v, CAST(is_seed * r_init AS BIGINT) AS r
        |    FROM fverts CROSS JOIN nsv
        |)""".stripMargin + steps +
      s"""
         |SELECT v AS domain, r AS rank_fp FROM pr$iters
         |ORDER BY domain""".stripMargin
  }

  /** The graph CTEs + the unrolled PageRank recurrence, ending at
    * `r<iters>` (v, r) — shared by the rank gate and the authority-mix
    * composition.
    */
  private def pagerankCtes(iters: Int): String = {
    // every repeatedly-referenced CTE is MATERIALIZED: DuckDB inlines
    // plain CTEs per reference, so the unrolled recurrence would otherwise
    // replay the regex extraction 2^iters times (measured: minutes at
    // sf0.01; materialized: instant)
    val steps = (1 to iters).map { i =>
      s""", c$i AS MATERIALIZED (
         |    SELECT e.dst AS v, CAST(SUM(r.r // o.outdeg) AS BIGINT)
         |               AS contrib
         |    FROM edges e
         |    JOIN r${i - 1} r ON e.src = r.v
         |    JOIN outd o ON o.src = e.src
         |    GROUP BY 1
         |), d$i AS MATERIALIZED (
         |    SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dang
         |    FROM r${i - 1} r LEFT JOIN outd o ON o.src = r.v
         |    WHERE o.src IS NULL
         |), r$i AS MATERIALIZED (
         |    SELECT t.v,
         |           CAST(nv.base + (85 * (COALESCE(c.contrib, 0)
         |                  + (d$i.dang // nv.n))) // 100 AS BIGINT) AS r
         |    FROM verts t CROSS JOIN nv CROSS JOIN d$i
         |    LEFT JOIN c$i c ON c.v = t.v
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, outd AS MATERIALIZED (
        |    SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
        |    FROM edges GROUP BY 1
        |), ind AS MATERIALIZED (
        |    SELECT dst, CAST(COUNT(*) AS BIGINT) AS indeg
        |    FROM edges GROUP BY 1
        |), nv AS MATERIALIZED (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(150000000000 // COUNT(*) AS BIGINT) AS base,
        |           CAST(1000000000000 // COUNT(*) AS BIGINT) AS r_init
        |    FROM verts
        |), r0 AS MATERIALIZED (
        |    SELECT v, r_init AS r FROM verts CROSS JOIN nv
        |)""".stripMargin + steps
  }

  /** Shared oracle fragments for the ANN split gates: L2 norms and the
    * in-order dot-product fold (the exact shape q_knn_cosine_topk proved
    * bit-compatible with the engine's vec_dot).
    */
  /** Fixture embedding dimensionality (TESTDATA.md: 64-dim float arrays).
    * The LSH bucket oracle inlines plane weights for exactly this many
    * dimensions; a wider fixture vector would make the oracle's replay
    * partial and fail the hash gate LOUDLY (red, never a silent pass).
    */
  private val OracleEmbeddingDims = 64

  /** The engine's deterministic hyperplane weights as a VALUES list —
    * fixed splitmix64-derived constants (engine constants interpolated
    * into the oracle like the thresholds, NOT engine outputs), inlined so
    * DuckDB replays the exact fixed-point dot products. Double.toString
    * is shortest-round-trip, so DuckDB parses each literal to the
    * bit-identical double.
    */
  private def hyperplaneWeightValues(nPlanes: Int, dims: Int): String =
    (0 until nPlanes).flatMap(p => (0 until dims).map(i =>
      s"($p,$i,${graft.functions.HyperplaneSketch.planeWeight(p, i)})"))
      .mkString(",")

  private val VecNormCte: String =
    """nrm AS (
      |    SELECT vec_id, embedding,
      |           sqrt(list_reduce(
      |             list_prepend(CAST(0.0 AS DOUBLE),
      |               list_transform(embedding,
      |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |             (a, b) -> a + b)) AS l2
      |    FROM embeddings
      |)""".stripMargin

  private val DotAB: String =
    """list_reduce(
      |             list_prepend(CAST(0.0 AS DOUBLE),
      |               list_transform(range(1, len(a.embedding) + 1),
      |                 i -> CAST(a.embedding[i] AS DOUBLE)
      |                      * CAST(b.embedding[i] AS DOUBLE))),
      |             (x, y) -> x + y)""".stripMargin

  /** Pair-set split gate: read the engine's materialized (vec_a, vec_b)
    * pairs, recompute each cosine from the raw embeddings, re-apply the
    * threshold — a wrong cosine or below-threshold pair hash-mismatches.
    */
  /** Shared top-k split-gate oracle: given a materialized (probe_id,
    * neighbor_id) set, recompute every cosine from the raw embeddings and
    * the full rank order — the gate for any retrieve-then-exact-re-rank
    * search (IVF, PQ). An engine rank disagreeing with the exact-cosine
    * order fails the hash.
    */
  /** The bigram-LM quality filter's full-replay oracle — shared verbatim
    * by q_perplexity_filter (in-session train+score) and
    * q_perplexity_serve (warehouse round-trip: build the stored LM, score
    * from it): deterministic training makes the two paths row-identical.
    */
  private def perplexityFilterOracle: String =
    """WITH base AS (
      |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |    FROM documents
      |), vocab AS (
      |    SELECT COUNT(DISTINCT w) AS v
      |    FROM (SELECT unnest(toks) AS w FROM base)
      |), tok AS (
      |    SELECT doc_id, unnest(toks) AS w,
      |           unnest(range(1, len(toks)+1)) AS pos
      |    FROM base WHERE len(toks) >= 2
      |), pw AS (
      |    SELECT a.doc_id, a.w AS prev, b.w AS w
      |    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |), c2 AS (SELECT prev, w, COUNT(*) AS c2 FROM pw GROUP BY 1, 2),
      |c1 AS (SELECT prev, COUNT(*) AS c1 FROM pw GROUP BY 1),
      |doc AS (
      |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
      |           CAST(SUM((1000 * (c1.c1 + (SELECT v FROM vocab)))
      |                    // (c2.c2 + 1)) AS BIGINT) AS score_sum
      |    FROM pw JOIN c2 USING (prev, w) JOIN c1 USING (prev)
      |    GROUP BY doc_id
      |), doc2 AS (
      |    SELECT doc_id, n_trans, score_sum // n_trans AS ppx_score FROM doc
      |), tot AS (
      |    SELECT CAST(SUM(ppx_score) AS BIGINT) AS tot, COUNT(*) AS n FROM doc2
      |)
      |SELECT doc_id, n_trans, ppx_score,
      |       CASE WHEN ppx_score * (SELECT n FROM tot) <= (SELECT tot FROM tot)
      |            THEN 1 ELSE 0 END AS keep
      |FROM doc2 ORDER BY doc_id""".stripMargin

  private def topkCosineOracle(gateName: String): String = {
    val path = OracleInputs.sqlPath(gateName)
    s"""WITH p AS (SELECT probe_id, neighbor_id
       |           FROM read_parquet('$path/*.parquet')),
       |$VecNormCte, scored AS (
       |    SELECT p.probe_id, p.neighbor_id,
       |           $DotAB / (a.l2 * b.l2) AS cosine
       |    FROM p JOIN nrm a ON a.vec_id = p.probe_id
       |           JOIN nrm b ON b.vec_id = p.neighbor_id
       |), ranked AS (
       |    SELECT probe_id, neighbor_id, cosine,
       |           row_number() OVER (PARTITION BY probe_id
       |                              ORDER BY cosine DESC, neighbor_id ASC)
       |               AS rnk
       |    FROM scored
       |)
       |SELECT probe_id, rnk, neighbor_id, cosine FROM ranked
       |ORDER BY probe_id, rnk""".stripMargin
  }

  /** The five-stage corpus-assembly replay from raw text, shared by the
    * full-pipeline and incremental gates (they differ only in WHICH
    * materialized band index the near-dup stage reads — the fresh build's
    * or the base-build-plus-batch-appends'). s5 packs PER SHARD: shard
    * assignment first (md5 permutation fold), then the running token sum
    * in shard read order — sequences never span shards, and a shard's
    * packing depends only on its own rows (the incremental contract).
    */
  private def corpusPipelineOracle(bandsGate: String): String = {
    val path = OracleInputs.sqlPath(bandsGate)
    import graft.pipeline.CorpusPipeline.{PerSourceBudget, PackBudget}
    s"""WITH survivors AS (
       |    SELECT MIN(doc_id) AS doc_id FROM documents
       |    GROUP BY sha256(lower(trim(text)))
       |), gate AS (
       |    SELECT doc_id FROM (
       |        SELECT doc_id,
       |               string_split_regex(trim(text), '\\s+') AS tokens
       |        FROM documents) t
       |    WHERE doc_id IN (SELECT doc_id FROM survivors)
       |      AND len(tokens) >= 20
       |      AND CAST(len(list_filter(tokens,
       |              tk -> tk IN ('the', 'a', 'of', 'to', 'and')))
       |            AS DOUBLE) / CAST(len(tokens) AS DOUBLE) >= 0.05
       |      AND CAST(len(list_filter(tokens,
       |              tk -> tk IN ('the', 'a', 'of', 'to', 'and')))
       |            AS DOUBLE) / CAST(len(tokens) AS DOUBLE) <= 0.6
       |), bands AS (
       |    SELECT doc_id, band_idx, band_hash
       |    FROM read_parquet('$path/*.parquet')
       |), dd AS (
       |    SELECT g.doc_id FROM gate g
       |    WHERE NOT EXISTS (
       |        SELECT 1 FROM bands b JOIN bands m
       |          ON m.band_idx = b.band_idx AND m.band_hash = b.band_hash
       |        WHERE b.doc_id = g.doc_id AND m.doc_id < g.doc_id)
       |), ctok AS (
       |    SELECT doc_id,
       |           list_filter(string_split_regex(trim(text), '\\s+'),
       |                       t -> t <> '') AS base
       |    FROM documents
       |), cex AS (
       |    SELECT doc_id,
       |           CASE WHEN doc_id % 3 = 0
       |                THEN list_concat(base,
       |                     ['안녕', '세계',
       |                      repeat('中', CAST(doc_id % 4 + 1 AS INT)),
       |                      'tail'])
       |                ELSE base END AS tokens
       |    FROM ctok
       |), grams AS (
       |    SELECT doc_id,
       |           list_distinct(list_transform(range(1, len(tokens) - 1),
       |               i -> array_to_string(tokens[i:i+2], ' '))) AS gs
       |    FROM cex
       |), eval_grams AS (
       |    SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 100 = 7
       |), flagged AS (
       |    SELECT DISTINCT c.doc_id
       |    FROM (SELECT doc_id, unnest(gs) AS g FROM grams
       |          WHERE doc_id % 100 <> 7) c
       |    JOIN eval_grams e ON c.g = e.g
       |), s3 AS (
       |    SELECT doc_id FROM dd
       |    WHERE doc_id % 100 <> 7
       |      AND doc_id NOT IN (SELECT doc_id FROM flagged)
       |), q AS (
       |    SELECT d.doc_id, d.source,
       |           GREATEST(d.n_chars // 4, 1) AS tokens,
       |           CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
       |                    tk -> tk IN ('the', 'a', 'of', 'to', 'and')))
       |                AS BIGINT) * 1000000
       |             // CAST(len(string_split_regex(trim(d.text), '\\s+'))
       |                  AS BIGINT) AS qm
       |    FROM documents d JOIN s3 USING (doc_id)
       |), c AS (
       |    SELECT doc_id, source, tokens,
       |           SUM(tokens) OVER (PARTITION BY source
       |               ORDER BY qm DESC, doc_id
       |               ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM q
       |), s4 AS (
       |    SELECT doc_id, source, tokens FROM c WHERE cum <= $PerSourceBudget
       |), sharded AS (
       |    SELECT doc_id, source, CAST(tokens AS BIGINT) AS n_tokens,
       |           md5(CAST(doc_id AS VARCHAR)) AS sk,
       |           CAST(((strpos('0123456789abcdef',
       |                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 13
       |                 + (strpos('0123456789abcdef',
       |                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
       |                % ${SamplingOps.ExportShards} AS INT) AS shard
       |    FROM s4
       |), packed AS (
       |    SELECT doc_id, source, n_tokens, shard,
       |           row_number() OVER (PARTITION BY shard ORDER BY sk, doc_id)
       |             AS shard_rank,
       |           CAST((SUM(n_tokens) OVER (PARTITION BY shard
       |                     ORDER BY sk, doc_id ROWS UNBOUNDED PRECEDING)
       |                 - n_tokens) // $PackBudget AS BIGINT) AS seq_id
       |    FROM sharded
       |)
       |SELECT doc_id, source, n_tokens, seq_id, shard, shard_rank
       |FROM packed ORDER BY doc_id""".stripMargin
  }

  private def pairCosineOracle(pairsName: String, threshold: Double): String = {
    val path = OracleInputs.sqlPath(pairsName)
    s"""WITH p AS (SELECT vec_a, vec_b FROM read_parquet('$path/*.parquet')),
       |$VecNormCte
       |SELECT vec_a, vec_b, cosine FROM (
       |    SELECT p.vec_a, p.vec_b,
       |           $DotAB / (a.l2 * b.l2) AS cosine
       |    FROM p JOIN nrm a ON a.vec_id = p.vec_a
       |           JOIN nrm b ON b.vec_id = p.vec_b
       |) WHERE cosine >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    // given the materialized band keys, the candidate derivation —
    // hot-bucket cap, band self-join, doc_a < doc_b canonicalization,
    // distinct — is deterministic and fully recomputable
    "q_dedup_minhash" -> {
      val path = OracleInputs.sqlPath("minhash_banded")
      s"""WITH b AS (SELECT doc_id, band_idx, band_hash
         |           FROM read_parquet('$path/*.parquet')),
         |hot AS (
         |    SELECT band_idx, band_hash FROM b
         |    GROUP BY band_idx, band_hash HAVING COUNT(*) > ${TextOps.MaxBucketSize}
         |), pruned AS (
         |    SELECT b.* FROM b
         |    WHERE NOT EXISTS (SELECT 1 FROM hot
         |                      WHERE hot.band_idx = b.band_idx
         |                        AND hot.band_hash = b.band_hash)
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, p.doc_id AS doc_b
         |FROM pruned a JOIN pruned p
         |  ON a.band_idx = p.band_idx AND a.band_hash = p.band_hash
         |WHERE a.doc_id < p.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // everything downstream of the materialized simhash values is
    // deterministic integer arithmetic: byte bands ((h >> 8i) & 255 — the
    // mask absorbs the arithmetic-vs-logical shift difference), hot-bucket
    // cap, probe join, hamming confirm
    "q_simhash_near_dup" -> {
      val path = OracleInputs.sqlPath("simhash_frame")
      s"""WITH h AS (SELECT doc_id, simhash FROM read_parquet('$path/*.parquet')),
         |banded AS (
         |    SELECT doc_id, CAST(i AS INTEGER) AS band_idx,
         |           (simhash >> CAST(i * 8 AS INTEGER)) & 255 AS band_key
         |    FROM h, (SELECT unnest(range(0, ${TextOps.SimhashBands})) AS i)
         |), hot AS (
         |    SELECT band_idx, band_key FROM banded
         |    GROUP BY band_idx, band_key HAVING COUNT(*) > ${TextOps.MaxBucketSize}
         |), pruned AS (
         |    SELECT b.* FROM banded b
         |    WHERE NOT EXISTS (SELECT 1 FROM hot
         |                      WHERE hot.band_idx = b.band_idx
         |                        AND hot.band_key = b.band_key)
         |), cand AS (
         |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM pruned a JOIN pruned b
         |      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    WHERE a.doc_id < 10 AND a.doc_id <> b.doc_id
         |)
         |SELECT c.doc_a, c.doc_b,
         |       CAST(bit_count(xor(ha.simhash, hb.simhash)) AS INTEGER)
         |           AS hamming
         |FROM cand c JOIN h ha ON ha.doc_id = c.doc_a
         |            JOIN h hb ON hb.doc_id = c.doc_b
         |WHERE bit_count(xor(ha.simhash, hb.simhash)) <= ${TextOps.SimhashMaxHamming}
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // the END-TO-END corpus-assembly pipeline: the oracle replays every
    // stage from raw text — exact dedup + quality gate, near-dup keep-
    // lowest over the MATERIALIZED band index (split gate: minhash values
    // are engine-specific, the survivor derivation is not), CJK 3-gram
    // decontamination, per-source budget prefix, sequence packing, export
    // shard/rank — and must land on the identical packed corpus
    "q_corpus_pipeline" -> corpusPipelineOracle("pipeline_bands"),
    // same replay over the same raw documents, gated on the INCREMENT's
    // band index (base build + batch appends): the batch-appended state
    // must land on the identical packed corpus a fresh full run produces
    "q_corpus_increment" -> corpusPipelineOracle("inc_pipeline_bands"),
    // full-value gate (no split): per token, the upper 64 bits of md5 are
    // extracted nibble-by-nibble from the hex string (bit i lives in hex
    // char 16 - i/4, nibble bit i%4), voted ±1 per bit over the doc's
    // whitespace tokens, and packed signed (bit 63 = Long.MinValue)
    "q_simhash" ->
      s"""WITH tok AS (
         |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tk
         |    FROM documents
         |), h AS (
         |    SELECT doc_id, substr(md5(tk), 1, 16) AS hx FROM tok
         |), votes AS (
         |    SELECT doc_id, i,
         |           SUM(CASE WHEN (strpos('0123456789abcdef',
         |                            substr(hx, CAST(16 - i//4 AS INT), 1)) - 1)
         |                    // (1 << CAST(i % 4 AS INT)) % 2 = 1
         |                    THEN 1 ELSE -1 END) AS v
         |    FROM h, range(64) r(i) GROUP BY doc_id, i
         |)
         |SELECT doc_id,
         |       CAST(SUM(CASE WHEN v > 0 THEN
         |              CASE WHEN i = 63 THEN -9223372036854775807 - 1
         |                   ELSE (1::BIGINT << CAST(i AS INT)) END
         |            ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // full-value gate: the 16 bucket bits are sign bits of fixed-point
    // dot products against the engine's deterministic plane weights,
    // inlined below as literals (Double.toString round-trips exactly);
    // per-term truncation to BIGINT makes the sum order-independent, so
    // the replay is exact — see graft.functions.HyperplaneSketch
    "q_lsh_cosine_buckets" ->
      s"""WITH w(p, i, wt) AS (VALUES ${hyperplaneWeightValues(
             graft.ops.VectorOps.NumPlanes, OracleEmbeddingDims)}),
         |e AS (
         |    SELECT vec_id, CAST(r.i AS INT) AS i,
         |           CAST(embedding[CAST(r.i AS INT) + 1] AS DOUBLE) AS x
         |    FROM embeddings CROSS JOIN range($OracleEmbeddingDims) r(i)
         |    WHERE embedding IS NOT NULL
         |      AND len(embedding) > CAST(r.i AS INT)
         |), d AS (
         |    SELECT e.vec_id, w.p,
         |           SUM(CAST(trunc((e.x * w.wt) * 1e15) AS BIGINT)) AS dot
         |    FROM e JOIN w ON w.i = e.i GROUP BY e.vec_id, w.p
         |)
         |SELECT vec_id,
         |       CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << p)
         |                     ELSE 0 END) AS BIGINT) AS bucket
         |FROM d GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q_embedding_near_dup" ->
      pairCosineOracle("neardup_pairs", graft.ops.VectorOps.CosineDupThreshold),
    "q_ivf_semantic_dedup" ->
      pairCosineOracle("ivf_dedup_pairs", graft.ops.VectorOps.CosineDupThreshold),
    // top-k split gate: given the engine's materialized (probe, neighbor)
    // sets, the cosines AND the rank order are deterministic — recompute
    // both; an engine rnk disagreeing with the exact-cosine order fails
    "q_ivf_cosine_topk" -> topkCosineOracle("ivf_topk"),
    // same split-gate shape as the IVF path: WHICH candidates the PQ
    // codebooks retrieve is engine-trained (rows-only), but the EXACT
    // re-rank's cosines and order over the materialized sets are fully
    // recomputed by the oracle
    "q_pq_cosine_topk" -> topkCosineOracle("pq_topk"),
    // SQ8: the WHOLE pipeline is replayable — min/max training is
    // order-independent (unlike Lloyd's), the encode/decode are fixed IEEE
    // expression trees, and the ADC fold is the proven in-order vec_dot
    // shape — so this gate retrains, re-encodes, re-cuts and re-ranks from
    // the raw embeddings with no materialized split input at all
    "q_sq_cosine_topk" ->
      s"""WITH e AS (
        |    SELECT vec_id, embedding FROM embeddings
        |    WHERE embedding IS NOT NULL AND len(embedding) > 0
        |), st AS (
        |    SELECT i,
        |           MIN(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS mn,
        |           MAX(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)) AS mx
        |    FROM e, (SELECT unnest(range(1, ${OracleEmbeddingDims + 1})) AS i)
        |    WHERE i <= len(embedding)
        |    GROUP BY i
        |), prm AS (
        |    SELECT list(mn ORDER BY i) AS mns,
        |           list(mx - mn ORDER BY i) AS ws
        |    FROM st
        |), codes AS (
        |    SELECT e.vec_id,
        |           list_transform(range(1, len(e.embedding) + 1), i ->
        |             CASE WHEN p.ws[i] = 0 THEN 0
        |                  ELSE CAST(LEAST(255, GREATEST(0,
        |                       CAST(floor(((CAST(e.embedding[i] AS DOUBLE) - p.mns[i])
        |                                   * 255.0) / p.ws[i]) AS BIGINT))) AS INTEGER)
        |             END) AS codes
        |    FROM e, prm p
        |), dec AS (
        |    SELECT c.vec_id,
        |           list_transform(range(1, len(c.codes) + 1), i ->
        |             p.mns[i] + (CAST(c.codes[i] AS DOUBLE) * p.ws[i]) / 255.0) AS dv
        |    FROM codes c, prm p
        |), pr AS (
        |    SELECT vec_id AS probe_id, embedding AS pv FROM e WHERE vec_id < 5
        |), approx AS (
        |    SELECT pr.probe_id, d.vec_id AS neighbor_id,
        |           list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(range(1, len(pr.pv) + 1),
        |                 i -> CAST(pr.pv[i] AS DOUBLE) * d.dv[i])),
        |             (x, y) -> x + y) AS approx
        |    FROM pr, dec d
        |), cut AS (
        |    SELECT probe_id, neighbor_id FROM (
        |        SELECT probe_id, neighbor_id,
        |               row_number() OVER (PARTITION BY probe_id
        |                                  ORDER BY approx DESC, neighbor_id ASC)
        |                   AS arnk
        |        FROM approx)
        |    WHERE arnk <= ${ops.VectorOps.SqRerank}
        |), $VecNormCte, scored AS (
        |    SELECT c.probe_id, c.neighbor_id,
        |           $DotAB / (a.l2 * b.l2) AS cosine
        |    FROM cut c JOIN nrm a ON a.vec_id = c.probe_id
        |               JOIN nrm b ON b.vec_id = c.neighbor_id
        |), ranked AS (
        |    SELECT probe_id, neighbor_id, cosine,
        |           row_number() OVER (PARTITION BY probe_id
        |                              ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |    FROM scored
        |)
        |SELECT probe_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin,
    // IVF-PQ composition: cell pruning changes only WHICH candidates
    // reach the exact re-rank — the same materialized-set gate applies
    "q_ivfpq_cosine_topk" -> topkCosineOracle("ivfpq_topk"),
    // IVF-SQ composition: same gate — the cell pruning + SQ cut only
    // change WHICH candidates reach the exact re-rank
    "q_ivfsq_cosine_topk" -> topkCosineOracle("ivfsq_topk"),
    // tolerance gate: the oracle asserts the HLL estimate landed within
    // 3·rsd of the exact count (within_3rsd must be 1 on the Spark side)
    "q_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS exact_orderkeys,
        |       CAST(1 AS INTEGER) AS within_3rsd
        |FROM lineitem""".stripMargin,
    // one row per profiled column; min/max stringified from
    // format-stable types only (bigint/varchar — doubles profile via
    // integer derivations: cents for prices, the µ-scale norm floor for
    // embeddings); one profileOracle shape per profiled table
    "q_profile_columns" -> profileOracle(
      """    SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |           CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
        |    FROM orders""".stripMargin,
      Seq("o_orderkey" -> true, "o_custkey" -> true, "o_orderstatus" -> false,
        "o_orderpriority" -> false, "o_totalprice_cents" -> true)),
    "q_profile_documents" -> profileOracle(
      "    SELECT doc_id, lang, source, n_chars, length(text) AS text_len" +
        "\n    FROM documents",
      Seq("doc_id" -> true, "lang" -> false, "source" -> false,
        "n_chars" -> true, "text_len" -> true)),
    // the norm fold mirrors q_embed_norm's proven bit-exact reduction,
    // floored at µ-scale into a BIGINT so stringified bounds are
    // format-stable across engines
    "q_profile_embeddings" -> profileOracle(
      """    SELECT vec_id, label, len(embedding) AS emb_dim,
        |           CAST(floor(list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |             (a, b) -> a + b) * 1000000) AS BIGINT) AS norm_sq_micro
        |    FROM embeddings""".stripMargin,
      Seq("vec_id" -> true, "label" -> true, "emb_dim" -> true,
        "norm_sq_micro" -> true)),
    "q_dedup_survivors" ->
      survivorOracle("text_pairs", "documents", "doc_id", "doc_id"),
    // incrementally-maintained cluster state: the oracle replays the
    // closure over the FRESH full-corpus pair set, so a pass proves the
    // append path landed bit-equal to a from-scratch survivors run
    "q_dedup_clusters_incremental" ->
      survivorOracle("inc_cluster_pairs", "documents", "doc_id", "doc_id"),
    // same closure, but the cluster representative is the BEST doc
    // (most whitespace tokens, id tie-break) — the oracle replays the
    // argmax over the same materialized pairs
    "q_dedup_best_of_cluster" -> {
      val path = OracleInputs.sqlPath("text_pairs_best")
      s"""WITH RECURSIVE
         |e AS (SELECT src, dst FROM read_parquet('$path/*.parquet')),
         |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
         |reach(id, r) AS (
         |    SELECT doc_id, doc_id FROM documents
         |    UNION
         |    SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id
         |),
         |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |q AS (SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
         |      FROM documents),
         |rep AS (
         |    SELECT comp.cluster_id, comp.id,
         |           row_number() OVER (PARTITION BY comp.cluster_id
         |                              ORDER BY q.n_tokens DESC, comp.id ASC) AS rnk
         |    FROM comp JOIN q ON q.doc_id = comp.id
         |)
         |SELECT c.id AS doc_id, r.id AS canonical_id,
         |       CAST(CASE WHEN c.id = r.id THEN 1 ELSE 0 END AS INTEGER)
         |           AS survives
         |FROM comp c JOIN (SELECT cluster_id, id FROM rep WHERE rnk = 1) r
         |     USING (cluster_id)
         |ORDER BY doc_id""".stripMargin
    },
    // incremental dedup: the engine materializes the persisted index's
    // CONTENT and the batch's band keys; the oracle replays the probe
    // join + per-doc aggregation over the same rows (batch universe from
    // the documents table so band-less short docs appear as survivors)
    "q_dedup_incremental" -> {
      val cb = OracleInputs.sqlPath("inc_corpus_bands")
      val bb = OracleInputs.sqlPath("inc_batch_bands")
      s"""WITH m AS (
         |    SELECT b.doc_id, c.doc_id AS corpus_id
         |    FROM read_parquet('$bb/*.parquet') b
         |    JOIN read_parquet('$cb/*.parquet') c
         |      ON b.band_idx = c.band_idx AND b.band_hash = c.band_hash
         |    GROUP BY 1, 2
         |), agg AS (
         |    SELECT doc_id, COUNT(*) AS n_matches, MIN(corpus_id) AS m_min
         |    FROM m GROUP BY 1
         |)
         |SELECT d.doc_id,
         |       CAST(COALESCE(agg.n_matches, 0) AS BIGINT) AS n_matches,
         |       CAST(COALESCE(agg.m_min, d.doc_id) AS BIGINT) AS match_min_id,
         |       CAST(CASE WHEN agg.doc_id IS NULL THEN 1 ELSE 0 END
         |            AS INTEGER) AS survives
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
         |LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },
    "q_semantic_survivors" ->
      survivorOracle("vec_pairs", "embeddings", "vec_id", "vec_id"),
    // cluster-balanced sample: assignments are quantizer-specific
    // (materialized); the per-cell md5-permutation top-k is replayed
    "q_cluster_sample" -> {
      val p = OracleInputs.sqlPath("cell_assignments")
      s"""WITH ranked AS (
         |    SELECT cell, vec_id,
         |           row_number() OVER (PARTITION BY cell
         |               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
         |             AS sample_rank
         |    FROM read_parquet('$p/*.parquet')
         |)
         |SELECT cell, sample_rank, vec_id FROM ranked
         |WHERE sample_rank <= 5 ORDER BY cell, sample_rank""".stripMargin
    },
    "q_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_tenant_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_incremental" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE epoch_ns(ts) > 1705276800000000000 ORDER BY event_id""".stripMargin,
    "q_limit_topk" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_cast_standard" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS item_id,
        |       CAST(p_name AS VARCHAR) AS item_name,
        |       CAST(p_type AS VARCHAR) AS item_type,
        |       CAST(p_brand AS VARCHAR) AS item_group_id
        |FROM part ORDER BY item_id""".stripMargin,
    "q_concat_partition_key" ->
      """SELECT CAST(o_custkey AS VARCHAR) || '_' || 'V1.0' AS partition_key,
        |       'V1.0' AS plan_ver, o_orderkey
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_coalesce_prefix" ->
      """SELECT p_partkey, '[계획용] ' || COALESCE(p_name, p_brand) AS description
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_suffix_tag" ->
      """SELECT o_orderkey,
        |       COALESCE(o_orderpriority, 'NORMAL') || '_PLANNED' AS order_priority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_arith_scale" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * CAST(1.1 AS DOUBLE) AS scaled_price,
        |       l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS disc_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_timestamp_replace" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS item_id,
        |       TIMESTAMP '2026-01-01 00:00:00' AS created_at,
        |       TIMESTAMP '2026-01-01 00:00:00' AS updated_at
        |FROM part ORDER BY item_id""".stripMargin,
    "q_cte_stage_chain" ->
      """WITH source AS (
        |    SELECT * FROM orders WHERE o_orderstatus = 'F'
        |), transformed AS (
        |    SELECT CAST(o_custkey AS VARCHAR) || '_' || 'V1.0' AS partition_key,
        |           'V1.0' AS plan_ver, o_orderkey,
        |           o_totalprice * CAST(1.1 AS DOUBLE) AS demand_qty,
        |           COALESCE(o_orderpriority, 'NORMAL') || '_PLANNED' AS demand_type
        |    FROM source
        |)
        |SELECT * FROM transformed ORDER BY o_orderkey""".stripMargin,
    "q_groupby_count" ->
      "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "q_mode_full_snapshot" ->
      """SELECT CAST(p_partkey AS VARCHAR) AS item_id,
        |       CAST(p_name AS VARCHAR) AS item_name,
        |       CAST(p_type AS VARCHAR) AS item_type,
        |       CAST(p_brand AS VARCHAR) AS item_group_id,
        |       'STANDARD' AS procurement_type,
        |       TIMESTAMP '2026-01-01 00:00:00' AS created_at,
        |       TIMESTAMP '2026-01-01 00:00:00' AS updated_at
        |FROM part
        |WHERE p_brand = 'Brand#4' AND p_partkey % 5 <> 0
        |ORDER BY item_id""".stripMargin,
    "q_mode_watermark_append" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "q_partition_backfill" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m') AS part_key
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
        |ORDER BY o_orderkey""".stripMargin,
    "q_delete_predicate" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       CASE WHEN o_orderkey % 2 = 0 THEN 'V1.0' ELSE 'V2.0' END AS plan_ver
        |FROM orders
        |WHERE NOT (CASE WHEN o_orderkey % 2 = 0 THEN 'V1.0' ELSE 'V2.0' END = 'V1.0')
        |ORDER BY o_orderkey""".stripMargin,
    "q_empty_result_schema" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < -1",
    // the engine runs the partition-scoped delete machinery (match scan →
    // affected partitions → drop+append of the filtered slice); the
    // oracle recomputes the surviving rows declaratively
    "q_delete_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       strftime(o_orderdate, '%Y-%m') AS part_key
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND NOT (strftime(o_orderdate, '%Y-%m') = '1996-02'
        |           AND o_orderkey % 3 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_equi" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_join_broadcast_dim" ->
      """SELECT r_name, n_name, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_join_semi_anti" ->
      """SELECT c_custkey, c_name, 'HAS_ORDERS' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, 'NO_ORDERS' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_latest_by_pk" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |    SELECT user_id, event_id, event_type, value,
        |           row_number() OVER (PARTITION BY user_id
        |                              ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_window_running_agg" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |           PARTITION BY user_id ORDER BY event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |           AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_sort_topk_per_group" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |    SELECT o_custkey, o_orderkey, o_totalprice,
        |           row_number() OVER (PARTITION BY o_custkey
        |                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |    FROM orders
        |) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_union_two_tenants" ->
      """SELECT 'tenant_a' AS tenant_id, c_custkey, c_name, c_mktsegment
        |FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION ALL
        |SELECT 'tenant_b' AS tenant_id, c_custkey, c_name, c_mktsegment
        |FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY tenant_id, c_custkey""".stripMargin,
    "q_except_intersect" ->
      """SELECT o_custkey, 'BOTH' AS tag FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |    INTERSECT
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT o_custkey, 'F_ONLY' AS tag FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |    EXCEPT
        |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY tag, o_custkey""".stripMargin,
    "q_rollup_agg" ->
      """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |FROM events
        |GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts) AS DATE))
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "q_distinct_exact" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
        |           AS gid,
        |       COUNT(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_token_count_bpe" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpeish,
        |       len(regexp_extract_all(text, '[a-z]+')) AS n_word,
        |       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin,
    // unicode-aware tokenization: the oracle reconstructs the expected
    // token list arithmetically from the same deterministic CJK enrichment
    // (base fixture text is pure lowercase/space, where UAX#29 word tokens
    // == whitespace tokens — the parity law) and hashes the joined stream
    "q_token_count_cjk" ->
      """WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS raw,
        |           list_filter(string_split_regex(trim(text), '\s+'),
        |                       t -> t <> '') AS base
        |    FROM documents
        |), ex AS (
        |    SELECT doc_id, len(raw) AS nb,
        |           CASE WHEN doc_id % 3 = 0
        |                THEN list_concat(base,
        |                     ['안녕', '세계',
        |                      repeat('中', CAST(doc_id % 4 + 1 AS INT)), 'tail'])
        |                ELSE base END AS toks
        |    FROM tok
        |)
        |SELECT doc_id,
        |       CAST(len(toks) AS INTEGER) AS n_unicode_tokens,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN nb + 2 ELSE nb END
        |            AS INTEGER) AS n_space_tokens,
        |       md5(array_to_string(toks, ' ')) AS tokens_md5
        |FROM ex ORDER BY doc_id""".stripMargin,
    // corpus-internal repeated spans: both engines build per-doc DISTINCT
    // n-gram sets, so n_docs counts containing documents; the total order
    // (count desc, gram asc) makes the top-k slice deterministic
    "q_repeated_spans" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), grams AS (
        |    SELECT doc_id,
        |           list_distinct(list_transform(
        |               range(1, len(tokens) - ${TextOps.SpanNgram - 2}),
        |               i -> array_to_string(tokens[i:i+${TextOps.SpanNgram - 1}], ' '))) AS gs
        |    FROM tok
        |), flat AS (
        |    SELECT unnest(gs) AS gram FROM grams
        |), counted AS (
        |    SELECT gram, COUNT(*) AS n_docs FROM flat GROUP BY gram
        |)
        |SELECT gram, n_docs FROM counted WHERE n_docs >= ${TextOps.SpanMinDocs}
        |ORDER BY n_docs DESC, gram ASC LIMIT ${TextOps.SpanTopK}""".stripMargin,
    "q_length_histogram" ->
      s"""WITH tok AS (
        |    SELECT len(string_split_regex(trim(text), '\\s+')) AS n
        |    FROM documents
        |)
        |SELECT n // ${TextOps.LenBucketWidth} AS bucket,
        |       COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS token_sum,
        |       CAST(MIN(n) AS INTEGER) AS min_tokens,
        |       CAST(MAX(n) AS INTEGER) AS max_tokens
        |FROM tok GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the unicode tokenizer composed into the vocabulary aggregation:
    // same arithmetic token-list reconstruction as q_token_count_cjk,
    // then the standard count + rank
    "q_top_terms_cjk" ->
      """WITH tok AS (
        |    SELECT doc_id, lang,
        |           list_filter(string_split_regex(trim(text), '\s+'),
        |                       t -> t <> '') AS base
        |    FROM documents
        |), ex AS (
        |    SELECT lang,
        |           CASE WHEN doc_id % 3 = 0
        |                THEN list_concat(base,
        |                     ['안녕', '세계',
        |                      repeat('中', CAST(doc_id % 4 + 1 AS INT)), 'tail'])
        |                ELSE base END AS toks
        |    FROM tok
        |), flat AS (
        |    SELECT lang, unnest(toks) AS token FROM ex
        |), counted AS (
        |    SELECT lang, token, COUNT(*) AS cnt FROM flat GROUP BY lang, token
        |), ranked AS (
        |    SELECT lang, token, cnt,
        |           row_number() OVER (PARTITION BY lang
        |                              ORDER BY cnt DESC, token ASC) AS rnk
        |    FROM counted
        |)
        |SELECT lang, rnk, token, cnt FROM ranked WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,
    "q_top_terms_per_lang" ->
      """WITH tok AS (
        |    SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents
        |), counted AS (
        |    SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY lang, token
        |), ranked AS (
        |    SELECT lang, token, cnt,
        |           row_number() OVER (PARTITION BY lang
        |                              ORDER BY cnt DESC, token ASC) AS rnk
        |    FROM counted
        |)
        |SELECT lang, rnk, token, cnt FROM ranked WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,
    "q_scalar_datetime_math" ->
      """SELECT o_orderkey,
        |       CAST(date_trunc('day', o_orderdate) AS DATE) AS order_day,
        |       CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |       CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |       CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_asof_last_click" ->
      """WITH p AS (
        |    SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_id
        |    FROM events WHERE event_type = 'purchase'
        |), c AS (
        |    SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_id
        |    FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       c.event_id AS last_click_id,
        |       p.tsu - c.tsu AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.tsu <= p.tsu
        |ORDER BY purchase_id""".stripMargin,
    "q_join_range" ->
      """WITH c AS (
        |    SELECT event_id AS click_id, user_id, epoch_ns(ts) AS cts
        |    FROM events WHERE event_type = 'click'
        |), p AS (
        |    SELECT user_id, epoch_ns(ts) AS pts
        |    FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.click_id, COUNT(p.pts) AS n_purchases_10m
        |FROM c LEFT JOIN p
        |  ON p.user_id = c.user_id
        | AND p.pts > c.cts AND p.pts <= c.cts + 600000000000
        |GROUP BY c.click_id ORDER BY c.click_id""".stripMargin,
    "q_groupby_salted" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_json_extract" ->
      // outer CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas fetches
      // as float — Spark's int64 would then fail the driver's typed hash
      // even though the values agree (round-2 verdict #2).
      """SELECT event_type, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS k_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_event_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
        |       COUNT(*) AS cnt,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1 ORDER BY ws""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |    SELECT user_id, epoch_ns(ts) // 1000 AS tsu FROM events
        |), m AS (
        |    SELECT user_id, tsu,
        |           CASE WHEN lag(tsu) OVER w IS NULL
        |                  OR tsu - lag(tsu) OVER w >= 1800000000 THEN 1
        |                ELSE 0 END AS brk
        |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu)
        |), sess AS (
        |    SELECT user_id, tsu,
        |           SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |    FROM m
        |)
        |SELECT user_id, MIN(tsu) AS session_start_us, COUNT(*) AS cnt
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       length(replace(text, ' ', '')) AS n_nonspace
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """WITH tok AS (
        |    SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |)
        |SELECT doc_id, len(tokens) AS n_tokens,
        |       len(list_filter(tokens,
        |           tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) AS stop_cnt,
        |       CAST(len(list_filter(tokens,
        |           tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
        |           / CAST(len(tokens) AS DOUBLE) AS stop_ratio,
        |       CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |           / CAST(len(tokens) AS DOUBLE) AS mean_token_len
        |FROM tok ORDER BY doc_id""".stripMargin,
    // script-histogram lang ID: per-script codepoint counts over the same
    // CJK enrichment, replayed with identical character-class strips
    // (all ranges are single-unit BMP, so UTF-16 length == codepoint
    // length); strict-argmax guess with ties -> 'und'
    "q_lang_id_script" ->
      """WITH ex AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 3 = 0
        |                THEN text || ' 안녕 세계' ||
        |                     repeat('中', CAST(doc_id % 4 + 1 AS INT)) || 'tail'
        |                ELSE text END AS enriched
        |    FROM documents
        |), scored AS (
        |    SELECT doc_id,
        |      CAST(length(regexp_replace(enriched, '[^一-鿿]', '', 'g')) AS INTEGER) AS han_chars,
        |      CAST(length(regexp_replace(enriched, '[^가-힯ᄀ-ᇿ㄰-㆏]', '', 'g')) AS INTEGER) AS hangul_chars,
        |      CAST(length(regexp_replace(enriched, '[^぀-ヿ]', '', 'g')) AS INTEGER) AS kana_chars,
        |      CAST(length(regexp_replace(enriched, '[^A-Za-z]', '', 'g')) AS INTEGER) AS latin_chars
        |    FROM ex
        |)
        |SELECT doc_id, han_chars, hangul_chars, kana_chars, latin_chars,
        |       CASE WHEN han_chars > greatest(hangul_chars, kana_chars, latin_chars) THEN 'han'
        |            WHEN hangul_chars > greatest(han_chars, kana_chars, latin_chars) THEN 'hangul'
        |            WHEN kana_chars > greatest(han_chars, hangul_chars, latin_chars) THEN 'kana'
        |            WHEN latin_chars > greatest(han_chars, hangul_chars, kana_chars) THEN 'latin'
        |            ELSE 'und' END AS script_guess
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """WITH tok AS (
        |    SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), scored AS (
        |    SELECT doc_id, lang,
        |      CAST(len(list_filter(tokens, t -> t IN ('the','a','of','and'))) AS INTEGER) AS en_score,
        |      CAST(len(list_filter(tokens, t -> t IN ('der','die','und','das'))) AS INTEGER) AS de_score,
        |      CAST(len(list_filter(tokens, t -> t IN ('el','la','los','que'))) AS INTEGER) AS es_score,
        |      CAST(len(list_filter(tokens, t -> t IN ('le','la','les','et'))) AS INTEGER) AS fr_score
        |    FROM tok
        |)
        |SELECT doc_id, lang, en_score, de_score, es_score, fr_score,
        |       CASE WHEN en_score > greatest(de_score, es_score, fr_score) THEN 'en'
        |            WHEN de_score > greatest(en_score, es_score, fr_score) THEN 'de'
        |            WHEN es_score > greatest(en_score, de_score, fr_score) THEN 'es'
        |            WHEN fr_score > greatest(en_score, de_score, es_score) THEN 'fr'
        |            ELSE 'und' END AS lang_guess
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q_dedup_exact_text" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt FROM documents
        |GROUP BY sha256(lower(trim(text))) ORDER BY doc_id""".stripMargin,
    // transitive dedup clusters: the iterative label-propagation engine
    // result must equal DuckDB's declarative recursive-CTE closure
    "q_dedup_clusters" ->
      """WITH RECURSIVE
        |bounds AS (SELECT max(doc_id) AS mx FROM documents),
        |e AS (
        |    SELECT doc_id AS src, doc_id + 1 AS dst FROM documents, bounds
        |    WHERE doc_id % 10 <> 9 AND doc_id + 1 <= mx
        |      AND doc_id + 1 IN (SELECT doc_id FROM documents)
        |    UNION ALL
        |    SELECT doc_id AS src, doc_id + 2 AS dst FROM documents, bounds
        |    WHERE doc_id % 10 < 5 AND doc_id + 2 <= mx
        |      AND doc_id + 2 IN (SELECT doc_id FROM documents)
        |),
        |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |reach(id, r) AS (
        |    SELECT doc_id, doc_id FROM documents
        |    UNION
        |    SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id
        |)
        |SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach
        |GROUP BY id ORDER BY doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH tok AS (
        |    SELECT doc_id, lang,
        |           list_distinct(string_split_regex(trim(text), '\s+')) AS token_set
        |    FROM documents
        |), pairs AS (
        |    SELECT p.doc_id AS probe_id, c.doc_id AS other_id,
        |           CAST(len(list_intersect(p.token_set, c.token_set)) AS DOUBLE)
        |             / CAST(len(list_distinct(list_concat(p.token_set, c.token_set))) AS DOUBLE)
        |             AS jacc
        |    FROM tok p JOIN tok c ON p.lang = c.lang AND p.doc_id <> c.doc_id
        |    WHERE p.doc_id < 10
        |), ranked AS (
        |    SELECT probe_id, other_id, jacc,
        |           row_number() OVER (PARTITION BY probe_id
        |                              ORDER BY jacc DESC, other_id ASC) AS rnk
        |    FROM pairs
        |)
        |SELECT probe_id, rnk, other_id, jacc FROM ranked WHERE rnk <= 3
        |ORDER BY probe_id, rnk""".stripMargin,
    "q_redact_pii" ->
      """WITH enriched AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 7 = 0
        |                THEN text || ' contact admin@example.com or https://example.com/data?id='
        |                          || CAST(doc_id AS VARCHAR)
        |                ELSE text END AS text2
        |    FROM documents
        |)
        |SELECT doc_id,
        |       len(regexp_extract_all(text2,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |       len(regexp_extract_all(text2, 'https?://[^\s]+')) AS n_urls,
        |       regexp_replace(
        |           regexp_replace(text2, 'https?://[^\s]+', '<URL>', 'g'),
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
        |           AS redacted
        |FROM enriched ORDER BY doc_id""".stripMargin,
    // keyed pseudonymization: identical enrichment, identical salt
    // constant, identical SORTED fold order — list_reduce seeds the fold
    // with the text via list_prepend, and replace/md5/substr agree
    // byte-for-byte between the engines
    "q_pseudonymize_pii" ->
      s"""WITH enriched AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 7 = 0
        |                THEN text || ' contact user' || CAST(doc_id % 23 AS VARCHAR)
        |                          || '@example.com or ops' || CAST(doc_id % 5 AS VARCHAR)
        |                          || '@corp.org for access'
        |                ELSE text END AS text2
        |    FROM documents
        |), m AS (
        |    -- length-desc fold order via the same 999-len prefix key the
        |    -- engine uses (nesting-safe: longer addresses rewrite first)
        |    SELECT doc_id, text2,
        |           list_transform(list_sort(list_transform(
        |             list_distinct(regexp_extract_all(text2,
        |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')),
        |             x -> lpad(CAST(999 - len(x) AS VARCHAR), 3, '0') || x)),
        |             k -> substr(k, 4)) AS ms
        |    FROM enriched
        |)
        |SELECT doc_id,
        |       CAST(len(ms) AS BIGINT) AS n_pii,
        |       len(regexp_extract_all(text2,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_matches,
        |       list_reduce(list_prepend(text2, ms), (acc, x) -> replace(acc, x,
        |           '<EMAIL_' || substr(md5('${graft.ops.TextOps.PseudoSalt}' || lower(x)), 1, 10) || '>'))
        |           AS pseudo_text,
        |       COALESCE(array_to_string(list_transform(ms, x ->
        |           '<EMAIL_' || substr(md5('${graft.ops.TextOps.PseudoSalt}' || lower(x)), 1, 10) || '>'), ' '), '')
        |           AS tokens_cat
        |FROM m ORDER BY doc_id""".stripMargin,
    // ε=ln3 randomized response: every deterministic coin recomputed, the
    // debiased per-mille estimator replayed with negatives clamped before
    // division (Spark div truncates, DuckDB // floors — never let them
    // see a negative numerator)
    "q_rr_privatize" ->
      s"""WITH rep AS (
        |    SELECT source,
        |           CAST(lang = 'en' AS INT) AS truth,
        |           CASE WHEN substr(md5('${graft.ops.PrivacyOps.RrSalt}'
        |                    || CAST(doc_id AS VARCHAR)), 1, 1)
        |                    IN ('0','4','8','c') THEN 1 ELSE 0 END AS flip
        |    FROM documents
        |), r2 AS (
        |    SELECT source,
        |           CASE WHEN flip = 1 THEN 1 - truth ELSE truth END
        |               AS reported
        |    FROM rep
        |), a AS (
        |    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(reported) AS BIGINT) AS n_reported
        |    FROM r2 GROUP BY 1
        |)
        |SELECT source, n, n_reported,
        |       CAST(CASE WHEN 2000 * n_reported - 500 * n <= 0 THEN 0
        |            WHEN 2000 * n_reported - 500 * n >= 1000 * n THEN 1000
        |            ELSE (2000 * n_reported - 500 * n) // n END AS BIGINT)
        |           AS est_permille
        |FROM a ORDER BY source""".stripMargin,
    // k-anonymity / l-diversity: class stats over the generalized QI
    // tuple, suppression decisions replayed row-for-row
    "q_k_anonymity" ->
      s"""WITH g AS (
        |    SELECT doc_id, source, lang,
        |           LEAST(length(text) // 100, 9) AS len_decile
        |    FROM documents
        |), cls AS (
        |    SELECT lang, len_decile,
        |           CAST(COUNT(*) AS BIGINT) AS class_n,
        |           CAST(COUNT(DISTINCT source) AS BIGINT) AS class_l
        |    FROM g GROUP BY 1, 2
        |), j AS (
        |    SELECT g.*, cls.class_n, cls.class_l,
        |           CAST(cls.class_n < ${graft.ops.PrivacyOps.KAnon}
        |                OR cls.class_l < ${graft.ops.PrivacyOps.LDiv}
        |               AS INT) AS suppress
        |    FROM g JOIN cls USING (lang, len_decile)
        |)
        |SELECT doc_id,
        |       CASE WHEN suppress = 1 THEN '*' ELSE lang END AS rel_lang,
        |       CAST(CASE WHEN suppress = 1 THEN -1 ELSE len_decile END
        |           AS BIGINT) AS rel_decile,
        |       source AS sensitive_source,
        |       class_n, class_l, suppress
        |FROM j ORDER BY doc_id""".stripMargin,
    "q_doc_chunking" ->
      """WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), starts AS (
        |    SELECT doc_id, tokens,
        |           unnest(range(0, len(tokens), 24)) AS start,
        |           generate_subscripts(range(0, len(tokens), 24), 1) - 1 AS chunk_idx
        |    FROM tok
        |)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       len(list_slice(tokens, start + 1, start + 32)) AS n_chunk_tokens,
        |       array_to_string(list_slice(tokens, start + 1, start + 32), ' ')
        |           AS chunk_text
        |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_corpus_clean" ->
      """WITH tok AS (
        |    SELECT doc_id, lang, text,
        |           string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), stats AS (
        |    SELECT doc_id, lang, text, len(tokens) AS n_tokens,
        |           CAST(len(list_filter(tokens,
        |               tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
        |             / CAST(len(tokens) AS DOUBLE) AS stop_ratio
        |    FROM tok
        |), survivors AS (
        |    SELECT MIN(doc_id) AS doc_id FROM documents
        |    GROUP BY sha256(lower(trim(text)))
        |)
        |SELECT doc_id, lang, n_tokens, stop_ratio
        |FROM stats
        |WHERE doc_id IN (SELECT doc_id FROM survivors)
        |  AND n_tokens >= 20 AND stop_ratio >= 0.05 AND stop_ratio <= 0.6
        |ORDER BY doc_id""".stripMargin,
    "q_percentile_status" ->
      // same pure-integer order-statistic selection as the Spark side:
      // built-in quantile_cont would interpolate through binary doubles
      // with an engine-specific formula (1-ulp drift on half results)
      """WITH freq AS (
        |    SELECT o_orderstatus,
        |           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |           COUNT(*) AS cnt
        |    FROM orders GROUP BY 1, 2
        |), cum AS (
        |    SELECT o_orderstatus, cents,
        |           SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY cents
        |                          ROWS UNBOUNDED PRECEDING) AS cum,
        |           SUM(cnt) OVER (PARTITION BY o_orderstatus) AS n
        |    FROM freq
        |), pos AS (
        |    SELECT *,
        |           (n - 1) * 5 // 10 AS idx50, (n - 1) * 5 % 10 AS frac50,
        |           (n - 1) * 9 // 10 AS idx90, (n - 1) * 9 % 10 AS frac90
        |    FROM cum
        |), sel AS (
        |    SELECT o_orderstatus, MAX(n) AS n_orders,
        |           MIN(CASE WHEN cum > idx50 THEN cents END) AS lo50,
        |           MIN(CASE WHEN cum > idx50 + 1 THEN cents END) AS hi50,
        |           MAX(frac50) AS f50,
        |           MIN(CASE WHEN cum > idx90 THEN cents END) AS lo90,
        |           MIN(CASE WHEN cum > idx90 + 1 THEN cents END) AS hi90,
        |           MAX(frac90) AS f90
        |    FROM pos GROUP BY 1
        |)
        |SELECT o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders,
        |       CAST(lo50 * (10 - f50) + COALESCE(hi50, lo50) * f50 AS BIGINT)
        |         AS p50_x10,
        |       CAST(lo90 * (10 - f90) + COALESCE(hi90, lo90) * f90 AS BIGINT)
        |         AS p90_x10
        |FROM sel ORDER BY o_orderstatus""".stripMargin,
    "q_unicode_nfc" ->
      """WITH e AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 5 = 0 THEN text || ' cafe' || chr(769)
        |                ELSE text END AS enriched
        |    FROM documents
        |)
        |SELECT doc_id, length(enriched) AS n_raw,
        |       length(nfc_normalize(enriched)) AS n_nfc,
        |       md5(nfc_normalize(enriched)) AS nfc_md5
        |FROM e ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH probes AS (
        |    SELECT substr(text, 10, 40) AS probe FROM documents
        |    WHERE doc_id % 100 = 7 AND length(text) >= 60
        |)
        |SELECT d.doc_id, COUNT(*) AS n_hits
        |FROM documents d, probes p
        |WHERE position(p.probe IN d.text) > 0
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "q_sample_stratified" ->
      """WITH ranked AS (
        |    SELECT lang, doc_id,
        |           row_number() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |             AS sample_rank
        |    FROM documents
        |)
        |SELECT lang, doc_id, sample_rank FROM ranked
        |WHERE sample_rank <= 20 ORDER BY lang, sample_rank""".stripMargin,
    // deterministic holdout split: leading 16 bits of the stratum-salted
    // md5 key on the 1000-bucket grid (the exportShuffle hex-digit idiom)
    "q_split_assign" ->
      s"""WITH keyed AS (
        |    SELECT doc_id, lang, source,
        |           md5(lang || '|' || source || '|' || CAST(doc_id AS VARCHAR))
        |               AS sk
        |    FROM documents
        |), b AS (
        |    SELECT doc_id, lang, source,
        |           CAST(((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 4096
        |                 + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1) * 256
        |                 + (strpos('0123456789abcdef', substr(sk, 3, 1)) - 1) * 16
        |                 + (strpos('0123456789abcdef', substr(sk, 4, 1)) - 1))
        |                % ${ops.SamplingOps.SplitBuckets} AS INT) AS bucket
        |    FROM keyed
        |)
        |SELECT doc_id, lang, source, bucket,
        |       CASE WHEN bucket < ${ops.SamplingOps.TrainPerMille} THEN 'train'
        |            WHEN bucket < ${ops.SamplingOps.ValPerMille} THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // SamplingOps.MixUnit / ExportShards are interpolated, not hardcoded:
    // a constant change on the engine side must break COMPILATION of
    // nothing and the oracle of nothing — both sides read the same value.
    "q_mix_weighted" ->
      s"""WITH ranked AS (
        |    SELECT source, doc_id,
        |           (1 + CAST(substr(source, 4) AS INT) % 3) * ${SamplingOps.MixUnit} AS quota,
        |           row_number() OVER (PARTITION BY source
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |             AS mix_rank
        |    FROM documents
        |)
        |SELECT source, doc_id, mix_rank FROM ranked
        |WHERE mix_rank <= quota ORDER BY source, mix_rank""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (
        |    SELECT doc_id, GREATEST(n_chars // 4, 1) AS tokens FROM documents
        |), c AS (
        |    SELECT doc_id, tokens,
        |           SUM(tokens) OVER (ORDER BY doc_id
        |               ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM t
        |)
        |SELECT doc_id, tokens,
        |       CAST((cum - tokens) // 512 AS BIGINT) AS seq_id
        |FROM c ORDER BY doc_id""".stripMargin,
    // rarity filter core: numerator/denominator as exact integers
    "q_mean_token_freq" ->
      """WITH tok AS (
        |    SELECT doc_id,
        |           unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents
        |), tf AS (
        |    SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        |), cf AS (
        |    SELECT token, SUM(tf) AS cf FROM tf GROUP BY 1
        |)
        |SELECT tf.doc_id,
        |       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
        |       CAST(SUM(tf.tf * cf.cf) AS BIGINT) AS freq_sum
        |FROM tf JOIN cf USING (token)
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin,
    // CCNet-style bigram-LM quality filter, log-free: the oracle retrains
    // the same add-one-smoothed LM and replays the fixed-point inverse-
    // probability scores and the cross-multiplied corpus-mean keep rule
    // in exact integer arithmetic (div / //)
    "q_perplexity_filter" -> perplexityFilterOracle,
    "q_bpe_tokenize" -> bpeTokenizeOracle,
    // tokenizer health: re-apply the health run's own materialized merge
    // table, then per-language integer fertility / char-fallback ratios
    "q_tokenizer_health" ->
      s"""WITH RECURSIVE
         |${bpeAppliedCteFrom("bpe_merges_health")}
         |, st AS (
         |    SELECT b.doc_id, d.lang,
         |           CAST(len(b.toks) AS BIGINT) AS n_words,
         |           CAST(CASE WHEN length(a.pieces) = 0 THEN 0
         |                ELSE len(string_split(a.pieces, ' ')) END AS BIGINT)
         |               AS n_pieces,
         |           CAST(CASE WHEN length(a.pieces) = 0 THEN 0
         |                ELSE len(list_filter(string_split(a.pieces, ' '),
         |                         p -> length(p) = 1)) END AS BIGINT)
         |               AS n_single
         |    FROM base b
         |    JOIN agg a USING (doc_id)
         |    JOIN documents d USING (doc_id)
         |)
         |SELECT lang,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_words) AS BIGINT) AS total_words,
         |       CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
         |       CAST(SUM(n_single) AS BIGINT) AS total_single,
         |       CAST(CASE WHEN SUM(n_words) = 0 THEN 0
         |            ELSE (1000 * SUM(n_pieces)) // SUM(n_words) END
         |           AS BIGINT) AS fertility_permille,
         |       CAST(CASE WHEN SUM(n_pieces) = 0 THEN 0
         |            ELSE (1000 * SUM(n_single)) // SUM(n_pieces) END
         |           AS BIGINT) AS char_fallback_permille
         |FROM st GROUP BY lang ORDER BY lang""".stripMargin,
    "q_pack_sequences_bpe" -> packSequencesBpeOracle,
    // seed-referenced NB quality classifier: deterministic training ⇒ the
    // oracle RETRAINS the same add-one-smoothed class-rate ratios and
    // replays the fixed-point token-mean + cross-multiplied keep rule
    "q_quality_classifier" -> qualityClassifierOracle,
    // heuristic corpus clean ∩ classifier keep (GPT-3 pipeline order)
    "q_corpus_clean_qc" ->
      s"""WITH $qcKeptCte
        |, tokc AS (
        |    SELECT doc_id, lang, text,
        |           string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), stats AS (
        |    SELECT doc_id, lang, text, len(tokens) AS n_tokens,
        |           CAST(len(list_filter(tokens,
        |               tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
        |             / CAST(len(tokens) AS DOUBLE) AS stop_ratio
        |    FROM tokc
        |), survivors AS (
        |    SELECT MIN(doc_id) AS doc_id FROM documents
        |    GROUP BY sha256(lower(trim(text)))
        |)
        |SELECT doc_id, lang, n_tokens, stop_ratio
        |FROM stats
        |WHERE doc_id IN (SELECT doc_id FROM survivors)
        |  AND n_tokens >= 20 AND stop_ratio >= 0.05 AND stop_ratio <= 0.6
        |  AND doc_id IN (SELECT doc_id FROM qckept)
        |ORDER BY doc_id""".stripMargin,
    // stored-LM serving: deterministic training ⇒ build-then-serve on the
    // same corpus must land on EXACTLY the in-session filter's rows, so
    // the serve path shares the filter's full-replay oracle verbatim —
    // a green row proves the warehouse round-trip (counts, vocab,
    // threshold) loses nothing
    "q_perplexity_serve" -> perplexityFilterOracle,
    // corpus clean ∘ perplexity gate: the oracle replays BOTH halves —
    // dedup keep-lowest + heuristic quality, intersected with the LM's
    // integer keep set
    "q_corpus_clean_ppx" ->
      """WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), vocab AS (
        |    SELECT COUNT(DISTINCT w) AS v
        |    FROM (SELECT unnest(toks) AS w FROM base)
        |), tok2 AS (
        |    SELECT doc_id, unnest(toks) AS w,
        |           unnest(range(1, len(toks)+1)) AS pos
        |    FROM base WHERE len(toks) >= 2
        |), pw AS (
        |    SELECT a.doc_id, a.w AS prev, b.w AS w
        |    FROM tok2 a JOIN tok2 b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), c2 AS (SELECT prev, w, COUNT(*) AS c2 FROM pw GROUP BY 1, 2),
        |c1 AS (SELECT prev, COUNT(*) AS c1 FROM pw GROUP BY 1),
        |doc AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
        |           CAST(SUM((1000 * (c1.c1 + (SELECT v FROM vocab)))
        |                    // (c2.c2 + 1)) AS BIGINT) AS score_sum
        |    FROM pw JOIN c2 USING (prev, w) JOIN c1 USING (prev)
        |    GROUP BY doc_id
        |), doc2 AS (
        |    SELECT doc_id, n_trans, score_sum // n_trans AS ppx_score FROM doc
        |), tot AS (
        |    SELECT CAST(SUM(ppx_score) AS BIGINT) AS tot, COUNT(*) AS n FROM doc2
        |), kept AS (
        |    SELECT doc_id FROM doc2
        |    WHERE ppx_score * (SELECT n FROM tot) <= (SELECT tot FROM tot)
        |), tok AS (
        |    SELECT doc_id, lang, text,
        |           string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), stats AS (
        |    SELECT doc_id, lang, text, len(tokens) AS n_tokens,
        |           CAST(len(list_filter(tokens,
        |               tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
        |             / CAST(len(tokens) AS DOUBLE) AS stop_ratio
        |    FROM tok
        |), survivors AS (
        |    SELECT MIN(doc_id) AS doc_id FROM documents
        |    GROUP BY sha256(lower(trim(text)))
        |)
        |SELECT doc_id, lang, n_tokens, stop_ratio
        |FROM stats
        |WHERE doc_id IN (SELECT doc_id FROM survivors)
        |  AND n_tokens >= 20 AND stop_ratio >= 0.05 AND stop_ratio <= 0.6
        |  AND doc_id IN (SELECT doc_id FROM kept)
        |ORDER BY doc_id""".stripMargin,
    // semantic decontamination: the knn oracle's exact in-order cosine
    // fold against the eval subset — bit-identical cosines make the
    // threshold boundary engine-stable; output is integer hit counts
    "q_semantic_decontam" ->
      """WITH nrm AS (
        |    SELECT vec_id, embedding,
        |           sqrt(list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |             (a, b) -> a + b)) AS l2
        |    FROM embeddings
        |), ev AS (
        |    SELECT vec_id, embedding, l2 FROM nrm WHERE vec_id % 100 = 7
        |), co AS (
        |    SELECT vec_id, embedding, l2 FROM nrm WHERE vec_id % 100 <> 7
        |), pairs AS (
        |    SELECT co.vec_id,
        |           list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(range(1, len(co.embedding) + 1),
        |                 i -> CAST(co.embedding[i] AS DOUBLE)
        |                      * CAST(ev.embedding[i] AS DOUBLE))),
        |             (a, b) -> a + b) / (co.l2 * ev.l2) AS cosine
        |    FROM co, ev
        |)
        |SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits
        |FROM pairs WHERE cosine >= 0.3
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    // span-coverage dedup signal: tokens covered by corpus-duplicated
    // 5-grams (Lee et al. substring dedup, integer form); DISTINCT is
    // applied in a subquery AFTER the position unnest on both engines
    "q_span_coverage" ->
      """WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), st AS (
        |    SELECT doc_id,
        |           unnest(range(1, len(toks) - 3)) AS pos,
        |           unnest(list_transform(range(1, len(toks) - 3),
        |                  i -> array_to_string(toks[i:i+4], ' '))) AS g
        |    FROM base WHERE len(toks) >= 5
        |), dup AS (
        |    SELECT g FROM (SELECT DISTINCT doc_id, g FROM st)
        |    GROUP BY g HAVING COUNT(*) >= 2
        |), cov AS (
        |    SELECT DISTINCT doc_id, p FROM (
        |        SELECT doc_id, unnest(range(pos, pos + 5)) AS p
        |        FROM st WHERE g IN (SELECT g FROM dup))
        |), covc AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS covered FROM cov
        |    GROUP BY doc_id
        |), nt AS (
        |    SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM base
        |)
        |SELECT nt.doc_id, nt.n_tokens,
        |       CAST(COALESCE(covc.covered, 0) AS BIGINT) AS covered_tokens,
        |       CASE WHEN COALESCE(covc.covered, 0) * 5 < nt.n_tokens
        |            THEN 1 ELSE 0 END AS keep
        |FROM nt LEFT JOIN covc USING (doc_id) ORDER BY doc_id""".stripMargin,
    // MP4 frame sampling: the engine walks the REAL crafted sample
    // tables (stts run-length decode, stsz sizes, stsc×stco chunk
    // offsets); the oracle replays the same arithmetic from the fixture's
    // doc_id formulas — run-length pts, per-doc prefix-sum offsets,
    // every-k-th selection, integer ms division
    "q_frame_sample" ->
      """WITH par AS (
        |    SELECT doc_id, 5 + doc_id % 40 AS n,
        |           1000 + doc_id % 9000 AS tsc,
        |           100 + doc_id % 50 AS d1,
        |           48 + doc_id % 64 AS base,
        |           1 + doc_id % 4 AS k
        |    FROM documents
        |), s AS (
        |    SELECT doc_id, unnest(range(0, n)) AS i, n, tsc, d1, base, k
        |    FROM par
        |), e AS (
        |    SELECT *, (n + 1) // 2 AS run1,
        |           100 + ((doc_id + i) % 37) AS sz
        |    FROM s
        |), f AS (
        |    SELECT *,
        |           CASE WHEN i < run1 THEN i * d1
        |                ELSE run1 * d1 + (i - run1) * (d1 + 25) END AS pts,
        |           COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS presum
        |    FROM e
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(pts * 1000 // tsc AS BIGINT) AS ts_ms,
        |       CAST(base + presum AS BIGINT) AS "offset",
        |       CAST(sz AS BIGINT) AS size
        |FROM f WHERE i % k = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    // keyframe extraction: the engine reads the REAL stss sync-sample
    // box (absent box = ISO default, every sample sync); the oracle
    // replays the stride rule from the fixture formulas — docs with
    // doc_id % 5 = 0 craft no stss and must yield every sample
    "q_keyframe_sample" ->
      """WITH par AS (
        |    SELECT doc_id, 5 + doc_id % 40 AS n,
        |           1000 + doc_id % 9000 AS tsc,
        |           100 + doc_id % 50 AS d1,
        |           48 + doc_id % 64 AS base,
        |           2 + doc_id % 4 AS j
        |    FROM documents
        |), s AS (
        |    SELECT doc_id, unnest(range(0, n)) AS i, n, tsc, d1, base, j
        |    FROM par
        |), e AS (
        |    SELECT *, (n + 1) // 2 AS run1,
        |           100 + ((doc_id + i) % 37) AS sz
        |    FROM s
        |), f AS (
        |    SELECT *,
        |           CASE WHEN i < run1 THEN i * d1
        |                ELSE run1 * d1 + (i - run1) * (d1 + 25) END AS pts,
        |           COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS presum
        |    FROM e
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       CAST(pts * 1000 // tsc AS BIGINT) AS ts_ms,
        |       CAST(base + presum AS BIGINT) AS "offset",
        |       CAST(sz AS BIGINT) AS size
        |FROM f WHERE doc_id % 5 = 0 OR i % j = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // Gopher repetition/format quality rules over the crafted line view:
    // the oracle reconstructs the lines, replays the per-(doc, line)
    // occurrence counts, the format-line counts and the integer
    // cross-multiplied keep rule
    "q_gopher_quality" ->
      s"""WITH $craftedLinesCte,
        |l AS (
        |    SELECT doc_id, unnest(string_split(crafted, chr(10))) AS line
        |    FROM crafted
        |), pl AS (
        |    SELECT doc_id, line, COUNT(*) AS c FROM l GROUP BY 1, 2
        |), la AS (
        |    SELECT doc_id,
        |           CAST(SUM(c) AS BIGINT) AS n_lines,
        |           CAST(SUM(c - 1) AS BIGINT) AS n_dup_lines,
        |           CAST(SUM((c - 1) * length(line)) AS BIGINT) AS dup_chars,
        |           CAST(SUM(CASE WHEN line LIKE '- %' THEN c ELSE 0 END)
        |                AS BIGINT) AS n_bullet,
        |           CAST(SUM(CASE WHEN line LIKE '%...' THEN c ELSE 0 END)
        |                AS BIGINT) AS n_ellipsis
        |    FROM pl GROUP BY 1
        |), tk AS (
        |    SELECT doc_id,
        |           CAST(len(string_split_regex(trim(crafted), '\\s+')) AS INT)
        |               AS n_tokens,
        |           CAST(length(regexp_replace(crafted, '\\s', '', 'g')) AS INT)
        |               AS n_nonspace
        |    FROM crafted
        |)
        |SELECT doc_id, n_lines, n_dup_lines, dup_chars, n_bullet,
        |       n_ellipsis, n_tokens, n_nonspace,
        |       CAST(n_dup_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
        |           AS dup_line_frac,
        |       CAST(CASE WHEN n_dup_lines * 10 <= n_lines * 3
        |                  AND n_bullet * 10 <= n_lines * 9
        |                  AND n_ellipsis * 10 <= n_lines * 3
        |                  AND n_tokens BETWEEN 50 AND 100000
        |                  AND n_nonspace >= n_tokens * 3
        |                  AND n_nonspace <= n_tokens * 10
        |            THEN 1 ELSE 0 END AS INT) AS keep
        |FROM la JOIN tk USING (doc_id) ORDER BY doc_id""".stripMargin,
    // corpus-level line dedup: the oracle reconstructs the crafted lines,
    // counts distinct docs per md5 line key (the ENGINE's join key, so
    // grouping can never diverge), and replays the rewrite — the cleaned
    // text is compared cell-for-cell
    "q_line_dedup" ->
      s"""WITH $craftedLinesCte,
        |l AS (
        |    SELECT doc_id, unnest(range(1, len(ls) + 1)) AS p,
        |           unnest(ls) AS line
        |    FROM (SELECT doc_id, string_split(crafted, chr(10)) AS ls
        |          FROM crafted)
        |), dup AS (
        |    SELECT lk FROM (
        |        SELECT md5(line) AS lk, COUNT(DISTINCT doc_id) AS df
        |        FROM l GROUP BY 1)
        |    WHERE df >= ${ops.WebTextOps.MinLineDocs}
        |), sel AS (
        |    SELECT doc_id, p, line,
        |           md5(line) IN (SELECT lk FROM dup) AS dropped
        |    FROM l
        |)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_removed,
        |       COALESCE(array_to_string(
        |           list(CASE WHEN NOT dropped THEN line END ORDER BY p)
        |               FILTER (WHERE NOT dropped), chr(10)), '')
        |           AS text_clean
        |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // leakage-safe split: the oracle replays the closure over the
    // materialized pair set (the survivors gate shape) and the md5-bucket
    // assignment on the canonical id
    "q_split_leakage_safe" -> {
      val path = OracleInputs.sqlPath("split_pairs")
      s"""WITH RECURSIVE
         |e AS (SELECT src, dst FROM read_parquet('$path/*.parquet')),
         |sym AS (SELECT src, dst FROM e
         |        UNION SELECT dst AS src, src AS dst FROM e),
         |reach(id, r) AS (
         |    SELECT doc_id, doc_id FROM documents
         |    UNION
         |    SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id
         |),
         |comp AS (SELECT id AS doc_id, MIN(r) AS canonical_id
         |         FROM reach GROUP BY id),
         |k AS (SELECT doc_id, canonical_id,
         |             md5('split|' || CAST(canonical_id AS VARCHAR)) AS sk
         |      FROM comp),
         |b AS (SELECT doc_id, canonical_id,
         |        CAST(((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 4096
         |              + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1) * 256
         |              + (strpos('0123456789abcdef', substr(sk, 3, 1)) - 1) * 16
         |              + (strpos('0123456789abcdef', substr(sk, 4, 1)) - 1))
         |             % ${ops.SamplingOps.SplitBuckets} AS INT) AS bucket
         |      FROM k)
         |SELECT doc_id, canonical_id, bucket,
         |       CASE WHEN bucket < ${ops.SamplingOps.TrainPerMille} THEN 'train'
         |            WHEN bucket < ${ops.SamplingOps.ValPerMille} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin
    },
    // HTML boilerplate extraction: the oracle reconstructs the crafted
    // wrapper, strips script/style blocks (same lazy dot-all regex), tags
    // to spaces, decodes the entity table in the same order and collapses
    // whitespace — the extracted text is compared cell-for-cell
    "q_html_extract" ->
      """WITH h AS (
        |    SELECT doc_id,
        |           '<html><head><script type="text/javascript">var t = 1;'
        |           || '</script><style>.x{color:red;}</style><title>'
        |           || source || ' ' || CAST(doc_id AS VARCHAR)
        |           || '</title></head><body><nav><a href="/">Home</a> | '
        |           || '<a href="/about">About</a></nav><h1>Doc '
        |           || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || '</p>'
        |           || CASE WHEN doc_id % 3 = 0 THEN
        |                '<div class="ad">Buy now &amp; save &lt;50%&gt;</div>'
        |              ELSE '' END
        |           || '<footer>&copy; 2024 ' || source
        |           || '</footer></body></html>' AS html
        |    FROM documents
        |), s1 AS (
        |    SELECT doc_id, html, regexp_replace(html,
        |             '(?is)<head>.*?</head>|<script.*?</script>|<style.*?</style>',
        |             '', 'g') AS x
        |    FROM h
        |), s2 AS (
        |    SELECT doc_id, html,
        |           regexp_replace(x, '<[^>]*>', ' ', 'g') AS x
        |    FROM s1
        |), s3 AS (
        |    SELECT doc_id, html,
        |           replace(replace(replace(replace(replace(replace(x,
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&#39;', ''''), '&copy;', '©'), '&amp;', '&') AS x
        |    FROM s2
        |), s4 AS (
        |    SELECT doc_id, html,
        |           trim(regexp_replace(x, '\s+', ' ', 'g')) AS text_main,
        |           regexp_extract(html, '(?is)<title>(.*?)</title>', 1)
        |               AS title
        |    FROM s3
        |)
        |SELECT doc_id, title,
        |       CAST(length(html) AS INT) AS n_chars_html,
        |       CAST(length(text_main) AS INT) AS n_chars_text,
        |       CAST(length(text_main) * 1000 // length(html) AS BIGINT)
        |           AS text_permille,
        |       text_main
        |FROM s4 ORDER BY doc_id""".stripMargin,
    // url canonicalization: the oracle reconstructs the crafted url and
    // replays parse, host/port/www normalization, trailing-slash strip,
    // tracking-param filter and the public-suffix label arithmetic
    "q_url_normalize" ->
      """WITH u AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 7 = 0 THEN
        |             'https://Sub.' || source || '.CO.UK/Path/'
        |               || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&id='
        |               || CAST(doc_id AS VARCHAR) || '#top'
        |           ELSE
        |             'HTTPS://WWW.' || source || '.COM:443/Path/'
        |               || CAST(doc_id AS VARCHAR) || '?id='
        |               || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
        |               || CASE WHEN doc_id % 3 = 0 THEN '&ref=promo'
        |                  ELSE '' END
        |           END AS url
        |    FROM documents
        |), p AS (
        |    SELECT doc_id, url,
        |           lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |           lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1))
        |               AS hostport,
        |           regexp_extract(url, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1)
        |               AS path,
        |           regexp_extract(url, '\?([^#]*)', 1) AS query
        |    FROM u
        |), hn AS (
        |    SELECT doc_id, url, scheme,
        |           regexp_replace(regexp_replace(hostport, ':443$', ''),
        |                          '^www\.', '') AS host,
        |           CASE WHEN path = '' THEN '/'
        |                ELSE regexp_replace(path, '(.)/$', '\1') END
        |               AS path_norm,
        |           array_to_string(list_filter(string_split(query, '&'),
        |             x -> NOT (starts_with(x, 'utm_')
        |                       OR starts_with(x, 'ref=') OR x = '')), '&')
        |               AS query_norm
        |    FROM p
        |), rd AS (
        |    SELECT *, string_split(host, '.') AS labels,
        |           CASE WHEN host LIKE '%.co.uk' THEN 3 ELSE 2 END AS k
        |    FROM hn
        |)
        |SELECT doc_id, url, scheme, host, path_norm, query_norm,
        |       array_to_string(labels[len(labels)-k+1:len(labels)], '.')
        |           AS registered_domain,
        |       scheme || '://' || host || path_norm ||
        |         CASE WHEN query_norm = '' THEN ''
        |              ELSE '?' || query_norm END AS norm_url
        |FROM rd ORDER BY doc_id""".stripMargin,
    // per-domain corpus stats: the oracle replays the crafting + suffix
    // arithmetic, the domain aggregation and the exact per-mille share
    "q_domain_stats" ->
      s"""WITH u AS (
        |    SELECT doc_id, lang,
        |           CASE WHEN doc_id % 7 = 0 THEN
        |             lower('Sub.' || source || '.CO.UK')
        |           ELSE lower(source || '.COM') END AS host,
        |           len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        |    FROM documents
        |), rd AS (
        |    SELECT *, string_split(host, '.') AS labels,
        |           CASE WHEN host LIKE '%.co.uk' THEN 3 ELSE 2 END AS k
        |    FROM u
        |), g AS (
        |    SELECT array_to_string(labels[len(labels)-k+1:len(labels)], '.')
        |               AS registered_domain,
        |           CAST(COUNT(*) AS BIGINT) AS n_docs,
        |           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |    FROM rd GROUP BY 1
        |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS corpus_docs
        |           FROM documents)
        |SELECT registered_domain, n_docs, n_langs, total_tokens,
        |       CAST(n_docs * 1000 // corpus_docs AS BIGINT) AS share_permille,
        |       CAST(CASE WHEN n_docs * 1000 // corpus_docs
        |                      > ${ops.UrlOps.SpamSharePerMille}
        |            THEN 1 ELSE 0 END AS INT) AS over_share
        |FROM g, tot ORDER BY registered_domain""".stripMargin,
    // link extraction: the oracle reconstructs the crafted page html,
    // replays the anchor regex, relative-reference resolution and the full
    // url normalization chain per link — compared cell-for-cell
    "q_link_extract" -> ("WITH " + linkCtes +
      """
        |SELECT doc_id, href, anchor, link_url, target_domain,
        |       page_domain, is_external
        |FROM lx ORDER BY doc_id, href""".stripMargin),
    // anchor-text aggregation: same link CTEs, then the (domain, term)
    // count and the top-3 window with the deterministic tie-break
    "q_anchor_text" -> ("WITH " + linkCtes +
      """, at1 AS (
        |    SELECT target_domain,
        |           unnest(string_split(anchor, ' ')) AS term
        |    FROM lx WHERE is_external = 1
        |), at2 AS (
        |    SELECT target_domain, term,
        |           CAST(COUNT(*) AS BIGINT) AS n_mentions
        |    FROM at1 GROUP BY 1, 2
        |), at3 AS (
        |    SELECT target_domain, term, n_mentions,
        |           CAST(row_number() OVER (PARTITION BY target_domain
        |                ORDER BY n_mentions DESC, term) AS INT) AS rnk
        |    FROM at2
        |)
        |SELECT target_domain, term, n_mentions, rnk
        |FROM at3 WHERE rnk <= 3
        |ORDER BY target_domain, rnk""".stripMargin),
    // domain PageRank: the oracle unrolls the engine's 10 exact integer
    // fixed-point rounds as chained CTEs — identical truncating BIGINT
    // arithmetic, so an iterative distributed walk hash-checks against a
    // declarative replay
    "q_pagerank_domains" -> pagerankOracle(10),
    // HITS: the second iterative walk — same exact-integer replay
    // posture, mutually-recursive half-steps with in-band renormalization
    "q_hits_domains" -> hitsOracle(5),
    "q_domain_hops" -> bfsHopsOracle(6),
    "q_communities_lpa" -> lpaOracle(graft.ops.LinkOps.LpaIters),
    // triangle counting: degree-ordered orientation, (lo)-keyed wedge
    // self-join, closing-edge membership in the canonical undirected
    // set — counts and the exact gcc ppm replayed join for join
    "q_triangle_count" -> (domainGraphCtes +
      """, tue AS MATERIALIZED (
        |    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |    FROM edges WHERE src <> dst
        |), tdg AS MATERIALIZED (
        |    SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |        SELECT a AS v FROM tue UNION ALL SELECT b AS v FROM tue
        |    ) GROUP BY 1
        |), tor AS MATERIALIZED (
        |    SELECT CASE WHEN da.deg < db.deg
        |                  OR (da.deg = db.deg AND e.a < e.b)
        |                THEN e.a ELSE e.b END AS lo,
        |           CASE WHEN da.deg < db.deg
        |                  OR (da.deg = db.deg AND e.a < e.b)
        |                THEN e.b ELSE e.a END AS hi
        |    FROM tue e JOIN tdg da ON da.v = e.a JOIN tdg db ON db.v = e.b
        |), tcl AS (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
        |    FROM (SELECT w1.hi AS x, w2.hi AS y
        |          FROM tor w1 JOIN tor w2
        |            ON w1.lo = w2.lo AND w1.hi < w2.hi) w
        |    JOIN tue t ON t.a = LEAST(w.x, w.y) AND t.b = GREATEST(w.x, w.y)
        |)
        |SELECT CAST((SELECT COUNT(*) FROM tdg) AS BIGINT) AS n_vertices,
        |       CAST((SELECT COUNT(*) FROM tue) AS BIGINT) AS n_edges,
        |       CAST((SELECT SUM(deg * (deg - 1) // 2) FROM tdg) AS BIGINT)
        |           AS n_wedges,
        |       CAST((SELECT n_tri FROM tcl) AS BIGINT) AS n_triangles,
        |       CAST(CASE WHEN (SELECT SUM(deg * (deg - 1) // 2) FROM tdg) = 0
        |                 THEN 0
        |                 ELSE 3000000 * (SELECT n_tri FROM tcl)
        |                      // (SELECT SUM(deg * (deg - 1) // 2) FROM tdg)
        |            END AS BIGINT) AS gcc_ppm""".stripMargin),
    // streaming maintenance invariant: the gate folds the back third of
    // the corpus through LinkIngest; the oracle is the FRESH full-corpus
    // walk — a green row proves streamed state ≡ a from-scratch build
    "q_link_graph_incremental" -> pagerankOracle(10),
    // Z-order clustering key: the oracle replays the dimension encoding
    // and the 16-term Morton interleave bit-for-bit
    "q_zorder_key" ->
      s"""WITH ld AS (
         |    SELECT lang,
         |           CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT)
         |               AS lang_idx
         |    FROM (SELECT DISTINCT lang FROM documents)
         |), zd AS (
         |    SELECT doc_id, ld.lang_idx,
         |           CAST(LEAST(n_chars, 65535) AS BIGINT) AS len16
         |    FROM documents d JOIN ld ON ld.lang = d.lang
         |), zk AS (
         |    SELECT doc_id, lang_idx, len16,
         |           CAST(${mortonSqlDuck("lang_idx", "len16")} AS BIGINT)
         |               AS z_key
         |    FROM zd
         |), mz AS (
         |    SELECT CAST(COALESCE(MAX(z_key), 0) AS BIGINT) AS mz FROM zk
         |)
         |SELECT doc_id, lang_idx, len16, z_key,
         |       CAST(z_key // GREATEST(1, (mz + 1) // 64) AS BIGINT)
         |           AS z_bucket
         |FROM zk CROSS JOIN mz ORDER BY doc_id""".stripMargin,
    // authority-weighted mix: the PageRank CTEs feed per-domain quotas
    // (1 + rank·100 div 1e12, exact integer), drawn by the shared md5
    // permutation — the oracle replays walk, quota and draw end-to-end
    "q_authority_mix" -> (pagerankCtes(10) +
      """, au AS MATERIALIZED (
        |    SELECT v AS domain,
        |           CAST(1 + (r * 100) // 1000000000000 AS BIGINT) AS quota
        |    FROM r10
        |), apd AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 7 = 0 THEN source || '.co.uk'
        |                ELSE source || '.com' END AS domain
        |    FROM documents
        |), ark AS (
        |    SELECT apd.domain, apd.doc_id, au.quota,
        |           row_number() OVER (PARTITION BY apd.domain
        |               ORDER BY md5(CAST(apd.doc_id AS VARCHAR)),
        |                        apd.doc_id) AS mix_rank
        |    FROM apd JOIN au ON au.domain = apd.domain
        |)
        |SELECT domain, doc_id, quota, mix_rank FROM ark
        |WHERE mix_rank <= quota
        |ORDER BY domain, mix_rank""".stripMargin),
    // substring-extent dedup (Lee et al. 2021 output-corpus operator):
    // the oracle replays seed set (duplicated 5-grams, per-doc DISTINCT),
    // interval-union extension (covered flag + lag run starts) and cut
    // arithmetic (runs → one chr(9247) marker, survivors re-joined) —
    // every column incl. the rewritten text is compared cell-for-cell
    "q_substring_dedup" ->
      """WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), pos AS (
        |    SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p,
        |           unnest(toks) AS tok
        |    FROM base
        |), st AS (
        |    SELECT doc_id,
        |           unnest(range(1, len(toks) - 3)) AS pos,
        |           unnest(list_transform(range(1, len(toks) - 3),
        |                  i -> array_to_string(toks[i:i+4], ' '))) AS g
        |    FROM base WHERE len(toks) >= 5
        |), dup AS (
        |    SELECT g FROM (SELECT DISTINCT doc_id, g FROM st)
        |    GROUP BY g HAVING COUNT(*) >= 2
        |), cov AS (
        |    SELECT DISTINCT doc_id, p FROM (
        |        SELECT doc_id, unnest(range(pos, pos + 5)) AS p
        |        FROM st WHERE g IN (SELECT g FROM dup))
        |), m AS (
        |    SELECT pos.doc_id, pos.p, pos.tok,
        |           cov.p IS NOT NULL AS covered
        |    FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id
        |                          AND pos.p = cov.p
        |), r AS (
        |    SELECT *, covered AND NOT COALESCE(
        |               LAG(covered) OVER (PARTITION BY doc_id ORDER BY p),
        |               false) AS new_span
        |    FROM m
        |)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_removed,
        |       CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_spans,
        |       array_to_string(list(
        |           CASE WHEN new_span THEN chr(9247)
        |                WHEN NOT covered THEN tok END ORDER BY p)
        |           FILTER (WHERE new_span OR NOT covered), ' ')
        |           AS text_clean
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // clean-then-excise composition (the Lee et al. pipeline order): the
    // oracle derives the corpus-clean kept set, then replays the whole
    // substring excision OVER THAT RESTRICTION — dup grams counted on the
    // cleaned corpus only
    "q_corpus_clean_spans" ->
      """WITH tokq AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |    FROM documents
        |), gate AS (
        |    SELECT doc_id, len(tk) AS n_tokens,
        |           CAST(len(list_filter(tk,
        |               t -> t IN ('the', 'a', 'of', 'to', 'and'))) AS DOUBLE)
        |             / CAST(len(tk) AS DOUBLE) AS stop_ratio
        |    FROM tokq
        |), survivors AS (
        |    SELECT MIN(doc_id) AS doc_id FROM documents
        |    GROUP BY sha256(lower(trim(text)))
        |), kept AS (
        |    SELECT doc_id FROM gate
        |    WHERE doc_id IN (SELECT doc_id FROM survivors)
        |      AND n_tokens >= 20 AND stop_ratio >= 0.05 AND stop_ratio <= 0.6
        |), base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)
        |), pos AS (
        |    SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p,
        |           unnest(toks) AS tok
        |    FROM base
        |), st AS (
        |    SELECT doc_id,
        |           unnest(range(1, len(toks) - 3)) AS pos,
        |           unnest(list_transform(range(1, len(toks) - 3),
        |                  i -> array_to_string(toks[i:i+4], ' '))) AS g
        |    FROM base WHERE len(toks) >= 5
        |), dup AS (
        |    SELECT g FROM (SELECT DISTINCT doc_id, g FROM st)
        |    GROUP BY g HAVING COUNT(*) >= 2
        |), cov AS (
        |    SELECT DISTINCT doc_id, p FROM (
        |        SELECT doc_id, unnest(range(pos, pos + 5)) AS p
        |        FROM st WHERE g IN (SELECT g FROM dup))
        |), m AS (
        |    SELECT pos.doc_id, pos.p, pos.tok,
        |           cov.p IS NOT NULL AS covered
        |    FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id
        |                          AND pos.p = cov.p
        |), r AS (
        |    SELECT *, covered AND NOT COALESCE(
        |               LAG(covered) OVER (PARTITION BY doc_id ORDER BY p),
        |               false) AS new_span
        |    FROM m
        |)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_removed,
        |       CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_spans,
        |       array_to_string(list(
        |           CASE WHEN new_span THEN chr(9247)
        |                WHEN NOT covered THEN tok END ORDER BY p)
        |           FILTER (WHERE new_span OR NOT covered), ' ')
        |           AS text_clean
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // incremental substring dedup: the oracle replays the FRESH union
    // operator and keeps only batch rows (append-only 2/3 id split) — a
    // green row proves the gram-index path's bit-equality invariant
    "q_substring_dedup_incremental" ->
      """WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), pos AS (
        |    SELECT doc_id, unnest(range(1, len(toks) + 1)) AS p,
        |           unnest(toks) AS tok
        |    FROM base
        |), st AS (
        |    SELECT doc_id,
        |           unnest(range(1, len(toks) - 3)) AS pos,
        |           unnest(list_transform(range(1, len(toks) - 3),
        |                  i -> array_to_string(toks[i:i+4], ' '))) AS g
        |    FROM base WHERE len(toks) >= 5
        |), dup AS (
        |    SELECT g FROM (SELECT DISTINCT doc_id, g FROM st)
        |    GROUP BY g HAVING COUNT(*) >= 2
        |), cov AS (
        |    SELECT DISTINCT doc_id, p FROM (
        |        SELECT doc_id, unnest(range(pos, pos + 5)) AS p
        |        FROM st WHERE g IN (SELECT g FROM dup))
        |), m AS (
        |    SELECT pos.doc_id, pos.p, pos.tok,
        |           cov.p IS NOT NULL AS covered
        |    FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id
        |                          AND pos.p = cov.p
        |), r AS (
        |    SELECT *, covered AND NOT COALESCE(
        |               LAG(covered) OVER (PARTITION BY doc_id ORDER BY p),
        |               false) AS new_span
        |    FROM m
        |)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_removed,
        |       CAST(SUM(CASE WHEN new_span THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_spans,
        |       array_to_string(list(
        |           CASE WHEN new_span THEN chr(9247)
        |                WHEN NOT covered THEN tok END ORDER BY p)
        |           FILTER (WHERE new_span OR NOT covered), ' ')
        |           AS text_clean
        |FROM r
        |WHERE doc_id * 3 >= (SELECT MAX(doc_id) * 2 FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // quality-ranked prefix that fits the token budget; the micro-ratio
    // quality key is integer arithmetic on both sides (div / //)
    "q_token_budget_select" ->
      """WITH q AS (
        |    SELECT doc_id, GREATEST(n_chars // 4, 1) AS tokens,
        |           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                    tk -> tk IN ('the', 'a', 'of', 'to', 'and')))
        |                AS BIGINT) * 1000000
        |             // CAST(len(string_split_regex(trim(text), '\s+'))
        |                  AS BIGINT) AS qm
        |    FROM documents
        |), c AS (
        |    SELECT doc_id, tokens,
        |           SUM(tokens) OVER (ORDER BY qm DESC, doc_id
        |               ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM q
        |)
        |SELECT doc_id, CAST(tokens AS BIGINT) AS n_tokens,
        |       CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum <= 20000 ORDER BY doc_id""".stripMargin,
    // per-source quality-prefix budget fill (same integer quality key)
    "q_budget_mix" ->
      """WITH q AS (
        |    SELECT doc_id, source, GREATEST(n_chars // 4, 1) AS tokens,
        |           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |                    tk -> tk IN ('the', 'a', 'of', 'to', 'and')))
        |                AS BIGINT) * 1000000
        |             // CAST(len(string_split_regex(trim(text), '\s+'))
        |                  AS BIGINT) AS qm
        |    FROM documents
        |), c AS (
        |    SELECT doc_id, source, tokens,
        |           SUM(tokens) OVER (PARTITION BY source
        |               ORDER BY qm DESC, doc_id
        |               ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM q
        |)
        |SELECT doc_id, source, CAST(tokens AS BIGINT) AS n_tokens,
        |       CAST(cum AS BIGINT) AS cum_tokens
        |FROM c WHERE cum <= 1000 ORDER BY doc_id""".stripMargin,
    "q_doc_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           list_transform(range(1, length(text) + 1),
        |                          i -> CAST(ascii(text[i]) AS BIGINT))),
        |         (a, c) -> (a * 31 + c) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_binary_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       sha256(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the fixture crafts REAL container headers with doc_id-derived format
    // and dimensions; the Spark side recovers them with byte-level parsers,
    // so recomputing the derivation here hash-checks the parser round-trip
    "q_multimodal_header" ->
      """SELECT doc_id,
        |       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
        |            WHEN 2 THEN 'jpeg' WHEN 3 THEN 'gif'
        |            WHEN 4 THEN 'webp' ELSE 'tiff' END AS format,
        |       CAST(16 + (doc_id * 7 % 2048) AS INTEGER) AS width,
        |       CAST(16 + (doc_id * 13 % 2048) AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // typed-metadata leg over the same crafted containers: nBytes is the
    // crafted header's compile-time length (per-format CASE) plus the
    // text payload's UTF-8 byte length — the decode stub never fires on
    // this fixture, so the whole projection is oracle arithmetic
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(CASE doc_id % 6 WHEN 0 THEN 24 WHEN 1 THEN 26
        |            WHEN 2 THEN 15 WHEN 3 THEN 10
        |            WHEN 4 THEN 30 ELSE 38 END
        |            + octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp'
        |            WHEN 2 THEN 'jpeg' WHEN 3 THEN 'gif'
        |            WHEN 4 THEN 'webp' ELSE 'tiff' END AS format,
        |       CAST(16 + (doc_id * 7 % 2048) AS INTEGER) AS width,
        |       CAST(16 + (doc_id * 13 % 2048) AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // full-PNG pixel round-trip: the engine deflates+filters a doc_id-
    // derived raster into a REAL PNG and decodes it back (Inflater + all
    // five unfilter branches); pixel (x,y,c) = base + x + y + 3c is bounded
    // under 256, so per-channel sum/min/max have these closed forms — any
    // unfilter or inflate defect breaks the sums
    "q_png_pixel_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), ch AS (SELECT unnest([0, 1, 2, 3]) AS c)
        |SELECT doc_id, CAST(c AS INTEGER) AS channel,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(w * h * (base + 3 * c)
        |            + h * (w * (w - 1) // 2)
        |            + w * (h * (h - 1) // 2) AS BIGINT) AS px_sum,
        |       CAST(base + 3 * c AS INTEGER) AS px_min,
        |       CAST(base + 3 * c + (w - 1) + (h - 1) AS INTEGER) AS px_max
        |FROM d JOIN ch ON c < nch
        |ORDER BY doc_id, channel""".stripMargin,
    // nearest-neighbor resize through the REAL decode: the oracle
    // enumerates the 8×8 destination grid and replays the exact integer
    // index map src = (dst · src_dim) // 8 — a resize that picked
    // different source pixels (round instead of floor, off-by-one grid)
    // hash-mismatches even when coarse statistics survive
    "q_image_resize_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), g AS (SELECT unnest(range(0, 8)) AS dx),
        |gy AS (SELECT unnest(range(0, 8)) AS dy),
        |ch AS (SELECT unnest([0, 1, 2, 3]) AS c),
        |px AS (
        |    SELECT d.doc_id, c,
        |           d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 3 * c AS v
        |    FROM d, g, gy, ch
        |    WHERE c < d.nch
        |)
        |SELECT doc_id, CAST(c AS INTEGER) AS channel,
        |       CAST(64 AS BIGINT) AS n_px,
        |       CAST(SUM(v) AS BIGINT) AS px_sum,
        |       CAST(MIN(v) AS INTEGER) AS px_min,
        |       CAST(MAX(v) AS INTEGER) AS px_max
        |FROM px GROUP BY doc_id, c
        |ORDER BY doc_id, channel""".stripMargin,
    // audio feature-extract over the REAL PCM path: the WAV data chunk is
    // the text's UTF-8 bytes by construction, so the oracle re-derives
    // every signed 16-bit LE sample from a hex-digit fold over
    // encode(text) and replays energy/peak/zero-crossings exactly
    "q_audio_features" ->
      """WITH w AS (
        |    SELECT doc_id, hex(encode(text)) AS hx,
        |           octet_length(encode(text)) AS nb
        |    FROM documents WHERE doc_id % 2 = 0
        |), b AS (
        |    SELECT doc_id,
        |           list_transform(range(1, nb + 1), i ->
        |             (strpos('0123456789ABCDEF',
        |                     substr(hx, CAST(2*i-1 AS INTEGER), 1)) - 1) * 16
        |             + (strpos('0123456789ABCDEF',
        |                       substr(hx, CAST(2*i AS INTEGER), 1)) - 1)) AS bytes
        |    FROM w
        |), s AS (
        |    SELECT doc_id,
        |           list_transform(range(1, len(bytes) // 2 + 1), i ->
        |             CASE WHEN bytes[2*i-1] + 256 * bytes[2*i] >= 32768
        |                  THEN bytes[2*i-1] + 256 * bytes[2*i] - 65536
        |                  ELSE bytes[2*i-1] + 256 * bytes[2*i] END) AS smp
        |    FROM b
        |)
        |SELECT doc_id,
        |       CAST(len(smp) AS BIGINT) AS n_samples,
        |       CAST(list_reduce(
        |              list_prepend(0, list_transform(smp, x -> x * x)),
        |              (a, b) -> a + b) AS BIGINT) AS sq_sum,
        |       CAST(COALESCE(list_max(list_transform(smp, x -> abs(x))), 0)
        |            AS INTEGER) AS peak,
        |       CAST(list_reduce(
        |              list_prepend(0, list_transform(range(2, len(smp) + 1),
        |                i -> CASE WHEN smp[i-1] * smp[i] < 0 THEN 1 ELSE 0 END)),
        |              (a, b) -> a + b) AS BIGINT) AS zero_cross
        |FROM s ORDER BY doc_id""".stripMargin,
    // perceptual-hash image dedup: the oracle replays the whole aHash —
    // thumbnail index map, integer luma, floor mean, strict
    // brighter-than-mean bits as two 32-bit halves — then the keep-lowest
    // canon; doc-arithmetic rasters collide across brightness offsets, so
    // the survivor set is a REAL dedup, not a per-doc identity
    "q_image_dedup_phash" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), g AS (SELECT unnest(range(0, 8)) AS dx),
        |gy AS (SELECT unnest(range(0, 8)) AS dy),
        |cell AS (
        |    SELECT d.doc_id, gy.dy * 8 + g.dx AS i,
        |           CASE WHEN d.nch = 1
        |                THEN d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8
        |                ELSE ((d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8) * 299
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 3) * 587
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 6) * 114)
        |                     // 1000
        |           END AS v
        |    FROM d, g, gy
        |), m AS (
        |    SELECT doc_id, SUM(v) // 64 AS mean FROM cell GROUP BY doc_id
        |), bits AS (
        |    SELECT c.doc_id,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i >= 32
        |                         THEN CAST(1 AS BIGINT) << (c.i - 32)
        |                         ELSE 0 END) AS BIGINT) AS ahash_hi,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i < 32
        |                         THEN CAST(1 AS BIGINT) << c.i
        |                         ELSE 0 END) AS BIGINT) AS ahash_lo
        |    FROM cell c JOIN m USING (doc_id)
        |    GROUP BY c.doc_id
        |)
        |SELECT doc_id, ahash_hi, ahash_lo,
        |       MIN(doc_id) OVER (PARTITION BY ahash_hi, ahash_lo)
        |           AS canonical_id,
        |       CAST(CASE WHEN doc_id = MIN(doc_id)
        |                      OVER (PARTITION BY ahash_hi, ahash_lo)
        |            THEN 1 ELSE 0 END AS INTEGER) AS survives
        |FROM bits ORDER BY doc_id""".stripMargin,
    // full-GIF round-trip: the engine LZW-encodes a doc_id-derived
    // indexed raster into a REAL GIF89a stream and decodes it back;
    // v(x,y) = base + x + y bounded under 256, so the oracle's closed
    // forms replay sum/min/max exactly — any sub-block or code-width
    // defect breaks the sums
    "q_gif_pixel_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 3 % 14) AS w,
        |           4 + (doc_id * 17 % 9) AS h,
        |           doc_id % 200 AS base
        |    FROM documents
        |)
        |SELECT doc_id, CAST(0 AS INTEGER) AS channel,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(w * h * base
        |            + h * (w * (w - 1) // 2)
        |            + w * (h * (h - 1) // 2) AS BIGINT) AS px_sum,
        |       CAST(base AS INTEGER) AS px_min,
        |       CAST(base + (w - 1) + (h - 1) AS INTEGER) AS px_max
        |FROM d ORDER BY doc_id""".stripMargin,
    // banded aHash near-dup: the engine's 4×16-bit band join + confirm is
    // EXACT at budget 3 (pigeonhole: ≤ 3 differing bits leave a band
    // identical), so the oracle replays clean all-pairs hamming — the
    // banding must change nothing, only the join volume
    "q_image_near_dup" ->
      s"""WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 7 % 13) AS w,
        |           4 + (doc_id * 13 % 11) AS h,
        |           CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS nch,
        |           doc_id % 200 AS base
        |    FROM documents
        |), g AS (SELECT unnest(range(0, 8)) AS dx),
        |gy AS (SELECT unnest(range(0, 8)) AS dy),
        |cell AS (
        |    SELECT d.doc_id, gy.dy * 8 + g.dx AS i,
        |           CASE WHEN d.nch = 1
        |                THEN d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8
        |                ELSE ((d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8) * 299
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 3) * 587
        |                      + (d.base + (g.dx * d.w) // 8 + (gy.dy * d.h) // 8 + 6) * 114)
        |                     // 1000
        |           END AS v
        |    FROM d, g, gy
        |), m AS (
        |    SELECT doc_id, SUM(v) // 64 AS mean FROM cell GROUP BY doc_id
        |), bits AS (
        |    SELECT c.doc_id,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i >= 32
        |                         THEN CAST(1 AS BIGINT) << (c.i - 32)
        |                         ELSE 0 END) AS BIGINT) AS hi,
        |           CAST(SUM(CASE WHEN c.v > m.mean AND c.i < 32
        |                         THEN CAST(1 AS BIGINT) << c.i
        |                         ELSE 0 END) AS BIGINT) AS lo
        |    FROM cell c JOIN m USING (doc_id)
        |    GROUP BY c.doc_id
        |), surv AS (
        |    SELECT MIN(doc_id) AS doc_id, hi, lo FROM bits GROUP BY hi, lo
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.hi, b.hi))
        |            + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
        |FROM surv a JOIN surv b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
        |      <= ${ops.MultimodalOps.ImageHammingMax}
        |ORDER BY id_a, id_b""".stripMargin,
    // full-VP8L round-trip: the engine entropy-encodes a doc_id-derived
    // ARGB raster into a REAL WebP-lossless stream (canonical prefix
    // codes, LSB-first bit packing) and decodes it back; R/G/B (x,y) =
    // base + x + y + 3c bounded under 256, alpha constant 255 — any
    // bit-packing or prefix-decode defect breaks the sums
    "q_vp8l_pixel_stats" ->
      """WITH d AS (
        |    SELECT doc_id,
        |           4 + (doc_id * 5 % 12) AS w,
        |           4 + (doc_id * 11 % 9) AS h,
        |           doc_id % 200 AS base
        |    FROM documents
        |), ch AS (SELECT unnest([0, 1, 2, 3]) AS c)
        |SELECT doc_id, CAST(c AS INTEGER) AS channel,
        |       CAST(w * h AS BIGINT) AS n_px,
        |       CAST(CASE WHEN c = 3 THEN w * h * 255
        |            ELSE w * h * (base + 3 * c)
        |                 + h * (w * (w - 1) // 2)
        |                 + w * (h * (h - 1) // 2) END AS BIGINT) AS px_sum,
        |       CAST(CASE WHEN c = 3 THEN 255
        |            ELSE base + 3 * c END AS INTEGER) AS px_min,
        |       CAST(CASE WHEN c = 3 THEN 255
        |            ELSE base + 3 * c + (w - 1) + (h - 1) END AS INTEGER)
        |         AS px_max
        |FROM d JOIN ch ON true
        |ORDER BY doc_id, channel""".stripMargin,
    // WAV/MP4 fixture round-trip: the Spark side PARSES the crafted
    // containers (data-size/byte-rate division for WAV duration); the
    // oracle recomputes the doc_id derivations directly
    "q_av_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS format,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |            THEN octet_length(CAST(text AS BLOB)) * 1000
        |                 // ((8000 + doc_id * 37 % 40000)
        |                    * (1 + (doc_id // 2) % 2) * 2)
        |            ELSE (doc_id * 13 % 100000) * 1000
        |                 // (1000 + doc_id % 9000)
        |       END AS BIGINT) AS duration_ms,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |            THEN 8000 + doc_id * 37 % 40000 ELSE 0
        |       END AS INTEGER) AS sample_rate,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |            THEN 1 + (doc_id // 2) % 2 ELSE 0
        |       END AS INTEGER) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_label_centroid" ->
      """WITH ex AS (
        |    SELECT label, CAST(i - 1 AS INTEGER) AS dim_idx,
        |           CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
        |    FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
        |    WHERE i <= len(embedding)
        |)
        |SELECT label, dim_idx,
        |       CAST(SUM(CAST(floor(x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / COUNT(*)
        |           AS centroid
        |FROM ex GROUP BY label, dim_idx ORDER BY label, dim_idx""".stripMargin,
    "q_embed_norm" ->
      """WITH sq AS (
        |    SELECT vec_id, embedding,
        |           list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |             (a, b) -> a + b) AS sumsq
        |    FROM embeddings
        |)
        |SELECT vec_id, sqrt(sumsq) AS l2_norm,
        |       CAST(embedding[1] AS DOUBLE) / sqrt(sumsq) AS first_component_norm
        |FROM sq ORDER BY vec_id""".stripMargin,
    "q_knn_cosine_topk" ->
      """WITH nrm AS (
        |    SELECT vec_id, embedding,
        |           sqrt(list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |             (a, b) -> a + b)) AS l2
        |    FROM embeddings
        |), pairs AS (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |           list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(range(1, len(p.embedding) + 1),
        |                 i -> CAST(p.embedding[i] AS DOUBLE)
        |                      * CAST(c.embedding[i] AS DOUBLE))),
        |             (a, b) -> a + b) / (p.l2 * c.l2) AS cosine
        |    FROM nrm p JOIN nrm c ON p.vec_id < 5
        |), ranked AS (
        |    SELECT probe_id, neighbor_id, cosine,
        |           row_number() OVER (PARTITION BY probe_id
        |                              ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |    FROM pairs
        |)
        |SELECT probe_id, rnk, neighbor_id, cosine FROM ranked WHERE rnk <= 5
        |ORDER BY probe_id, rnk""".stripMargin,
    // integer-count repetition signals; the most-frequent-token count is a
    // per-doc GROUP BY here vs the engine's per-row sorted-run fold —
    // identical integers either way
    "q_repetition_stats" ->
      """WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), flat AS (
        |    SELECT doc_id, unnest(tokens) AS tk FROM tok
        |), tcnt AS (
        |    SELECT doc_id, tk, COUNT(*) AS cnt FROM flat GROUP BY doc_id, tk
        |), tops AS (
        |    SELECT doc_id, MAX(cnt) AS top_token_count FROM tcnt GROUP BY doc_id
        |), big AS (
        |    SELECT doc_id, tokens,
        |           list_transform(range(1, len(tokens)),
        |                          i -> tokens[i] || ' ' || tokens[i + 1]) AS bigrams
        |    FROM tok
        |)
        |SELECT b.doc_id,
        |       len(b.tokens) AS n_tokens,
        |       len(list_distinct(b.tokens)) AS n_distinct_tokens,
        |       len(b.bigrams) AS n_bigrams,
        |       len(list_distinct(b.bigrams)) AS n_distinct_bigrams,
        |       t.top_token_count,
        |       CASE WHEN (len(b.bigrams) - len(list_distinct(b.bigrams))) * 2
        |                 > len(b.bigrams)
        |            THEN 1 ELSE 0 END AS repetitive
        |FROM big b JOIN tops t USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    // T=2 temperature mixing: sqrt is correctly rounded in IEEE-754, so
    // floor(sqrt(w) * 5) is the same integer in both engines (pow/ln are
    // libm-specific and would NOT be safe here)
    "q_mix_temperature" ->
      s"""WITH ranked AS (
        |    SELECT source, doc_id,
        |           CAST(floor(sqrt(CAST(1 + CAST(substr(source, 4) AS INT) % 9
        |                                AS DOUBLE)) * ${SamplingOps.MixUnit}) AS INT) AS quota,
        |           row_number() OVER (PARTITION BY source
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |             AS mix_rank
        |    FROM documents
        |)
        |SELECT source, doc_id, quota, mix_rank FROM ranked
        |WHERE mix_rank <= quota ORDER BY source, mix_rank""".stripMargin,
    "q_export_shuffle" ->
      s"""WITH keyed AS (
        |    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sk FROM documents
        |), sharded AS (
        |    SELECT doc_id, sk,
        |           CAST(((strpos('0123456789abcdef', substr(sk, 1, 1)) - 1) * 13
        |                 + (strpos('0123456789abcdef', substr(sk, 2, 1)) - 1))
        |                % ${SamplingOps.ExportShards} AS INT) AS shard
        |    FROM keyed
        |)
        |SELECT shard,
        |       row_number() OVER (PARTITION BY shard ORDER BY sk, doc_id)
        |         AS shard_rank,
        |       doc_id
        |FROM sharded ORDER BY shard, shard_rank""".stripMargin,
    // eval-set decontamination by distinct-trigram overlap: both engines
    // build per-doc DISTINCT n-gram sets, so n_shared counts distinct
    // shared grams
    "q_decontaminate_ngram" ->
      """WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), grams AS (
        |    SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(tokens) - 1),
        |               i -> array_to_string(tokens[i:i+2], ' '))) AS gs
        |    FROM tok
        |), eval_grams AS (
        |    SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 100 = 7
        |), corpus AS (
        |    SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 100 <> 7
        |)
        |SELECT c.doc_id, COUNT(*) AS n_shared
        |FROM corpus c JOIN eval_grams e ON c.g = e.g
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // the unicode tokenizer composed into decontamination: token lists
    // reconstructed arithmetically (same CJK enrichment, empty-filtered
    // base — unicode_tokens never emits empty tokens), then the same
    // distinct-gram overlap count
    "q_decontaminate_cjk" ->
      """WITH tok AS (
        |    SELECT doc_id,
        |           list_filter(string_split_regex(trim(text), '\s+'),
        |                       t -> t <> '') AS base
        |    FROM documents
        |), ex AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 3 = 0
        |                THEN list_concat(base,
        |                     ['안녕', '세계',
        |                      repeat('中', CAST(doc_id % 4 + 1 AS INT)), 'tail'])
        |                ELSE base END AS tokens
        |    FROM tok
        |), grams AS (
        |    SELECT doc_id,
        |           list_distinct(list_transform(range(1, len(tokens) - 1),
        |               i -> array_to_string(tokens[i:i+2], ' '))) AS gs
        |    FROM ex
        |), eval_grams AS (
        |    SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 100 = 7
        |), corpus AS (
        |    SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 100 <> 7
        |)
        |SELECT c.doc_id, COUNT(*) AS n_shared
        |FROM corpus c JOIN eval_grams e ON c.g = e.g
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    // the unicode tokenizer composed into the integer TF-IDF: same
    // arithmetic token reconstruction, then the same tf/df/score replay
    "q_salient_terms_cjk" ->
      """WITH tok AS (
        |    SELECT doc_id, source,
        |           list_filter(string_split_regex(trim(text), '\s+'),
        |                       t -> t <> '') AS base
        |    FROM documents
        |), ex AS (
        |    SELECT source,
        |           CASE WHEN doc_id % 3 = 0
        |                THEN list_concat(base,
        |                     ['안녕', '세계',
        |                      repeat('中', CAST(doc_id % 4 + 1 AS INT)), 'tail'])
        |                ELSE base END AS toks
        |    FROM tok
        |), flat AS (
        |    SELECT source, unnest(toks) AS token FROM ex
        |), tf AS (
        |    SELECT source, token, COUNT(*) AS tf FROM flat GROUP BY source, token
        |), df AS (
        |    SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        |), ns AS (
        |    SELECT COUNT(DISTINCT source) AS n FROM documents
        |), scored AS (
        |    SELECT tf.source, tf.token, tf.tf, df.df,
        |           tf.tf * ns.n // df.df AS score
        |    FROM tf JOIN df USING (token), ns
        |), ranked AS (
        |    SELECT source, token, tf, df, score,
        |           row_number() OVER (PARTITION BY source
        |                              ORDER BY score DESC, token ASC) AS rnk
        |    FROM scored
        |)
        |SELECT source, rnk, token, tf, df, score FROM ranked WHERE rnk <= 3
        |ORDER BY source, rnk""".stripMargin,
    // the engine's bloom filter is a bandwidth gate only (FPs resolved by
    // the exact confirm join), so the plain NOT EXISTS is the oracle
    "q_blocklist_bloom" ->
      """WITH block AS (
        |    SELECT DISTINCT sha256(text) AS digest FROM documents
        |    WHERE doc_id % 11 = 3
        |)
        |SELECT d.doc_id, sha256(d.text) AS digest
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM block b
        |                  WHERE b.digest = sha256(d.text))
        |ORDER BY d.doc_id""".stripMargin,
    // bucketing is a physical layout choice — the joined result is the
    // plain equi-join, which the oracle computes directly
    "q_join_bucketed" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // integer idf (tf × n_sources div df) — log-free idf is monotone in
    // the standard one, and integer ranks can't drift between engines
    "q_salient_terms" ->
      """WITH tok AS (
        |    SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents
        |), tf AS (
        |    SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY source, token
        |), df AS (
        |    SELECT token, COUNT(*) AS df FROM tf GROUP BY token
        |), ns AS (
        |    SELECT COUNT(DISTINCT source) AS n FROM documents
        |), scored AS (
        |    SELECT tf.source, tf.token, tf.tf, df.df,
        |           tf.tf * ns.n // df.df AS score
        |    FROM tf JOIN df USING (token), ns
        |), ranked AS (
        |    SELECT source, token, tf, df, score,
        |           row_number() OVER (PARTITION BY source
        |                              ORDER BY score DESC, token ASC) AS rnk
        |    FROM scored
        |)
        |SELECT source, rnk, token, tf, df, score FROM ranked WHERE rnk <= 3
        |ORDER BY source, rnk""".stripMargin,
    // the engine runs the partition-SCOPED merge machinery (pruned
    // current-slice scan + metadata DROP PARTITION + append of only the
    // touched partition); the oracle recomputes the final state
    // declaratively over all three months
    "q_mode_merge_partitioned" ->
      """WITH base AS (
        |    SELECT o_orderkey, o_custkey, o_totalprice,
        |           strftime(o_orderdate, '%Y-%m') AS part_key
        |    FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |), mx AS (SELECT MAX(o_orderkey) + 1 AS stride FROM base)
        |SELECT o_orderkey, o_custkey,
        |       CASE WHEN part_key = '1996-02' AND o_orderkey % 10 = 3
        |            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |       CAST(CASE WHEN part_key = '1996-02' AND o_orderkey % 10 = 3
        |            THEN 2 ELSE 1 END AS BIGINT) AS v,
        |       part_key
        |FROM base
        |UNION ALL
        |SELECT o_orderkey + mx.stride AS o_orderkey, o_custkey,
        |       o_totalprice, CAST(2 AS BIGINT) AS v, part_key
        |FROM base, mx WHERE part_key = '1996-02' AND o_orderkey % 100 = 55
        |ORDER BY o_orderkey""".stripMargin,
    // the engine runs the real merge machinery (base load + latest-wins
    // window through the temp-swap); the oracle recomputes the final
    // state declaratively
    "q_mode_merge_upsert" ->
      """WITH mx AS (SELECT MAX(o_orderkey) + 1 AS stride FROM orders)
        |SELECT o_orderkey, o_custkey,
        |       CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 2
        |            ELSE o_totalprice END AS o_totalprice,
        |       CAST(CASE WHEN o_orderkey % 10 = 3 THEN 2 ELSE 1 END
        |            AS BIGINT) AS v
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + mx.stride AS o_orderkey, o_custkey,
        |       o_totalprice, CAST(2 AS BIGINT) AS v
        |FROM orders, mx WHERE o_orderkey % 100 = 55
        |ORDER BY o_orderkey""".stripMargin,
    // BM25 over the stored inverted index: the oracle re-derives postings,
    // doclen, df and totals declaratively and replays the staged
    // fixed-point scoring (dl/avgdl in 1e3, tf saturation in 1e6, odds idf
    // in 1e4 — RetrievalOps constants) integer-for-integer; queries are
    // the doc_id % 97 = 3 probe slice's first-4-distinct-token formula
    "q_bm25_topk" -> (bm25Ctes("doc_id % 97 = 3", "") +
      """
        |SELECT query_id, rnk, doc_id, n_hit, score
        |FROM rk WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin),
    // retrieval-driven decontamination: eval-slice docs query the same
    // replayed index; candidates restricted to NON-eval docs; flags are
    // per-doc hit counts over the eval queries' top-5 sets
    "q_bm25_decontam" -> (bm25Ctes("doc_id % 100 = 7",
        "AND f.doc_id % 100 <> 7") +
      """
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
        |       CAST(MAX(score) AS BIGINT) AS best_score
        |FROM rk WHERE rnk <= 5 GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin),
    // hard-negative mining: the unranked scored pool (sc CTE), minus the
    // query's whole near-dup cluster (closure over the materialized
    // minhash pair set), re-ranked top-5 — a cluster member at rank 3
    // must PROMOTE rank 6, hence the filter-then-rank order
    "q_hard_negatives" -> {
      val path = OracleInputs.sqlPath("text_pairs_hardneg")
      bm25Ctes("doc_id % 100 = 7", "")
        .replaceFirst("WITH ", "WITH RECURSIVE ") +
        s""", e AS (SELECT src, dst FROM read_parquet('$path/*.parquet')),
           |sym AS (SELECT src, dst FROM e
           |        UNION SELECT dst AS src, src AS dst FROM e),
           |reach(id, rr) AS (
           |    SELECT doc_id, doc_id FROM documents
           |    UNION
           |    SELECT s.dst, reach.rr FROM reach JOIN sym s ON s.src = reach.id
           |),
           |comp AS (SELECT id, MIN(rr) AS cluster_id FROM reach GROUP BY id),
           |neg AS (
           |    SELECT sc.query_id, sc.doc_id, sc.n_hit, sc.score,
           |           CAST(row_number() OVER (PARTITION BY sc.query_id
           |               ORDER BY sc.score DESC, sc.doc_id ASC) AS INTEGER)
           |               AS rnk
           |    FROM sc
           |    JOIN comp cq ON cq.id = sc.query_id
           |    JOIN comp cd ON cd.id = sc.doc_id
           |    WHERE cq.cluster_id <> cd.cluster_id
           |)
           |SELECT query_id, rnk, doc_id, n_hit, score
           |FROM neg WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
    },
    // K-class NB domain classifier: the oracle retrains the add-one-
    // smoothed per-class token rates (class = source) and replays the
    // token-mean argmax in the same 1e9 fixed point
    "q_domain_classify" -> (dcCtes +
      """
        |SELECT doc_id, c AS pred_source, CAST(dc_score AS BIGINT) AS dc_score,
        |       CAST(CASE WHEN c = source THEN 1 ELSE 0 END AS INTEGER)
        |           AS is_correct
        |FROM drk WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    // classifier-routed temperature mixing: the same quota formula and md5
    // permutation as q_mix_temperature, keyed on the PREDICTED domain the
    // retrained classifier assigns
    "q_domain_mix" -> (dcCtes + s"""
        |, pred AS (SELECT doc_id, c AS source FROM drk WHERE rn = 1),
        |mixr AS (
        |    SELECT source, doc_id,
        |           CAST(floor(sqrt(CAST(1 + CAST(substr(source, 4) AS INT) % 9
        |                AS DOUBLE)) * ${graft.ops.SamplingOps.MixUnit}) AS INT) AS quota,
        |           row_number() OVER (PARTITION BY source
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |             AS mix_rank
        |    FROM pred
        |)
        |SELECT source AS pred_source, doc_id, quota, mix_rank FROM mixr
        |WHERE mix_rank <= quota ORDER BY pred_source, mix_rank""".stripMargin),
    // content-defined chunking: the oracle replays the rolling window
    // hash (the q_doc_fingerprint polynomial), the mod-residue cut rule,
    // the boundary segmentation and the >=2-docs chunk-hash dedup
    "q_cdc_chunks" -> (cdcCtes +
      """
        |, dh AS (
        |    SELECT DISTINCT doc_id, md5(chunk) AS h FROM cchunks
        |), ddup AS (
        |    SELECT h FROM dh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
        |), nck AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
        |    FROM cchunks GROUP BY doc_id
        |), ndp AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_chunks
        |    FROM dh WHERE h IN (SELECT h FROM ddup) GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(nck.n_chunks, 0) AS BIGINT) AS n_chunks,
        |       CAST(COALESCE(ndp.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks
        |FROM documents d
        |LEFT JOIN nck USING (doc_id) LEFT JOIN ndp USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // output-corpus form: globally-first chunk occurrences survive, later
    // ones excise to chr(9247) (U+241F — the substring-dedup marker), and
    // the rewritten text is hash-compared cell-for-cell
    "q_cdc_dedup_rewrite" -> (cdcCtes +
      """
        |, crnk AS (
        |    SELECT doc_id, chunk_pos, chunk,
        |           row_number() OVER (PARTITION BY chunk
        |               ORDER BY doc_id, chunk_pos) AS rnk
        |    FROM cchunks
        |), crw AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |           CAST(SUM(CASE WHEN rnk > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_excised,
        |           string_agg(CASE WHEN rnk = 1 THEN chunk
        |                           ELSE chr(9247) END, ''
        |                      ORDER BY chunk_pos) AS text_dedup
        |    FROM crnk GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(crw.n_chunks, 0) AS BIGINT) AS n_chunks,
        |       CAST(COALESCE(crw.n_excised, 0) AS BIGINT) AS n_excised,
        |       COALESCE(crw.text_dedup, '') AS text_dedup
        |FROM documents d LEFT JOIN crw USING (doc_id)
        |ORDER BY doc_id""".stripMargin),
    // incremental rewrite: the FRESH full-union rewrite restricted to the
    // append-only batch split — a green row proves the persisted
    // chunk-index path lands bit-equal (the substring-incremental gate
    // style)
    "q_cdc_rewrite_incremental" -> (cdcCtes +
      """
        |, crnk AS (
        |    SELECT doc_id, chunk_pos, chunk,
        |           row_number() OVER (PARTITION BY chunk
        |               ORDER BY doc_id, chunk_pos) AS rnk
        |    FROM cchunks
        |), crw AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |           CAST(SUM(CASE WHEN rnk > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_excised,
        |           string_agg(CASE WHEN rnk = 1 THEN chunk
        |                           ELSE chr(9247) END, ''
        |                      ORDER BY chunk_pos) AS text_dedup
        |    FROM crnk GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |       CAST(COALESCE(crw.n_chunks, 0) AS BIGINT) AS n_chunks,
        |       CAST(COALESCE(crw.n_excised, 0) AS BIGINT) AS n_excised,
        |       COALESCE(crw.text_dedup, '') AS text_dedup
        |FROM documents d LEFT JOIN crw USING (doc_id)
        |WHERE d.doc_id * 3 >= (SELECT MAX(doc_id) * 2 FROM documents)
        |ORDER BY doc_id""".stripMargin),
    // exact phrase search via anchor alignment over positional postings:
    // the oracle re-derives 1-based token positions, joins each phrase
    // term's occurrences at anchor pos - k, and counts anchors where all
    // three distinct ks aligned
    "q_phrase_search" ->
      """WITH pb AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), ptok AS (
        |    SELECT doc_id, unnest(toks) AS w,
        |           unnest(range(1, len(toks) + 1)) AS pos
        |    FROM pb
        |), pterms AS (
        |    SELECT doc_id AS query_id,
        |           unnest(range(0, 3)) AS k,
        |           unnest(toks[1:3]) AS w
        |    FROM pb WHERE doc_id % 101 = 11 AND len(toks) >= 3
        |), pm AS (
        |    SELECT t.query_id, p.doc_id, p.pos - t.k AS anchor, t.k
        |    FROM pterms t JOIN ptok p ON p.w = t.w
        |), pa AS (
        |    SELECT query_id, doc_id, anchor
        |    FROM pm GROUP BY 1, 2, 3 HAVING COUNT(DISTINCT k) = 3
        |)
        |SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM pa GROUP BY 1, 2 ORDER BY query_id, doc_id""".stripMargin,
    // hybrid retrieval: RRF over the replayed BM25 ranks and the exact
    // in-order cosine-fold ranks (the q_knn_cosine_topk shape) — only
    // RANKS cross into the fused score, which is exact integer
    "q_hybrid_search" -> (bm25Ctes("doc_id % 97 = 3", "") +
      """
        |, hnrm AS (
        |    SELECT vec_id, embedding,
        |           sqrt(list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |             (a, b) -> a + b)) AS l2
        |    FROM embeddings
        |), hsem AS (
        |    SELECT probe_id AS query_id, neighbor_id AS doc_id, rnk AS r_sem
        |    FROM (
        |        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |               row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |                 (list_reduce(
        |                   list_prepend(CAST(0.0 AS DOUBLE),
        |                     list_transform(range(1, len(p.embedding) + 1),
        |                       i -> CAST(p.embedding[i] AS DOUBLE)
        |                            * CAST(c.embedding[i] AS DOUBLE))),
        |                   (a, b) -> a + b) / (p.l2 * c.l2)) DESC,
        |                 c.vec_id ASC) AS rnk
        |        FROM hnrm p JOIN hnrm c ON p.vec_id % 97 = 3)
        |    WHERE rnk <= 5
        |), hfuse AS (
        |    SELECT COALESCE(l.query_id, s.query_id) AS query_id,
        |           COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |           COALESCE(1000000 // (60 + l.rnk), 0)
        |             + COALESCE(1000000 // (60 + s.r_sem), 0) AS rrf_fp
        |    FROM (SELECT query_id, doc_id, rnk FROM rk WHERE rnk <= 5) l
        |    FULL OUTER JOIN hsem s
        |        ON l.query_id = s.query_id AND l.doc_id = s.doc_id
        |), hfrk AS (
        |    SELECT query_id, doc_id, rrf_fp,
        |           row_number() OVER (PARTITION BY query_id
        |               ORDER BY rrf_fp DESC, doc_id ASC) AS rn
        |    FROM hfuse
        |)
        |SELECT query_id, CAST(rn AS INTEGER) AS rnk, doc_id,
        |       CAST(rrf_fp AS BIGINT) AS rrf_fp
        |FROM hfrk WHERE rn <= 5 ORDER BY query_id, rnk""".stripMargin),
    // heavy-hitter trigrams: exact top-20 replayed declaratively; the CM
    // sketch contract (est ≥ exact, overshoot ≤ 8·total/width) is asserted
    // in-engine and surfaces as constant verdict columns — the
    // q_approx_distinct tolerance-gate posture
    "q_heavy_ngrams" ->
      """WITH tokh AS (
        |    SELECT string_split_regex(trim(text), '\s+') AS toks
        |    FROM documents
        |), hg AS (
        |    SELECT unnest(list_transform(range(1, len(toks) - 1),
        |                  i -> array_to_string(toks[i:i+2], ' '))) AS g
        |    FROM tokh WHERE len(toks) >= 3
        |), hc AS (
        |    SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM hg GROUP BY g
        |), ht AS (
        |    SELECT g, cnt,
        |           row_number() OVER (ORDER BY cnt DESC, g ASC) AS rnk
        |    FROM hc
        |)
        |SELECT CAST(rnk AS INTEGER) AS rnk, g, cnt,
        |       CAST(1 AS INTEGER) AS ge_exact,
        |       CAST(1 AS INTEGER) AS within_bound
        |FROM ht WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // approximate-quantile sketch: exact discrete percentiles replayed
    // via the cum/frequency arithmetic; the rank-space verdicts are
    // asserted in-engine and surface as constant columns
    "q_approx_percentile" ->
      """WITH apl AS (
        |    SELECT l_returnflag,
        |           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |    FROM lineitem
        |), apg AS (
        |    SELECT l_returnflag, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM apl GROUP BY 1, 2
        |), apc AS (
        |    SELECT l_returnflag, cents,
        |           SUM(cnt) OVER (PARTITION BY l_returnflag
        |               ORDER BY cents) AS cum,
        |           SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        |    FROM apg
        |)
        |SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_items,
        |       CAST(MIN(CASE WHEN cum > (n - 1) * 5 // 10
        |                     THEN cents END) AS BIGINT) AS p50_disc,
        |       CAST(MIN(CASE WHEN cum > (n - 1) * 9 // 10
        |                     THEN cents END) AS BIGINT) AS p90_disc,
        |       CAST(1 AS INTEGER) AS p50_within,
        |       CAST(1 AS INTEGER) AS p90_within
        |FROM apc GROUP BY 1 ORDER BY 1""".stripMargin,
    // KMV theta sketch: unlike the CM/HLL tolerance gates, the md5-fold
    // hash is cross-engine, so the ESTIMATES (and the ±30% verdicts)
    // replay integer-for-integer — K-th-min thetas, merged-union K-min,
    // joint-theta intersection count, (K-1)*M div theta estimators
    "q_theta_sketch" ->
      s"""WITH tdk AS (
        |    SELECT DISTINCT l_returnflag AS tag, l_orderkey AS k
        |    FROM lineitem WHERE l_returnflag IN ('R', 'A')
        |), tfl AS (
        |    SELECT k, MAX(CASE WHEN tag='R' THEN 1 ELSE 0 END) AS has_r,
        |           MAX(CASE WHEN tag='A' THEN 1 ELSE 0 END) AS has_a
        |    FROM tdk GROUP BY k
        |), tex AS (
        |    SELECT CAST(SUM(has_r) AS BIGINT) AS exact_r,
        |           CAST(SUM(has_a) AS BIGINT) AS exact_a,
        |           CAST(COUNT(*) AS BIGINT) AS exact_union,
        |           CAST(SUM(has_r * has_a) AS BIGINT) AS exact_common
        |    FROM tfl
        |), thv AS (
        |    SELECT DISTINCT tag,
        |           ('0x' || substr(md5(CAST(k AS VARCHAR)), 1,
        |                           ${ThetaOps.HashHexChars}))::BIGINT + 1 AS hv
        |    FROM tdk
        |), tsmp AS (
        |    SELECT tag, hv FROM (
        |        SELECT tag, hv,
        |               row_number() OVER (PARTITION BY tag ORDER BY hv) AS rn
        |        FROM thv) WHERE rn <= ${ThetaOps.K}
        |), tpt AS (
        |    SELECT MAX(CASE WHEN tag='R' THEN theta END) AS theta_r,
        |           MAX(CASE WHEN tag='R' THEN cnt END) AS cnt_r,
        |           MAX(CASE WHEN tag='A' THEN theta END) AS theta_a,
        |           MAX(CASE WHEN tag='A' THEN cnt END) AS cnt_a
        |    FROM (SELECT tag, MAX(hv) AS theta, CAST(COUNT(*) AS BIGINT) AS cnt
        |          FROM tsmp GROUP BY tag)
        |), tun AS (
        |    SELECT MAX(hv) AS theta_u, CAST(COUNT(*) AS BIGINT) AS cnt_u
        |    FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
        |          FROM (SELECT DISTINCT hv FROM tsmp)) WHERE rn <= ${ThetaOps.K}
        |), tci AS (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS cnt_i
        |    FROM (SELECT hv FROM tsmp WHERE tag='R') ta
        |    JOIN (SELECT hv FROM tsmp WHERE tag='A') tb USING (hv), tpt
        |    WHERE hv <= LEAST(theta_r, theta_a)
        |), tst AS (
        |    SELECT exact_r, exact_a, exact_union, exact_common,
        |           CASE WHEN cnt_r < ${ThetaOps.K} THEN cnt_r
        |                ELSE ${(ThetaOps.K - 1).toLong * ThetaOps.M} // theta_r END AS est_r,
        |           CASE WHEN cnt_a < ${ThetaOps.K} THEN cnt_a
        |                ELSE ${(ThetaOps.K - 1).toLong * ThetaOps.M} // theta_a END AS est_a,
        |           CASE WHEN cnt_u < ${ThetaOps.K} THEN cnt_u
        |                ELSE ${(ThetaOps.K - 1).toLong * ThetaOps.M} // theta_u END AS est_union,
        |           CASE WHEN cnt_r < ${ThetaOps.K} AND cnt_a < ${ThetaOps.K} THEN cnt_i
        |                ELSE cnt_i * ${ThetaOps.M} // LEAST(theta_r, theta_a) END AS est_common
        |    FROM tex, tpt, tun, tci
        |)
        |SELECT exact_r, CAST(est_r AS BIGINT) AS est_r,
        |       exact_a, CAST(est_a AS BIGINT) AS est_a,
        |       exact_union, CAST(est_union AS BIGINT) AS est_union,
        |       exact_common, CAST(est_common AS BIGINT) AS est_common,
        |       CAST(CASE WHEN abs(est_r - exact_r) * ${ThetaOps.TolDen}
        |                      <= exact_r * ${ThetaOps.TolNum} THEN 1 ELSE 0 END AS INTEGER) AS r_ok,
        |       CAST(CASE WHEN abs(est_a - exact_a) * ${ThetaOps.TolDen}
        |                      <= exact_a * ${ThetaOps.TolNum} THEN 1 ELSE 0 END AS INTEGER) AS a_ok,
        |       CAST(CASE WHEN abs(est_union - exact_union) * ${ThetaOps.TolDen}
        |                      <= exact_union * ${ThetaOps.TolNum} THEN 1 ELSE 0 END AS INTEGER) AS union_ok,
        |       CAST(CASE WHEN abs(est_common - exact_common) * ${ThetaOps.TolDen}
        |                      <= exact_common * ${ThetaOps.TolNum} THEN 1 ELSE 0 END AS INTEGER) AS common_ok
        |FROM tst""".stripMargin,
    // directional containment: brute-force ordered-pair replay —
    // completeness proof for the one-sided prefix filter
    "q_containment_join" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), csh AS (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |               range(1, len(tokens) - 1),
        |               i -> array_to_string(tokens[i:i+2], ' ')))) AS sh
        |    FROM tok WHERE len(tokens) >= 3
        |), csz AS (
        |    SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM csh GROUP BY 1
        |), cov AS (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           CAST(count(*) AS BIGINT) AS overlap
        |    FROM csh a JOIN csh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |    GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, za.sz AS size_a, zb.sz AS size_b, overlap,
        |       CAST(overlap * 1000000 // za.sz AS BIGINT) AS containment_ppm
        |FROM cov
        |JOIN csz za ON za.doc_id = cov.doc_a
        |JOIN csz zb ON zb.doc_id = cov.doc_b
        |WHERE ${SetJoinOps.ConDen} * overlap >= ${SetJoinOps.ConNum} * za.sz
        |ORDER BY doc_a, doc_b""".stripMargin,
    // daily theta rollup: per-day K-min samples + the range estimate
    // from MERGED samples (day = -1 row) — replayed value for value
    "q_theta_daily" ->
      s"""WITH tdk AS (
        |    SELECT DISTINCT CAST(epoch_ns(ts) // 86400000000000 AS VARCHAR)
        |               AS tag,
        |           ('0x' || substr(md5(concat(
        |               CAST(user_id AS VARCHAR), ':',
        |               CAST((epoch_ns(ts) % 86400000000000) // 60000000000
        |                    AS VARCHAR))), 1,
        |               ${ThetaOps.HashHexChars}))::BIGINT + 1 AS hv
        |    FROM events
        |), tds AS (
        |    SELECT tag, hv FROM (
        |        SELECT tag, hv,
        |               row_number() OVER (PARTITION BY tag ORDER BY hv) AS rn
        |        FROM tdk) WHERE rn <= ${ThetaOps.K}
        |), tdp AS (
        |    SELECT CAST(tag AS BIGINT) AS day, MAX(hv) AS theta,
        |           CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM tds GROUP BY 1
        |), tdr AS (
        |    SELECT CAST(-1 AS BIGINT) AS day, MAX(hv) AS theta,
        |           CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM (SELECT hv, row_number() OVER (ORDER BY hv) AS rn
        |          FROM (SELECT DISTINCT hv FROM tds
        |                WHERE CAST(tag AS BIGINT) >= ${ThetaOps.DailyRangeLo}
        |                  AND CAST(tag AS BIGINT) < ${ThetaOps.DailyRangeHi}))
        |    WHERE rn <= ${ThetaOps.K}
        |), tdu AS (
        |    SELECT day, cnt, theta FROM tdp
        |    UNION ALL SELECT day, cnt, theta FROM tdr
        |)
        |SELECT day, cnt, theta,
        |       CAST(CASE WHEN cnt < ${ThetaOps.K} THEN cnt
        |                 ELSE ${(ThetaOps.K - 1).toLong * ThetaOps.M} // theta
        |            END AS BIGINT) AS est
        |FROM tdu ORDER BY day""".stripMargin,
    // Pearson chi-square per event type: exact rational through HUGEINT,
    // cross-multiplied 3.841 significance verdict — no float anywhere
    "q_ab_chisquare" ->
      s"""WITH xc AS (
        |    SELECT CAST(user_id % 2 AS INTEGER) AS arm, event_type,
        |           CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM events GROUP BY 1, 2
        |), xa AS (
        |    SELECT event_type,
        |           CAST(SUM(CASE WHEN arm = 0 THEN cnt ELSE 0 END) AS BIGINT) AS a,
        |           CAST(SUM(CASE WHEN arm = 1 THEN cnt ELSE 0 END) AS BIGINT) AS c
        |    FROM xc GROUP BY 1
        |), xt AS (
        |    SELECT CAST(SUM(CASE WHEN arm = 0 THEN cnt ELSE 0 END) AS BIGINT) AS tot_a,
        |           CAST(SUM(CASE WHEN arm = 1 THEN cnt ELSE 0 END) AS BIGINT) AS tot_b
        |    FROM xc
        |), xx AS (
        |    SELECT event_type, a, tot_a - a AS b, c, tot_b - c AS d,
        |           tot_a + tot_b AS n
        |    FROM xa, xt
        |)
        |SELECT event_type, a, b, c, d, CAST(n AS BIGINT) AS n,
        |       CAST(CAST(n AS HUGEINT) * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c) * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
        |            * ${EventOps.Chi2Scale}
        |            // (CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d))
        |            AS BIGINT) AS chi2_ppm,
        |       CAST(CASE WHEN CAST(n AS HUGEINT) * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c) * (CAST(a AS HUGEINT)*d - CAST(b AS HUGEINT)*c)
        |                      * 1000
        |                      >= ${EventOps.Chi2CritThousandths}
        |                         * CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d)
        |                 THEN 1 ELSE 0 END AS INTEGER) AS significant
        |FROM xx ORDER BY event_type""".stripMargin,
    // Kaplan-Meier: right-censored time-to-conversion — risk sets from
    // exit-day running sums, per-day factors, and the EXPLICIT day-order
    // prefix fold (list_reduce over a prepended init, matching Spark's
    // aggregate(slice)) — curve replayed day for day
    "q_survival_km" ->
      s"""WITH kev AS (
        |    SELECT user_id, epoch_ns(ts) AS tns, event_type, props
        |    FROM events
        |), kt0 AS (
        |    SELECT user_id, MIN(tns) AS t0 FROM kev
        |    WHERE event_type = 'signup' GROUP BY 1
        |), kq AS (
        |    SELECT e.user_id, MIN(e.tns) AS tp
        |    FROM kev e JOIN kt0 t USING (user_id)
        |    WHERE e.event_type = 'purchase'
        |      AND CAST(json_extract_string(e.props, '$$.k') AS BIGINT) % 7 = 0
        |      AND e.tns > t.t0
        |    GROUP BY 1
        |), kob AS (
        |    SELECT MAX(tns) AS obs_end FROM kev
        |), kpu AS (
        |    SELECT t.user_id,
        |           CASE WHEN q.tp IS NOT NULL THEN 1 ELSE 0 END AS observed,
        |           CASE WHEN q.tp IS NOT NULL
        |                THEN (q.tp - t.t0) // ${EventOps.DayNs}
        |                ELSE ((SELECT obs_end FROM kob) - t.t0)
        |                     // ${EventOps.DayNs} END AS exit_day
        |    FROM kt0 t LEFT JOIN kq q USING (user_id)
        |), kex AS (
        |    SELECT exit_day, CAST(COUNT(*) AS BIGINT) AS n_exit,
        |           CAST(SUM(observed) AS BIGINT) AS d_ev
        |    FROM kpu GROUP BY 1
        |), kgr AS (
        |    SELECT exit_day, d_ev,
        |           (SELECT CAST(COUNT(*) AS BIGINT) FROM kpu)
        |             - COALESCE(SUM(n_exit) OVER (ORDER BY exit_day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                 AND 1 PRECEDING), 0) AS n_risk
        |    FROM kex
        |), kfa AS (
        |    SELECT exit_day, d_ev, n_risk,
        |           CAST(${EventOps.KmScale} * (n_risk - d_ev) // n_risk
        |                AS BIGINT) AS factor_fp,
        |           CAST(row_number() OVER (ORDER BY exit_day) AS INTEGER)
        |               AS rn
        |    FROM kgr WHERE d_ev > 0
        |), kls AS (
        |    SELECT list(factor_fp ORDER BY exit_day) AS facs FROM kfa
        |)
        |SELECT exit_day AS day, CAST(n_risk AS BIGINT) AS n_risk,
        |       d_ev AS n_events, factor_fp,
        |       CAST(list_reduce(
        |           list_prepend(CAST(${EventOps.KmScale} AS BIGINT),
        |               list_slice(facs, 1, rn)),
        |           (acc, x) -> acc * x // ${EventOps.KmScale}) AS BIGINT)
        |           AS surv_fp
        |FROM kfa, kls ORDER BY day""".stripMargin,
    // Luhn-validated PAN scan: crafted valid/invalid candidates from
    // doc_id arithmetic, the digit fold replayed position for position,
    // checksum-gated redaction — every cell including the redacted text
    // hash-compared
    "q_pii_luhn" ->
      s"""WITH lb AS (
        |    SELECT doc_id,
        |           substr(repeat(CAST(doc_id * 7919 + 13 AS VARCHAR), 8),
        |                  1, 15) AS acct_base
        |    FROM documents
        |), lc AS (
        |    SELECT doc_id, acct_base,
        |           (10 - ${duckLuhn("concat(acct_base, '0')")} % 10) % 10
        |               AS check_digit
        |    FROM lb
        |), lp AS (
        |    SELECT doc_id,
        |           concat(acct_base, CAST(check_digit AS VARCHAR)) AS valid_pan,
        |           concat(acct_base, CAST((check_digit + 1) % 10 AS VARCHAR))
        |               AS invalid_pan
        |    FROM lc
        |), lt AS (
        |    SELECT doc_id,
        |           concat('acct ', valid_pan, ' ref ', invalid_pan) AS acct_text
        |    FROM lp
        |), lel AS (
        |    SELECT doc_id, acct_text,
        |           regexp_extract_all(acct_text, '[0-9]{13,19}') AS cands
        |    FROM lt
        |), le AS (
        |    SELECT doc_id, acct_text,
        |           unnest(range(0, len(cands))) AS candidate_idx,
        |           unnest(cands) AS digits
        |    FROM lel
        |)
        |SELECT doc_id, CAST(candidate_idx AS INTEGER) AS candidate_idx,
        |       digits, CAST(length(digits) AS INTEGER) AS n_digits,
        |       CAST(CASE WHEN ${duckLuhn("digits")} % 10 = 0
        |                 THEN 1 ELSE 0 END AS INTEGER) AS luhn_valid,
        |       CASE WHEN ${duckLuhn("digits")} % 10 = 0
        |            THEN replace(acct_text, digits, '[PAN]')
        |            ELSE acct_text END AS redacted
        |FROM le ORDER BY doc_id, candidate_idx""".stripMargin,
    // session trajectories: 30-min-gap sessionization (lag + running
    // sum), ordered event-type sequence via ordered string_agg — the
    // string cell itself is hash-compared
    "q_session_sequences" ->
      s"""WITH sev AS (
        |    SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type
        |    FROM events
        |), sbrk AS (
        |    SELECT user_id, tns, event_id, event_type,
        |           CASE WHEN lag(tns) OVER w IS NOT NULL
        |                 AND tns - lag(tns) OVER w > ${EventOps.SessionGapNs}
        |                THEN 1 ELSE 0 END AS brk
        |    FROM sev WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)
        |), ssid AS (
        |    SELECT user_id, tns, event_id, event_type,
        |           SUM(brk) OVER (PARTITION BY user_id ORDER BY tns, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND CURRENT ROW) AS sid
        |    FROM sbrk
        |)
        |SELECT user_id, CAST(sid AS INTEGER) AS session_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(tns) // 1000000 AS BIGINT) AS start_ms,
        |       CAST(MAX(tns) // 1000000 AS BIGINT) AS end_ms,
        |       CAST(MAX(tns) // 1000000 - MIN(tns) // 1000000 AS BIGINT)
        |           AS duration_ms,
        |       string_agg(event_type, '>' ORDER BY tns, event_id) AS seq
        |FROM ssid GROUP BY user_id, sid
        |ORDER BY user_id, session_idx""".stripMargin,
    // collocations: bigram association lift (the log-free PMI proxy)
    // through DECIMAL(38) exact arithmetic, min-count guard, top-20 —
    // replayed rank for rank
    "q_collocations" ->
      s"""WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        |    FROM documents
        |), ctk AS (
        |    SELECT doc_id, unnest(toks) AS w,
        |           unnest(range(1, len(toks)+1)) AS pos
        |    FROM base WHERE len(toks) >= 2
        |), cuni AS (
        |    SELECT w AS tok, CAST(COUNT(*) AS BIGINT) AS cw
        |    FROM (SELECT unnest(toks) AS w FROM base) GROUP BY 1
        |), ctot AS (
        |    SELECT CAST(SUM(cw) AS BIGINT) AS t_tot FROM cuni
        |), cc2 AS (
        |    SELECT a.w AS prev, b.w AS w, CAST(COUNT(*) AS BIGINT) AS c2
        |    FROM ctk a JOIN ctk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |    GROUP BY 1, 2 HAVING COUNT(*) >= ${TextOps.CollocMinCount}
        |), clf AS (
        |    SELECT prev, w, c2,
        |           CAST((CAST(1000000 AS HUGEINT) * c2
        |                 * (SELECT t_tot FROM ctot))
        |                // (CAST(u1.cw AS HUGEINT) * u2.cw) AS BIGINT) AS lift_fp
        |    FROM cc2
        |    JOIN cuni u1 ON cc2.prev = u1.tok
        |    JOIN cuni u2 ON cc2.w = u2.tok
        |)
        |SELECT CAST(row_number() OVER (ORDER BY lift_fp DESC, prev, w)
        |            AS INTEGER) AS rnk,
        |       prev AS w1, w AS w2, c2, lift_fp
        |FROM clf ORDER BY rnk LIMIT ${TextOps.CollocTopK}""".stripMargin,
    // largest-remainder apportionment: floor quotas + remainder-ranked
    // leftover seats sum to exactly N; seats filled by the md5
    // permutation — replayed seat for seat
    "q_split_proportional" ->
      s"""WITH pst AS (
        |    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_i
        |    FROM documents GROUP BY 1
        |), ptt AS (
        |    SELECT CAST(SUM(n_i) AS BIGINT) AS n_tot FROM pst
        |), pbs AS (
        |    SELECT lang, n_i,
        |           CAST(${SamplingOps.ApportionN} * n_i // n_tot AS BIGINT) AS floor_q,
        |           CAST((${SamplingOps.ApportionN} * n_i) % n_tot AS BIGINT) AS rem
        |    FROM pst, ptt
        |), plo AS (
        |    SELECT ${SamplingOps.ApportionN} - CAST(SUM(floor_q) AS BIGINT) AS extra
        |    FROM pbs
        |), pal AS (
        |    SELECT lang, n_i,
        |           CAST(floor_q + CASE WHEN row_number()
        |                    OVER (ORDER BY rem DESC, lang) <= extra
        |                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |    FROM pbs, plo
        |), prk AS (
        |    SELECT doc_id, lang,
        |           row_number() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |    FROM documents
        |)
        |SELECT p.lang, a.n_i, a.alloc, p.doc_id,
        |       CAST(p.rn AS INTEGER) AS pick_rank
        |FROM prk p JOIN pal a USING (lang)
        |WHERE p.rn <= a.alloc
        |ORDER BY p.lang, pick_rank""".stripMargin,
    // Aho-Corasick span scan: the oracle brute-forces every (doc, term,
    // position) triple — O(text·terms) is fine for the oracle, while the
    // engine's single-pass DFA is the 100 TB path; ASCII fixture text
    // makes byte and character offsets coincide
    "q_ac_scan" ->
      s"""WITH act AS MATERIALIZED (
        |    SELECT * FROM (VALUES ${BlocklistOps.AcTerms.zipWithIndex
              .map { case (t, i) => s"($i, '$t')" }.mkString(", ")})
        |        AS v(term_id, term)
        |), acp AS MATERIALIZED (
        |    SELECT doc_id, text, term_id, term FROM documents, act
        |    WHERE length(text) >= length(term)
        |), ace AS (
        |    SELECT doc_id, text, term_id, term,
        |           unnest(range(1, length(text) - length(term) + 2)) AS pos
        |    FROM acp
        |)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
        |       CAST(term_id AS INTEGER) AS term_id, term
        |FROM ace WHERE substr(text, pos, length(term)) = term
        |ORDER BY doc_id, pos, term_id""".stripMargin,
    // curriculum ordering: integer readability difficulty, exact discrete
    // tertile cuts (the q_approx_percentile idiom), md5 within-stage
    // permutation — the easy→hard schedule replayed cell for cell
    "q_curriculum_order" ->
      s"""WITH cdoc AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
        |           GREATEST(1, len(list_filter(
        |               string_split_regex(text, '[.!?]+'),
        |               x -> trim(x) <> ''))) AS n_sents
        |    FROM documents
        |), ctok AS (
        |    SELECT doc_id, n_sents, unnest(toks) AS w FROM cdoc
        |), ccw AS (
        |    SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM ctok GROUP BY 1
        |), ctot AS (
        |    SELECT CAST(SUM(cw) AS BIGINT) AS t_tot FROM ccw
        |), cpd AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |           CAST(SUM(length(w)) AS BIGINT) AS chars_sum,
        |           CAST(SUM(CASE WHEN cw * ${CurriculumOps.RarePm}
        |                         <= (SELECT t_tot FROM ctot)
        |                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |           MAX(n_sents) AS n_sents
        |    FROM ctok JOIN ccw USING (w) GROUP BY doc_id
        |), csc AS (
        |    SELECT doc_id, n_tokens,
        |           CAST(1000 * chars_sum // n_tokens AS BIGINT) AS awl_pm,
        |           CAST(1000 * n_tokens // n_sents AS BIGINT) AS asl_pm,
        |           CAST(1000 * n_rare // n_tokens AS BIGINT) AS rare_pm
        |    FROM cpd
        |), cs2 AS (
        |    SELECT doc_id, n_tokens, awl_pm, asl_pm, rare_pm,
        |           CAST(awl_pm + asl_pm // 10 + 2 * rare_pm AS BIGINT)
        |               AS difficulty_fp
        |    FROM csc
        |), cfq AS (
        |    SELECT difficulty_fp, COUNT(*) AS cnt FROM cs2 GROUP BY 1
        |), ccm AS (
        |    SELECT difficulty_fp,
        |           SUM(cnt) OVER (ORDER BY difficulty_fp) AS cum,
        |           (SELECT COUNT(*) FROM cs2) AS n
        |    FROM cfq
        |), cbd AS (
        |    SELECT MIN(CASE WHEN cum * ${CurriculumOps.Stages} > (n - 1)
        |                    THEN difficulty_fp END) AS t1,
        |           MIN(CASE WHEN cum * ${CurriculumOps.Stages} > (n - 1) * 2
        |                    THEN difficulty_fp END) AS t2
        |    FROM ccm
        |)
        |SELECT doc_id, n_tokens, awl_pm, asl_pm, rare_pm, difficulty_fp,
        |       CAST(CASE WHEN difficulty_fp <= t1 THEN 0
        |                 WHEN difficulty_fp <= t2 THEN 1
        |                 ELSE 2 END AS INTEGER) AS stage,
        |       md5(CAST(doc_id AS VARCHAR)) AS sk
        |FROM cs2, cbd ORDER BY stage, sk, doc_id""".stripMargin,
    // interpolated Kneser-Ney: continuation counts, absolute discount
    // D=3/4 as (4c2-3)/4, staged fixed-point interpolation — replayed
    // transition for transition (the q_perplexity_filter CTE skeleton)
    "q_kneser_ney" ->
      s"""WITH base AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        |    FROM documents
        |), tok AS (
        |    SELECT doc_id, unnest(toks) AS w,
        |           unnest(range(1, len(toks)+1)) AS pos
        |    FROM base WHERE len(toks) >= 2
        |), pw AS (
        |    SELECT a.doc_id, a.w AS prev, b.w AS w
        |    FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |), c2 AS (SELECT prev, w, CAST(COUNT(*) AS BIGINT) AS c2
        |          FROM pw GROUP BY 1, 2),
        |c1 AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1,
        |              CAST(COUNT(*) AS BIGINT) AS n1p
        |       FROM c2 GROUP BY 1),
        |cont AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1m FROM c2 GROUP BY 1),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM c2),
        |probs AS (
        |    SELECT prev, w,
        |           ((${TextOps.KnScale} * (4*c2 - 3)) // (4*c1))
        |           + (((3 * ${TextOps.KnScale} * n1p) // (4*c1))
        |              * ((${TextOps.KnScale} * n1m) // (SELECT nb FROM nb)))
        |             // ${TextOps.KnScale} AS p_fp
        |    FROM c2 JOIN c1 USING (prev) JOIN cont USING (w)
        |), doc AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
        |           CAST(SUM(p_fp) AS BIGINT) AS p_sum
        |    FROM pw JOIN probs USING (prev, w)
        |    GROUP BY doc_id
        |), doc2 AS (
        |    SELECT doc_id, n_trans,
        |           CAST(p_sum // n_trans AS BIGINT) AS kn_fp FROM doc
        |), tot AS (
        |    SELECT CAST(SUM(kn_fp) AS BIGINT) AS tot, COUNT(*) AS n FROM doc2
        |)
        |SELECT doc_id, n_trans, kn_fp,
        |       CAST(CASE WHEN kn_fp * (SELECT n FROM tot) >= (SELECT tot FROM tot)
        |                 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM doc2 ORDER BY doc_id""".stripMargin,
    // DSIR importance resampling: hashed-bigram class models retrained
    // declaratively, the smoothed importance ratio, the integer doc mean,
    // and the priority draw — replayed end-to-end rank for rank
    "q_dsir_select" ->
      s"""WITH dft AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 100 = 7 THEN 1 ELSE 0 END AS is_target,
        |           string_split_regex(trim(text), '\\s+') AS toks
        |    FROM documents
        |), dfe AS (
        |    SELECT doc_id, is_target,
        |           unnest(list_transform(range(1, len(toks)),
        |                  i -> array_to_string(toks[i:i+1], ' '))) AS g
        |    FROM dft WHERE len(toks) >= 2
        |), dff AS (
        |    SELECT doc_id, is_target,
        |           CAST(((strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 4096
        |               + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 256
        |               + (strpos('0123456789abcdef', substr(md5(g), 3, 1)) - 1) * 16
        |               + (strpos('0123456789abcdef', substr(md5(g), 4, 1)) - 1))
        |               % ${DsirOps.Buckets} AS BIGINT) AS f
        |    FROM dfe
        |), dcn AS (
        |    SELECT f, CAST(SUM(is_target) AS BIGINT) AS c_t,
        |           CAST(SUM(1 - is_target) AS BIGINT) AS c_r
        |    FROM dff GROUP BY f
        |), dtt AS (
        |    SELECT CAST(SUM(c_t) AS BIGINT) AS t_t,
        |           CAST(SUM(c_r) AS BIGINT) AS t_r
        |    FROM dcn
        |), dwt AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
        |           CAST(SUM((${DsirOps.Scale} * (COALESCE(c_t, 0) + 1) * (t_r + ${DsirOps.Buckets}))
        |                    // ((COALESCE(c_r, 0) + 1) * (t_t + ${DsirOps.Buckets}))) AS BIGINT) AS r_sum
        |    FROM dff LEFT JOIN dcn USING (f), dtt
        |    WHERE is_target = 0
        |    GROUP BY doc_id
        |), dsc AS (
        |    SELECT doc_id, n_feats, CAST(r_sum // n_feats AS BIGINT) AS imp_fp,
        |           CAST((strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |              + (strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |              + (strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |              + (strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) + 1
        |              AS BIGINT) AS u
        |    FROM dwt
        |), dpr AS (
        |    SELECT doc_id, n_feats, imp_fp, u,
        |           CAST(imp_fp * 65536 // u AS BIGINT) AS priority_fp
        |    FROM dsc
        |)
        |SELECT CAST(row_number() OVER (ORDER BY priority_fp DESC, doc_id)
        |            AS INTEGER) AS sample_rank,
        |       doc_id, n_feats, imp_fp, u, priority_fp
        |FROM dpr ORDER BY sample_rank LIMIT ${DsirOps.SampleK}""".stripMargin,
    // data-quality expectations: every verdict is an exact integer
    // (conditional-sum violation counts, count-distinct uniqueness,
    // NOT EXISTS referential containment, per-million rate by
    // truncating division) — replayed constraint by constraint
    "q_expectations" ->
      """WITH o AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
        |           CAST(sum(CASE WHEN o_orderstatus IS NULL
        |                    OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
        |           CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
        |                    OR o_totalprice > 1e12 THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
        |           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS u_distinct,
        |           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u_nulls
        |    FROM orders
        |), l AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |           CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
        |                    OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |           CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0
        |                    OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
        |    FROM lineitem
        |), r AS (
        |    SELECT CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
        |           CAST((SELECT count(*) FROM orders o2
        |                 WHERE o2.o_custkey IS NOT NULL AND NOT EXISTS (
        |                     SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o2.o_custkey)) AS BIGINT) AS violations
        |), v AS (
        |    SELECT 'orders.o_custkey.not_null' AS check_id, 'orders' AS tbl,
        |           n_rows, v_null AS violations FROM o
        |    UNION ALL SELECT 'orders.o_orderstatus.in_set', 'orders', n_rows, v_set FROM o
        |    UNION ALL SELECT 'orders.o_totalprice.non_negative', 'orders', n_rows, v_range FROM o
        |    UNION ALL SELECT 'orders.o_orderkey.unique', 'orders', n_rows,
        |              n_rows - u_distinct - u_nulls FROM o
        |    UNION ALL SELECT 'lineitem.l_quantity.range_1_50', 'lineitem', n_rows, v_qty FROM l
        |    UNION ALL SELECT 'lineitem.l_discount.range_0_1', 'lineitem', n_rows, v_disc FROM l
        |    UNION ALL SELECT 'orders.o_custkey.ref_customer', 'orders', n_rows, violations FROM r
        |)
        |SELECT check_id, tbl, n_rows, violations,
        |       CAST(CASE WHEN n_rows = 0 THEN 0
        |                 ELSE violations * 1000000 // n_rows END AS BIGINT) AS viol_ppm,
        |       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS ok
        |FROM v ORDER BY check_id""".stripMargin,
    // exact Jaccard set-similarity join: the oracle is the BRUTE-FORCE
    // shingle-sharing join (complete by construction for t > 0), so a
    // green gate proves the engine's prefix filter lost no true pair
    "q_jaccard_join_exact" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), sh AS (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |               range(1, len(tokens) - ${SetJoinOps.ShingleN - 2}),
        |               i -> array_to_string(tokens[i:i+${SetJoinOps.ShingleN - 1}], ' ')))) AS sh
        |    FROM tok WHERE len(tokens) >= ${SetJoinOps.ShingleN}
        |), sz AS (
        |    SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1
        |), ov AS (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           CAST(count(*) AS BIGINT) AS overlap
        |    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, za.sz AS size_a, zb.sz AS size_b, overlap,
        |       CAST(overlap * 1000000 // (za.sz + zb.sz - overlap) AS BIGINT) AS jac_ppm
        |FROM ov
        |JOIN sz za ON za.doc_id = ov.doc_a
        |JOIN sz zb ON zb.doc_id = ov.doc_b
        |WHERE ${SetJoinOps.JacDen} * overlap >=
        |      ${SetJoinOps.JacNum} * (za.sz + zb.sz - overlap)
        |ORDER BY doc_a, doc_b""".stripMargin,
    // in-engine embeddings: feature-hashed TF-IDF in exact integer fixed
    // point — md5 16-bit fold mod Dims, ratio idf by truncating division,
    // L1 normalization; every cell replayed
    "q_hashed_tfidf" ->
      s"""WITH toks AS (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        |    FROM documents
        |), tf AS (
        |    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |    FROM toks GROUP BY 1, 2
        |), dfreq AS (
        |    SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), nd AS (
        |    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
        |), wtd AS (
        |    SELECT tf.doc_id,
        |           CAST(((strpos('0123456789abcdef', substr(md5(tf.tok),1,1))-1)*4096
        |               + (strpos('0123456789abcdef', substr(md5(tf.tok),2,1))-1)*256
        |               + (strpos('0123456789abcdef', substr(md5(tf.tok),3,1))-1)*16
        |               + (strpos('0123456789abcdef', substr(md5(tf.tok),4,1))-1))
        |               % ${TfidfOps.Dims} AS INT) AS dim,
        |           tf.tf * ((${TfidfOps.IdfScale} * nd.n_docs) // dfreq.df) AS w
        |    FROM tf JOIN dfreq USING (tok), nd
        |), v AS (
        |    SELECT doc_id, dim, CAST(sum(w) AS BIGINT) AS v FROM wtd GROUP BY 1, 2
        |), l AS (
        |    SELECT doc_id, dim, v, sum(v) OVER (PARTITION BY doc_id) AS l1 FROM v
        |)
        |SELECT doc_id, dim, CAST(v * ${TfidfOps.NormScale} // l1 AS BIGINT) AS v_fp
        |FROM l ORDER BY doc_id, dim""".stripMargin,
    // exact kNN over the in-engine vectors: integer cosine^2 score
    // dot^2*1e12 // (na*nb) through HUGEINT (Spark side: DECIMAL(38)),
    // deterministic other_id tie-break
    "q_tfidf_knn" ->
      s"""WITH toks AS (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        |    FROM documents
        |), tf AS (
        |    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        |    FROM toks GROUP BY 1, 2
        |), dfreq AS (
        |    SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), nd AS (
        |    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
        |), wtd AS (
        |    SELECT tf.doc_id,
        |           CAST(((strpos('0123456789abcdef', substr(md5(tf.tok),1,1))-1)*4096
        |               + (strpos('0123456789abcdef', substr(md5(tf.tok),2,1))-1)*256
        |               + (strpos('0123456789abcdef', substr(md5(tf.tok),3,1))-1)*16
        |               + (strpos('0123456789abcdef', substr(md5(tf.tok),4,1))-1))
        |               % ${TfidfOps.Dims} AS INT) AS dim,
        |           tf.tf * ((${TfidfOps.IdfScale} * nd.n_docs) // dfreq.df) AS w
        |    FROM tf JOIN dfreq USING (tok), nd
        |), v AS (
        |    SELECT doc_id, dim, CAST(sum(w) AS BIGINT) AS v FROM wtd GROUP BY 1, 2
        |), vec AS MATERIALIZED (
        |    SELECT doc_id, dim,
        |           CAST(v * ${TfidfOps.NormScale} //
        |                (sum(v) OVER (PARTITION BY doc_id)) AS BIGINT) AS v_fp
        |    FROM v
        |), nrm AS MATERIALIZED (
        |    SELECT doc_id, CAST(sum(v_fp * v_fp) AS BIGINT) AS nrm
        |    FROM vec GROUP BY 1
        |), probes AS (
        |    SELECT doc_id AS probe_id, dim, v_fp AS pv FROM vec
        |    WHERE doc_id < ${TfidfOps.KnnProbes}
        |), dots AS (
        |    SELECT p.probe_id, x.doc_id AS other_id,
        |           CAST(sum(x.v_fp * p.pv) AS BIGINT) AS dot
        |    FROM vec x JOIN probes p USING (dim)
        |    WHERE x.doc_id <> p.probe_id GROUP BY 1, 2
        |), sc AS (
        |    SELECT probe_id, other_id,
        |           CAST(CAST(dot AS HUGEINT) * CAST(dot AS HUGEINT) * 1000000000000
        |                // (CAST(na.nrm AS HUGEINT) * CAST(nb.nrm AS HUGEINT))
        |                AS BIGINT) AS score_fp
        |    FROM dots
        |    JOIN nrm na ON na.doc_id = dots.probe_id
        |    JOIN nrm nb ON nb.doc_id = dots.other_id
        |), rk AS (
        |    SELECT probe_id, other_id, score_fp,
        |           row_number() OVER (PARTITION BY probe_id
        |               ORDER BY score_fp DESC, other_id ASC) AS rnk
        |    FROM sc
        |)
        |SELECT probe_id, CAST(rnk AS INT) AS rnk, other_id, score_fp
        |FROM rk WHERE rnk <= ${TfidfOps.TopK}
        |ORDER BY probe_id, rnk""".stripMargin,
    // authority-ranked survivors: closure from the materialized minhash
    // pair set (the best-of-cluster posture) + the 10-round exact-integer
    // walk (pagerankCtes), keep rule = max rank_fp, min doc_id
    "q_authority_survivors" -> {
      val path = OracleInputs.sqlPath("text_pairs_auth")
      pagerankCtes(10).replaceFirst("WITH ", "WITH RECURSIVE ") +
        s""", e AS (SELECT src, dst FROM read_parquet('$path/*.parquet')),
           |sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
           |reach(id, rr) AS (
           |    SELECT doc_id, doc_id FROM documents
           |    UNION
           |    SELECT s.dst, reach.rr FROM reach JOIN sym s ON s.src = reach.id
           |),
           |comp AS (SELECT id, MIN(rr) AS cluster_id FROM reach GROUP BY id),
           |dd AS (
           |    SELECT doc_id,
           |           CASE WHEN doc_id % 7 = 0 THEN source || '.co.uk'
           |                ELSE source || '.com' END AS domain
           |    FROM documents
           |),
           |da AS MATERIALIZED (
           |    SELECT dd.doc_id, dd.domain,
           |           CAST(COALESCE(r.r, 0) AS BIGINT) AS rank_fp
           |    FROM dd LEFT JOIN r10 r ON r.v = dd.domain
           |),
           |rep AS (
           |    SELECT comp.cluster_id, comp.id,
           |           row_number() OVER (PARTITION BY comp.cluster_id
           |               ORDER BY da.rank_fp DESC, comp.id ASC) AS rnk
           |    FROM comp JOIN da ON da.doc_id = comp.id
           |)
           |SELECT c.id AS doc_id, da.domain, da.rank_fp,
           |       r.id AS canonical_id,
           |       CAST(CASE WHEN c.id = r.id THEN 1 ELSE 0 END AS INTEGER)
           |           AS survives
           |FROM comp c
           |JOIN da ON da.doc_id = c.id
           |JOIN (SELECT cluster_id, id FROM rep WHERE rnk = 1) r
           |     USING (cluster_id)
           |ORDER BY doc_id""".stripMargin
    },
    // robots.txt compliance: craft, line-parse, group-select and decide
    // replayed end-to-end (longest raw pattern, allow wins ties, empty
    // rules ignored, specific agent group shadows `*`)
    "q_robots_filter" ->
      s"""WITH docs AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 7 = 0 THEN source || '.co.uk'
        |                ELSE source || '.com' END AS domain,
        |           '/Path/' || CAST(doc_id AS VARCHAR) AS path
        |    FROM documents
        |), doms AS (
        |    SELECT DISTINCT domain,
        |           COALESCE(TRY_CAST(regexp_extract(domain, '([0-9]+)', 1)
        |               AS INT), 0) % 10 AS k
        |    FROM docs
        |), rob AS (
        |    SELECT domain, k,
        |      CASE WHEN k % 2 = 0 THEN
        |        '# crafted robots for ' || domain || chr(10) ||
        |        'User-agent: ${RobotsOps.Agent}' || chr(10) ||
        |        'Disallow: /Path/' || CAST(k AS VARCHAR)
        |            || '  # note: prefix rule' || chr(10) ||
        |        'Allow: /Path/' || CAST(k AS VARCHAR) || CAST(k AS VARCHAR)
        |            || chr(10) || chr(10) ||
        |        'User-agent: *' || chr(10) || 'Disallow: /'
        |      ELSE
        |        'User-agent: *' || chr(10) ||
        |        'Disallow: /Path/*' || CAST(k AS VARCHAR) || chr(10) ||
        |        'Allow: /Path/' || CAST(k AS VARCHAR) || CAST(k AS VARCHAR)
        |            || chr(10) ||
        |        'Disallow:'
        |      END AS robots
        |    FROM doms
        |), ln AS (
        |    SELECT domain, unnest(range(1, len(ls) + 1)) AS line_no,
        |           unnest(ls) AS raw
        |    FROM (SELECT domain, string_split(robots, chr(10)) AS ls FROM rob)
        |), dv AS (
        |    SELECT domain, line_no,
        |           lower(regexp_extract(trim(regexp_replace(raw, '#.*$$', '')),
        |               '^([A-Za-z-]+)\\s*:', 1)) AS directive,
        |           trim(regexp_extract(trim(regexp_replace(raw, '#.*$$', '')),
        |               '^[A-Za-z-]+\\s*:\\s*(.*)$$', 1)) AS value
        |    FROM ln
        |), gp AS (
        |    SELECT domain, line_no, directive, value,
        |           SUM(CASE WHEN directive = 'user-agent' THEN 1 ELSE 0 END)
        |               OVER (PARTITION BY domain ORDER BY line_no) AS group_id
        |    FROM dv
        |), ag AS (
        |    SELECT domain, group_id, max(value) AS agent FROM gp
        |    WHERE directive = 'user-agent' GROUP BY 1, 2
        |), hb AS (
        |    SELECT domain, max(CASE WHEN agent = '${RobotsOps.Agent}' THEN 1
        |                            ELSE 0 END) AS has_bot
        |    FROM ag GROUP BY 1
        |), ch AS (
        |    SELECT ag.domain, ag.group_id FROM ag JOIN hb USING (domain)
        |    WHERE (hb.has_bot = 1 AND ag.agent = '${RobotsOps.Agent}')
        |       OR (hb.has_bot = 0 AND ag.agent = '*')
        |), rl AS MATERIALIZED (
        |    SELECT gp.domain, gp.directive AS rtype, gp.value AS pattern
        |    FROM gp JOIN ch ON ch.domain = gp.domain
        |                   AND ch.group_id = gp.group_id
        |    WHERE gp.directive IN ('allow', 'disallow') AND gp.value <> ''
        |), mt AS (
        |    SELECT d.doc_id, d.domain, d.path, r.rtype, r.pattern,
        |           (r.pattern IS NOT NULL AND
        |            d.path LIKE replace(r.pattern, '*', '%') || '%') AS hit
        |    FROM docs d LEFT JOIN rl r USING (domain)
        |), rk AS (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY
        |               hit DESC, length(pattern) DESC,
        |               CASE WHEN rtype = 'allow' THEN 0 ELSE 1 END ASC,
        |               pattern ASC) AS rnk
        |    FROM mt
        |)
        |SELECT doc_id, domain, path,
        |       COALESCE(max(CASE WHEN rnk = 1 AND hit THEN pattern END), '')
        |           AS rule_pattern,
        |       COALESCE(max(CASE WHEN rnk = 1 AND hit THEN rtype END), 'none')
        |           AS rule_type,
        |       CAST(CASE WHEN COALESCE(max(CASE WHEN rnk = 1 AND hit
        |                                   THEN rtype END), 'allow')
        |                 = 'disallow' THEN 0 ELSE 1 END AS INTEGER) AS allowed
        |FROM rk GROUP BY doc_id, domain, path ORDER BY doc_id""".stripMargin,
    // priority sampling: w·65536 // u with u = 16-bit md5 fold + 1 —
    // the weighted top-k replayed rank for rank
    "q_priority_sample" ->
      s"""WITH sc AS (
        |    SELECT doc_id,
        |           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
        |           CAST((strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |              + (strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |              + (strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |              + (strpos('0123456789abcdef',
        |                    substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) + 1
        |              AS BIGINT) AS u
        |    FROM documents
        |), s2 AS (
        |    SELECT doc_id, w, u, CAST(w * 65536 // u AS BIGINT) AS score_fp
        |    FROM sc
        |)
        |SELECT CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id)
        |            AS INTEGER) AS sample_rank,
        |       doc_id, w, u, score_fp
        |FROM s2 ORDER BY sample_rank LIMIT ${SamplingOps.PriorityK}""".stripMargin,
    // dataset card: per-source release summary — counts, token/char
    // totals, mean via truncating x100 fixed point, intra-source exact
    // dups (docs - distinct normalized hashes), per-million corpus share
    "q_dataset_card" ->
      """WITH docs AS (
        |    SELECT source, lang, doc_id,
        |           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |           CAST(length(text) AS BIGINT) AS n_chars,
        |           sha256(lower(trim(text))) AS text_hash
        |    FROM documents
        |), ps AS (
        |    SELECT source,
        |           CAST(count(*) AS BIGINT) AS n_docs,
        |           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
        |           CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |           CAST(count(*) - count(DISTINCT text_hash) AS BIGINT) AS dup_docs
        |    FROM docs GROUP BY 1
        |), tot AS (
        |    SELECT CAST(count(*) AS BIGINT) AS corpus_docs FROM docs
        |)
        |SELECT source, n_docs, n_langs, tokens_total, chars_total,
        |       CAST(tokens_total * 100 // n_docs AS BIGINT) AS mean_tokens_x100,
        |       dup_docs,
        |       CAST(n_docs * 1000000 // corpus_docs AS BIGINT) AS share_ppm
        |FROM ps, tot ORDER BY source""".stripMargin,
    // card drift: both snapshots' cards replayed (previous = the
    // doc_id % 10 != 0 slice), signed ppm delta, threshold + new/vanished
    // flags
    "q_card_drift" ->
      s"""WITH oldc AS (
        |    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |    FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1
        |), oldt AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |    WHERE doc_id % 10 <> 0
        |), olds AS (
        |    SELECT source, n_docs,
        |           CAST(n_docs * 1000000 // n AS BIGINT) AS share_ppm
        |    FROM oldc, oldt
        |), newc AS (
        |    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |    FROM documents GROUP BY 1
        |), newt AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |), news AS (
        |    SELECT source, n_docs,
        |           CAST(n_docs * 1000000 // n AS BIGINT) AS share_ppm
        |    FROM newc, newt
        |)
        |SELECT COALESCE(o.source, w.source) AS source,
        |       CAST(COALESCE(o.n_docs, 0) AS BIGINT) AS docs_old,
        |       CAST(COALESCE(w.n_docs, 0) AS BIGINT) AS docs_new,
        |       CAST(COALESCE(o.share_ppm, 0) AS BIGINT) AS share_old_ppm,
        |       CAST(COALESCE(w.share_ppm, 0) AS BIGINT) AS share_new_ppm,
        |       CAST(COALESCE(w.share_ppm, 0) - COALESCE(o.share_ppm, 0)
        |            AS BIGINT) AS share_delta_ppm,
        |       CAST(CASE WHEN abs(COALESCE(w.share_ppm, 0)
        |                          - COALESCE(o.share_ppm, 0))
        |                      > ${TextOps.DriftThresholdPpm}
        |                   OR COALESCE(o.n_docs, 0) = 0
        |                   OR COALESCE(w.n_docs, 0) = 0
        |                 THEN 1 ELSE 0 END AS INTEGER) AS drift
        |FROM olds o FULL OUTER JOIN news w ON o.source = w.source
        |ORDER BY source""".stripMargin,
    // sitemap coverage: sorted assembly, regex re-parse (blocks -> fields
    // -> path) and the per-(domain, path) full outer coverage join all
    // replayed
    "q_sitemap_coverage" ->
      """WITH docs AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id % 7 = 0 THEN source || '.co.uk'
        |                ELSE source || '.com' END AS domain,
        |           '/Path/' || CAST(doc_id AS VARCHAR) AS path
        |    FROM documents
        |), ent AS (
        |    SELECT domain,
        |           '<url><loc>https://' || domain || '/Path/'
        |             || CAST(doc_id AS VARCHAR) || '</loc><lastmod>2024-01-'
        |             || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |             || '</lastmod></url>' AS entry
        |    FROM docs WHERE doc_id % 5 <> 4
        |    UNION ALL
        |    SELECT domain,
        |           '<url><loc>https://' || domain || '/Path/'
        |             || CAST(doc_id + 100000 AS VARCHAR) || '</loc><lastmod>2024-01-'
        |             || lpad(CAST((doc_id + 100000) % 28 + 1 AS VARCHAR), 2, '0')
        |             || '</lastmod></url>' AS entry
        |    FROM docs WHERE doc_id % 5 = 0
        |), xml AS (
        |    SELECT domain, '<?xml version="1.0"?><urlset>'
        |             || string_agg(entry, '' ORDER BY entry) || '</urlset>' AS xml
        |    FROM ent GROUP BY 1
        |), blocks AS (
        |    SELECT domain,
        |           unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1)) AS block
        |    FROM xml
        |), parsed AS (
        |    SELECT domain,
        |           regexp_extract(block, '<loc>([^<]*)</loc>', 1) AS loc,
        |           regexp_extract(block, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod
        |    FROM blocks
        |), pp AS (
        |    SELECT domain, regexp_extract(loc, '^https://[^/]+(/.*)$', 1) AS path,
        |           lastmod, 1 AS listed
        |    FROM parsed
        |), cov AS (
        |    SELECT COALESCE(p.domain, c.domain) AS domain,
        |           p.listed, p.lastmod, c.crawled
        |    FROM pp p FULL OUTER JOIN
        |         (SELECT domain, path, 1 AS crawled FROM docs) c
        |      ON p.domain = c.domain AND p.path = c.path
        |)
        |SELECT domain,
        |       CAST(sum(COALESCE(listed, 0)) AS BIGINT) AS n_listed,
        |       CAST(sum(COALESCE(crawled, 0)) AS BIGINT) AS n_crawled,
        |       CAST(sum(CASE WHEN listed = 1 AND crawled = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_both,
        |       CAST(sum(CASE WHEN listed = 1 AND crawled IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_listed_uncrawled,
        |       CAST(sum(CASE WHEN listed IS NULL AND crawled = 1 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_crawled_unlisted,
        |       max(CASE WHEN listed = 1 THEN lastmod END) AS latest_lastmod,
        |       CAST(CASE WHEN sum(COALESCE(listed, 0)) = 0 THEN 0
        |                 ELSE sum(CASE WHEN listed = 1 AND crawled = 1
        |                          THEN 1 ELSE 0 END) * 1000000
        |                      // sum(COALESCE(listed, 0)) END AS BIGINT)
        |           AS coverage_ppm
        |FROM cov GROUP BY domain ORDER BY domain""".stripMargin,
    // cohort retention: first-active-week cohorts x week offsets over
    // the distinct (user, week) activity set, exact ns-week arithmetic
    "q_retention_cohorts" ->
      s"""WITH uw AS (
        |    SELECT DISTINCT user_id,
        |           epoch_ns(ts) // ${EventOps.WeekNs} AS week
        |    FROM events
        |), ch AS (
        |    SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1
        |)
        |SELECT ch.cohort_week,
        |       uw.week - ch.cohort_week AS week_offset,
        |       CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_users
        |FROM uw JOIN ch USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,
    // strict-order funnel: first-touch chaining (each step strictly after
    // the previous step's earliest time), per-step conversion in ppm
    "q_funnel_steps" ->
      """WITH e AS (
        |    SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events
        |), s1 AS (
        |    SELECT user_id, MIN(tsn) AS t1 FROM e
        |    WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |    SELECT e.user_id, MIN(e.tsn) AS t2
        |    FROM e JOIN s1 USING (user_id)
        |    WHERE e.event_type = 'click' AND e.tsn > s1.t1 GROUP BY 1
        |), s3 AS (
        |    SELECT e.user_id, MIN(e.tsn) AS t3
        |    FROM e JOIN s2 USING (user_id)
        |    WHERE e.event_type = 'purchase' AND e.tsn > s2.t2 GROUP BY 1
        |), c AS (
        |    SELECT 1 AS step, 'signup' AS event_type,
        |           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |    UNION ALL
        |    SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |    UNION ALL
        |    SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
        |), t AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n_top FROM s1
        |)
        |SELECT CAST(step AS INTEGER) AS step, event_type, n_users,
        |       CAST(CASE WHEN n_top = 0 THEN 0
        |                 ELSE n_users * 1000000 // n_top END AS BIGINT)
        |           AS conv_ppm
        |FROM c, t ORDER BY step""".stripMargin,
    // incremental exact Jaccard: brute force over the FULL corpus,
    // restricted to pairs touching the % 5 = 0 batch — green proves the
    // frozen-order incremental path is exact, not approximately recalled
    "q_jaccard_join_incremental" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), sh AS (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |               range(1, len(tokens) - ${SetJoinOps.ShingleN - 2}),
        |               i -> array_to_string(tokens[i:i+${SetJoinOps.ShingleN - 1}], ' ')))) AS sh
        |    FROM tok WHERE len(tokens) >= ${SetJoinOps.ShingleN}
        |), sz AS (
        |    SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1
        |), ov AS (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           CAST(count(*) AS BIGINT) AS overlap
        |    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b, za.sz AS size_a, zb.sz AS size_b, overlap,
        |       CAST(overlap * 1000000 // (za.sz + zb.sz - overlap) AS BIGINT) AS jac_ppm
        |FROM ov
        |JOIN sz za ON za.doc_id = ov.doc_a
        |JOIN sz zb ON zb.doc_id = ov.doc_b
        |WHERE ${SetJoinOps.JacDen} * overlap >=
        |      ${SetJoinOps.JacNum} * (za.sz + zb.sz - overlap)
        |  AND (doc_a % 5 = 0 OR doc_b % 5 = 0)
        |ORDER BY doc_a, doc_b""".stripMargin,
    // SCD Type 2: run-collapse of the per-user status stream into
    // versioned half-open validity intervals. The SAME replay gates the
    // batch collapse AND the incremental stored maintenance — a green
    // q_scd2_incremental proves the appended state is bit-equal to a
    // from-scratch collapse.
    "q_scd2_history" -> scd2HistorySql,
    "q_scd2_incremental" -> scd2HistorySql,
    // Fuzzy edit-1 vocabulary join: the engine blocks on deletion
    // neighborhoods (SymSpell); the oracle replays BRUTE FORCE over the
    // distinct vocabulary — green proves the blocking lost no true pair.
    "q_fuzzy_vocab_edit1" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        |    FROM documents
        |), base AS (
        |    SELECT doc_id, toks[1] || toks[2] AS clean
        |    FROM tok WHERE len(toks) >= 2
        |), feed AS (
        |    SELECT doc_id, CASE WHEN doc_id % 3 = 1 THEN
        |               substr(clean, 1, CAST(doc_id % length(clean) AS INT)) ||
        |               substr(clean, CAST(doc_id % length(clean) AS INT) + 2)
        |           ELSE clean END AS name
        |    FROM base WHERE length(clean) >= ${graft.ops.FuzzyOps.MinLen}
        |), vocab AS (
        |    SELECT name, CAST(count(*) AS BIGINT) AS freq FROM feed GROUP BY 1
        |)
        |SELECT a.name AS word_a, b.name AS word_b,
        |       a.freq AS freq_a, b.freq AS freq_b,
        |       CASE WHEN a.freq >= b.freq THEN a.name ELSE b.name END AS canon
        |FROM vocab a JOIN vocab b
        |  ON a.name < b.name AND levenshtein(a.name, b.name) = 1
        |ORDER BY word_a, word_b""".stripMargin,
    // Winnowing (MOSS): per window of W gram hashes select the min,
    // rightmost on ties — one struct-min window pass, replayed
    // cell-for-cell (md5-prefix hex strings order like the numbers).
    "q_winnow_fingerprint" ->
      s"""$winnowSelCte
        |SELECT doc_id, pos, h FROM sel ORDER BY doc_id, pos""".stripMargin,
    "q_copy_candidates" ->
      s"""$winnowSelCte, dh AS (
        |    SELECT DISTINCT doc_id, h FROM sel
        |), cnt AS (
        |    SELECT h, count(*) AS nd FROM dh GROUP BY 1
        |), pruned AS (
        |    SELECT dh.doc_id, dh.h FROM dh JOIN cnt USING (h)
        |    WHERE cnt.nd <= ${graft.ops.WinnowOps.MaxDocsPerPrint}
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= ${graft.ops.WinnowOps.MinShared}
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Dense hourly grid with LOCF: the carried value is a deterministic
    // ROW pick (latest by ts, event_id), never an aggregate over doubles.
    "q_gapfill_locf" ->
      s"""WITH ev AS (
        |    SELECT user_id, epoch_ns(ts) // ${graft.ops.TimeSeriesOps.HourNs}
        |               AS bucket,
        |           epoch_ns(ts) AS tsn, event_id, value
        |    FROM events
        |), bkt AS (
        |    SELECT user_id, bucket, n, value AS v FROM (
        |        SELECT *,
        |               row_number() OVER (PARTITION BY user_id, bucket
        |                   ORDER BY tsn DESC, event_id DESC) AS rn,
        |               count(*) OVER (PARTITION BY user_id, bucket) AS n
        |        FROM ev) WHERE rn = 1
        |), grid AS (
        |    SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
        |    FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        |          FROM bkt GROUP BY 1)
        |), j AS (
        |    SELECT g.user_id, g.bucket, coalesce(b.n, 0) AS n_events, b.v
        |    FROM grid g LEFT JOIN bkt b USING (user_id, bucket)
        |)
        |SELECT user_id, bucket, n_events,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |           ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND
        |           CURRENT ROW) AS value_filled
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    // Robust per-type outlier summary: lower median + MAD over integer
    // cents (rank (n+1) div 2 by (value, event_id) — no interpolation).
    // The SAME replay gates the raw-row query AND the histogram-served
    // incremental maintenance (q_outlier_mad_incremental).
    "q_outlier_mad" -> madOracleSql,
    "q_outlier_mad_incremental" -> madOracleSql,
    // OLS trend: exact rational slope/intercept through HUGEINT, signs
    // split before the truncating division (negative `//` conventions
    // are not cross-engine portable)
    "q_ols_trend" ->
      s"""WITH olm AS (
        |    SELECT r.r_name,
        |           (date_part('year', o.o_orderdate) - 1995) * 12
        |             + date_part('month', o.o_orderdate) - 1 AS mx,
        |           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        |    FROM orders o
        |    JOIN customer c ON c.c_custkey = o.o_custkey
        |    JOIN nation n ON n.n_nationkey = c.c_nationkey
        |    JOIN region r ON r.r_regionkey = n.n_regionkey
        |    GROUP BY 1, 2
        |), ols AS (
        |    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(mx) AS BIGINT) AS sx, SUM(y) AS sy,
        |           CAST(SUM(mx * mx) AS BIGINT) AS sxx,
        |           SUM(CAST(mx AS HUGEINT) * y) AS sxy
        |    FROM olm GROUP BY 1
        |), olv AS (
        |    SELECT r_name, n AS n_months,
        |           CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS s_num,
        |           CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy
        |               AS i_num,
        |           CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |               AS den
        |    FROM ols
        |)
        |SELECT r_name, n_months,
        |       CAST(CASE WHEN s_num < 0
        |                 THEN -((-s_num * ${TimeSeriesOps.OlsScale}) // den)
        |                 ELSE (s_num * ${TimeSeriesOps.OlsScale}) // den
        |            END AS BIGINT) AS slope_micro_cents,
        |       CAST(CASE WHEN i_num < 0
        |                 THEN -((-i_num * ${TimeSeriesOps.OlsScale}) // den)
        |                 ELSE (i_num * ${TimeSeriesOps.OlsScale}) // den
        |            END AS BIGINT) AS intercept_micro_cents
        |FROM olv ORDER BY r_name""".stripMargin,
    // CUSUM: the nonlinear max(0, ·) recurrence replayed as the same
    // explicit day-order fold (list_reduce over a prepended init)
    "q_cusum_changepoint" ->
      s"""WITH cde AS (
        |    SELECT event_type, epoch_ns(ts) // ${EventOps.DayNs} AS day,
        |           CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM events GROUP BY 1, 2
        |), cgr AS (
        |    SELECT event_type, unnest(range(mn, mx + 1)) AS day
        |    FROM (SELECT event_type, min(day) AS mn, max(day) AS mx
        |          FROM cde GROUP BY 1)
        |), cda AS (
        |    SELECT g.event_type, g.day,
        |           CAST(coalesce(e.cnt, 0) AS BIGINT) AS cnt
        |    FROM cgr g LEFT JOIN cde e USING (event_type, day)
        |), crf AS (
        |    SELECT event_type, CAST(SUM(cnt) // COUNT(*) AS BIGINT) AS k
        |    FROM cda GROUP BY 1
        |), crk AS (
        |    SELECT event_type, day, cnt,
        |           CAST(row_number() OVER (PARTITION BY event_type
        |               ORDER BY day) AS INTEGER) AS rn
        |    FROM cda
        |), car AS (
        |    SELECT event_type, list(cnt ORDER BY day) AS xs
        |    FROM cda GROUP BY 1
        |)
        |SELECT r.event_type, r.day, r.cnt, f.k,
        |       CAST(list_reduce(
        |           list_prepend(CAST(0 AS BIGINT), list_slice(a.xs, 1, r.rn)),
        |           (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x - f.k))
        |           AS BIGINT) AS cusum_hi,
        |       CAST(list_reduce(
        |           list_prepend(CAST(0 AS BIGINT), list_slice(a.xs, 1, r.rn)),
        |           (acc, x) -> greatest(CAST(0 AS BIGINT), acc + f.k - x))
        |           AS BIGINT) AS cusum_lo,
        |       CAST(CASE WHEN cusum_hi > ${TimeSeriesOps.CusumH} * f.k
        |            THEN 1 ELSE 0 END AS INTEGER) AS alarm_hi,
        |       CAST(CASE WHEN cusum_lo > ${TimeSeriesOps.CusumH} * f.k
        |            THEN 1 ELSE 0 END AS INTEGER) AS alarm_lo
        |FROM crk r JOIN car a USING (event_type) JOIN crf f USING (event_type)
        |ORDER BY event_type, day""".stripMargin,
    // EWMA: seeded fixed-point fold, each level truncating once in day
    // order; resid = one-step-ahead error off the predecessor fold
    "q_ewma_smooth" -> {
      def lvl(upTo: String) =
        s"list_reduce(list_prepend(a.xs[1] * ${TimeSeriesOps.EwmaScale}, " +
          s"list_slice(a.xs, 2, $upTo)), " +
          s"(acc, x) -> (${TimeSeriesOps.EwmaNum} * x * " +
          s"${TimeSeriesOps.EwmaScale} + " +
          s"${TimeSeriesOps.EwmaDen - TimeSeriesOps.EwmaNum} * acc) " +
          s"// ${TimeSeriesOps.EwmaDen})"
      s"""WITH cde AS (
        |    SELECT event_type, epoch_ns(ts) // ${EventOps.DayNs} AS day,
        |           CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM events GROUP BY 1, 2
        |), cgr AS (
        |    SELECT event_type, unnest(range(mn, mx + 1)) AS day
        |    FROM (SELECT event_type, min(day) AS mn, max(day) AS mx
        |          FROM cde GROUP BY 1)
        |), cda AS (
        |    SELECT g.event_type, g.day,
        |           CAST(coalesce(e.cnt, 0) AS BIGINT) AS cnt
        |    FROM cgr g LEFT JOIN cde e USING (event_type, day)
        |), crk AS (
        |    SELECT event_type, day, cnt,
        |           CAST(row_number() OVER (PARTITION BY event_type
        |               ORDER BY day) AS INTEGER) AS rn
        |    FROM cda
        |), car AS (
        |    SELECT event_type, list(cnt ORDER BY day) AS xs
        |    FROM cda GROUP BY 1
        |)
        |SELECT r.event_type, r.day, r.cnt,
        |       CAST(${lvl("r.rn")} AS BIGINT) AS level_fp,
        |       CAST(CASE WHEN r.rn = 1 THEN 0
        |            ELSE r.cnt * ${TimeSeriesOps.EwmaScale}
        |                 - ${lvl("r.rn - 1")} END AS BIGINT) AS resid_fp
        |FROM crk r JOIN car a USING (event_type)
        |ORDER BY event_type, day""".stripMargin
    },
    // association rules: supports as order counts, confidence/lift as
    // exact ppm rationals through HUGEINT
    "q_assoc_rules" ->
      s"""WITH abk AS (
        |    SELECT DISTINCT l.l_orderkey, p.p_brand
        |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |), anb AS (
        |    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM abk
        |), asi AS (
        |    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS supp
        |    FROM abk GROUP BY 1
        |), apr AS (
        |    SELECT a.p_brand AS ante, b.p_brand AS cons,
        |           CAST(COUNT(*) AS BIGINT) AS supp_pair
        |    FROM abk a JOIN abk b ON a.l_orderkey = b.l_orderkey
        |                         AND a.p_brand < b.p_brand
        |    GROUP BY 1, 2 HAVING COUNT(*) >= ${BasketOps.MinSupp}
        |), aru AS (
        |    SELECT ante, cons, supp_pair FROM apr
        |    UNION ALL SELECT cons, ante, supp_pair FROM apr
        |)
        |SELECT r.ante, r.cons, r.supp_pair,
        |       sa.supp AS supp_ante, sc.supp AS supp_cons,
        |       CAST((r.supp_pair * ${BasketOps.Ppm}) // sa.supp AS BIGINT)
        |           AS conf_ppm,
        |       CAST((CAST(r.supp_pair AS HUGEINT) * anb.n * ${BasketOps.Ppm})
        |            // (CAST(sa.supp AS HUGEINT) * sc.supp) AS BIGINT)
        |           AS lift_ppm
        |FROM aru r
        |JOIN asi sa ON sa.p_brand = r.ante
        |JOIN asi sc ON sc.p_brand = r.cons, anb
        |ORDER BY ante, cons""".stripMargin,
    // 2-D skyline: sort-based rendering — two RANGE-framed running
    // maxima over the price order replace the all-pairs dominance join.
    // The SAME replay gates the single-pass query AND the stored
    // build/fold/serve lifecycle (q_skyline_incremental).
    "q_skyline" -> skylineOracleSql,
    // linear multi-touch attribution: equal split in micro-cents, the
    // division remainder pinned to the most recent click (conservation)
    "q_attribution_linear" ->
      s"""WITH apu AS (
        |    SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS pts,
        |           CAST(round(value * 100) AS BIGINT) * ${EventOps.AttribScale}
        |               AS credit_total
        |    FROM events WHERE event_type = 'purchase'
        |), acl AS (
        |    SELECT event_id AS click_id, user_id AS c_user, epoch_ns(ts) AS cts
        |    FROM events WHERE event_type = 'click'
        |), apd AS (
        |    SELECT * FROM apu JOIN acl ON c_user = user_id
        |        AND cts < pts AND cts >= pts - ${EventOps.AttribWindowNs}
        |), asp AS (
        |    SELECT *,
        |           CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
        |               AS n,
        |           row_number() OVER (PARTITION BY purchase_id
        |               ORDER BY cts DESC, click_id DESC) AS rn
        |    FROM apd
        |)
        |SELECT click_id, c_user AS user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(credit_total // n
        |                + CASE WHEN rn = 1
        |                  THEN credit_total - (credit_total // n) * n
        |                  ELSE 0 END) AS BIGINT) AS credit_micro_cents
        |FROM asp GROUP BY 1, 2 ORDER BY click_id""".stripMargin,
    // entity resolution: crafted single-edit corruption replayed, then
    // prefix/suffix blocking + levenshtein verify + argmin pick
    "q_entity_resolution" ->
      s"""WITH erc AS (
        |    SELECT p_partkey AS listing_id, p_name,
        |           p_partkey % length(p_name) + 1 AS q
        |    FROM part
        |), erd AS (
        |    SELECT listing_id,
        |           CASE listing_id % 3
        |             WHEN 0 THEN concat(substr(p_name, 1, q - 1),
        |                               substr(p_name, q + 1))
        |             WHEN 1 THEN concat(substr(p_name, 1, q),
        |                               substr(p_name, q))
        |             ELSE p_name END AS dirty_name
        |    FROM erc
        |), ern AS (SELECT DISTINCT p_name FROM part
        |), erb AS (
        |    SELECT listing_id, dirty_name,
        |           substr(dirty_name, 1, ${EntityOps.BlockChars}) AS bk
        |    FROM erd
        |    UNION ALL
        |    SELECT listing_id, dirty_name,
        |           substr(dirty_name, greatest(length(dirty_name)
        |               - ${EntityOps.BlockChars - 1}, 1)) AS bk
        |    FROM erd
        |), ecb AS (
        |    SELECT p_name, substr(p_name, 1, ${EntityOps.BlockChars}) AS bk
        |    FROM ern
        |    UNION ALL
        |    SELECT p_name, substr(p_name, greatest(length(p_name)
        |               - ${EntityOps.BlockChars - 1}, 1)) AS bk
        |    FROM ern
        |), erx AS (
        |    SELECT DISTINCT d.listing_id, d.dirty_name, c.p_name
        |    FROM erb d JOIN ecb c USING (bk)
        |), erv AS (
        |    SELECT listing_id, dirty_name, p_name,
        |           CAST(levenshtein(dirty_name, p_name) AS INTEGER) AS dist
        |    FROM erx
        |    WHERE levenshtein(dirty_name, p_name) <= ${EntityOps.EditMax}
        |)
        |SELECT listing_id, dirty_name, p_name AS resolved_name, dist
        |FROM (SELECT *, row_number() OVER (PARTITION BY listing_id
        |          ORDER BY dist, p_name) AS rn FROM erv)
        |WHERE rn = 1 ORDER BY listing_id""".stripMargin,
    // mergeable bottom-K row sample: per-day medians + the range row
    // answered from merged day samples (the shard-merge law). The SAME
    // replay gates the single-pass query AND the stored build/append/
    // serve lifecycle (q_reservoir_incremental) — the madOracleSql
    // double-use posture.
    "q_reservoir_daily" -> reservoirOracleSql,
    "q_reservoir_incremental" -> reservoirOracleSql,
    // cohort LTV: money-weighted retention triangle, exact cents, with
    // the cumulative curve over the cohort-grid-bounded cell frame
    "q_cohort_ltv" ->
      s"""WITH cuw AS (
        |    SELECT DISTINCT user_id, epoch_ns(ts) // ${EventOps.WeekNs}
        |               AS week
        |    FROM events
        |), cch AS (
        |    SELECT user_id, min(week) AS cohort_week FROM cuw GROUP BY 1
        |), crv AS (
        |    SELECT user_id, epoch_ns(ts) // ${EventOps.WeekNs} AS week,
        |           CAST(round(value * 100) AS BIGINT) AS cents
        |    FROM events WHERE event_type = 'purchase'
        |), ccl AS (
        |    SELECT c.cohort_week, r.week - c.cohort_week AS week_offset,
        |           CAST(SUM(r.cents) AS BIGINT) AS revenue_cents,
        |           CAST(COUNT(DISTINCT r.user_id) AS BIGINT) AS n_buyers
        |    FROM crv r JOIN cch c USING (user_id) GROUP BY 1, 2
        |)
        |SELECT cohort_week, week_offset, revenue_cents, n_buyers,
        |       CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_week
        |           ORDER BY week_offset) AS BIGINT) AS ltv_cum_cents
        |FROM ccl ORDER BY cohort_week, week_offset""".stripMargin,
    // bounded-round k-core peel hash-checked against unrolled stages
    "q_kcore_domains" -> kcoreOracle(graft.ops.LinkOps.KCoreK,
      graft.ops.LinkOps.KCoreRounds),
    // sweep-line interval concurrency: two delta rows per interval, one
    // day-keyed collapse, running sum on the day grid
    "q_interval_concurrency" ->
      s"""WITH civ AS (
        |    SELECT epoch_ns(o_orderdate) // ${EventOps.DayNs} AS d0,
        |           epoch_ns(o_orderdate) // ${EventOps.DayNs}
        |             + o_orderkey % 7 + 1 AS d1
        |    FROM orders
        |), cdl AS (
        |    SELECT day, CAST(SUM(opened) AS BIGINT) AS n_open,
        |           CAST(SUM(closed) AS BIGINT) AS n_close
        |    FROM (
        |        SELECT d0 AS day, 1 AS opened, 0 AS closed FROM civ
        |        UNION ALL
        |        SELECT d1 AS day, 0 AS opened, 1 AS closed FROM civ
        |    ) GROUP BY 1
        |)
        |SELECT day, n_open, n_close,
        |       CAST(SUM(n_open - n_close) OVER (ORDER BY day) AS BIGINT)
        |           AS n_active
        |FROM cdl ORDER BY day""".stripMargin,
    // windowed funnel: each step within FunnelStepNs of the previous
    // step's conversion instant
    "q_funnel_windowed" ->
      s"""WITH e AS (
        |    SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events
        |), s1 AS (
        |    SELECT user_id, MIN(tsn) AS t1 FROM e
        |    WHERE event_type = 'signup' GROUP BY 1
        |), s2 AS (
        |    SELECT e.user_id, MIN(e.tsn) AS t2
        |    FROM e JOIN s1 USING (user_id)
        |    WHERE e.event_type = 'click' AND e.tsn > s1.t1
        |      AND e.tsn <= s1.t1 + ${EventOps.FunnelStepNs} GROUP BY 1
        |), s3 AS (
        |    SELECT e.user_id, MIN(e.tsn) AS t3
        |    FROM e JOIN s2 USING (user_id)
        |    WHERE e.event_type = 'purchase' AND e.tsn > s2.t2
        |      AND e.tsn <= s2.t2 + ${EventOps.FunnelStepNs} GROUP BY 1
        |), c AS (
        |    SELECT 1 AS step, 'signup' AS event_type,
        |           CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |    UNION ALL
        |    SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |    UNION ALL
        |    SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
        |), t AS (
        |    SELECT CAST(count(*) AS BIGINT) AS n_top FROM s1
        |)
        |SELECT CAST(step AS INTEGER) AS step, event_type, n_users,
        |       CAST(CASE WHEN n_top = 0 THEN 0
        |                 ELSE n_users * 1000000 // n_top END AS BIGINT)
        |           AS conv_ppm
        |FROM c, t ORDER BY step""".stripMargin,
    // gaps-and-islands: the id - row_number grouping key
    "q_id_islands" ->
      """WITH ii AS (
        |    SELECT doc_id,
        |           doc_id - row_number() OVER (ORDER BY doc_id) AS grp
        |    FROM documents
        |)
        |SELECT CAST(MIN(doc_id) AS BIGINT) AS island_start,
        |       CAST(MAX(doc_id) AS BIGINT) AS island_end,
        |       CAST(COUNT(*) AS BIGINT) AS island_len
        |FROM ii GROUP BY grp ORDER BY island_start""".stripMargin,
    // stored skyline maintenance: the SAME fresh replay as q_skyline
    // gates the merge-law fold + stored serve (double-use posture)
    "q_skyline_incremental" -> skylineOracleSql,
    // exact Mann-Whitney AUC off the score histogram: integer midrank2
    // = 2·cnt_lt + n + 1, U2 = 2U, one non-negative HUGEINT division
    "q_classifier_auc" ->
      s"""WITH $qcKeptCte
        |, auh AS (
        |    SELECT q.q_score, CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(CASE WHEN q.doc_id % 100 = 7 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS np
        |    FROM qsc2 q GROUP BY 1
        |), aur AS (
        |    SELECT np, n,
        |           2 * COALESCE(SUM(n) OVER (ORDER BY q_score
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |             + n + 1 AS midrank2
        |    FROM auh
        |), aut AS (
        |    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |           CAST(SUM(n - np) AS BIGINT) AS n_neg,
        |           CAST(SUM(np * midrank2) AS BIGINT) AS r2_pos
        |    FROM aur
        |)
        |SELECT n_pos, n_neg,
        |       CAST(r2_pos - n_pos * (n_pos + 1) AS BIGINT) AS u2,
        |       CAST((CAST(r2_pos - n_pos * (n_pos + 1) AS HUGEINT)
        |             * ${TextOps.QcScale})
        |            // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
        |           AS auc_ppm
        |FROM aut""".stripMargin,
    // confusion matrix + P/R/F1 in exact ppm (F1 single-division form)
    "q_classifier_prf" ->
      s"""WITH $qcKeptCte
        |, prl AS (
        |    SELECT CASE WHEN q.doc_id % 100 = 7 THEN 1 ELSE 0 END AS pos,
        |           CASE WHEN q.doc_id IN (SELECT doc_id FROM qckept)
        |                THEN 1 ELSE 0 END AS keep
        |    FROM qsc2 q
        |), pcm AS (
        |    SELECT CAST(SUM(pos * keep) AS BIGINT) AS tp,
        |           CAST(SUM((1 - pos) * keep) AS BIGINT) AS fp,
        |           CAST(SUM(pos * (1 - keep)) AS BIGINT) AS fn,
        |           CAST(SUM((1 - pos) * (1 - keep)) AS BIGINT) AS tn
        |    FROM prl
        |)
        |SELECT tp, fp, fn, tn,
        |       CAST(CASE WHEN tp + fp = 0 THEN 0
        |            ELSE tp * ${TextOps.QcScale} // (tp + fp) END AS BIGINT)
        |           AS precision_ppm,
        |       CAST(CASE WHEN tp + fn = 0 THEN 0
        |            ELSE tp * ${TextOps.QcScale} // (tp + fn) END AS BIGINT)
        |           AS recall_ppm,
        |       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
        |            ELSE 2 * tp * ${TextOps.QcScale} // (2 * tp + fp + fn)
        |            END AS BIGINT) AS f1_ppm
        |FROM pcm""".stripMargin,
    // TWAP: LOCF-held segments, exact HUGEINT numerator, single-event
    // users excluded (no held segment)
    "q_time_weighted_avg" ->
      s"""WITH twe AS (
        |    SELECT user_id, epoch_ns(ts) AS tsn, event_id,
        |           CAST(round(value * 100) AS BIGINT) AS cents
        |    FROM events
        |), tws AS (
        |    SELECT user_id, tsn, cents,
        |           lead(tsn) OVER (PARTITION BY user_id
        |               ORDER BY tsn, event_id) AS next_ts
        |    FROM twe
        |)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(MAX(next_ts) - MIN(tsn) AS BIGINT) AS span_ns,
        |       CAST((SUM(CAST(next_ts - tsn AS HUGEINT) * cents)
        |             * ${graft.ops.TimeSeriesOps.TwapScale})
        |            // (MAX(next_ts) - MIN(tsn)) AS BIGINT)
        |           AS twap_milli_cents
        |FROM tws WHERE next_ts > tsn
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // period-over-period: lag on the observed month grid, sign-split
    // ppm change, NULL deltas at grid gaps
    "q_period_over_period" ->
      s"""WITH pom AS (
        |    SELECT r.r_name,
        |           (date_part('year', o.o_orderdate) - 1995) * 12
        |             + date_part('month', o.o_orderdate) - 1 AS mx,
        |           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        |    FROM orders o
        |    JOIN customer c ON c.c_custkey = o.o_custkey
        |    JOIN nation n ON n.n_nationkey = c.c_nationkey
        |    JOIN region r ON r.r_regionkey = n.n_regionkey
        |    GROUP BY 1, 2
        |), pol AS (
        |    SELECT r_name, mx AS month_idx, y AS revenue_cents,
        |           CASE WHEN lag(mx) OVER (PARTITION BY r_name ORDER BY mx)
        |                     = mx - 1
        |                THEN lag(y) OVER (PARTITION BY r_name ORDER BY mx)
        |                END AS prev_cents
        |    FROM pom
        |), pod AS (
        |    SELECT *, revenue_cents - prev_cents AS delta_cents FROM pol
        |)
        |SELECT r_name, CAST(month_idx AS BIGINT) AS month_idx,
        |       CAST(revenue_cents AS BIGINT) AS revenue_cents,
        |       CAST(prev_cents AS BIGINT) AS prev_cents,
        |       CAST(delta_cents AS BIGINT) AS delta_cents,
        |       CAST(CASE WHEN prev_cents IS NULL THEN NULL
        |            WHEN delta_cents < 0
        |              THEN -((-delta_cents * ${TimeSeriesOps.OlsScale})
        |                     // prev_cents)
        |            ELSE (delta_cents * ${TimeSeriesOps.OlsScale})
        |                 // prev_cents END AS BIGINT) AS pct_change_ppm
        |FROM pod ORDER BY r_name, month_idx""".stripMargin,
    // trailing-hour rate: user-keyed RANGE frame over exact ns
    "q_sliding_rate" ->
      s"""WITH sre AS (
        |    SELECT event_id, user_id, epoch_ns(ts) AS tsn FROM events
        |)
        |SELECT event_id, user_id,
        |       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY tsn
        |           RANGE BETWEEN ${graft.ops.TimeSeriesOps.HourNs - 1}
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_1h,
        |       CAST(CASE WHEN COUNT(*) OVER (PARTITION BY user_id
        |           ORDER BY tsn RANGE BETWEEN
        |           ${graft.ops.TimeSeriesOps.HourNs - 1} PRECEDING
        |           AND CURRENT ROW) > ${EventOps.BurstThreshold}
        |           THEN 1 ELSE 0 END AS INTEGER) AS burst
        |FROM sre ORDER BY event_id""".stripMargin,
    // rolling 7-day distinct actives: bounded fan-out + exact distinct
    "q_trailing_wau" ->
      s"""WITH wua AS (
        |    SELECT DISTINCT user_id, epoch_ns(ts) // ${EventOps.DayNs}
        |               AS day
        |    FROM events
        |), wub AS (SELECT min(day) AS mn, max(day) AS mx FROM wua
        |), wuf AS (
        |    SELECT a.user_id,
        |           unnest(range(a.day, least(a.day + 7,
        |               (SELECT mx FROM wub) + 1))) AS target_day
        |    FROM wua a
        |)
        |SELECT target_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        |FROM wuf WHERE target_day >= (SELECT mn FROM wub)
        |GROUP BY 1 ORDER BY target_day""".stripMargin,
    // ABC bands: running revenue share cross-multiplied against the
    // 80/95 cuts — no division anywhere
    "q_abc_classification" ->
      """WITH abr AS (
        |    SELECT l_partkey,
        |           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
        |               AS BIGINT) AS revenue_cents
        |    FROM lineitem GROUP BY 1
        |), abt AS (
        |    SELECT CAST(SUM(revenue_cents) AS BIGINT) AS total FROM abr
        |), abc AS (
        |    SELECT l_partkey, revenue_cents,
        |           CAST(SUM(revenue_cents) OVER (ORDER BY revenue_cents
        |               DESC, l_partkey ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW) AS BIGINT) AS cum_cents
        |    FROM abr
        |)
        |SELECT l_partkey AS p_partkey, revenue_cents, cum_cents,
        |       CASE WHEN cum_cents * 100 <= abt.total * 80 THEN 'A'
        |            WHEN cum_cents * 100 <= abt.total * 95 THEN 'B'
        |            ELSE 'C' END AS abc_class
        |FROM abc, abt ORDER BY revenue_cents DESC, p_partkey""".stripMargin,
    // snapshot reconciliation: crafted v2 replayed, one full outer join
    // on the key, per-class counts + value sums
    "q_snapshot_diff" ->
      """WITH sdv1 AS (
        |    SELECT o_orderkey AS k,
        |           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |    FROM orders
        |), sdmx AS (SELECT max(k) AS mk FROM sdv1
        |), sdv2 AS (
        |    SELECT k, CASE WHEN k % 13 = 5 THEN cents + 500
        |                   ELSE cents END AS cents
        |    FROM sdv1 WHERE k % 97 <> 3
        |    UNION ALL
        |    SELECT k + (SELECT mk FROM sdmx) + 1, cents
        |    FROM sdv1 WHERE k % 101 = 7
        |), sdj AS (
        |    SELECT a.cents AS c1, b.cents AS c2
        |    FROM sdv1 a FULL OUTER JOIN sdv2 b ON a.k = b.k
        |)
        |SELECT CASE WHEN c2 IS NULL THEN 'removed'
        |            WHEN c1 IS NULL THEN 'added'
        |            WHEN c1 <> c2 THEN 'changed'
        |            ELSE 'unchanged' END AS change_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(coalesce(SUM(c1), 0) AS BIGINT) AS sum_cents_v1,
        |       CAST(coalesce(SUM(c2), 0) AS BIGINT) AS sum_cents_v2
        |FROM sdj GROUP BY 1 ORDER BY 1""".stripMargin,
    // Apriori level 3: order-keyed triple join, HUGEINT 3-way lift
    "q_frequent_triples" ->
      s"""WITH fbk AS (
        |    SELECT DISTINCT l.l_orderkey, p.p_brand
        |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |), fnb AS (
        |    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM fbk
        |), fsi AS (
        |    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS supp
        |    FROM fbk GROUP BY 1
        |), ftr AS (
        |    SELECT a.p_brand AS i1, b.p_brand AS i2, c.p_brand AS i3,
        |           CAST(COUNT(*) AS BIGINT) AS supp_triple
        |    FROM fbk a
        |    JOIN fbk b ON a.l_orderkey = b.l_orderkey
        |              AND a.p_brand < b.p_brand
        |    JOIN fbk c ON a.l_orderkey = c.l_orderkey
        |              AND b.p_brand < c.p_brand
        |    GROUP BY 1, 2, 3
        |    HAVING COUNT(*) >= ${BasketOps.MinSuppTriple}
        |)
        |SELECT t.i1, t.i2, t.i3, t.supp_triple,
        |       CAST((CAST(t.supp_triple AS HUGEINT) * fnb.n * fnb.n
        |             * ${BasketOps.Ppm})
        |            // (CAST(s1.supp AS HUGEINT) * s2.supp * s3.supp)
        |            AS BIGINT) AS lift_ppm
        |FROM ftr t
        |JOIN fsi s1 ON s1.p_brand = t.i1
        |JOIN fsi s2 ON s2.p_brand = t.i2
        |JOIN fsi s3 ON s3.p_brand = t.i3, fnb
        |ORDER BY i1, i2, i3""".stripMargin,
    // deterministic MLM masking: position rule replayed, masked text
    // cell hash-compared
    "q_mask_spans" ->
      s"""WITH mtk AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |)
        |SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
        |       CASE WHEN len(tokens) = 0 THEN ''
        |            ELSE array_to_string(list_transform(
        |                range(1, len(tokens) + 1),
        |                p -> CASE WHEN (doc_id * 31 + p)
        |                               % ${TextOps.MaskEvery} = 0
        |                     THEN '[MASK]' ELSE tokens[p] END), ' ')
        |            END AS masked_text,
        |       CAST(len(list_filter(range(1, len(tokens) + 1),
        |           p -> (doc_id * 31 + p) % ${TextOps.MaskEvery} = 0))
        |           AS BIGINT) AS n_masked
        |FROM mtk ORDER BY doc_id""".stripMargin,
    // ANN recall@k: engine-materialized approx set (split gate), oracle
    // recomputes the exact flat side and the intersection arithmetic
    "q_ann_recall" -> {
      val path = OracleInputs.sqlPath("ann_recall_sq")
      s"""WITH sqp AS (
        |    SELECT probe_id, neighbor_id FROM read_parquet('$path/*.parquet')
        |), nrm AS (
        |    SELECT vec_id, embedding,
        |           sqrt(list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(embedding,
        |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |             (a, b) -> a + b)) AS l2
        |    FROM embeddings
        |), pairs AS (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |           list_reduce(
        |             list_prepend(CAST(0.0 AS DOUBLE),
        |               list_transform(range(1, len(p.embedding) + 1),
        |                 i -> CAST(p.embedding[i] AS DOUBLE)
        |                      * CAST(c.embedding[i] AS DOUBLE))),
        |             (a, b) -> a + b) / (p.l2 * c.l2) AS cosine
        |    FROM nrm p JOIN nrm c ON p.vec_id < 5
        |), exact AS (
        |    SELECT probe_id, neighbor_id FROM (
        |        SELECT probe_id, neighbor_id,
        |               row_number() OVER (PARTITION BY probe_id
        |                   ORDER BY cosine DESC, neighbor_id ASC) AS rnk
        |        FROM pairs)
        |    WHERE rnk <= 5
        |)
        |SELECT e.probe_id, CAST(COUNT(*) AS BIGINT) AS k,
        |       CAST(SUM(CASE WHEN s.probe_id IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_match,
        |       CAST(SUM(CASE WHEN s.probe_id IS NOT NULL THEN 1 ELSE 0 END)
        |            * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
        |FROM exact e LEFT JOIN sqp s ON s.probe_id = e.probe_id
        |                            AND s.neighbor_id = e.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // weighted crawl distance: unrolled min-plus relaxations over
    // link-count edge costs
    "q_weighted_paths" -> weightedPathsOracle(
      graft.ops.LinkOps.WPathIters),
    // vocabulary health: one (source, token) count + source rollup
    "q_vocab_stats" ->
      """WITH vtk AS (
        |    SELECT source,
        |           unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents
        |), vct AS (
        |    SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM vtk GROUP BY 1, 2
        |), vag AS (
        |    SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |           CAST(COUNT(*) AS BIGINT) AS n_types,
        |           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_hapax
        |    FROM vct GROUP BY 1
        |)
        |SELECT source, n_tokens, n_types, n_hapax,
        |       CAST(n_types * 1000000 // n_tokens AS BIGINT) AS ttr_ppm,
        |       CAST(n_hapax * 1000000 // n_types AS BIGINT) AS hapax_ppm
        |FROM vag ORDER BY source""".stripMargin,
    // key-skew report: count-of-counts histogram, exact Gini through
    // HUGEINT with the doubled (no-intermediate-division) form
    "q_key_skew" ->
      """WITH ksc AS (
        |    SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM lineitem GROUP BY 1
        |), ksh AS (
        |    SELECT cnt, CAST(COUNT(*) AS BIGINT) AS nk FROM ksc GROUP BY 1
        |), ks2 AS (
        |    SELECT cnt, nk,
        |           CAST(COALESCE(SUM(nk) OVER (ORDER BY cnt ROWS BETWEEN
        |               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |               AS cumk_before,
        |           CAST(SUM(nk) OVER (ORDER BY cnt ROWS BETWEEN UNBOUNDED
        |               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumk
        |    FROM ksh
        |), kst AS (
        |    SELECT CAST(SUM(nk) AS BIGINT) AS n_keys,
        |           CAST(SUM(CAST(cnt AS HUGEINT) * nk) AS BIGINT) AS n_rows,
        |           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
        |           SUM(CAST(cnt AS HUGEINT)
        |               * (2 * CAST(cumk_before AS HUGEINT) * nk
        |                  + CAST(nk AS HUGEINT) * (nk + 1))) AS t2
        |    FROM ks2
        |), k50 AS (
        |    SELECT CAST(MIN(cnt) AS BIGINT) AS p50_cnt FROM ks2, kst
        |    WHERE cumk >= (n_keys + 1) // 2
        |), k99 AS (
        |    SELECT CAST(MIN(cnt) AS BIGINT) AS p99_cnt FROM ks2, kst
        |    WHERE cumk >= (99 * n_keys + 99) // 100
        |)
        |SELECT n_keys, n_rows, max_cnt,
        |       CAST(max_cnt * 1000000 // n_rows AS BIGINT) AS max_share_ppm,
        |       p50_cnt, p99_cnt,
        |       CAST((t2 - (n_keys + 1) * CAST(n_rows AS HUGEINT)) * 1000000
        |            // (CAST(n_keys AS HUGEINT) * n_rows) AS BIGINT)
        |           AS gini_ppm
        |FROM kst, k50, k99""".stripMargin,
    // personalized PageRank: seed-conditional teleport, unrolled rounds
    "q_pagerank_seeded" -> pprOracle(10),
    // drop provenance: first-failing-gate precedence over the same
    // corpus-clean gate definitions
    "q_drop_reasons" ->
      """WITH drs AS (
        |    SELECT MIN(doc_id) AS doc_id FROM documents
        |    GROUP BY sha256(lower(trim(text)))
        |), drt AS (
        |    SELECT doc_id,
        |           string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), drg AS (
        |    SELECT doc_id, len(tokens) AS n_tokens,
        |           CAST(len(list_filter(tokens,
        |               tk -> tk IN ('the', 'a', 'of', 'to', 'and')))
        |               AS DOUBLE) / CAST(len(tokens) AS DOUBLE)
        |               AS stop_ratio
        |    FROM drt
        |), drr AS (
        |    SELECT doc_id,
        |           CASE WHEN doc_id NOT IN (SELECT doc_id FROM drs)
        |                THEN 'duplicate'
        |                WHEN n_tokens < 20 THEN 'too_short'
        |                WHEN stop_ratio < 0.05 THEN 'low_stopwords'
        |                WHEN stop_ratio > 0.6 THEN 'high_stopwords'
        |                ELSE 'kept' END AS reason
        |    FROM drg
        |)
        |SELECT doc_id,
        |       CAST(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END AS INTEGER)
        |           AS kept,
        |       reason
        |FROM drr ORDER BY doc_id""".stripMargin,
    // reliability bins: exact decile rank cut, integer rates
    "q_calibration_bins" ->
      s"""WITH $qcKeptCte
        |, cbr AS (
        |    SELECT doc_id, q_score,
        |           CASE WHEN doc_id % 100 = 7 THEN 1 ELSE 0 END AS pos,
        |           row_number() OVER (ORDER BY q_score, doc_id) AS rnk,
        |           (SELECT COUNT(*) FROM qsc2) AS n_all
        |    FROM qsc2
        |)
        |SELECT CAST((rnk - 1) * 10 // n_all AS BIGINT) AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(pos) AS BIGINT) AS n_pos,
        |       CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT)
        |           AS pos_rate_ppm,
        |       CAST(SUM(q_score) // COUNT(*) AS BIGINT) AS mean_score
        |FROM cbr GROUP BY 1 ORDER BY 1""".stripMargin,
    // telemetry debounce: gaps-and-islands per (user, type), first-of-
    // burst kept by (ts, event_id) struct order
    "q_event_debounce" ->
      s"""WITH dbe AS (
        |    SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id
        |    FROM events
        |), dbl AS (
        |    SELECT *,
        |           CASE WHEN lag(tsn) OVER (PARTITION BY user_id, event_type
        |                    ORDER BY tsn, event_id) IS NULL
        |                  OR tsn - lag(tsn) OVER (PARTITION BY user_id,
        |                    event_type ORDER BY tsn, event_id)
        |                    >= ${EventOps.DebounceNs}
        |                THEN 1 ELSE 0 END AS new_burst
        |    FROM dbe
        |), dbi AS (
        |    SELECT *, SUM(new_burst) OVER (PARTITION BY user_id, event_type
        |        ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING)
        |        AS burst_idx
        |    FROM dbl
        |)
        |SELECT user_id, event_type,
        |       CAST(MIN(tsn) // 1000000 AS BIGINT) AS burst_start_ms,
        |       CAST((MIN(struct_pack(t := tsn, e := event_id))).e AS BIGINT)
        |           AS kept_event_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_in_burst
        |FROM dbi GROUP BY user_id, event_type, burst_idx
        |ORDER BY user_id, event_type, burst_start_ms, kept_event_id"""
        .stripMargin,
    // trending: exact power-of-two decay by right shift, anchored at
    // the corpus max order date
    "q_trending_brands" ->
      s"""WITH tbo AS (
        |    SELECT o_orderkey AS l_orderkey,
        |           epoch_ns(o_orderdate) // ${EventOps.DayNs} AS day
        |    FROM orders
        |), tba AS (SELECT MAX(day) AS max_day FROM tbo
        |), tbw AS (
        |    SELECT p.p_brand,
        |           ${BasketOps.TrendScale} >> CAST(LEAST(tba.max_day - o.day,
        |               ${BasketOps.TrendMaxAge}) AS INTEGER) AS w
        |    FROM lineitem l
        |    JOIN part p ON p.p_partkey = l.l_partkey
        |    JOIN tbo o ON o.l_orderkey = l.l_orderkey, tba
        |)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lineitems,
        |       CAST(SUM(w) AS BIGINT) AS trend_score
        |FROM tbw GROUP BY 1 ORDER BY trend_score DESC, p_brand"""
        .stripMargin,
    // LSH recall: engine-materialized candidate pairs (split gate);
    // oracle recomputes the exact-Jaccard truth and the intersection
    "q_minhash_recall" -> {
      val path = OracleInputs.sqlPath("minhash_recall_cand")
      s"""WITH mrc AS (
        |    SELECT doc_a, doc_b FROM read_parquet('$path/*.parquet')
        |), tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), sh AS (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |               range(1, len(tokens) - ${SetJoinOps.ShingleN - 2}),
        |               i -> array_to_string(
        |                   tokens[i:i+${SetJoinOps.ShingleN - 1}], ' '))))
        |               AS sh
        |    FROM tok WHERE len(tokens) >= ${SetJoinOps.ShingleN}
        |), sz AS (
        |    SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1
        |), ov AS (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |           CAST(count(*) AS BIGINT) AS overlap
        |    FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2
        |), truth AS (
        |    SELECT doc_a, doc_b FROM ov
        |    JOIN sz za ON za.doc_id = ov.doc_a
        |    JOIN sz zb ON zb.doc_id = ov.doc_b
        |    WHERE ${SetJoinOps.JacDen} * overlap >=
        |          ${SetJoinOps.JacNum} * (za.sz + zb.sz - overlap)
        |), agg AS (
        |    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
        |           CAST((SELECT COUNT(*) FROM mrc) AS BIGINT)
        |               AS n_candidates,
        |           CAST((SELECT COUNT(*) FROM truth t JOIN mrc c
        |                 ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
        |               AS BIGINT) AS n_hit
        |)
        |SELECT n_truth, n_candidates, n_hit,
        |       CAST(CASE WHEN n_truth = 0 THEN 0
        |            ELSE n_hit * 1000000 // n_truth END AS BIGINT)
        |           AS recall_ppm
        |FROM agg""".stripMargin
    },
    // periodicity bot signal: second-rounded gap mode per user
    "q_bot_periodicity" ->
      s"""WITH bpe AS (
        |    SELECT user_id, epoch_ns(ts) AS tsn, event_id FROM events
        |), bpg AS (
        |    SELECT user_id,
        |           (tsn - lag(tsn) OVER (PARTITION BY user_id
        |               ORDER BY tsn, event_id)) // 1000000000 AS gap_s
        |    FROM bpe
        |), bpc AS (
        |    SELECT user_id, gap_s, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM bpg WHERE gap_s IS NOT NULL GROUP BY 1, 2
        |), bpt AS (
        |    SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_gaps
        |    FROM bpc GROUP BY 1
        |), bpm AS (
        |    SELECT user_id, gap_s AS modal_gap_s, c AS modal_n FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id
        |            ORDER BY c DESC, gap_s ASC) AS rk FROM bpc)
        |    WHERE rk = 1
        |)
        |SELECT m.user_id, t.n_gaps, m.modal_gap_s,
        |       CAST(m.modal_n * 1000000 // t.n_gaps AS BIGINT)
        |           AS modal_share_ppm,
        |       CAST(CASE WHEN m.modal_n * 1000000 // t.n_gaps
        |                      > ${EventOps.BotShareThresholdPpm}
        |            THEN 1 ELSE 0 END AS INTEGER) AS is_bot
        |FROM bpm m JOIN bpt t USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // linear interpolation between known buckets, sign-split division
    "q_gapfill_interp" ->
      s"""WITH gie AS (
        |    SELECT user_id, epoch_ns(ts) // ${TimeSeriesOps.HourNs}
        |               AS bucket,
        |           epoch_ns(ts) AS tsn, event_id,
        |           CAST(round(value * 100) AS BIGINT) AS cents
        |    FROM events
        |), gib AS (
        |    SELECT user_id, bucket, n, cents AS v FROM (
        |        SELECT *,
        |               row_number() OVER (PARTITION BY user_id, bucket
        |                   ORDER BY tsn DESC, event_id DESC) AS rn,
        |               CAST(count(*) OVER (PARTITION BY user_id, bucket)
        |                   AS BIGINT) AS n
        |        FROM gie) WHERE rn = 1
        |), gig AS (
        |    SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
        |    FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
        |          FROM gib GROUP BY 1)
        |), gij AS (
        |    SELECT g.user_id, g.bucket, coalesce(b.n, 0) AS n_events, b.v
        |    FROM gig g LEFT JOIN gib b USING (user_id, bucket)
        |), gik AS (
        |    SELECT user_id, bucket, n_events,
        |           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |               ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW) AS v0,
        |           last_value(CASE WHEN v IS NOT NULL THEN bucket END
        |               IGNORE NULLS) OVER (PARTITION BY user_id
        |               ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW) AS b0,
        |           first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |               ORDER BY bucket ROWS BETWEEN CURRENT ROW
        |               AND UNBOUNDED FOLLOWING) AS v1,
        |           first_value(CASE WHEN v IS NOT NULL THEN bucket END
        |               IGNORE NULLS) OVER (PARTITION BY user_id
        |               ORDER BY bucket ROWS BETWEEN CURRENT ROW
        |               AND UNBOUNDED FOLLOWING) AS b1
        |    FROM gij
        |)
        |SELECT user_id, bucket, CAST(n_events AS BIGINT) AS n_events,
        |       CAST(v0 * ${TimeSeriesOps.InterpScale}
        |            + CASE WHEN b1 = b0 THEN 0
        |              WHEN (v1 - v0) * (bucket - b0) < 0
        |                THEN -((-((v1 - v0) * ${TimeSeriesOps.InterpScale}
        |                       * (bucket - b0))) // (b1 - b0))
        |              ELSE ((v1 - v0) * ${TimeSeriesOps.InterpScale}
        |                    * (bucket - b0)) // (b1 - b0) END
        |            AS BIGINT) AS value_interp_mc
        |FROM gik ORDER BY user_id, bucket""".stripMargin,
    // declared-vs-guessed language agreement matrix in exact ppm
    "q_langid_agreement" ->
      """WITH lat AS (
        |    SELECT doc_id, lang,
        |           string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), las AS (
        |    SELECT lang,
        |      CASE WHEN en_score > greatest(de_score, es_score, fr_score)
        |               THEN 'en'
        |           WHEN de_score > greatest(en_score, es_score, fr_score)
        |               THEN 'de'
        |           WHEN es_score > greatest(en_score, de_score, fr_score)
        |               THEN 'es'
        |           WHEN fr_score > greatest(en_score, de_score, es_score)
        |               THEN 'fr'
        |           ELSE 'und' END AS lang_guess
        |    FROM (SELECT lang,
        |        len(list_filter(tokens, t -> t IN ('the','a','of','and')))
        |            AS en_score,
        |        len(list_filter(tokens, t -> t IN ('der','die','und','das')))
        |            AS de_score,
        |        len(list_filter(tokens, t -> t IN ('el','la','los','que')))
        |            AS es_score,
        |        len(list_filter(tokens, t -> t IN ('le','la','les','et')))
        |            AS fr_score
        |        FROM lat)
        |), lac AS (
        |    SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM las GROUP BY 1, 2
        |), lal AS (
        |    SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
        |    FROM lac GROUP BY 1
        |)
        |SELECT c.lang, c.lang_guess, c.n,
        |       CAST(c.n * 1000000 // l.n_lang AS BIGINT) AS share_ppm
        |FROM lac c JOIN lal l USING (lang)
        |ORDER BY lang, lang_guess""".stripMargin,
    // exact TVD drift per type between the two time halves (HUGEINT
    // cross-multiplied; an absent half is total drift)
    "q_histogram_drift" ->
      """WITH hde AS (
        |    SELECT event_type,
        |           CAST(round(value * 100) AS BIGINT) AS cents,
        |           CASE WHEN epoch_ns(ts) >= (SELECT min(epoch_ns(ts))
        |                  + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2
        |                FROM events) THEN 1 ELSE 0 END AS late
        |    FROM events
        |), hdc AS (
        |    SELECT event_type, cents,
        |           CAST(SUM(CASE WHEN late = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS c1,
        |           CAST(SUM(CASE WHEN late = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS c2
        |    FROM hde GROUP BY 1, 2
        |), hdt AS (
        |    SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,
        |           CAST(SUM(c2) AS BIGINT) AS n2
        |    FROM hdc GROUP BY 1
        |), hda AS (
        |    SELECT c.event_type, t.n1 AS n_early, t.n2 AS n_late,
        |           CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |           SUM(abs(CAST(c.c1 AS HUGEINT) * t.n2
        |               - CAST(c.c2 AS HUGEINT) * t.n1)) AS num
        |    FROM hdc c JOIN hdt t USING (event_type)
        |    GROUP BY 1, 2, 3
        |)
        |SELECT event_type, n_early, n_late, n_buckets,
        |       CAST(CASE WHEN n_early = 0 OR n_late = 0 THEN 1000000
        |            ELSE (num * 1000000)
        |                 // (2 * CAST(n_early AS HUGEINT) * n_late)
        |            END AS BIGINT) AS tvd_ppm
        |FROM hda ORDER BY event_type""".stripMargin,
    // session-scoped funnel: same gaps-and-islands session cut, steps
    // chained within the (user, session) key
    "q_session_funnel" ->
      s"""WITH sfe AS (
        |    SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
        |    FROM events
        |), sfl AS (
        |    SELECT *,
        |           CASE WHEN tsn - lag(tsn) OVER (PARTITION BY user_id
        |                    ORDER BY tsn, event_id)
        |                    > ${EventOps.SessionGapNs}
        |                THEN 1 ELSE 0 END AS new_s
        |    FROM sfe
        |), sfs AS (
        |    SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |        ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING)
        |        AS session_idx
        |    FROM sfl
        |), f1 AS (
        |    SELECT user_id, session_idx, MIN(tsn) AS t1 FROM sfs
        |    WHERE event_type = 'signup' GROUP BY 1, 2
        |), f2 AS (
        |    SELECT e.user_id, e.session_idx, MIN(e.tsn) AS t2
        |    FROM sfs e JOIN f1 USING (user_id, session_idx)
        |    WHERE e.event_type = 'click' AND e.tsn > f1.t1 GROUP BY 1, 2
        |), f3 AS (
        |    SELECT e.user_id, e.session_idx, MIN(e.tsn) AS t3
        |    FROM sfs e JOIN f2 USING (user_id, session_idx)
        |    WHERE e.event_type = 'purchase' AND e.tsn > f2.t2 GROUP BY 1, 2
        |), c AS (
        |    SELECT 1 AS step, 'signup' AS event_type,
        |           CAST((SELECT count(*) FROM f1) AS BIGINT) AS n_sessions
        |    UNION ALL
        |    SELECT 2, 'click', CAST((SELECT count(*) FROM f2) AS BIGINT)
        |    UNION ALL
        |    SELECT 3, 'purchase', CAST((SELECT count(*) FROM f3) AS BIGINT)
        |), t AS (SELECT CAST(count(*) AS BIGINT) AS n_top FROM f1)
        |SELECT CAST(step AS INTEGER) AS step, event_type, n_sessions,
        |       CAST(CASE WHEN n_top = 0 THEN 0
        |                 ELSE n_sessions * 1000000 // n_top END AS BIGINT)
        |           AS conv_ppm
        |FROM c, t ORDER BY step""".stripMargin,
    // decayed-counter store: fresh zero-floor replay at the global-max
    // anchor, score-positive rows — proves the shift re-anchoring
    // composes exactly
    "q_trending_incremental" ->
      s"""WITH tio AS (
        |    SELECT o_orderkey AS l_orderkey,
        |           epoch_ns(o_orderdate) // ${EventOps.DayNs} AS day
        |    FROM orders
        |), tia AS (SELECT MAX(day) AS a FROM tio
        |), tiw AS (
        |    SELECT p.p_brand,
        |           ${BasketOps.TrendScale} >> CAST(LEAST(tia.a - o.day,
        |               ${BasketOps.TrendZeroAge}) AS INTEGER) AS w
        |    FROM lineitem l
        |    JOIN tio o ON o.l_orderkey = l.l_orderkey
        |    JOIN part p ON p.p_partkey = l.l_partkey, tia
        |)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lineitems,
        |       CAST(SUM(w) AS BIGINT) AS trend_score
        |FROM tiw GROUP BY 1 HAVING SUM(w) > 0
        |ORDER BY trend_score DESC, p_brand""".stripMargin,
    // cluster-size distribution over the same recursive closure
    "q_dedup_cluster_stats" ->
      """WITH RECURSIVE
        |bounds AS (SELECT max(doc_id) AS mx FROM documents),
        |e AS (
        |    SELECT doc_id AS src, doc_id + 1 AS dst FROM documents, bounds
        |    WHERE doc_id % 10 <> 9 AND doc_id + 1 <= mx
        |      AND doc_id + 1 IN (SELECT doc_id FROM documents)
        |    UNION ALL
        |    SELECT doc_id AS src, doc_id + 2 AS dst FROM documents, bounds
        |    WHERE doc_id % 10 < 5 AND doc_id + 2 <= mx
        |      AND doc_id + 2 IN (SELECT doc_id FROM documents)
        |),
        |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |reach(id, r) AS (
        |    SELECT doc_id, doc_id FROM documents
        |    UNION
        |    SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id
        |),
        |cls AS (
        |    SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
        |),
        |szs AS (
        |    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        |    FROM cls GROUP BY 1
        |)
        |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
        |FROM szs GROUP BY 1 ORDER BY cluster_size""".stripMargin,
    // third-order paths: two lags on the same per-user order, exact
    // conditional ppm
    "q_event_trigrams" ->
      """WITH tge AS (
        |    SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id
        |    FROM events
        |), tgl AS (
        |    SELECT user_id, event_type,
        |           lag(event_type, 1) OVER (PARTITION BY user_id
        |               ORDER BY tsn, event_id) AS p1,
        |           lag(event_type, 2) OVER (PARTITION BY user_id
        |               ORDER BY tsn, event_id) AS p2
        |    FROM tge
        |), tgc AS (
        |    SELECT p2 AS t1, p1 AS t2, event_type AS t3,
        |           CAST(COUNT(*) AS BIGINT) AS n
        |    FROM tgl WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
        |), tgx AS (
        |    SELECT t1, t2, CAST(SUM(n) AS BIGINT) AS ctx_n
        |    FROM tgc GROUP BY 1, 2
        |)
        |SELECT c.t1, c.t2, c.t3, c.n,
        |       CAST(c.n * 1000000 // x.ctx_n AS BIGINT) AS p_ppm
        |FROM tgc c JOIN tgx x USING (t1, t2)
        |ORDER BY t1, t2, t3""".stripMargin,
    // exact Spearman: midrank2 ranks off value histograms, sqrt-free
    // sign + rho^2 through HUGEINT
    "q_spearman" ->
      """WITH spr AS (
        |    SELECT p_partkey,
        |           CAST(round(p_retailprice * 100) AS BIGINT) AS price,
        |           CAST(p_size AS BIGINT) AS size
        |    FROM part
        |), rkx AS (
        |    SELECT price,
        |           2 * COALESCE(SUM(nat) OVER (ORDER BY price ROWS BETWEEN
        |               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + nat + 1
        |               AS rx
        |    FROM (SELECT price, CAST(COUNT(*) AS BIGINT) AS nat
        |          FROM spr GROUP BY 1)
        |), rky AS (
        |    SELECT size,
        |           2 * COALESCE(SUM(nat) OVER (ORDER BY size ROWS BETWEEN
        |               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + nat + 1
        |               AS ry
        |    FROM (SELECT size, CAST(COUNT(*) AS BIGINT) AS nat
        |          FROM spr GROUP BY 1)
        |), rkd AS (
        |    SELECT r.p_partkey, x.rx, y.ry
        |    FROM spr r JOIN rkx x USING (price) JOIN rky y USING (size)
        |), sms AS (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(rx) AS BIGINT) AS sx,
        |           CAST(SUM(ry) AS BIGINT) AS sy,
        |           SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
        |           SUM(CAST(ry AS HUGEINT) * ry) AS syy,
        |           SUM(CAST(rx AS HUGEINT) * ry) AS sxy
        |    FROM rkd
        |), smv AS (
        |    SELECT n,
        |           CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |               AS num,
        |           CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |               AS denx,
        |           CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
        |               AS deny
        |    FROM sms
        |)
        |SELECT n,
        |       CAST(CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1
        |            ELSE 0 END AS INTEGER) AS rho_sign,
        |       CAST(CASE WHEN denx = 0 OR deny = 0 THEN 0
        |            ELSE (num * num * 1000000) // (denx * deny)
        |            END AS BIGINT) AS rho2_ppm
        |FROM smv""".stripMargin,
    // Benford screen: fixed ppm expectations (they sum to exactly 1e6),
    // integer shares and deviations
    "q_benford" -> {
      val values = Relational.BenfordPpm.toSeq.sortBy(_._1)
        .map { case (d, p) => s"($d, ${p})" }.mkString(", ")
      s"""WITH bfc AS (
        |    SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
        |               AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |           CAST(COUNT(*) AS BIGINT) AS n
        |    FROM orders GROUP BY 1
        |), bft AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM bfc
        |), bfe (digit, benford_ppm) AS (VALUES $values)
        |SELECT e.digit, COALESCE(c.n, 0) AS n,
        |       CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT)
        |           AS obs_ppm,
        |       CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        |       CAST(abs(COALESCE(c.n, 0) * 1000000 // t.total
        |            - e.benford_ppm) AS BIGINT) AS dev_ppm
        |FROM bfe e CROSS JOIN bft t LEFT JOIN bfc c ON c.digit = e.digit
        |ORDER BY e.digit""".stripMargin
    },
  ) ++ lateOracleSql

  /** Fresh sort-based skyline replay (shared by both skyline gates). */
  private def skylineOracleSql: String =
      s"""WITH ssp AS (
        |    SELECT p_type, p_partkey,
        |           CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |           p_size
        |    FROM part
        |), ssw AS (
        |    SELECT *,
        |           max(p_size) OVER (PARTITION BY p_type ORDER BY price_cents
        |               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS mx_strict,
        |           max(p_size) OVER (PARTITION BY p_type ORDER BY price_cents
        |               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS mx_incl
        |    FROM ssp
        |)
        |SELECT p_type, p_partkey, price_cents, p_size
        |FROM ssw
        |WHERE coalesce(mx_strict < p_size, TRUE) AND NOT (mx_incl > p_size)
        |ORDER BY p_type, p_partkey""".stripMargin

  /** Fresh single-pass bottom-K replay (shared by both reservoir gates). */
  private def reservoirOracleSql: String =
      s"""WITH rre AS (
        |    SELECT epoch_ns(ts) // ${EventOps.DayNs} AS day, event_id,
        |           CAST(round(value * 100) AS BIGINT) AS cents,
        |           ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1,
        |               ${graft.ops.ThetaOps.HashHexChars}))::BIGINT + 1 AS hv
        |    FROM events
        |), rrk AS (
        |    SELECT *,
        |           row_number() OVER (PARTITION BY day ORDER BY hv, event_id)
        |               AS rn,
        |           CAST(count(*) OVER (PARTITION BY day) AS BIGINT)
        |               AS n_total
        |    FROM rre
        |), rsm AS (
        |    SELECT day, event_id, cents, hv, n_total FROM rrk
        |    WHERE rn <= ${ReservoirOps.K}
        |), rmn AS (SELECT min(day) AS mn FROM rre
        |), rpd AS (
        |    SELECT day, n_total, CAST(mcnt AS BIGINT) AS n_sample,
        |           cents AS med_cents
        |    FROM (SELECT *,
        |              row_number() OVER (PARTITION BY day
        |                  ORDER BY cents, event_id) AS mrn,
        |              count(*) OVER (PARTITION BY day) AS mcnt
        |          FROM rsm)
        |    WHERE mrn = (mcnt + 1) // 2
        |), rrg AS (
        |    SELECT s.* FROM rsm s, rmn
        |    WHERE s.day >= rmn.mn + ${ReservoirOps.RangeLoOff}
        |      AND s.day < rmn.mn + ${ReservoirOps.RangeHiOff}
        |), rmg AS (
        |    SELECT * FROM (SELECT *,
        |            row_number() OVER (ORDER BY hv, event_id) AS rrn
        |        FROM rrg)
        |    WHERE rrn <= ${ReservoirOps.K}
        |), rmm AS (
        |    SELECT CAST(-1 AS BIGINT) AS day, CAST(mcnt AS BIGINT)
        |               AS n_sample, cents AS med_cents
        |    FROM (SELECT *,
        |              row_number() OVER (ORDER BY cents, event_id) AS mrn,
        |              count(*) OVER () AS mcnt
        |          FROM rmg)
        |    WHERE mrn = (mcnt + 1) // 2
        |), rrt AS (
        |    SELECT CAST(coalesce(sum(nt), 0) AS BIGINT) AS n_total
        |    FROM (SELECT day, max(n_total) AS nt FROM rrg GROUP BY 1)
        |)
        |SELECT day, n_total, n_sample, med_cents FROM rpd
        |UNION ALL
        |SELECT day, rrt.n_total, n_sample, med_cents FROM rmm, rrt
        |ORDER BY day""".stripMargin

  /** Fresh raw-row MAD replay (shared by both outlier gates). */
  private def madOracleSql: String =
      s"""WITH e AS (
        |    SELECT event_type, event_id,
        |           CAST(round(value * 100) AS BIGINT) AS cents
        |    FROM events
        |), med AS (
        |    SELECT event_type, cents AS med_cents FROM (
        |        SELECT event_type, cents,
        |               row_number() OVER (PARTITION BY event_type
        |                   ORDER BY cents, event_id) AS rn,
        |               count(*) OVER (PARTITION BY event_type) AS cnt
        |        FROM e) WHERE rn = (cnt + 1) // 2
        |), d AS (
        |    SELECT e.event_type, e.event_id, m.med_cents,
        |           abs(e.cents - m.med_cents) AS dev
        |    FROM e JOIN med m USING (event_type)
        |), mad AS (
        |    SELECT event_type, dev AS mad_cents FROM (
        |        SELECT event_type, dev,
        |               row_number() OVER (PARTITION BY event_type
        |                   ORDER BY dev, event_id) AS rn,
        |               count(*) OVER (PARTITION BY event_type) AS cnt
        |        FROM d) WHERE rn = (cnt + 1) // 2
        |)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(d.med_cents) AS BIGINT) AS med_cents,
        |       CAST(min(m.mad_cents) AS BIGINT) AS mad_cents,
        |       CAST(sum(CASE WHEN d.dev > ${graft.ops.TimeSeriesOps.MadK}
        |                     * m.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_outliers
        |FROM d JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Overflow tail of the oracle map (Scala limits a single Map literal's
    * arity-safe growth here only stylistically — this is plain `++`).
    */
  private def lateOracleSql: Map[String, String] = Map(
    // Power iteration over the TF-IDF Gram matrix: every round replayed
    // as MATERIALIZED CTE stages (HUGEINT sums, truncating division).
    "q_power_direction" ->
      s"""$spectralCtes
        |SELECT CAST(dim AS INT) AS dim, CAST(u AS BIGINT) AS u_fp
        |FROM u${graft.ops.SpectralOps.Rounds}
        |ORDER BY dim""".stripMargin,
    "q_spectral_order" ->
      s"""$spectralCtes
        |SELECT v.doc_id,
        |       CAST(SUM(CAST(v.v_fp AS HUGEINT) * u.u)
        |            // ${graft.ops.SpectralOps.UScale} AS BIGINT) AS proj_fp
        |FROM vecs v JOIN u${graft.ops.SpectralOps.Rounds} u USING (dim)
        |GROUP BY 1
        |ORDER BY proj_fp DESC, doc_id""".stripMargin,
    // RAG windows: overlapping fixed-token chunks, last-window-short rule.
    "q_rag_chunks" ->
      s"""WITH tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents WHERE trim(text) <> ''
        |), k AS (
        |    SELECT doc_id, tokens, CAST(len(tokens) AS BIGINT) AS n,
        |           CASE WHEN len(tokens) <= ${graft.ops.ChunkOps.RagChunkSize}
        |                THEN 1
        |                ELSE 1 + (len(tokens) - ${graft.ops.ChunkOps.RagChunkSize}
        |                          + ${graft.ops.ChunkOps.RagStride - 1})
        |                         // ${graft.ops.ChunkOps.RagStride} END AS nk
        |    FROM tok
        |), c AS (
        |    SELECT doc_id, n, tokens,
        |           unnest(range(0, nk)) AS chunk_idx
        |    FROM k
        |)
        |SELECT doc_id, chunk_idx,
        |       least(${graft.ops.ChunkOps.RagChunkSize},
        |             n - chunk_idx * ${graft.ops.ChunkOps.RagStride}) AS n_tokens,
        |       array_to_string(tokens[
        |           1 + chunk_idx * ${graft.ops.ChunkOps.RagStride} :
        |           chunk_idx * ${graft.ops.ChunkOps.RagStride}
        |               + ${graft.ops.ChunkOps.RagChunkSize}], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // Mojibake repair: the oracle computes the expected repaired text BY
    // CONSTRUCTION (repair ∘ craft = identity on the injected tokens; the
    // genuine-Latin-1 arm must survive unrepaired), and replays the
    // suspect-pattern count with the same RE2 classes.
    "q_mojibake_repair" ->
      """WITH base AS (
        |    SELECT doc_id,
        |           CASE CAST(doc_id % 7 AS INT)
        |             WHEN 2 THEN text || ' caf' || chr(195) || chr(169)
        |             WHEN 3 THEN text || ' ' || chr(237) || chr(149) || chr(156)
        |             WHEN 4 THEN text || ' caf' || chr(233)
        |             ELSE text END AS crafted,
        |           CASE CAST(doc_id % 7 AS INT)
        |             WHEN 2 THEN text || ' caf' || chr(233)
        |             WHEN 3 THEN text || ' ' || chr(54620)
        |             WHEN 4 THEN text || ' caf' || chr(233)
        |             ELSE text END AS expected,
        |           CASE WHEN doc_id % 7 IN (2, 3) THEN 1 ELSE 0 END AS rep
        |    FROM documents
        |)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(crafted,
        |           '[\x{00E0}-\x{00EF}][\x{0080}-\x{00BF}]{2}' ||
        |           '|[\x{00C2}-\x{00DF}][\x{0080}-\x{00BF}]'))
        |         AS BIGINT) AS n_suspects,
        |       CAST(rep AS INT) AS repaired,
        |       md5(expected) AS repaired_md5,
        |       CAST(length(expected) AS BIGINT) AS n_chars
        |FROM base ORDER BY doc_id""".stripMargin,
    // Incremental winnowing probe vs the FRESH full-corpus run restricted
    // to batch-involving pairs (split: doc_id*3 >= 2*max).
    "q_copy_incremental" ->
      s"""$winnowSelCte, dh AS (
        |    SELECT DISTINCT doc_id, h FROM sel
        |), cnt AS (
        |    SELECT h, count(*) AS nd FROM dh GROUP BY 1
        |), pruned AS (
        |    SELECT dh.doc_id, dh.h FROM dh JOIN cnt USING (h)
        |    WHERE cnt.nd <= ${graft.ops.WinnowOps.MaxDocsPerPrint}
        |), mx AS (
        |    SELECT max(doc_id) AS m FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM pruned a JOIN pruned b ON a.h = b.h AND a.doc_id < b.doc_id, mx
        |WHERE a.doc_id * 3 >= mx.m * 2 OR b.doc_id * 3 >= mx.m * 2
        |GROUP BY 1, 2
        |HAVING count(*) >= ${graft.ops.WinnowOps.MinShared}
        |ORDER BY doc_a, doc_b""".stripMargin,
    // First-order Markov transitions: per-user bigram counts + exact ppm.
    "q_event_transitions" ->
      """WITH ev AS (
        |    SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id
        |    FROM events
        |), pr AS (
        |    SELECT user_id, event_type,
        |           lag(event_type) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS prev
        |    FROM ev
        |), n AS (
        |    SELECT prev AS prev_type, event_type AS cur_type,
        |           CAST(count(*) AS BIGINT) AS n
        |    FROM pr WHERE prev IS NOT NULL GROUP BY 1, 2
        |), tot AS (
        |    SELECT prev_type, SUM(n) AS tot FROM n GROUP BY 1
        |)
        |SELECT n.prev_type, n.cur_type, n.n,
        |       CAST(n.n * 1000000 // t.tot AS BIGINT) AS p_ppm
        |FROM n JOIN tot t USING (prev_type)
        |ORDER BY prev_type, cur_type""".stripMargin,
    // Typo-cluster canonicalization: brute-force pairs → recursive
    // transitive closure → (freq desc, name asc) canon per cluster.
    "q_vocab_normalize" ->
      s"""WITH RECURSIVE tok AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
        |    FROM documents
        |), base AS (
        |    SELECT doc_id, toks[1] || toks[2] AS clean
        |    FROM tok WHERE len(toks) >= 2
        |), feed AS (
        |    SELECT doc_id, CASE WHEN doc_id % 3 = 1 THEN
        |               substr(clean, 1, CAST(doc_id % length(clean) AS INT)) ||
        |               substr(clean, CAST(doc_id % length(clean) AS INT) + 2)
        |           ELSE clean END AS name
        |    FROM base WHERE length(clean) >= ${graft.ops.FuzzyOps.MinLen}
        |), vocab AS (
        |    SELECT name, CAST(count(*) AS BIGINT) AS freq FROM feed GROUP BY 1
        |), pairs AS (
        |    SELECT a.name AS a, b.name AS b
        |    FROM vocab a JOIN vocab b
        |      ON a.name < b.name AND levenshtein(a.name, b.name) = 1
        |), sym AS (
        |    SELECT a AS x, b AS y FROM pairs
        |    UNION ALL SELECT b, a FROM pairs
        |), reach(a, b) AS (
        |    SELECT name, name FROM vocab
        |    UNION
        |    SELECT r.a, s.y FROM reach r JOIN sym s ON s.x = r.b
        |), lbl AS (
        |    SELECT a AS name, min(b) AS cl FROM reach GROUP BY 1
        |), canon AS (
        |    SELECT cl, name AS canon FROM (
        |        SELECT l.cl, v.name, v.freq,
        |               row_number() OVER (PARTITION BY l.cl
        |                   ORDER BY v.freq DESC, v.name ASC) AS rn
        |        FROM lbl l JOIN vocab v USING (name)) WHERE rn = 1
        |)
        |SELECT f.doc_id, f.name, c.canon,
        |       CAST(f.name <> c.canon AS INT) AS changed
        |FROM feed f
        |JOIN lbl USING (name)
        |JOIN canon c USING (cl)
        |ORDER BY doc_id""".stripMargin,
  )

  /** TF-IDF vectors + unrolled power-iteration rounds (HUGEINT, floor
    * division — identical to the engine's nonnegative truncation).
    */
  private def spectralCtes: String = {
    val sc = graft.ops.SpectralOps.UScale
    val rounds = (1 to graft.ops.SpectralOps.Rounds).map { i =>
      s""", sd$i AS MATERIALIZED (
         |    SELECT v.doc_id,
         |           SUM(CAST(v.v_fp AS HUGEINT) * u.u) // $sc AS sd
         |    FROM vecs v JOIN u${i - 1} u USING (dim) GROUP BY 1
         |), w$i AS MATERIALIZED (
         |    SELECT v.dim, SUM(CAST(v.v_fp AS HUGEINT) * s.sd) AS w
         |    FROM vecs v JOIN sd$i s USING (doc_id) GROUP BY 1
         |), wm$i AS MATERIALIZED (
         |    SELECT MAX(w) AS mx FROM w$i
         |), u$i AS MATERIALIZED (
         |    SELECT d.dim, COALESCE(w.w, 0) * $sc // wm$i.mx AS u
         |    FROM u0 d LEFT JOIN w$i w USING (dim), wm$i
         |)""".stripMargin
    }.mkString
    s"""WITH toks AS (
      |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      |    FROM documents
      |), tf AS (
      |    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |    FROM toks GROUP BY 1, 2
      |), dfreq AS (
      |    SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
      |), nd AS (
      |    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf
      |), wtd AS (
      |    SELECT tf.doc_id,
      |           CAST(((strpos('0123456789abcdef', substr(md5(tf.tok),1,1))-1)*4096
      |               + (strpos('0123456789abcdef', substr(md5(tf.tok),2,1))-1)*256
      |               + (strpos('0123456789abcdef', substr(md5(tf.tok),3,1))-1)*16
      |               + (strpos('0123456789abcdef', substr(md5(tf.tok),4,1))-1))
      |               % ${graft.ops.TfidfOps.Dims} AS INT) AS dim,
      |           tf.tf * ((${graft.ops.TfidfOps.IdfScale} * nd.n_docs) // dfreq.df) AS w
      |    FROM tf JOIN dfreq USING (tok), nd
      |), v0 AS (
      |    SELECT doc_id, dim, CAST(sum(w) AS BIGINT) AS v FROM wtd GROUP BY 1, 2
      |), l AS (
      |    SELECT doc_id, dim, v, sum(v) OVER (PARTITION BY doc_id) AS l1 FROM v0
      |), vecs AS MATERIALIZED (
      |    SELECT doc_id, dim,
      |           CAST(v * ${graft.ops.TfidfOps.NormScale} // l1 AS BIGINT) AS v_fp
      |    FROM l
      |), u0 AS MATERIALIZED (
      |    SELECT CAST(unnest(range(0, ${graft.ops.TfidfOps.Dims})) AS INT) AS dim,
      |           CAST($sc AS HUGEINT) AS u
      |)""".stripMargin + rounds
  }

  /** Shared winnowing-selection CTE: gram hashes → full-window struct-min
    * → distinct (doc_id, pos, h).
    */
  private def winnowSelCte: String = {
    val k = graft.ops.WinnowOps.K
    val w = graft.ops.WinnowOps.W
    s"""WITH tok AS (
      |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
      |    FROM documents
      |), g AS (
      |    SELECT doc_id,
      |           unnest(range(1, len(tokens) - ${k - 2})) AS pos,
      |           unnest(list_transform(range(1, len(tokens) - ${k - 2}),
      |               i -> substr(md5(array_to_string(tokens[i:i+${k - 1}], ' ')),
      |                           1, 16))) AS h
      |    FROM tok WHERE len(tokens) >= $k
      |), fwin AS (
      |    SELECT doc_id, pos,
      |           count(*) OVER (PARTITION BY doc_id) AS n,
      |           min({'h': h, 'np': -pos}) OVER (PARTITION BY doc_id
      |               ORDER BY pos ROWS BETWEEN CURRENT ROW AND ${w - 1}
      |               FOLLOWING) AS m
      |    FROM g
      |), sel AS (
      |    SELECT DISTINCT doc_id, -(m.np) AS pos, m.h AS h
      |    FROM fwin WHERE pos <= n - $w + 1
      |)""".stripMargin
  }

  /** Fresh full-feed SCD2 collapse (shared by both scd2 gates). */
  private def scd2HistorySql: String =
    """WITH ev AS (
      |    SELECT user_id, event_type AS status, epoch_ns(ts) AS ts, event_id
      |    FROM events
      |), chg AS (
      |    SELECT user_id, status, ts, event_id,
      |           lag(status) OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS prev
      |    FROM ev
      |), runs AS (
      |    SELECT user_id, status, ts AS valid_from, event_id AS first_event_id,
      |           CAST(row_number() OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS INTEGER) AS version
      |    FROM chg WHERE prev IS NULL OR prev <> status
      |), hist AS (
      |    SELECT user_id, status, valid_from,
      |           lead(valid_from) OVER (PARTITION BY user_id
      |               ORDER BY valid_from, first_event_id) AS valid_to,
      |           version, first_event_id
      |    FROM runs
      |)
      |SELECT user_id, status, valid_from, valid_to, version, first_event_id,
      |       CAST(valid_to IS NULL AS INTEGER) AS is_current
      |FROM hist
      |ORDER BY user_id, version""".stripMargin
}
