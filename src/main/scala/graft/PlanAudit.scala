package graft

/** Dumps formatted physical plans for the headline queries into PLANS.md —
  * the auditable evidence for the scale-design claims in DESIGN.md
  * (pushdown reaching the scan, broadcasts on dims, no cartesian products).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", TempDirs.create("graft-audit-wh"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = Seq(
      "q_scan_projection", "q_filter_tenant_eq", "q_join_broadcast_dim",
      "q_join_equi", "q_window_latest_by_pk", "q_dedup_minhash",
      "q_knn_cosine_topk", "q_embedding_near_dup", "q_asof_last_click",
      "q_groupby_salted", "q_partition_backfill", "q_ivf_cosine_topk",
      "q_doc_chunking", "q_corpus_clean", "q_simhash_near_dup",
      "q_sample_stratified", "q_mix_weighted", "q_pack_sequences",
      "q_contamination", "q_join_range", "q_percentile_status",
      "q_ivf_semantic_dedup", "q_repetition_stats", "q_mix_temperature",
      "q_export_shuffle", "q_decontaminate_ngram", "q_blocklist_bloom",
      "q_join_bucketed", "q_salient_terms",
      // round-7 additions: profiler over the north-star tables, the real
      // PNG decode path, and the unicode-tokenizer compositions
      "q_profile_documents", "q_profile_embeddings", "q_png_pixel_stats",
      "q_decontaminate_cjk", "q_salient_terms_cjk",
      // round-7 additions: rarity signal, quality-prefix budget selection,
      // best-of-cluster dedup
      "q_mean_token_freq", "q_token_budget_select", "q_dedup_best_of_cluster",
      "q_dedup_incremental", "q_cluster_sample", "q_budget_mix",
      // round-8 addition: PQ retrieve + exact re-rank (training collects
      // are part of the audited path, like q_ivf_cosine_topk above)
      "q_pq_cosine_topk",
      // round-9 additions: the IVF-PQ composition (the audit evidence is
      // the cell-keyed BroadcastHashJoin pruning the code scan) and the
      // VP8L decode leg (typed mapPartitions batch shape)
      "q_ivfpq_cosine_topk", "q_vp8l_pixel_stats",
      // round-10 additions: the incremental-extract hot path (the audit
      // evidence is the transposed watermark predicate back in the events
      // scan's PushedFilters — EpochNsTranspose), and the bigram-LM
      // perplexity gate (vocab-sized LM join + one fine-keyed probe join)
      "q_filter_incremental", "q_perplexity_filter", "q_corpus_clean_ppx",
      "q_span_coverage", "q_semantic_decontam",
      // round-10 additions: SQ8 flat + IVF-composed (the audit evidence is
      // the decode-dot ADC inside whole-stage codegen, and for the
      // composition the cell-keyed BroadcastHashJoin pruning the scan)
      // and the shuffle-free split assignment
      "q_sq_cosine_topk", "q_ivfsq_cosine_topk", "q_split_assign",
      // stored-LM serving: the registered form pays the build (the
      // q_join_bucketed unavoidable-materialization class); the audited
      // plan is the serve — stored-table scans, no corpus-sized training
      // aggregate
      "q_perplexity_serve",
      // the typed mapPartitions resize shape (decode → thumbnail → stats,
      // rasters never leave the executor), the perceptual-hash dedup
      // (one hash-keyed window over decode output — never image pairs),
      // its banded hamming near-dup (band-keyed equi-join over the
      // persisted survivor hashes) and the GIF LZW decode leg
      "q_image_resize_stats", "q_image_dedup_phash", "q_image_near_dup",
      "q_gif_pixel_stats",
      // round-11 additions: substring-extent dedup (the audit evidence is
      // ONE doc_id hash-partitioning shared by the lag window and the
      // final group — no second exchange — plus the gram-keyed count as
      // the only token-volume shuffle) and the per-row frame-sampling
      // flatMap (typed, no shuffle before the output sort)
      "q_substring_dedup", "q_frame_sample",
      // round-11 late additions: BM25 serving (the audit evidence is the
      // bkt-partition-pruned postings scan + broadcast terms + vocab-sized
      // df join; the registry form pays the index build, the
      // q_perplexity_serve class), the K-class domain scorer (broadcast
      // K-row class frame, stored-table joins, doc-keyed argmax window)
      // and the CM-sketch heavy-hitter gate (TakeOrderedAndProject top-k,
      // never a full-vocab window)
      "q_bm25_topk", "q_domain_classify", "q_heavy_ngrams",
      // and their compositions: decontam inherits the pruned-postings
      // serve shape with a doc-keyed flag agg; domain mix appends one
      // stratum WindowGroupLimit to the classifier's serve plan
      "q_bm25_decontam", "q_domain_mix",
      // CDC chunking: the audit evidence is ONE chunk-hash exchange for
      // the duplicate set + doc-keyed aggs — the exact-dedup shape at
      // chunk granularity, no positional self-join
      "q_cdc_chunks", "q_cdc_dedup_rewrite", "q_cdc_rewrite_incremental",
      "q_phrase_search", "q_hybrid_search", "q_approx_percentile",
      // round-11 web-provenance additions: link extraction (per-row
      // regex + explode, zero exchange before the output sort), domain
      // PageRank (the audit evidence is the returned frame being a
      // checkpointed scan — the 10 iterative rounds run one src-keyed
      // join + one dst-keyed sum each and never appear in the serve
      // plan) and the authority mix (broadcast domain-sized quota join
      // + one WindowGroupLimit under the constant rank bound)
      "q_link_extract", "q_pagerank_domains", "q_authority_mix",
      "q_hits_domains",
      // Z-order key: the audit evidence is the 32-term shift/mask sum
      // riding inside one WholeStageCodegen project over the scan
      "q_zorder_key",
      // round-11 fifth-session additions: expectations (ONE aggregate
      // pass per fact table — every constraint a conditional sum in the
      // same agg — plus a broadcast anti-join for referential), exact
      // Jaccard join (prefix-bucket equi-join, never all-pairs;
      // verification keyed on candidate pairs), hashed TF-IDF (one
      // (doc,token) shuffle + one (doc,dim) sum; the kNN consumer
      // broadcasts probes over one corpus scan), authority survivors
      // (CC over banded pairs + ONE broadcast rank join + per-cluster
      // WindowGroupLimit) and the robots filter (domain-sized broadcast
      // rule table, single corpus scan, per-doc WindowGroupLimit)
      "q_expectations", "q_jaccard_join_exact", "q_hashed_tfidf",
      "q_tfidf_knn", "q_authority_survivors", "q_robots_filter",
      // round-11 sixth-session additions: SCD2 collapse (the audit
      // evidence is ONE user-keyed hash exchange carrying all three
      // windows), the deletion-neighborhood join (residue equi-join +
      // broadcast vocab joins, codegen'd levenshtein verify), winnowing
      // (one doc-keyed exchange, struct-min window — no member self-join),
      // the incremental copy probe (bucket-pruned index scan), gap-fill
      // (one (user,bucket) collapse + user-keyed LOCF window), histogram
      // MAD serving (bounded-table windows, no events scan), the power
      // iteration serve (broadcast 64-row direction, one corpus scan) and
      // the per-row RAG/mojibake transforms
      "q_scd2_history", "q_scd2_incremental", "q_fuzzy_vocab_edit1",
      "q_winnow_fingerprint", "q_copy_candidates", "q_copy_incremental",
      "q_gapfill_locf", "q_outlier_mad", "q_outlier_mad_incremental",
      "q_spectral_order", "q_rag_chunks", "q_mojibake_repair",
      // round-11 seventh-session additions: theta sketch (ONE (tag,key)
      // distinct shuffle + per-tag WindowGroupLimit K-min; every
      // downstream frame sample-bounded), DSIR (one bucket-keyed feature
      // shuffle, broadcast B-sized model, TakeOrderedAndProject draw),
      // Kneser-Ney (vocab-sized enrichment joins + one (prev,w) probe on
      // the c2 exchange key), curriculum (one token shuffle + value-
      // bounded boundary window, no global rank), the AC span scan (the
      // audit evidence is the single corpus scan with the DFA literal
      // inside WholeStageCodegen — the term join fans over match rows)
      // and the Hamilton split (strata-bounded windows + the constant
      // rank bound keeping WindowGroupLimit)
      "q_theta_sketch", "q_dsir_select", "q_kneser_ney",
      "q_curriculum_order", "q_ac_scan", "q_split_proportional",
      // collocations (vocab-sized lift join + TakeOrderedAndProject),
      // session assembly (ONE user-keyed exchange under window + group),
      // luhn (per-row folds, zero pre-sort exchanges) and triangles
      // (oriented wedge self-join + membership join — no vertex-pair
      // cartesian anywhere)
      "q_collocations", "q_session_sequences", "q_pii_luhn",
      "q_triangle_count",
      // KM (user-keyed aggs + the day-grid-bounded curve math), LPA
      // (checkpointed rounds: per round one edge join + a per-id
      // WindowGroupLimit pick — returned frame is a checkpointed scan)
      // and chi-square (ONE (arm,type) count agg + K-row DECIMAL math)
      "q_survival_km", "q_communities_lpa", "q_ab_chisquare",
      // daily theta (per-day WindowGroupLimit K-min + sample-bounded
      // range merge) and containment (one-sided prefix-filter join —
      // A's rare-prefix buckets probe the full shingle frame)
      "q_theta_daily", "q_containment_join",
      // round-11 eighth-session additions: OLS (one orders⨝customer key
      // shuffle + broadcast dims, OLS math on the month grid), CUSUM/EWMA
      // (one (type,day) agg, day-grid slice folds), association rules
      // (order-keyed pair self-join + broadcast vocab-sized supports),
      // skyline (the audit evidence is ONE p_type exchange + in-partition
      // sort shared by both RANGE-framed maxima — no dominance self-join),
      // attribution (user-keyed bounded range join + purchase-keyed
      // window + click rollup), entity resolution (block-keyed candidate
      // joins + per-listing WindowGroupLimit — never dirty×canon),
      // reservoir (ONE day-keyed exchange carrying rank + count,
      // sample-bounded tails; the incremental form audits the stored
      // serve), cohort LTV (distinct-activity cohort agg + cell-grid
      // cumulative window) and the k-core peel (checkpointed rounds —
      // the returned frame is a union of checkpoint scans)
      "q_ols_trend", "q_cusum_changepoint", "q_ewma_smooth",
      "q_assoc_rules", "q_skyline", "q_attribution_linear",
      "q_entity_resolution", "q_reservoir_daily", "q_reservoir_incremental",
      "q_cohort_ltv", "q_kcore_domains",
      // the sweep-line concurrency profile (two delta rows per interval,
      // one day-keyed collapse — the audit evidence is NO explode and no
      // interval self-join), the windowed funnel (per-step min
      // aggregates), islands (one range exchange + grp aggregate) and
      // the stored skyline serve
      "q_interval_concurrency", "q_funnel_windowed", "q_id_islands",
      "q_skyline_incremental",
      // classifier evaluation: the audit evidence is the AUC rank window
      // riding the SCORE-HISTOGRAM frame (one q_score agg), never the
      // corpus rows; PRF is one aggregate over the scoring join
      "q_classifier_auc", "q_classifier_prf",
      // TWAP (ONE user exchange shared by the lead window and the
      // final agg), period-over-period (lag on the month grid), the
      // trailing-hour rate (user-keyed RANGE frame — a sliding
      // two-pointer, no self-join), rolling WAU (bounded 7x fan-out +
      // one exact distinct) and ABC bands (catalog-sized running sum)
      "q_time_weighted_avg", "q_period_over_period", "q_sliding_rate",
      "q_trailing_wau", "q_abc_classification",
      // snapshot diff (ONE key-keyed full outer join), Apriori triples
      // (order-keyed joins + broadcast supports), MLM masking (per-row,
      // zero pre-sort exchange) and ANN recall (two probe-bounded
      // searches + one (probe, neighbor) semi-join)
      "q_snapshot_diff", "q_frequent_triples", "q_mask_spans",
      "q_ann_recall",
      // weighted paths (checkpointed min-plus rounds — serve plan is a
      // checkpoint scan), vocab stats (one (source, token) shuffle) and
      // the key-skew report (windows over the count-of-counts frame)
      "q_weighted_paths", "q_vocab_stats", "q_key_skew",
      // PPR (checkpointed walk rounds — serve plan is a checkpoint
      // scan), drop provenance (dedup hash-groupBy + per-row gates),
      // calibration (one range-exchange rank + a 10-row agg), debounce
      // (ONE (user, type) exchange under lag window + burst group) and
      // trending (fact-fact key join + broadcast brand + shift decay)
      "q_pagerank_seeded", "q_drop_reasons", "q_calibration_bins",
      "q_event_debounce", "q_trending_brands",
      // LSH recall (two gated paths + one pair semi-join), periodicity
      // (ONE user exchange under lag + gap count + argmax window),
      // interp gapfill (the LOCF shape + a mirrored next-known window)
      // and the lang agreement cross-tab (K-cell aggregate)
      "q_minhash_recall", "q_bot_periodicity", "q_gapfill_interp",
      "q_langid_agreement",
      // TVD drift (one (type, cents, half) agg + broadcast totals) and
      // the session funnel (ONE user exchange for the session cut +
      // composite-keyed step aggregates)
      "q_histogram_drift", "q_session_funnel",
      // decayed-counter store (the audit form runs build+fold+serve; the
      // serve leg is the stored-table scan asserted in spec) and the
      // cluster-size rollup over the CC machinery
      "q_trending_incremental", "q_dedup_cluster_stats",
      // third-order paths: two lags on ONE per-user sort + K^3 agg
      "q_event_trigrams",
      // spearman: ranks off value histograms, one final sum; benford:
      // one digit-keyed agg + a 9-row constant join
      "q_spearman", "q_benford")
    // q_corpus_pipeline is deliberately NOT audited here: its query-form
    // plan is a trivial read over the staged tables (auditing it would
    // execute the whole 5-stage materialization for nothing — against
    // this file's lazy-audit discipline), the stage plans ARE the
    // operators audited above, and CorpusPipelineSpec plan-asserts the
    // one pipeline-specific shape (zero-exchange bucketed self-probe).
    // Plan-only overrides: q_embedding_near_dup's default construction
    // sizes its adaptive banding with a Spark job (persist + count of the
    // sketch); an explicit bandBits keeps the audit lazy and the plan
    // shape identical (sf0.01 sits at the BitsPerBand floor anyway).
    val overrides: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "q_embedding_near_dup" -> ops.VectorOps.nearDupPairs(
        Tables.t(spark, d, "embeddings"), 0.45,
        bandBits = Some(ops.VectorOps.BitsPerBand)),
      // the gated query's executed plan is only the oracle-checkpoint
      // read-back — audit the SEARCH frame instead (training collects
      // are unavoidable, the plan's codebooks are trained literals)
      "q_pq_cosine_topk" -> ops.VectorOps.pqTopkFrame(spark, d),
      "q_ivfpq_cosine_topk" -> ops.VectorOps.ivfPqTopkFrame(spark, d),
      "q_ivfsq_cosine_topk" -> ops.VectorOps.ivfSqTopkFrame(spark, d),
      // explicit nCells skips the corpus-count job (the index TRAINING
      // jobs are unavoidable — the plan's centroid side is trained data)
      "q_ivf_semantic_dedup" -> ops.VectorOps.ivfSemanticDedupPairs(
        Tables.t(spark, d, "embeddings"), 0.45,
        nCells = Some(ops.VectorOps.IvfCells)),
      // the bloom bitmap is a plan LITERAL, so the shape is content-
      // independent: a layout-valid dummy keeps the audit lazy (no
      // blocklist count, no bitmap collect)
      "q_blocklist_bloom" -> {
        val docs = Tables.t(spark, d, "documents")
          .withColumn("digest",
            org.apache.spark.sql.functions.sha2(
              org.apache.spark.sql.functions.col("text"), 256))
        val block = docs
          .filter(org.apache.spark.sql.functions.expr("doc_id % 11 = 3"))
          .select("digest").distinct()
        ops.BlocklistOps.cleanAgainstBloom(docs, block,
          Array[Byte](7, -1, -1, -1, -1, -1, -1, -1, -1))
      },
      // the scalar source count would otherwise run before the plan exists
      "q_salient_terms" -> ops.TextOps.salientTermsPerSource(spark, d,
        nSourcesHint = Some(20L)),
      "q_salient_terms_cjk" -> ops.TextOps.salientTermsCjk(spark, d,
        nSourcesHint = Some(20L)),
      // q_ivf_cosine_topk's registered form returns its oracle-input
      // checkpoint READ-BACK (the search executes during the write); the
      // plan worth auditing is the search frame itself. The mid-pipeline
      // checkpoints (minhash bands, simhash frame) need no override — the
      // join/confirm stages still sit in the registered plans.
      "q_ivf_cosine_topk" -> {
        val emb = Tables.t(spark, d, "embeddings")
        val (assignments, centroids) = ops.VectorOps.ivfIndex(emb)
        val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
          .select(org.apache.spark.sql.functions.col("vec_id").as("probe_id"),
            org.apache.spark.sql.functions.col("embedding").as("probe_vec"))
        ops.VectorOps.ivfSearch(assignments, centroids, probes)
      },
      // the registered form materializes gate inputs; the plan worth
      // auditing is the PRODUCTION probe against the persisted bucketed
      // band index (one small index build — same unavoidable-
      // materialization class as the bucketed-join tables)
      "q_dedup_incremental" ->
        ops.IncrementalDedup.dedupIncrementJoined(spark, d),
      // the vocab scalar is a literal in the score expression; the hint
      // keeps the audit lazy with an identical plan shape (salientTerms'
      // nSourcesHint contract)
      "q_perplexity_filter" ->
        ops.TextOps.perplexityFilter(spark, d, vocabHint = Some(1L)),
      "q_corpus_clean_ppx" ->
        ops.TextOps.corpusCleanPerplexity(spark, d, vocabHint = Some(1L)))
    // Round-11 stored-model SERVE audits (the registered gates pay
    // training so the oracle can replay it; the plan worth auditing is
    // the serve — stored-table scans + the codegen application fold, no
    // training aggregate). Same unavoidable-materialization class as
    // q_perplexity_serve: the audit pays one small build.
    lazy val servedOverrides: Map[String, org.apache.spark.sql.DataFrame] = {
      ops.BpeOps.buildBpeModel(Tables.t(spark, d, "documents"), "audit_bpe")
      ops.TextOps.buildQualityClassifier(
        Tables.t(spark, d, "documents"), "audit_qc")
      Map(
        "q_bpe_tokenize" ->
          ops.BpeOps.bpeTokenizeFromModel(spark, d, "audit_bpe"),
        "q_quality_classifier" ->
          ops.TextOps.qualityClassifierFromModel(spark, d, "audit_qc"))
    }
    // q_join_bucketed stays un-overridden BY DESIGN: a bucketed-join plan
    // cannot exist without bucketed tables in the catalog (the layout IS
    // catalog metadata), so the audit pays the two small writes — same
    // unavoidable-materialization class as the IVF training jobs.
    val sb = new StringBuilder
    sb.append("# PLANS — physical plan audits (generated by graft.PlanAudit at sf0.01)\n\n")
    sb.append("What to look for per DESIGN.md: `PushedFilters`/pruned `ReadSchema` on scans,\n")
    sb.append("`BroadcastHashJoin` on dimension joins, single hash-partition exchanges on\n")
    sb.append("group/window keys, `BroadcastNestedLoopJoin` only for the blocked knn probe,\n")
    sb.append("and no `CartesianProduct` anywhere.\n")
    names.foreach { n =>
      val df = overrides.getOrElse(n, SparkEntry.queries(n)(spark, d))
      sb.append(s"\n## $n\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(6000))
      sb.append("\n```\n")
    }
    servedOverrides.toSeq.sortBy(_._1).foreach { case (n, df) =>
      sb.append(s"\n## $n — SERVE path (stored model, training paid in build)\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(6000))
      sb.append("\n```\n")
    }
    // Incremental-cluster append WRITE-path audit (round 11): the rewrite
    // must READ only the affected id-range partitions. Evidence: the
    // affected-slice scan below carries the part IN-list as a
    // PartitionFilters entry — untouched partitions are never scanned,
    // and the spec additionally asserts their files stay bit-identical
    // across an append (OpsPropertySpec incremental-cluster test).
    locally {
      val db = "audit_inc_clusters"
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
      ops.IncrementalClusters.buildClusterState(spark,
        ops.IncrementalClusters.corpusDocsRange(spark, d), db)
      val slice = spark.table(s"`$db`.`${ops.IncrementalClusters.LabelsTable}`")
        .filter(org.apache.spark.sql.functions.col("part").isin(0, 3))
      sb.append("\n## q_dedup_clusters_incremental — WRITE path (affected-partition pruned read)\n\n```\n")
      sb.append(slice.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(3000))
      sb.append("\n```\n\nAppend mechanics: contracted CC over (batch ids ∪ touched labels)\n")
      sb.append("only; affected parts = parts of relabeled canons ∪ batch canons (driver\n")
      sb.append("metadata, bounded by the adaptive block law near 256 partitions); the\n")
      sb.append("read above prunes to exactly those (PartitionFilters); dynamic partition\n")
      sb.append("overwrite rewrites them and explicitly drops fully-emptied ones.\n")
      sb.append("Untouched partitions: never scanned, never rewritten — file-bit-identity\n")
      sb.append("asserted in OpsPropertySpec.\n")
    }
    // Backfill WRITE-path audit (q_partition_backfill's cost center): the
    // ranged re-run must touch only the DECLARED range. Evidence: the
    // write batch below pushes its date range into the parquet scan
    // (PushedFilters on the date column); partition replacement is
    // `ALTER TABLE … DROP PARTITION` — a metadata operation with no table
    // scan — followed by an append of this batch only. Untouched
    // partitions are never read or rewritten (no read-filter-rewrite, no
    // dynamic-overwrite pass over the table).
    locally {
      import java.time.LocalDate
      val src = Tables.t(spark, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val batch = pipeline.PartitionedMaterializer.rangedBatch(src,
        "o_orderdate", pipeline.PartitionGrain.Monthly,
        LocalDate.of(1996, 2, 1), LocalDate.of(1996, 3, 1))
      sb.append("\n## q_partition_backfill — WRITE path (ranged batch scan)\n\n```\n")
      sb.append(batch.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(3000))
      sb.append("\n```\n\nReplacement mechanics: `ALTER TABLE … DROP PARTITION` (metadata-only,\n")
      sb.append("no scan) + append of exactly this batch — partitions outside the\n")
      sb.append("declared range are never read or rewritten\n")
      sb.append("(graft.pipeline.PartitionedMaterializer.backfill).\n")
    }
    // Partition-scoped merge WRITE-path audit (q_mode_merge_partitioned's
    // cost center): a CDC batch against a partitioned table must rewrite
    // ONLY the partitions it touches. Evidence: the current-slice read
    // below carries the affected partition value as a PartitionFilters
    // entry — untouched partitions are never SCANNED (directory pruning at
    // plan time), and replacement is `ALTER TABLE … DROP PARTITION`
    // (metadata-only) + an append of the merged slice. The audit pays one
    // small partitioned write — same catalog-metadata class as the
    // bucketed-join tables.
    locally {
      val (db, table) = ("graft_audit_merge", "orders_by_month_cur")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
      val base = Tables.t(spark, d, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderdate") >=
          org.apache.spark.sql.functions.lit("1996-01-01").cast("timestamp") &&
          org.apache.spark.sql.functions.col("o_orderdate") <
            org.apache.spark.sql.functions.lit("1996-04-01").cast("timestamp"))
        .select(org.apache.spark.sql.functions.col("o_orderkey"),
          org.apache.spark.sql.functions.col("o_totalprice"),
          org.apache.spark.sql.functions.lit(1L).as("v"),
          org.apache.spark.sql.functions.date_format(
            org.apache.spark.sql.functions.col("o_orderdate"), "yyyy-MM")
            .as("part_key"))
      store.Warehouse.saveModel(base, db, table, Seq("part_key"))
      val slice = spark.table(s"`$db`.`$table`").filter(
        org.apache.spark.sql.functions.col("part_key") === "1996-02")
      sb.append("\n## q_mode_merge_partitioned — WRITE path (pruned current-slice scan)\n\n```\n")
      sb.append(slice.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(3000))
      sb.append("\n```\n\nMerge mechanics: affected partitions = the batch's distinct partition\n")
      sb.append("values; the current slice above prunes to exactly those (PartitionFilters\n")
      sb.append("— untouched partitions never scanned); one latest-wins window over\n")
      sb.append("union(slice, batch) lands in a temp table, then `ALTER TABLE … DROP\n")
      sb.append("PARTITION` (metadata-only) + append of the merged slice. Unaffected\n")
      sb.append("partition files are bit-untouched (file-level asserted in\n")
      sb.append("ExtractWarehouseSpec); unpartitioned targets fall back to the full\n")
      sb.append("temp-swap rewrite (graft.store.Warehouse.mergeUpsert).\n")
    }
    // Grain-evolution WRITE-path audit (round 7): the ranged rebuild's
    // read side must prune to exactly the old-grain partitions of the
    // range (PartitionFilters IN over the literal keys) — a 100 TB table
    // evolves month-by-month reading only each month's partitions.
    locally {
      import java.time.LocalDate
      val (db, table) = ("graft_audit_evolve", "orders_by_day")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
      val src = Tables.t(spark, d, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
      pipeline.PartitionedMaterializer.backfill(spark, src, "o_orderdate",
        pipeline.PartitionGrain.Daily, db, table,
        LocalDate.of(1996, 2, 1), LocalDate.of(1996, 3, 1))
      val oldKeys = pipeline.PartitionGrain.Daily.keys(
        LocalDate.of(1996, 2, 1), LocalDate.of(1996, 3, 1))
      val slice = spark.table(s"`$db`.`$table`")
        .filter(org.apache.spark.sql.functions.col("part_key")
          .isin(oldKeys: _*))
        .withColumn("part_key", pipeline.PartitionGrain.Monthly.key(
          org.apache.spark.sql.functions.col("o_orderdate")))
      sb.append("\n## grain evolution — WRITE path (pruned old-grain read)\n\n```\n")
      sb.append(slice.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(3000))
      sb.append("\n```\n\nEvolve mechanics: the slice above reads ONLY the range's old-grain\n")
      sb.append("partitions (PartitionFilters IN over the literal keys), re-derives the\n")
      sb.append("key at the new grain, lands in a manifest-carrying evolve tmp, then\n")
      sb.append("`ALTER TABLE … DROP PARTITION` (metadata-only) + append — crash-\n")
      sb.append("recoverable from the tmp + manifest at every window\n")
      sb.append("(graft.pipeline.PartitionedMaterializer.evolveGrain).\n")
    }
    // Corpus-increment WRITE-path audit (round 10): the three
    // scale-critical plans of runIncrement, reconstructed over a tiny
    // synthetic corpus through the same private[graft] helpers the
    // pipeline composes — the pruning/exchange properties are asserted in
    // CorpusPipelineSpec (zero-exchange self-probe, file-bit-identical
    // unaffected shards, emptied-shard drop); this section is the plan
    // evidence.
    locally {
      import org.apache.spark.sql.functions.{col, length}
      import pipeline.CorpusPipeline
      val db = "graft_audit_inc"
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
      import spark.implicits._
      def text(id: Long) = s"the quick document $id of a series to index " +
        s"and measure with twenty or more unique tokens alpha$id beta$id " +
        s"gamma$id delta$id epsilon$id zeta$id eta$id theta$id"
      val docs = (1L to 30L).filterNot(_ % 100 == 7).map(i =>
          (i, text(i), "en", s"src${(i % 3).toInt}"))
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
      CorpusPipeline.runFresh(spark, docs.filter(col("doc_id") <= 20),
        "audit#base<=20", db)
      val batch = docs.filter(col("doc_id") > 20)

      val batchClean = ops.TextOps.corpusCleanSurvivorsAgainst(batch,
        spark.table(CorpusPipeline.fq(db, CorpusPipeline.HashIndexTable)))
      val bands = ops.IncrementalDedup.pruneHot(
        ops.TextOps.bandsOfDocs(batchClean))
      val verdicts = ops.IncrementalDedup.incrementVerdicts(
        spark.table(CorpusPipeline.fq(db, CorpusPipeline.IndexTable)),
        bands, batchClean)
      sb.append("\n## corpus increment — s2 probe+append (batch bands vs bucketed index)\n\n```\n")
      sb.append(verdicts.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(4000))
      sb.append("\n```\n\nAppend mechanics: the batch's pruned bands land via insertInto\n")
      sb.append("preserving the index's bucket spec; the keep-lowest probe above reads\n")
      sb.append("the corpus-sized index IN PLACE (bucketed scan — the zero-exchange\n")
      sb.append("band-key contract CorpusPipelineSpec asserts) while only the\n")
      sb.append("batch-sized side shuffles. The corpus is never re-signed.\n")

      val addFlagged = ops.TextOps.cjkFlaggedAgainst(
        spark.table(CorpusPipeline.fq(db, CorpusPipeline.EvalGramsTable)),
        batchClean, CorpusPipeline.DecontamNgram).select("doc_id")
      val added = batchClean.filter(col("doc_id") % 100 =!= 7)
        .join(addFlagged, Seq("doc_id"), "left_anti")
      sb.append("\n## corpus increment — s3 append-only fast path\n\n```\n")
      sb.append(added.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(3000))
      sb.append("\n```\n\nWhen the batch carries no eval grams that retro-flag stored docs,\n")
      sb.append("s3 is a PURE batch-sized append: the batch probes the BROADCAST\n")
      sb.append("stored-gram set (plan above — no corpus scan anywhere) and appends.\n")
      sb.append("The corpus-sized s3 rewrite is paid only when new eval grams actually\n")
      sb.append("bite (retro-flag eviction), and the s4/s5 suffix then recomputes only\n")
      sb.append("affected sources/shards.\n")

      val replacement = CorpusPipeline.packShards(
        spark.table(CorpusPipeline.fq(db, "s4_mix"))
          .filter(ops.SamplingOps.shardOfDocId.isin(Seq(0, 1): _*)))
      sb.append("\n## corpus increment — s5 affected-shard repack\n\n```\n")
      sb.append(replacement.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).take(3000))
      sb.append("\n```\n\nRepack mechanics: only shards holding an s4 delta re-pack — the\n")
      sb.append("replacement frame above scans s4 FILTERED to the affected shards (the\n")
      sb.append("same md5 shard law the window applies) and lands via DYNAMIC partition\n")
      sb.append("overwrite, which rewrites only partitions present in the frame\n")
      sb.append("(unaffected shard partitions keep their files byte-for-byte —\n")
      sb.append("spec-asserted); an affected shard whose s4 membership vanished is\n")
      sb.append("dropped through the partition-scoped delete (fully-emptied partitions\n")
      sb.append("stay dropped — the r10 stale-partition fix, spec-asserted).\n")
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    }
    // plan dumps can carry raw control chars (the mojibake regex ranges,
    // the BPE chr(2)/chr(3) delimiters) — escape them so PLANS.md stays a
    // text file a reviewer's grep/pager treats as one
    val sanitized = sb.toString.flatMap {
      case c if c != '\n' && c != '\t' && (c < ' ' || (c >= '\u007f' && c <= '\u009f')) =>
        f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sanitized)
    println("wrote PLANS.md")
    spark.stop()
  }
}
