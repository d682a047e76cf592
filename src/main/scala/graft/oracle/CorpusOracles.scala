package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Corpus family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object CorpusOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
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
    // incrementally-maintained cluster state: the oracle replays the
    // closure over the FRESH full-corpus pair set, so a pass proves the
    // append path landed bit-equal to a from-scratch survivors run
    "q_dedup_clusters_incremental" ->
      survivorOracle("inc_cluster_pairs", "documents", "doc_id", "doc_id"),
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
    "q_pack_sequences_bpe" -> packSequencesBpeOracle,
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
  )
}
