package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Text family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object TextOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
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
    "q_dedup_survivors" ->
      survivorOracle("text_pairs", "documents", "doc_id", "doc_id"),
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
    "q_text_stats" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       length(replace(text, ' ', '')) AS n_nonspace
        |FROM documents ORDER BY doc_id""".stripMargin,
    // LIX readability over the crafted sentence view: the every-12th-space
    // period injection is one global regex both engines run identically;
    // long words count on the ORIGINAL whitespace tokens; ratios are
    // nonnegative-integer truncations, so `//` == Spark `div`
    "q_readability" ->
      s"""WITH rdt AS (
        |    SELECT doc_id,
        |           string_split_regex(trim(text), '\\s+') AS tokens,
        |           regexp_replace(trim(text),
        |             '(\\S+( \\S+){${TextOps.SentenceTokens - 1}}) ',
        |             '\\1. ', 'g') || '.' AS sent
        |    FROM documents
        |), rdc AS (
        |    SELECT doc_id,
        |           CAST(len(tokens) AS BIGINT) AS n_words,
        |           CAST(len(list_filter(tokens, tk -> length(tk) >= 7))
        |               AS BIGINT) AS n_long,
        |           CAST(length(sent) - length(replace(sent, '.', ''))
        |               AS BIGINT) AS n_sentences
        |    FROM rdt
        |)
        |SELECT doc_id, n_words, n_long, n_sentences,
        |       CAST(CASE WHEN n_sentences = 0 THEN 0
        |            ELSE n_words * 1000000 // n_sentences END AS BIGINT)
        |           AS wps_ppm,
        |       CAST(CASE WHEN n_words = 0 THEN 0
        |            ELSE n_long * 1000000 // n_words END AS BIGINT)
        |           AS long_ppm,
        |       CAST(CASE WHEN n_sentences = 0 OR n_words = 0 THEN 0
        |            ELSE n_words * 1000000 // n_sentences
        |               + n_long * 100000000 // n_words END AS BIGINT)
        |           AS lix_ppm
        |FROM rdc ORDER BY doc_id""".stripMargin,
    // KWIC concordance: 1-based token positions via unnest(range),
    // edge-clamped inclusive list slices == Spark's (start, length)
    // slice; empty contexts emit '' in both engines
    "q_kwic" ->
      s"""WITH kwt AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), kwp AS (
        |    SELECT doc_id, tokens,
        |           unnest(range(1, len(tokens) + 1)) AS p,
        |           unnest(tokens) AS w
        |    FROM kwt
        |)
        |SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |       COALESCE(array_to_string(
        |           tokens[greatest(p - ${TextOps.KwicRadius}, 1) : p - 1],
        |           ' '), '') AS left_ctx,
        |       COALESCE(array_to_string(
        |           tokens[p + 1 : p + ${TextOps.KwicRadius}], ' '), '')
        |           AS right_ctx
        |FROM kwp WHERE w = '${TextOps.KwicTerm}'
        |ORDER BY doc_id, pos""".stripMargin,
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
    // count-threshold-pruned KN: hapax bigram types cut from the model
    // (HAVING >= KnPruneMinCount), derived stats from the PRUNED table,
    // pruned transitions back off through the stored-model serve law
    // (context survives → λ·p_cont; context fully pruned → p_cont)
    "q_kneser_ney_pruned" ->
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
        |          FROM pw GROUP BY 1, 2
        |          HAVING COUNT(*) >= ${TextOps.KnPruneMinCount}),
        |c1 AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS c1,
        |              CAST(COUNT(*) AS BIGINT) AS n1p
        |       FROM c2 GROUP BY 1),
        |cont AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n1m FROM c2 GROUP BY 1),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM c2),
        |joined AS (
        |    SELECT p.doc_id,
        |           CASE WHEN (SELECT nb FROM nb) = 0 THEN 0
        |                ELSE (${TextOps.KnScale} * COALESCE(cont.n1m, 0))
        |                     // (SELECT nb FROM nb) END AS p_cont,
        |           c2.c2 AS c2, c1.c1 AS c1, c1.n1p AS n1p
        |    FROM pw p
        |    LEFT JOIN c2 ON p.prev = c2.prev AND p.w = c2.w
        |    LEFT JOIN c1 ON p.prev = c1.prev
        |    LEFT JOIN cont ON p.w = cont.w
        |), scored AS (
        |    SELECT doc_id,
        |           CASE WHEN c1 IS NULL THEN p_cont
        |                ELSE COALESCE((${TextOps.KnScale} * (4*c2 - 3))
        |                         // (4*c1), 0)
        |                   + (((3 * ${TextOps.KnScale} * n1p) // (4*c1))
        |                      * p_cont) // ${TextOps.KnScale}
        |           END AS p_fp
        |    FROM joined
        |), doc AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
        |           CAST(SUM(p_fp) AS BIGINT) AS p_sum
        |    FROM scored GROUP BY doc_id
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
    // HHI / Simpson concentration: exact integer sums, one floor at the
    // end — HUGEINT // == Spark DECIMAL(38) div
    "q_source_concentration" ->
      """WITH scc AS (
        |    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cnt
        |    FROM documents GROUP BY 1, 2
        |), sca AS (
        |    SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |           CAST(COUNT(*) AS BIGINT) AS n_sources,
        |           CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS s2
        |    FROM scc GROUP BY 1
        |)
        |SELECT lang, n_docs, n_sources,
        |       CAST(s2 * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs)
        |            AS BIGINT) AS hhi_ppm,
        |       CAST(1000000 - s2 * 1000000
        |            // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
        |           AS simpson_ppm
        |FROM sca ORDER BY lang""".stripMargin,
    // distinct-3-gram novelty of the odd slice vs the even reference:
    // per-slice distinct gram sets, anti-join count, exact ppm
    "q_ngram_novelty" ->
      s"""WITH nvt AS (
        |    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), nvg AS (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |               range(1, len(tokens) - ${SetJoinOps.ShingleN - 2}),
        |               i -> array_to_string(
        |                   tokens[i:i+${SetJoinOps.ShingleN - 1}], ' '))))
        |               AS sh
        |    FROM nvt WHERE len(tokens) >= ${SetJoinOps.ShingleN}
        |), nvr AS (
        |    SELECT DISTINCT sh FROM nvg WHERE doc_id % 2 = 0
        |), nvc AS (
        |    SELECT DISTINCT sh FROM nvg WHERE doc_id % 2 = 1
        |), nvn AS (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_novel
        |    FROM nvc WHERE sh NOT IN (SELECT sh FROM nvr)
        |), nvs AS (
        |    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nvr)
        |               AS n_grams_ref,
        |           (SELECT CAST(COUNT(*) AS BIGINT) FROM nvc)
        |               AS n_grams_cand
        |)
        |SELECT s.n_grams_ref, s.n_grams_cand, n.n_novel,
        |       CAST(CASE WHEN s.n_grams_cand = 0 THEN 0
        |            ELSE n.n_novel * 1000000 // s.n_grams_cand END
        |            AS BIGINT) AS novelty_ppm
        |FROM nvn n, nvs s""".stripMargin,
    // isotonic calibration: PAV via the minimax characterization over
    // the bounded bin frame — segment rates ordered by the exact scaled-
    // fraction key (HUGEINT // == Spark DECIMAL(38) div), lexicographic
    // tie-breaks replaying Spark's min/max-of-struct, emitted as the
    // chosen segment's exact ppm
    "q_isotonic_calibration" ->
      s"""WITH $qcKeptCte
        |, isr AS (
        |    SELECT doc_id, q_score,
        |           CASE WHEN doc_id % 100 = 7 THEN 1 ELSE 0 END AS pos,
        |           row_number() OVER (ORDER BY q_score, doc_id) AS rnk,
        |           (SELECT COUNT(*) FROM qsc2) AS n_all
        |    FROM qsc2
        |), isb AS (
        |    SELECT CAST((rnk - 1) * 10 // n_all AS BIGINT) AS bin,
        |           CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(pos) AS BIGINT) AS n_pos
        |    FROM isr GROUP BY 1
        |), iseg AS (
        |    SELECT a.bin AS a, b.bin AS b,
        |           CAST(SUM(x.n) AS BIGINT) AS scnt,
        |           CAST(SUM(x.n_pos) AS BIGINT) AS spos
        |    FROM isb a JOIN isb b ON a.bin <= b.bin
        |    JOIN isb x ON x.bin BETWEEN a.bin AND b.bin
        |    GROUP BY 1, 2
        |), isk AS (
        |    SELECT a, b, scnt, spos,
        |           CAST(spos AS HUGEINT) * 1000000000000000000 // scnt
        |               AS rate_key
        |    FROM iseg
        |), isn AS (
        |    SELECT i.bin AS i, k.a, k.rate_key, k.b, k.spos, k.scnt,
        |           row_number() OVER (PARTITION BY i.bin, k.a
        |               ORDER BY k.rate_key, k.b, k.spos, k.scnt) AS rn
        |    FROM isk k JOIN isb i ON k.a <= i.bin AND i.bin <= k.b
        |), iso AS (
        |    SELECT i, spos, scnt,
        |           row_number() OVER (PARTITION BY i
        |               ORDER BY rate_key DESC, b DESC, spos DESC,
        |                        scnt DESC) AS rx
        |    FROM isn WHERE rn = 1
        |)
        |SELECT s.bin, s.n, s.n_pos,
        |       CAST(s.n_pos * 1000000 // s.n AS BIGINT) AS raw_rate_ppm,
        |       CAST(o.spos * 1000000 // o.scnt AS BIGINT) AS iso_rate_ppm
        |FROM isb s JOIN iso o ON o.i = s.bin AND o.rx = 1
        |ORDER BY s.bin""".stripMargin,
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
    // three-rater agreement (declared × stopword vote × NB retrain) in
    // exact ppm — the NB chain rides dcCtesOver('lang'), the vote CTEs
    // append to it
    "q_langid_agreement" -> (dcCtesOver("lang") +
      """, lat AS (
        |    SELECT doc_id, lang,
        |           string_split_regex(trim(text), '\s+') AS tokens
        |    FROM documents
        |), las AS (
        |    SELECT doc_id, lang,
        |      CASE WHEN en_score > greatest(de_score, es_score, fr_score)
        |               THEN 'en'
        |           WHEN de_score > greatest(en_score, es_score, fr_score)
        |               THEN 'de'
        |           WHEN es_score > greatest(en_score, de_score, fr_score)
        |               THEN 'es'
        |           WHEN fr_score > greatest(en_score, de_score, es_score)
        |               THEN 'fr'
        |           ELSE 'und' END AS lang_guess
        |    FROM (SELECT doc_id, lang,
        |        len(list_filter(tokens, t -> t IN ('the','a','of','and')))
        |            AS en_score,
        |        len(list_filter(tokens, t -> t IN ('der','die','und','das')))
        |            AS de_score,
        |        len(list_filter(tokens, t -> t IN ('el','la','los','que')))
        |            AS es_score,
        |        len(list_filter(tokens, t -> t IN ('le','la','les','et')))
        |            AS fr_score
        |        FROM lat)
        |), lnb AS (
        |    SELECT doc_id, c AS nb_guess FROM drk WHERE rn = 1
        |), lac AS (
        |    SELECT v.lang, v.lang_guess, b.nb_guess,
        |           CAST(COUNT(*) AS BIGINT) AS n
        |    FROM las v JOIN lnb b USING (doc_id) GROUP BY 1, 2, 3
        |), lal AS (
        |    SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang
        |    FROM lac GROUP BY 1
        |)
        |SELECT c.lang, c.lang_guess, c.nb_guess, c.n,
        |       CAST(c.n * 1000000 // l.n_lang AS BIGINT) AS share_ppm
        |FROM lac c JOIN lal l USING (lang)
        |ORDER BY lang, lang_guess, nb_guess""".stripMargin),
    // skip-gram pairs: per-row list generation (backward offsets 1..2,
    // both directions emitted), one count, deterministic top-100
    "q_skipgram_pairs" ->
      """WITH sgt AS (
        |    SELECT string_split_regex(trim(text), '\s+') AS tk
        |    FROM documents
        |), sgp AS (
        |    SELECT u.pr FROM sgt, unnest(flatten(list_transform(
        |        range(1, len(tk) + 1),
        |        i -> flatten(list_transform(range(greatest(1, i - 2), i),
        |          j -> [struct_pack(w := tk[i], c := tk[j]),
        |                struct_pack(w := tk[j], c := tk[i])]))))) AS u(pr)
        |)
        |SELECT pr.w AS w, pr.c AS c, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM sgp GROUP BY 1, 2
        |ORDER BY cnt DESC, w, c LIMIT 100""".stripMargin,
    // Zipf doubling buckets: rank types per source, bucket = binary
    // digit count of the rank - 1 (exact integer log2), lead ratio ppm
    "q_zipf_profile" ->
      """WITH zpf AS (
        |    SELECT source, u.tok, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM (SELECT source,
        |              string_split_regex(trim(text), '\s+') AS tk
        |          FROM documents) d, unnest(d.tk) AS u(tok)
        |    GROUP BY 1, 2
        |), zpr AS (
        |    SELECT source, c,
        |           row_number() OVER (PARTITION BY source
        |               ORDER BY c DESC, tok) AS rnk
        |    FROM zpf
        |), zpb AS (
        |    SELECT source,
        |           CAST(length(printf('%b', rnk)) - 1 AS BIGINT) AS bucket,
        |           CAST(COUNT(*) AS BIGINT) AS n_types,
        |           CAST(SUM(c) AS BIGINT) AS bucket_tokens
        |    FROM zpr GROUP BY 1, 2
        |)
        |SELECT source, bucket, n_types, bucket_tokens,
        |       CAST(coalesce(CAST(lead(bucket_tokens) OVER (PARTITION BY source
        |                ORDER BY bucket) AS HUGEINT)
        |                * 1000000 // bucket_tokens, -1)
        |            AS BIGINT) AS decay_ppm
        |FROM zpb ORDER BY source, bucket""".stripMargin,
    // coverage curve: vocabulary ranks + three prefix cutoffs
    "q_vocab_coverage" ->
      """WITH vcf AS (
        |    SELECT u.w, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM (SELECT string_split_regex(trim(text), '\s+') AS tk
        |          FROM documents) d, unnest(d.tk) AS u(w)
        |    GROUP BY 1
        |), vcr AS (
        |    SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rnk
        |    FROM vcf
        |), vct AS (
        |    SELECT CAST(SUM(c) AS BIGINT) AS total,
        |           CAST(COUNT(*) AS BIGINT) AS n_types
        |    FROM vcf
        |)
        |SELECT CAST(n.top_n AS BIGINT) AS top_n, t.n_types, t.total,
        |       CAST(COALESCE((SELECT SUM(c) FROM vcr
        |                      WHERE rnk <= n.top_n), 0) AS BIGINT)
        |           AS covered,
        |       CAST(CAST(COALESCE((SELECT SUM(c) FROM vcr
        |                      WHERE rnk <= n.top_n), 0) AS HUGEINT)
        |            * 1000000 // t.total AS BIGINT) AS coverage_ppm
        |FROM (VALUES (100), (1000), (10000)) n(top_n), vct t
        |ORDER BY top_n""".stripMargin,
    // OOV of the back-1/3 batch against the front-2/3 vocabulary
    // (the incremental gates' doc_id split rule)
    "q_oov_rate" ->
      """WITH omx AS (
        |    SELECT MAX(doc_id) AS mx FROM documents
        |), ovv AS (
        |    SELECT DISTINCT u.w
        |    FROM (SELECT string_split_regex(trim(text), '\s+') AS tk
        |          FROM documents, omx WHERE doc_id * 3 < mx * 2) d,
        |         unnest(d.tk) AS u(w)
        |), ovb AS (
        |    SELECT d.source, u.w, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM (SELECT source,
        |              string_split_regex(trim(text), '\s+') AS tk
        |          FROM documents, omx WHERE doc_id * 3 >= mx * 2) d,
        |         unnest(d.tk) AS u(w)
        |    GROUP BY 1, 2
        |)
        |SELECT b.source, CAST(SUM(b.c) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN v.w IS NULL THEN b.c ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_oov_types,
        |       CAST(SUM(CASE WHEN v.w IS NULL THEN b.c ELSE 0 END)
        |            * 1000000 // SUM(b.c) AS BIGINT) AS oov_ppm
        |FROM ovb b LEFT JOIN ovv v ON v.w = b.w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // quantile alignment: per-source and global length histograms with
    // cumulative ranges, percentile ranks ceil(p*n/100) looked up by
    // range containment (the oracle favors the declarative BETWEEN
    // join; the engine's as-of union+window computes the same cell)
    "q_quantile_align" -> quantileAlignSql,
    // maintenance invariant: the gate serves from a delta-grown stored
    // histogram; the oracle is the FRESH full-corpus alignment — green
    // proves streamed state ≡ from-scratch (the link-graph posture)
    "q_quantile_align_incremental" -> quantileAlignSql,
    // deletion invariant: the gate folds the back-1/3 slice as a
    // NEGATIVE delta; the oracle is the fresh alignment WITHOUT that
    // slice — green proves the forget fold ≡ retrain-without-deleted
    "q_quantile_align_forget" -> quantileAlignSqlOver(
      "(SELECT * FROM documents WHERE doc_id * 3 < " +
        "(SELECT MAX(doc_id) FROM documents) * 2)"),
    // pairwise source 3-gram Jaccard: per-source distinct shingle sets,
    // gram-keyed pairing (fan-out ≤ C(|sources|,2) per gram), exact
    // |A∪B| = |A|+|B|−|A∩B|
    "q_source_similarity" ->
      s"""WITH sst AS (
        |    SELECT source, doc_id,
        |           string_split_regex(trim(text), '\\s+') AS tokens
        |    FROM documents
        |), ssg AS (
        |    SELECT DISTINCT source, unnest(list_transform(
        |               range(1, len(tokens) - ${SetJoinOps.ShingleN - 2}),
        |               i -> array_to_string(
        |                   tokens[i:i+${SetJoinOps.ShingleN - 1}], ' ')))
        |               AS sh
        |    FROM sst WHERE len(tokens) >= ${SetJoinOps.ShingleN}
        |), ssn AS (
        |    SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM ssg GROUP BY 1
        |), ssi AS (
        |    SELECT a.source AS sa, b.source AS sb,
        |           CAST(COUNT(*) AS BIGINT) AS n_inter
        |    FROM ssg a JOIN ssg b ON a.sh = b.sh AND a.source < b.source
        |    GROUP BY 1, 2
        |)
        |SELECT i.sa, i.sb, x.n AS na, y.n AS nb, i.n_inter,
        |       CAST(i.n_inter * 1000000 // (x.n + y.n - i.n_inter)
        |            AS BIGINT) AS jaccard_ppm
        |FROM ssi i JOIN ssn x ON x.source = i.sa
        |JOIN ssn y ON y.source = i.sb
        |ORDER BY i.sa, i.sb""".stripMargin,
  )

  /** The quantile-alignment SQL — shared by the fresh gate and the
    * incremental gate's from-scratch oracle.
    */
  private def quantileAlignSql: String = quantileAlignSqlOver("documents")

  /** The alignment SQL over a caller-chosen document relation — the
    * forget gate's oracle passes the corpus MINUS the departing slice.
    */
  private def quantileAlignSqlOver(docs: String): String = {
      def side(src: String, tag: String) =
        s"""${tag}h AS (
           |    SELECT $src AS source, n_chars,
           |           CAST(COUNT(*) AS BIGINT) AS c,
           |           SUM(COUNT(*)) OVER (PARTITION BY $src
           |               ORDER BY n_chars) AS hi
           |    FROM $docs GROUP BY 1, 2
           |), ${tag}r AS (
           |    SELECT source, n_chars, hi - c + 1 AS lo, hi FROM ${tag}h
           |), ${tag}n AS (
           |    SELECT $src AS source, CAST(COUNT(*) AS BIGINT) AS n_s
           |    FROM $docs GROUP BY 1
           |), ${tag}g AS (
           |    SELECT source, u.pct,
           |           greatest(1, (u.pct * n_s + 99) // 100) AS k
           |    FROM ${tag}n, unnest(range(0, 101)) AS u(pct)
           |), ${tag}v AS (
           |    SELECT g.source, g.pct, r.n_chars AS value
           |    FROM ${tag}g g JOIN ${tag}r r
           |      ON r.source = g.source AND g.k BETWEEN r.lo AND r.hi
           |)""".stripMargin
      s"""WITH ${side("source", "qa")},
         |${side("'__all__'", "qb")}
         |SELECT a.source, CAST(a.pct AS INTEGER) AS pct,
         |       CAST(a.value AS BIGINT) AS src_value,
         |       CAST(b.value AS BIGINT) AS global_value,
         |       CAST(a.value - b.value AS BIGINT) AS shift
         |FROM qav a JOIN qbv b ON b.pct = a.pct
         |ORDER BY a.source, a.pct""".stripMargin
  }
}
