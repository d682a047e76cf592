package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Vector family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object VectorOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
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
    // retrieval MRR: BM25 replayed declaratively, self excluded BEFORE
    // ranking, relevance = shared minhash cluster over the materialized
    // pair set; first_rank/rr_ppm 0-defaulted so no-partner and
    // missed-partner probes stay distinguishable via n_relevant
    "q_retrieval_mrr" -> {
      val path = OracleInputs.sqlPath("text_pairs_mrr")
      bm25Ctes(s"doc_id % ${ops.RetrievalOps.MrrModulus} = " +
          s"${ops.RetrievalOps.MrrResidue}", "", fullDocTerms = true)
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
           |cszm AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csz
           |         FROM comp GROUP BY 1),
           |mrk AS (
           |    SELECT sc.query_id, sc.doc_id,
           |           CAST(row_number() OVER (PARTITION BY sc.query_id
           |               ORDER BY sc.score DESC, sc.doc_id ASC) AS INTEGER)
           |               AS rnk
           |    FROM sc WHERE sc.doc_id <> sc.query_id
           |), fh AS (
           |    SELECT r.query_id, MIN(r.rnk) AS first_rank
           |    FROM mrk r
           |    JOIN comp cq ON cq.id = r.query_id
           |    JOIN comp cd ON cd.id = r.doc_id
           |    WHERE cq.cluster_id = cd.cluster_id AND r.rnk <= 5
           |    GROUP BY 1
           |)
           |SELECT q.query_id,
           |       CAST(z.csz - 1 AS BIGINT) AS n_relevant,
           |       CAST(COALESCE(f.first_rank, 0) AS INTEGER) AS first_rank,
           |       CAST(COALESCE(1000000 // f.first_rank, 0) AS BIGINT)
           |           AS rr_ppm
           |FROM (SELECT DISTINCT query_id FROM qt) q
           |JOIN comp c ON c.id = q.query_id
           |JOIN cszm z ON z.cluster_id = c.cluster_id
           |LEFT JOIN fh f ON f.query_id = q.query_id
           |ORDER BY q.query_id""".stripMargin
    },
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
    // stored-model language ID: the SAME declarative NB retrain, class
    // label = the declared lang
    "q_lang_id_nb" -> (dcCtesOver("lang") +
      """
        |SELECT doc_id, c AS pred_lang, CAST(dc_score AS BIGINT) AS nb_score,
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
    // nProbe tuning curve: the exact top-5 CTEs (the ann_recall text),
    // then per budget the materialized candidate frame's count, top-5
    // rank replay and hit count — split-gate contract
    "q_ivf_nprobe_curve" -> {
      val blocks = Seq(1, 2, 4, 8).map { np =>
        val path = OracleInputs.sqlPath(s"ivf_curve_cand_np$np")
        s""", c$np AS (
           |    SELECT probe_id, neighbor_id, cosine
           |    FROM read_parquet('$path/*.parquet')
           |), t$np AS (
           |    SELECT probe_id, neighbor_id FROM (
           |        SELECT probe_id, neighbor_id,
           |               row_number() OVER (PARTITION BY probe_id
           |                   ORDER BY cosine DESC, neighbor_id) AS rnk
           |        FROM c$np) WHERE rnk <= 5
           |), r$np AS (
           |    SELECT CAST($np AS INTEGER) AS nprobe,
           |           (SELECT CAST(COUNT(*) AS BIGINT) FROM c$np)
           |               AS n_candidates,
           |           (SELECT CAST(COUNT(*) AS BIGINT) FROM exact)
           |               AS n_exact,
           |           CAST((SELECT COUNT(*) FROM exact e JOIN t$np t
           |                 ON t.probe_id = e.probe_id
           |                AND t.neighbor_id = e.neighbor_id) AS BIGINT)
           |               AS n_hit
           |)""".stripMargin
      }.mkString
      s"""WITH nrm AS (
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
        |)""".stripMargin + blocks +
        """
          |SELECT nprobe, n_candidates, n_exact, n_hit,
          |       CAST(n_hit * 1000000 // n_exact AS BIGINT) AS recall_ppm
          |FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
          |      UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r8)
          |ORDER BY nprobe""".stripMargin
    },
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
}
