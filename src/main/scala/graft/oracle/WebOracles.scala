package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Web family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object WebOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
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
    // single-document content/boilerplate line classification: the
    // jusText stopword-density rule replayed per line — >= 4 single-space
    // tokens AND at least one canonical stopword; cleaned text re-joins
    // content lines in original order, compared cell-for-cell
    "q_line_quality" ->
      s"""WITH $craftedLinesCte,
        |lql AS (
        |    SELECT doc_id, unnest(range(1, len(ls) + 1)) AS p,
        |           unnest(ls) AS line
        |    FROM (SELECT doc_id, string_split(crafted, chr(10)) AS ls
        |          FROM crafted)
        |), lqv AS (
        |    SELECT doc_id, p, line,
        |           len(string_split(line, ' '))
        |               >= ${ops.WebTextOps.LineMinTokens}
        |           AND len(list_filter(string_split(line, ' '),
        |               tk -> tk IN ('the', 'a', 'of', 'to', 'and'))) >= 1
        |               AS content
        |    FROM lql
        |)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CASE WHEN content THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_content,
        |       CAST(SUM(CASE WHEN content THEN 0 ELSE 1 END) AS BIGINT)
        |           AS n_boiler,
        |       COALESCE(array_to_string(
        |           list(CASE WHEN content THEN line END ORDER BY p)
        |               FILTER (WHERE content), chr(10)), '')
        |           AS text_content
        |FROM lqv GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // C4 rule-based cleaning: the crafted view plus the rule-exercising
    // injected lines and the (p + doc_id) % 3 period schedule, then the
    // four line rules and two page rules replayed verbatim
    "q_c4_filters" ->
      s"""WITH $craftedLinesCte,
        |c4c AS (
        |    SELECT doc_id,
        |           crafted
        |           || CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
        |                'lorem ipsum dolor sit amet {' ELSE '' END
        |           || CASE WHEN doc_id % 9 = 0 THEN chr(10) ||
        |                'please enable javascript to view this site.'
        |              ELSE '' END
        |           || CASE WHEN doc_id % 10 = 0 THEN chr(10) ||
        |                'read our privacy policy here.' ELSE '' END
        |               AS crafted2
        |    FROM crafted
        |), c4l AS (
        |    SELECT doc_id, unnest(range(1, len(ls) + 1)) AS p,
        |           unnest(ls) AS line
        |    FROM (SELECT doc_id, string_split(crafted2, chr(10)) AS ls
        |          FROM c4c)
        |), c4s AS (
        |    SELECT doc_id, p,
        |           line || CASE WHEN (p + doc_id) % 3 = 1 THEN '.'
        |                   ELSE '' END AS line2
        |    FROM c4l
        |), c4v AS (
        |    SELECT doc_id, p, line2,
        |           right(line2, 1) IN ('.', '!', '?', '"')
        |           AND len(string_split(line2, ' '))
        |               >= ${ops.WebTextOps.C4MinLineTokens}
        |           AND NOT contains(line2, 'javascript')
        |           AND NOT contains(line2, 'privacy policy') AS kept,
        |           contains(line2, '{') OR contains(line2, 'lorem ipsum')
        |               AS page_bad
        |    FROM c4s
        |), c4a AS (
        |    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_kept,
        |           CAST(CASE WHEN NOT MAX(page_bad)
        |                  AND SUM(CASE WHEN kept THEN 1 ELSE 0 END)
        |                      >= ${ops.WebTextOps.C4MinKeptLines}
        |                THEN 1 ELSE 0 END AS INTEGER) AS page_keep,
        |           COALESCE(array_to_string(
        |               list(CASE WHEN kept THEN line2 END ORDER BY p)
        |                   FILTER (WHERE kept), chr(10)), '') AS kt
        |    FROM c4v GROUP BY doc_id
        |)
        |SELECT doc_id, n_lines, n_kept, page_keep,
        |       CASE WHEN page_keep = 1 THEN kt ELSE '' END AS text_c4
        |FROM c4a ORDER BY doc_id""".stripMargin,
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
    // harmonic centrality: the all-pairs bounded BFS keyed per source,
    // 6 unrolled min-rounds, then the exact ppm harmonic rollup with a
    // verts left join so isolated domains emit 0
    "q_harmonic_centrality" -> allPairsHopsOracle(6),
    // same APSP rounds, per-SOURCE rollup (reach, dist sum, max geodesic)
    "q_eccentricity" -> eccentricityOracle(6),
    // symmetric endpoint-degree Pearson: variance terms equal by
    // symmetry so r is the exact rational num/den, no sqrt; the
    // negative-floor CASE matches Spark's truncating div
    "q_assortativity" -> (domainGraphCtes +
      """, aue AS MATERIALIZED (
        |    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |    FROM edges WHERE src <> dst
        |), adg AS (
        |    SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |        SELECT a AS v FROM aue UNION ALL SELECT b AS v FROM aue
        |    ) GROUP BY 1
        |), apt AS (
        |    SELECT da.deg AS x, db.deg AS y
        |    FROM aue e JOIN adg da ON da.v = e.a JOIN adg db ON db.v = e.b
        |    UNION ALL
        |    SELECT db.deg AS x, da.deg AS y
        |    FROM aue e JOIN adg da ON da.v = e.a JOIN adg db ON db.v = e.b
        |), asm AS (
        |    SELECT CAST(COUNT(*) AS HUGEINT) AS m2,
        |           CAST(SUM(x) AS HUGEINT) AS sx,
        |           CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |           CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |    FROM apt
        |), and_ AS (
        |    SELECT m2, m2 * sxy - sx * sx AS num, m2 * sxx - sx * sx AS den
        |    FROM asm
        |)
        |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
        |       CAST(CASE WHEN den = 0 THEN 0
        |                 WHEN num < 0 THEN -((-num * 1000000) // den)
        |                 ELSE (num * 1000000) // den END AS BIGINT)
        |           AS assort_ppm
        |FROM and_""".stripMargin),
    // directed-edge reciprocity: semi-join against the reversed set
    "q_reciprocity" -> (domainGraphCtes +
      """, rde AS MATERIALIZED (
        |    SELECT src, dst FROM edges WHERE src <> dst
        |), rcp AS (
        |    SELECT CAST(COUNT(*) AS BIGINT) AS n_reciprocated
        |    FROM rde e WHERE EXISTS (
        |        SELECT 1 FROM rde r WHERE r.src = e.dst AND r.dst = e.src)
        |)
        |SELECT CAST((SELECT COUNT(*) FROM rde) AS BIGINT) AS n_edges,
        |       (SELECT n_reciprocated FROM rcp) AS n_reciprocated,
        |       CAST(CASE WHEN (SELECT COUNT(*) FROM rde) = 0 THEN 0
        |            ELSE (SELECT n_reciprocated FROM rcp) * 1000000
        |                 // (SELECT COUNT(*) FROM rde) END AS BIGINT)
        |           AS recip_ppm""".stripMargin),
    // stress centrality: the geodesic-count walk unrolled, then the
    // Shimbel through-path rollup — exact integer path counts end to end
    "q_stress_centrality" -> allPairsGeodesicsOracle(6),
    "q_domain_hops" -> bfsHopsOracle(6),
    "q_communities_lpa" -> lpaOracle(graft.ops.LinkOps.LpaIters),
    // LPA rounds + the Newman-Girvan tallies (division-free numerator
    // and shared 4m² denominator — see GraphOps.modularityOver)
    "q_modularity" -> modularityOracle(graft.ops.LinkOps.LpaIters),
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
    // bounded-round k-core peel hash-checked against unrolled stages
    "q_kcore_domains" -> kcoreOracle(graft.ops.LinkOps.KCoreK,
      graft.ops.LinkOps.KCoreRounds),
    // weighted crawl distance: unrolled min-plus relaxations over
    // link-count edge costs
    "q_weighted_paths" -> weightedPathsOracle(
      graft.ops.LinkOps.WPathIters),
    // personalized PageRank: seed-conditional teleport, unrolled rounds
    "q_pagerank_seeded" -> pprOracle(10),
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
  )
}
