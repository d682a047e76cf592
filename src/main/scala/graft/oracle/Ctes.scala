package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._

/** Shared DuckDB-SQL helper fragments for the oracle map — CTE bodies,
  * unrolled fixed-point walks, and fixed-point scales (pure move from
  * SparkEntry.scala).
  */
object Ctes {
  private val _ = OracleInputs

  /** DuckDB rendering of the Luhn digit fold over expression `x` — the
    * q_pii_luhn oracle needs it twice (check-digit crafting + candidate
    * validation), single-sourced so the copies can't drift.
    */
  def duckLuhn(x: String): String = {
    def d = s"(ascii(substr($x, length($x) + 1 - i, 1)) - 48)"
    s"list_sum(list_transform(range(1, length($x) + 1), i -> " +
      s"CASE WHEN i % 2 = 0 THEN CASE WHEN $d * 2 > 9 THEN $d * 2 - 9 " +
      s"ELSE $d * 2 END ELSE $d END))"
  }

  /** The one-pass profiler's oracle shape for any source projection: one
    * UNION ALL block per profiled column, numeric columns (`true`) CAST
    * their bounds to VARCHAR to match the engine's uniform stringified
    * schema.
    */
  def profileOracle(srcSql: String,
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
  def bpeAppliedCte: String = bpeAppliedCteFrom("bpe_merges")

  def bpeAppliedCteFrom(ckpt: String): String = {
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

  def bpeTokenizeOracle: String =
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
  def packSequencesBpeOracle: String =
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
  val cdcCtes: String =
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
  /** The K-class NB retrain/score chain over an arbitrary class label
    * column (`source` for the domain classifier, `lang` for stored-model
    * language ID) — the chain aliases the label to `source` so every
    * downstream CTE is label-agnostic.
    */
  def dcCtesOver(label: String): String =
    s"""WITH tokd AS (
      |    SELECT doc_id, $label AS source,
      |           unnest(string_split_regex(trim(text), '\\s+')) AS w
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

  val dcCtes: String = dcCtesOver("source")

  /** Shared CTE chain of the BM25 oracles — re-derives postings, doclen,
    * df and totals declaratively and replays the staged fixed-point
    * scoring (RetrievalOps constants) over `probeFilter`-selected queries
    * against `candFilter`-restricted candidates, ending at the ranked
    * top-k CTE `rk`.
    */
  def bm25Ctes(probeFilter: String, candFilter: String,
               fullDocTerms: Boolean = false): String = {
    // two query-term selectors share the scoring pipeline: first-4-by-
    // position (the serving gates) vs the full distinct-token profile
    // (the MRR eval — RetrievalOps.allTermsFor replayed)
    val qtCte = if (fullDocTerms)
      raw"""qt AS (
        |    SELECT DISTINCT doc_id AS query_id, w
        |    FROM tok WHERE $probeFilter
        |)""".stripMargin
    else
      raw"""qt AS (
        |    SELECT query_id, w FROM (
        |        SELECT query_id, w,
        |               row_number() OVER (PARTITION BY query_id
        |                   ORDER BY fp ASC, w ASC) AS rn
        |        FROM (SELECT doc_id AS query_id, w, MIN(pos) AS fp
        |              FROM tok WHERE $probeFilter GROUP BY 1, 2))
        |    WHERE rn <= 4
        |)""".stripMargin
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
        |), $qtCte, sc AS (
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
  }

  val qcKeptCte: String =
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

  def qualityClassifierOracle: String =
    s"""WITH $qcKeptCte
      |SELECT q.doc_id, q.n_tokens, CAST(q.q_score AS BIGINT) AS q_score,
      |       CAST(CASE WHEN q.doc_id IN (SELECT doc_id FROM qckept)
      |            THEN 1 ELSE 0 END AS INTEGER) AS keep
      |FROM qsc2 q ORDER BY doc_id""".stripMargin

  /** Recursive-CTE closure over a materialized pair set → (id, cluster-min
    * canon, survives) — the shared oracle shape of both survivor queries.
    */
  def survivorOracle(pairsName: String, table: String,
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
  def craftedLinesCte: String =
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
  def linkCtes: String =
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
  def pagerankOracle(iters: Int): String =
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
  def mortonSqlDuck(x: String, y: String): String =
    (0 until graft.ops.LayoutOps.Bits).map { b =>
      s"(((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1}))"
    }.mkString(" + ")

  /** Link CTEs + the domain graph (distinct external edges + the vertex
    * union) — shared by both iterative-walk oracles.
    */
  def domainGraphCtes: String =
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
  def hitsOracle(iters: Int): String = {
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
  /** The LPA round CTEs (symmetrized simple graph + `iters` unrolled
    * synchronous rounds ending at `lp<iters>`) — shared by the community
    * listing ([[lpaOracle]]) and its modularity score
    * ([[modularityOracle]]).
    */
  /** The synchronous LPA round steps (lpn/lpp/lp 1..iters) — graph-
    * agnostic: any caller that defines `lsy` (symmetrized simple edges)
    * and `lp0` (initial id = label) can append these, whatever the
    * underlying graph (domain links, brand co-purchase, ...).
    */
  def lpaRounds(iters: Int): String =
    (1 to iters).map { i =>
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

  private def lpaCtes(iters: Int): String = {
    val steps = lpaRounds(iters)
    domainGraphCtes +
      """, lsy AS MATERIALIZED (
        |    SELECT DISTINCT src, dst FROM (
        |        SELECT src, dst FROM edges WHERE src <> dst
        |        UNION ALL
        |        SELECT dst AS src, src AS dst FROM edges WHERE src <> dst
        |    )
        |), lp0 AS MATERIALIZED (
        |    SELECT v AS id, v AS label FROM verts
        |)""".stripMargin + steps
  }

  def lpaOracle(iters: Int): String =
    lpaCtes(iters) +
      s"""
         |SELECT l.id AS domain, l.label AS community,
         |       CAST(z.community_size AS BIGINT) AS community_size
         |FROM lp$iters l JOIN (
         |    SELECT label, COUNT(*) AS community_size
         |    FROM lp$iters GROUP BY 1) z ON z.label = l.label
         |ORDER BY domain""".stripMargin

  /** Modularity oracle: the LPA rounds, then the Newman-Girvan tallies
    * over the UNDIRECTED simple graph — per community intra-edge count,
    * degree sum and the division-free numerator 4·m·e_c − d_c² next to
    * the shared denominator 4m² (GraphOps.modularityOver's contract:
    * the division is the consumer's, because floor semantics differ on
    * negative numerators between the engines).
    */
  def modularityOracle(iters: Int): String =
    lpaCtes(iters) +
      s""", mue AS MATERIALIZED (
         |    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |    FROM edges WHERE src <> dst
         |), mmm AS (
         |    SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM mue
         |), mdg AS (
         |    SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |        SELECT a AS v FROM mue UNION ALL SELECT b AS v FROM mue
         |    ) GROUP BY 1
         |), mint AS (
         |    SELECT la.label AS community, CAST(COUNT(*) AS BIGINT)
         |               AS e_intra
         |    FROM mue e
         |    JOIN lp$iters la ON la.id = e.a
         |    JOIN lp$iters lb ON lb.id = e.b
         |    WHERE la.label = lb.label GROUP BY 1
         |), mds AS (
         |    SELECT l.label AS community, CAST(COUNT(*) AS BIGINT)
         |               AS n_nodes,
         |           CAST(SUM(COALESCE(g.deg, 0)) AS BIGINT) AS d_sum
         |    FROM lp$iters l LEFT JOIN mdg g ON g.v = l.id GROUP BY 1
         |)
         |SELECT d.community, d.n_nodes,
         |       CAST(COALESCE(i.e_intra, 0) AS BIGINT) AS e_intra, d.d_sum,
         |       CAST(4 * (SELECT m FROM mmm) * COALESCE(i.e_intra, 0)
         |            - CAST(d.d_sum AS HUGEINT) * d.d_sum AS BIGINT)
         |           AS contrib_num,
         |       CAST(4 * (SELECT m FROM mmm) * (SELECT m FROM mmm)
         |            AS BIGINT) AS four_m2
         |FROM mds d LEFT JOIN mint i USING (community)
         |ORDER BY community""".stripMargin

  /** k-core oracle: symmetrized simple graph, `rounds` unrolled peel
    * stages (degree → condemned set → surviving edges), then removal
    * records + rounds-survivors with their final in-subgraph degree.
    */
  def kcoreOracle(k: Int, rounds: Int): String = {
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
  def bfsHopsOracle(iters: Int): String = {
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

  /** All-pairs bounded-BFS oracle (q_harmonic_centrality): the bfsHops
    * walk keyed by its source vertex — `iters` unrolled rounds over the
    * (s, v, dist) frame, then the harmonic rollup
    * Σ (10⁶ // dist) per target with a verts left join so isolated
    * domains emit 0 (GraphOps.allPairsHops replayed declaratively).
    */
  /** The bounded-round APSP CTEs (ap0..ap<iters>) — shared by the
    * harmonic ([[allPairsHopsOracle]]) and eccentricity
    * ([[eccentricityOracle]]) rollups.
    */
  private def apHopsCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", ap$i AS MATERIALIZED (
         |    SELECT s, v, CAST(MIN(dist) AS BIGINT) AS dist FROM (
         |        SELECT s, v, dist FROM ap${i - 1}
         |        UNION ALL
         |        SELECT h.s, e.dst AS v, h.dist + 1 AS dist
         |        FROM ap${i - 1} h JOIN edges e ON e.src = h.v
         |    ) GROUP BY 1, 2
         |)""".stripMargin
    }.mkString
    domainGraphCtes +
      """, ap0 AS MATERIALIZED (
        |    SELECT v AS s, v, CAST(0 AS BIGINT) AS dist FROM verts
        |)""".stripMargin + steps
  }

  /** Eccentricity oracle: the APSP rounds, then the per-SOURCE rollup
    * (reached count, distance sum, max geodesic) with isolated domains
    * left-joined to 0 — GraphOps.allPairsHops replayed, out-direction.
    */
  def eccentricityOracle(iters: Int): String =
    apHopsCtes(iters) +
      s"""
         |, ec AS (
         |    SELECT s, CAST(COUNT(*) AS BIGINT) AS n_reached,
         |           CAST(SUM(dist) AS BIGINT) AS dist_sum,
         |           CAST(MAX(dist) AS BIGINT) AS ecc
         |    FROM ap$iters WHERE s <> v GROUP BY 1
         |)
         |SELECT t.v AS domain,
         |       CAST(COALESCE(e.n_reached, 0) AS BIGINT) AS n_reached,
         |       CAST(COALESCE(e.dist_sum, 0) AS BIGINT) AS dist_sum,
         |       CAST(COALESCE(e.ecc, 0) AS BIGINT) AS ecc
         |FROM verts t LEFT JOIN ec e ON e.s = t.v
         |ORDER BY domain""".stripMargin

  def allPairsHopsOracle(iters: Int): String = {
    apHopsCtes(iters) +
      s"""
         |, hc AS (
         |    SELECT v, CAST(COUNT(*) AS BIGINT) AS n_reachers,
         |           CAST(SUM(1000000 // dist) AS BIGINT) AS harmonic_fp
         |    FROM ap$iters WHERE s <> v GROUP BY 1
         |)
         |SELECT t.v AS domain,
         |       CAST(COALESCE(h.n_reachers, 0) AS BIGINT) AS n_reachers,
         |       CAST(COALESCE(h.harmonic_fp, 0) AS BIGINT) AS harmonic_fp
         |FROM verts t LEFT JOIN hc h ON h.v = t.v
         |ORDER BY harmonic_fp DESC, domain""".stripMargin
  }

  /** Geodesic-count oracle (q_stress_centrality): the walk-count matrix
    * W_i = W_{i-1}·A unrolled `iters` rounds, (dist, sigma) frozen at
    * each pair's first-discovery round (GraphOps.allPairsGeodesics
    * replayed declaratively — σ(s,v) = W_{d(s,v)}(s,v)), then the
    * Shimbel stress rollup: σ(s,v)·σ(v,t) summed over triples with
    * d(s,v)+d(v,t) = d(s,t), verts left-joined so isolated domains
    * emit 0.
    */
  def allPairsGeodesicsOracle(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""", gw$i AS MATERIALIZED (
         |    SELECT s, e.dst AS v, CAST(SUM(w) AS BIGINT) AS w
         |    FROM gw${i - 1} g JOIN edges e ON e.src = g.v GROUP BY 1, 2
         |)""".stripMargin
    }.mkString
    val union = (0 to iters)
      .map(i => s"SELECT s, v, CAST($i AS BIGINT) AS i, w FROM gw$i")
      .mkString("\n        UNION ALL\n        ")
    domainGraphCtes +
      """, gw0 AS MATERIALIZED (
        |    SELECT v AS s, v, CAST(1 AS BIGINT) AS w FROM verts
        |)""".stripMargin + steps +
      s"""
         |, gst AS MATERIALIZED (
         |    SELECT * FROM (
         |        $union)
         |), geo AS MATERIALIZED (
         |    SELECT g.s, g.v, g.i AS dist, g.w AS sigma
         |    FROM gst g
         |    JOIN (SELECT s, v, MIN(i) AS mi FROM gst GROUP BY 1, 2) m
         |      ON m.s = g.s AND m.v = g.v AND m.mi = g.i
         |), thr AS (
         |    SELECT g1.v, CAST(COUNT(*) AS BIGINT) AS n_routes,
         |           CAST(SUM(g1.sigma * g2.sigma) AS BIGINT) AS stress
         |    FROM geo g1
         |    JOIN geo g2 ON g2.s = g1.v AND g2.dist > 0
         |    JOIN geo g3 ON g3.s = g1.s AND g3.v = g2.v
         |      AND g3.dist = g1.dist + g2.dist
         |    WHERE g1.dist > 0
         |    GROUP BY 1
         |)
         |SELECT t.v AS domain,
         |       CAST(COALESCE(h.n_routes, 0) AS BIGINT) AS n_routes,
         |       CAST(COALESCE(h.stress, 0) AS BIGINT) AS stress
         |FROM verts t LEFT JOIN thr h ON h.v = t.v
         |ORDER BY stress DESC, domain""".stripMargin
  }

  /** Weighted-paths oracle: per-pair link-count costs, `iters` unrolled
    * min-plus relaxations — min is order-independent, so the replay
    * lands on GraphOps.weightedHops' exact Longs.
    */
  def weightedPathsOracle(iters: Int): String = {
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
  def pprOracle(iters: Int): String = {
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
  def pagerankCtes(iters: Int): String = {
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
  val OracleEmbeddingDims = 64

  /** The engine's deterministic hyperplane weights as a VALUES list —
    * fixed splitmix64-derived constants (engine constants interpolated
    * into the oracle like the thresholds, NOT engine outputs), inlined so
    * DuckDB replays the exact fixed-point dot products. Double.toString
    * is shortest-round-trip, so DuckDB parses each literal to the
    * bit-identical double.
    */
  def hyperplaneWeightValues(nPlanes: Int, dims: Int): String =
    (0 until nPlanes).flatMap(p => (0 until dims).map(i =>
      s"($p,$i,${graft.functions.HyperplaneSketch.planeWeight(p, i)})"))
      .mkString(",")

  val VecNormCte: String =
    """nrm AS (
      |    SELECT vec_id, embedding,
      |           sqrt(list_reduce(
      |             list_prepend(CAST(0.0 AS DOUBLE),
      |               list_transform(embedding,
      |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |             (a, b) -> a + b)) AS l2
      |    FROM embeddings
      |)""".stripMargin

  val DotAB: String =
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
  def perplexityFilterOracle: String =
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

  def topkCosineOracle(gateName: String): String = {
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
  def corpusPipelineOracle(bandsGate: String): String = {
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

  def pairCosineOracle(pairsName: String, threshold: Double): String = {
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


  /** Fresh sort-based skyline replay (shared by both skyline gates). */
  def skylineOracleSql: String =
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
  def reservoirOracleSql: String =
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
  def madOracleSql: String =
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


  /** TF-IDF vectors + unrolled power-iteration rounds (HUGEINT, floor
    * division — identical to the engine's nonnegative truncation).
    */
  def spectralCtes: String = {
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
  def winnowSelCte: String = {
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
  def scd2HistorySql: String =
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
