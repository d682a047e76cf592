package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Relational family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object RelationalOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
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
    "q_scalar_datetime_math" ->
      """SELECT o_orderkey,
        |       CAST(date_trunc('day', o_orderdate) AS DATE) AS order_day,
        |       CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |       CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |       CAST(o_orderdate AS DATE) + 30 AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_groupby_salted" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
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
    // bucketing is a physical layout choice — the joined result is the
    // plain equi-join, which the oracle computes directly
    "q_join_bucketed" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
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
    // exact Spearman: midrank2 ranks off value histograms, sqrt-free
    // sign + rho^2 through HUGEINT; the ppm quotient is STAGED through
    // abs(num) exactly like the engine (each stage nonnegative, so // and
    // div agree; the unstaged num^2 passed 38 digits at the 25x probe)
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
        |            ELSE (((abs(num) * 1000000) // denx) * abs(num)) // deny
        |            END AS BIGINT) AS rho2_ppm
        |FROM smv""".stripMargin,
    // trimmed + winsorized means: per-region rank with the orderkey
    // tie-break, boundary values by conditional window max, exact
    // integer means — the engine's windows replayed verbatim
    "q_trimmed_stats" ->
      s"""WITH trows AS (
        |    SELECT o.o_orderkey, r.r_name,
        |           CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
        |    FROM orders o
        |    JOIN customer c ON c.c_custkey = o.o_custkey
        |    JOIN nation n ON n.n_nationkey = c.c_nationkey
        |    JOIN region r ON r.r_regionkey = n.n_regionkey
        |), trk AS (
        |    SELECT r_name, cents,
        |           row_number() OVER (PARTITION BY r_name
        |               ORDER BY cents, o_orderkey) AS rnk,
        |           CAST(COUNT(*) OVER (PARTITION BY r_name) AS BIGINT)
        |               AS nr
        |    FROM trows
        |), tbn AS (
        |    SELECT r_name, cents, rnk,
        |           nr // ${Relational.TrimDen} AS lo,
        |           nr - nr // ${Relational.TrimDen} AS hi,
        |           MAX(CASE WHEN rnk = nr // ${Relational.TrimDen} + 1
        |               THEN cents END) OVER (PARTITION BY r_name)
        |               AS lo_val,
        |           MAX(CASE WHEN rnk = nr - nr // ${Relational.TrimDen}
        |               THEN cents END) OVER (PARTITION BY r_name)
        |               AS hi_val
        |    FROM trk
        |)
        |SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MAX(lo) AS BIGINT) AS n_trim_side,
        |       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS mean_cents,
        |       CAST(CASE WHEN SUM(CASE WHEN rnk > lo AND rnk <= hi
        |                 THEN 1 ELSE 0 END) = 0 THEN 0
        |            ELSE SUM(CASE WHEN rnk > lo AND rnk <= hi
        |                 THEN cents ELSE 0 END)
        |              // SUM(CASE WHEN rnk > lo AND rnk <= hi
        |                 THEN 1 ELSE 0 END) END AS BIGINT)
        |           AS trimmed_mean_cents,
        |       CAST(SUM(CASE WHEN rnk <= lo THEN lo_val
        |                WHEN rnk > hi THEN hi_val
        |                ELSE cents END) // COUNT(*) AS BIGINT)
        |           AS winsor_mean_cents
        |FROM tbn GROUP BY r_name ORDER BY r_name""".stripMargin,
    // Kendall tau-b: pair counting over the joint (size, price) value
    // histogram — concordant/discordant from the cell-pair self-join on
    // x1 < x2, tie terms from the marginals; (nc-nd)^2 is nonnegative and
    // both tie-corrected denominators positive, so HUGEINT `//` matches
    // Spark's DECIMAL(38) `div` exactly
    "q_kendall_tau" ->
      """WITH ktc AS (
        |    SELECT CAST(p_size AS BIGINT) AS x,
        |           CAST(round(p_retailprice * 100) AS BIGINT) AS y,
        |           CAST(COUNT(*) AS BIGINT) AS c
        |    FROM part GROUP BY 1, 2
        |), ktp AS (
        |    SELECT CAST(SUM(CASE WHEN a.y < b.y THEN a.c * b.c
        |                    ELSE 0 END) AS BIGINT) AS nc,
        |           CAST(SUM(CASE WHEN a.y > b.y THEN a.c * b.c
        |                    ELSE 0 END) AS BIGINT) AS nd
        |    FROM ktc a JOIN ktc b ON a.x < b.x
        |), ktm AS (
        |    SELECT CAST(SUM(c) AS BIGINT) AS n FROM ktc
        |), kt1 AS (
        |    SELECT CAST(SUM(cx * (cx - 1) // 2) AS BIGINT) AS n1
        |    FROM (SELECT CAST(SUM(c) AS BIGINT) AS cx FROM ktc GROUP BY x)
        |), kt2 AS (
        |    SELECT CAST(SUM(cy * (cy - 1) // 2) AS BIGINT) AS n2
        |    FROM (SELECT CAST(SUM(c) AS BIGINT) AS cy FROM ktc GROUP BY y)
        |)
        |SELECT n, nc, nd,
        |       CAST(CASE WHEN nc < nd THEN -1 WHEN nc > nd THEN 1
        |            ELSE 0 END AS INTEGER) AS tau_sign,
        |       CAST(CASE WHEN (n * (n - 1) // 2 - n1) = 0
        |                  OR (n * (n - 1) // 2 - n2) = 0 THEN 0
        |            ELSE (CAST(nc - nd AS HUGEINT) * (nc - nd) * 1000000)
        |              // (CAST(n * (n - 1) // 2 - n1 AS HUGEINT)
        |                 * (n * (n - 1) // 2 - n2))
        |            END AS BIGINT) AS tau2_ppm
        |FROM ktp CROSS JOIN ktm CROSS JOIN kt1 CROSS JOIN kt2""".stripMargin,
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
    // Gini via the value-histogram rank-weighted identity: per distinct
    // spend value x (c customers, F strictly below), rank sum
    // Σ(2i−n−1)x = Σ x·c·(2F+c) − n·S — exact HUGEINT, one floor at
    // the end (HUGEINT // == Spark DECIMAL(38) div; numerator ≥ 0)
    "q_gini_spend" ->
      """WITH gsp AS (
        |    SELECT o_custkey,
        |           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |                AS BIGINT) AS x
        |    FROM orders GROUP BY 1
        |), gjr AS (
        |    SELECT r.r_name, s.x
        |    FROM gsp s
        |    JOIN customer c ON c.c_custkey = s.o_custkey
        |    JOIN nation n ON n.n_nationkey = c.c_nationkey
        |    JOIN region r ON r.r_regionkey = n.n_regionkey
        |), gh AS (
        |    SELECT r_name, x, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM gjr GROUP BY 1, 2
        |), gf AS (
        |    SELECT r_name, x, c,
        |           COALESCE(SUM(c) OVER (PARTITION BY r_name ORDER BY x
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) AS f
        |    FROM gh
        |), gt AS (
        |    SELECT r_name, CAST(SUM(c) AS BIGINT) AS n_customers,
        |           CAST(SUM(CAST(x AS HUGEINT) * c) AS HUGEINT) AS s,
        |           CAST(SUM(CAST(x AS HUGEINT) * c * (2 * f + c))
        |                AS HUGEINT) AS a
        |    FROM gf GROUP BY 1
        |)
        |SELECT r_name, n_customers, CAST(s AS BIGINT) AS total_cents,
        |       CAST((a - n_customers * s) * 1000000 // (n_customers * s)
        |            AS BIGINT) AS gini_ppm
        |FROM gt ORDER BY r_name""".stripMargin,
    // candidate-FD profile: per FD one (det)-level distinct-dep count,
    // then the violation rollup — exact ppm, truncating //
    "q_fd_profile" -> {
      def one(name: String, tbl: String, det: String, dep: String) =
        s"""SELECT '$name' AS fd,
           |       CAST(COUNT(*) AS BIGINT) AS n_groups,
           |       CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_violating,
           |       CAST(SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END)
           |            * 1000000 // COUNT(*) AS BIGINT) AS viol_ppm,
           |       CAST(MAX(card) AS BIGINT) AS max_card
           |FROM (SELECT $det AS k, COUNT(DISTINCT $dep) AS card
           |      FROM $tbl GROUP BY 1)""".stripMargin
      Seq(
        one("customer.nation->segment", "customer",
          "c_nationkey", "c_mktsegment"),
        one("documents.source->lang", "documents", "source", "lang"),
        one("events.user->type", "events", "user_id", "event_type"),
        one("lineitem.part->supp", "lineitem", "l_partkey", "l_suppkey"),
        one("orders.cust->priority", "orders",
          "o_custkey", "o_orderpriority"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
    },
    // brand co-purchase affinity graph (pair support >= 1.25x mean,
    // exact 4*c*np >= 5*sc) + the shared LPA rounds
    "q_brand_communities" -> (brandGraphCtes +
        lpaRounds(ops.BasketOps.BrandLpaIters) +
        s"""
           |SELECT l.id AS brand, l.label AS community,
           |       CAST(z.community_size AS BIGINT) AS community_size
           |FROM lp${ops.BasketOps.BrandLpaIters} l JOIN (
           |    SELECT label, COUNT(*) AS community_size
           |    FROM lp${ops.BasketOps.BrandLpaIters} GROUP BY 1) z
           |  ON z.label = l.label
           |ORDER BY brand""".stripMargin),
    // the Newman-Girvan tallies of the brand partition (the
    // q_modularity tail on the co-purchase graph)
    "q_brand_modularity" -> (brandGraphCtes +
      lpaRounds(ops.BasketOps.BrandLpaIters) +
      s""", mue AS MATERIALIZED (
         |    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         |    FROM bed WHERE src <> dst
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
         |    JOIN lp${ops.BasketOps.BrandLpaIters} la ON la.id = e.a
         |    JOIN lp${ops.BasketOps.BrandLpaIters} lb ON lb.id = e.b
         |    WHERE la.label = lb.label GROUP BY 1
         |), mds AS (
         |    SELECT l.label AS community, CAST(COUNT(*) AS BIGINT)
         |               AS n_nodes,
         |           CAST(SUM(COALESCE(g.deg, 0)) AS BIGINT) AS d_sum
         |    FROM lp${ops.BasketOps.BrandLpaIters} l
         |    LEFT JOIN mdg g ON g.v = l.id GROUP BY 1
         |)
         |SELECT d.community, d.n_nodes,
         |       CAST(COALESCE(i.e_intra, 0) AS BIGINT) AS e_intra, d.d_sum,
         |       CAST(4 * (SELECT m FROM mmm) * COALESCE(i.e_intra, 0)
         |            - CAST(d.d_sum AS HUGEINT) * d.d_sum AS BIGINT)
         |           AS contrib_num,
         |       CAST(4 * (SELECT m FROM mmm) * (SELECT m FROM mmm)
         |            AS BIGINT) AS four_m2
         |FROM mds d LEFT JOIN mint i USING (community)
         |ORDER BY community""".stripMargin),
  )

  /** The co-purchase affinity graph CTEs (bbk/bpe/btt/bed + lsy/lp0) —
    * shared by the community listing and its modularity score.
    */
  private def brandGraphCtes: String =
    s"""WITH bbk AS MATERIALIZED (
       |    SELECT DISTINCT l.l_orderkey, p.p_brand
       |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       |), bpe AS MATERIALIZED (
       |    SELECT a.p_brand AS src, b.p_brand AS dst,
       |           CAST(COUNT(*) AS BIGINT) AS c
       |    FROM bbk a JOIN bbk b ON a.l_orderkey = b.l_orderkey
       |      AND a.p_brand < b.p_brand
       |    GROUP BY 1, 2
       |), btt AS (
       |    SELECT CAST(COUNT(*) AS HUGEINT) AS np,
       |           CAST(SUM(c) AS HUGEINT) AS sc
       |    FROM bpe
       |), bed AS MATERIALIZED (
       |    SELECT src, dst FROM bpe, btt WHERE 4 * c * np >= 5 * sc
       |), lsy AS MATERIALIZED (
       |    SELECT DISTINCT src, dst FROM (
       |        SELECT src, dst FROM bed
       |        UNION ALL
       |        SELECT dst AS src, src AS dst FROM bed
       |    )
       |), lp0 AS MATERIALIZED (
       |    SELECT DISTINCT p_brand AS id, p_brand AS label FROM bbk
       |)""".stripMargin
}
