package graft.oracle

import graft.OracleInputs
import graft.ops
import graft.ops._
import Ctes._

/** DuckDB oracle SQL — Event family (pure move from SparkEntry.scala;
  * see SURVEY.md §2.5 for the declared query inventory).
  */
object EventOracles {
  // silence the unused-import warning for fragments that need no helper
  private val _ = (OracleInputs, Ctes)

  val sql: Map[String, String] = Map(
    // clicks pre-reduced to one row per (user, microsecond) = MAX
    // event_id: DuckDB's ASOF picks an ARBITRARY row among equal-tsu
    // matches, while the engine's window order (is_click desc, click_id
    // asc under a running last) deterministically takes the largest
    // click_id of the winning microsecond — the 25x replicated corpus
    // (copies share user_id and ts) made the tie real and the oracle
    // nondeterministic; the reduction is an identity on tie-free corpora
    "q_asof_last_click" ->
      """WITH p AS (
        |    SELECT user_id, epoch_ns(ts) // 1000 AS tsu, event_id
        |    FROM events WHERE event_type = 'purchase'
        |), c AS (
        |    SELECT user_id, epoch_ns(ts) // 1000 AS tsu,
        |           MAX(event_id) AS event_id
        |    FROM events WHERE event_type = 'click' GROUP BY 1, 2
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
        |    -- RANGE, not ROWS (r15): under duplicate (user_id, tsu) the
        |    -- ROWS frame is tie-order-dependent — tie rows framed before
        |    -- the brk=1 row land in the PREVIOUS session, so the oracle
        |    -- was nondeterministic exactly where the engine's
        |    -- session_window is not (equal-ts events share one session by
        |    -- construction). RANGE includes all ORDER BY peers in the
        |    -- frame, assigning tie groups atomically; identical to ROWS on
        |    -- tie-free data (all driver SFs measured tie-free), surfaced
        |    -- by the 25x replica where every ts is duplicated 25x.
        |    SELECT user_id, tsu,
        |           SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
        |                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |    FROM m
        |)
        |SELECT user_id, MIN(tsu) AS session_start_us, COUNT(*) AS cnt
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
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
    // SCD Type 2: run-collapse of the per-user status stream into
    // versioned half-open validity intervals. The SAME replay gates the
    // batch collapse AND the incremental stored maintenance — a green
    // q_scd2_incremental proves the appended state is bit-equal to a
    // from-scratch collapse.
    "q_scd2_history" -> scd2HistorySql,
    "q_scd2_incremental" -> scd2HistorySql,
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
    // Theil-Sen: all pairwise month-grid slopes, sign-split exact
    // truncation, lower median under the (slope, x1, x2) total order
    "q_theil_sen" ->
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
        |), tsp AS (
        |    SELECT a.r_name, a.mx AS x1, b.mx AS x2, a.y AS y1, b.y AS y2
        |    FROM olm a JOIN olm b
        |      ON b.r_name = a.r_name AND a.mx < b.mx
        |), tss AS (
        |    SELECT r_name, x1, x2,
        |           CAST(CASE WHEN y2 >= y1 THEN
        |                  (CAST(y2 - y1 AS HUGEINT)
        |                   * ${graft.ops.TimeSeriesOps.OlsScale}) // (x2 - x1)
        |                ELSE -((CAST(y1 - y2 AS HUGEINT)
        |                   * ${graft.ops.TimeSeriesOps.OlsScale}) // (x2 - x1))
        |                END AS BIGINT) AS slope_micro
        |    FROM tsp
        |), tsr AS (
        |    SELECT r_name, slope_micro,
        |           row_number() OVER (PARTITION BY r_name
        |               ORDER BY slope_micro, x1, x2) AS rn,
        |           CAST(COUNT(*) OVER (PARTITION BY r_name) AS BIGINT) AS np
        |    FROM tss
        |)
        |SELECT r_name, np AS n_pairs, slope_micro AS theil_slope_micro
        |FROM tsr WHERE rn = (np + 1) // 2 ORDER BY r_name""".stripMargin,
    // two-sample KS: cross-multiplied ECDF-difference numerator off the
    // pooled value histogram; the Smirnov criterion via the same
    // cross-multiplied integer comparison
    "q_ks_test" ->
      s"""WITH ksv AS (
        |    SELECT CAST(user_id % 2 AS INTEGER) AS arm,
        |           CAST(round(value * 100) AS BIGINT) AS cents
        |    FROM events WHERE event_type = 'purchase'
        |), ksh AS (
        |    SELECT cents,
        |           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS c0,
        |           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS c1
        |    FROM ksv GROUP BY 1
        |), kst AS (
        |    SELECT CAST(SUM(c0) AS BIGINT) AS n1,
        |           CAST(SUM(c1) AS BIGINT) AS n2
        |    FROM ksh
        |), ksc AS (
        |    SELECT SUM(c0) OVER (ORDER BY cents
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS f0,
        |           SUM(c1) OVER (ORDER BY cents
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS f1
        |    FROM ksh
        |), ksd AS (
        |    SELECT CAST(COALESCE(MAX(abs(f0 * t.n2 - f1 * t.n1)), 0)
        |               AS BIGINT) AS d_num
        |    FROM ksc, kst t
        |)
        |SELECT t.n1, t.n2, d.d_num,
        |       CAST(CASE WHEN t.n1 = 0 OR t.n2 = 0 THEN 0
        |            ELSE d.d_num * 1000000 // (t.n1 * t.n2) END AS BIGINT)
        |           AS d_ppm,
        |       CAST(CASE WHEN t.n1 = 0 OR t.n2 = 0 THEN 0
        |            WHEN CAST(d.d_num AS HUGEINT) * d.d_num * 1000
        |                 >= ${EventOps.KsCritSqThousandths}
        |                    * CAST(t.n1 + t.n2 AS HUGEINT) * t.n1 * t.n2
        |            THEN 1 ELSE 0 END AS INTEGER) AS significant
        |FROM ksd d, kst t""".stripMargin,
    // Mann-Whitney U: doubled midranks off the value histogram, exact
    // z² in milli through HUGEINT, the chi-square critical constant
    // shared via the same cross-multiplied comparison
    "q_mann_whitney" ->
      s"""WITH mwv AS (
        |    SELECT CAST(user_id % 2 AS INTEGER) AS arm,
        |           CAST(round(value * 100) AS BIGINT) AS cents
        |    FROM events WHERE event_type = 'purchase'
        |), mwh AS (
        |    SELECT cents, CAST(COUNT(*) AS BIGINT) AS nat,
        |           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
        |               AS BIGINT) AS n0v
        |    FROM mwv GROUP BY 1
        |), mwr AS (
        |    SELECT cents, nat, n0v,
        |           2 * COALESCE(SUM(nat) OVER (ORDER BY cents
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |               0) + nat + 1 AS r2
        |    FROM mwh
        |), mwa AS (
        |    SELECT CAST(SUM(n0v * r2) AS BIGINT) AS r1d,
        |           CAST(SUM(n0v) AS BIGINT) AS n1,
        |           CAST(SUM(nat - n0v) AS BIGINT) AS n2,
        |           CAST(SUM(nat * nat * nat - nat) AS BIGINT) AS tcorr
        |    FROM mwr
        |)
        |SELECT n1, n2,
        |       CAST(r1d - n1 * (n1 + 1) AS BIGINT) AS u1_doubled,
        |       CAST(n1 * n2 AS BIGINT) AS mu_doubled, tcorr,
        |       CAST(CASE WHEN n1 = 0 OR n2 = 0 OR
        |                 (CAST(n1 + n2 + 1 AS HUGEINT) * (n1 + n2)
        |                  * (n1 + n2 - 1)) - tcorr = 0 THEN 0 ELSE
        |            (CAST(r1d - n1 * (n1 + 1) - n1 * n2 AS HUGEINT)
        |             * (r1d - n1 * (n1 + 1) - n1 * n2)
        |             * 3000 * (n1 + n2) * (n1 + n2 - 1))
        |            // (CAST(n1 AS HUGEINT) * n2 *
        |                ((CAST(n1 + n2 + 1 AS HUGEINT) * (n1 + n2)
        |                  * (n1 + n2 - 1)) - tcorr)) END AS BIGINT)
        |           AS z2_milli,
        |       CAST(CASE WHEN CASE WHEN n1 = 0 OR n2 = 0 OR
        |                 (CAST(n1 + n2 + 1 AS HUGEINT) * (n1 + n2)
        |                  * (n1 + n2 - 1)) - tcorr = 0 THEN 0 ELSE
        |            (CAST(r1d - n1 * (n1 + 1) - n1 * n2 AS HUGEINT)
        |             * (r1d - n1 * (n1 + 1) - n1 * n2)
        |             * 3000 * (n1 + n2) * (n1 + n2 - 1))
        |            // (CAST(n1 AS HUGEINT) * n2 *
        |                ((CAST(n1 + n2 + 1 AS HUGEINT) * (n1 + n2)
        |                  * (n1 + n2 - 1)) - tcorr)) END
        |            >= ${EventOps.Chi2CritThousandths} THEN 1 ELSE 0 END
        |            AS INTEGER) AS significant
        |FROM mwa""".stripMargin,
    // Cramér's V: the r×c contingency identity chi²/n = Σ O²/(ri·cj) − 1
    // with per-cell independent floors at 1e12 — order-free exact sum,
    // HUGEINT // == Spark DECIMAL(38) div
    "q_cramers_v" ->
      s"""WITH cvx AS (
        |    SELECT event_type,
        |           (epoch_ns(ts) // ${EventOps.DayNs}) % 7 AS wd,
        |           CAST(COUNT(*) AS BIGINT) AS o
        |    FROM events GROUP BY 1, 2
        |), cvr AS (
        |    SELECT event_type, CAST(SUM(o) AS BIGINT) AS ri
        |    FROM cvx GROUP BY 1
        |), cvcm AS (
        |    SELECT wd, CAST(SUM(o) AS BIGINT) AS cj FROM cvx GROUP BY 1
        |), cvn AS (
        |    SELECT CAST(SUM(o) AS BIGINT) AS n,
        |           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
        |           CAST(COUNT(DISTINCT wd) AS BIGINT) AS c
        |    FROM cvx
        |), cvs AS (
        |    SELECT CAST(SUM(CAST(x.o AS HUGEINT) * x.o
        |               * ${EventOps.CramerScale}
        |               // (CAST(a.ri AS HUGEINT) * b.cj)) AS HUGEINT)
        |               AS s_fp
        |    FROM cvx x
        |    JOIN cvr a ON a.event_type = x.event_type
        |    JOIN cvcm b ON b.wd = x.wd
        |)
        |SELECT n, r AS n_rows, c AS n_cols,
        |       CAST(GREATEST(s_fp - ${EventOps.CramerScale}, 0) AS BIGINT)
        |           AS phi2_fp,
        |       CAST(CASE WHEN LEAST(r, c) <= 1 THEN 0
        |            ELSE GREATEST(s_fp - ${EventOps.CramerScale}, 0)
        |              // ((LEAST(r, c) - 1) * 1000000) END AS BIGINT)
        |           AS v2_ppm
        |FROM cvs, cvn""".stripMargin,
    // rank autocorrelation: within-region month ranks (mx tie-break),
    // lag self-join on the bounded grid, exact Pearson sums over the
    // grid-bounded rank integers, HUGEINT // == Spark DECIMAL(38) div
    "q_acf_lags" ->
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
        |), arr AS (
        |    SELECT r_name, mx,
        |           CAST(row_number() OVER (PARTITION BY r_name
        |               ORDER BY y, mx) AS BIGINT) AS rk
        |    FROM olm
        |), apr AS (
        |    SELECT a.r_name, CAST(b.mx - a.mx AS BIGINT) AS lag,
        |           a.rk AS x, b.rk AS yr
        |    FROM arr a JOIN arr b ON b.r_name = a.r_name
        |      AND b.mx > a.mx
        |      AND b.mx <= a.mx + ${graft.ops.TimeSeriesOps.AcfMaxLag}
        |), asm AS (
        |    SELECT r_name, lag, CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(x) AS BIGINT) AS sx,
        |           CAST(SUM(yr) AS BIGINT) AS sy,
        |           CAST(SUM(x * x) AS BIGINT) AS sxx,
        |           CAST(SUM(yr * yr) AS BIGINT) AS syy,
        |           CAST(SUM(x * yr) AS BIGINT) AS sxy
        |    FROM apr GROUP BY 1, 2
        |)
        |SELECT r_name, lag, n,
        |       CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1
        |            WHEN n * sxy - sx * sy > 0 THEN 1 ELSE 0 END
        |            AS INTEGER) AS acf_sign,
        |       CAST(CASE WHEN n * sxx - sx * sx = 0
        |                  OR n * syy - sy * sy = 0 THEN 0
        |            ELSE (CAST(n * sxy - sx * sy AS HUGEINT)
        |                  * (n * sxy - sx * sy) * 1000000)
        |              // (CAST(n * sxx - sx * sx AS HUGEINT)
        |                  * (n * syy - sy * sy)) END AS BIGINT)
        |           AS acf2_ppm
        |FROM asm ORDER BY r_name, lag""".stripMargin,
    // RFM quintiles: global row_number per metric with the custkey
    // tie-break == the engine's histogram + value-partitioned rank
    "q_rfm_segments" ->
      s"""WITH rfo AS (
        |    SELECT o_custkey AS c_custkey,
        |           epoch_ns(o_orderdate) // ${EventOps.DayNs} AS day,
        |           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |    FROM orders
        |), rfa AS (SELECT MAX(day) AS max_day FROM rfo),
        |rfb AS (
        |    SELECT c_custkey,
        |           CAST((SELECT max_day FROM rfa) - MAX(day) AS BIGINT)
        |               AS recency_days,
        |           CAST(COUNT(*) AS BIGINT) AS frequency,
        |           CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |    FROM rfo GROUP BY 1
        |), rfn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rfb),
        |rfq AS (
        |    SELECT c_custkey, recency_days, frequency, monetary_cents,
        |           CAST(1 + (5 * (row_number() OVER (ORDER BY recency_days,
        |               c_custkey) - 1)) // (SELECT n FROM rfn) AS INTEGER)
        |             AS r_q,
        |           CAST(1 + (5 * (row_number() OVER (ORDER BY frequency,
        |               c_custkey) - 1)) // (SELECT n FROM rfn) AS INTEGER)
        |             AS f_q,
        |           CAST(1 + (5 * (row_number() OVER (ORDER BY monetary_cents,
        |               c_custkey) - 1)) // (SELECT n FROM rfn) AS INTEGER)
        |             AS m_q
        |    FROM rfb
        |)
        |SELECT c_custkey, recency_days, frequency, monetary_cents,
        |       r_q, f_q, m_q,
        |       CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS rfm
        |FROM rfq ORDER BY c_custkey""".stripMargin,
    // weekday seasonality: exact epoch-day arithmetic, within-type ppm
    "q_weekday_profile" ->
      s"""WITH wdc AS (
        |    SELECT event_type,
        |           (epoch_ns(ts) // ${EventOps.DayNs} + 3) % 7 AS weekday,
        |           CAST(COUNT(*) AS BIGINT) AS n,
        |           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |               AS value_cents
        |    FROM events GROUP BY 1, 2
        |), wdt AS (
        |    SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type
        |    FROM wdc GROUP BY 1
        |)
        |SELECT c.event_type, CAST(c.weekday AS BIGINT) AS weekday, c.n,
        |       CAST(c.n * 1000000 // t.n_type AS BIGINT) AS share_ppm,
        |       c.value_cents
        |FROM wdc c JOIN wdt t USING (event_type)
        |ORDER BY event_type, weekday""".stripMargin,
    // funnel latency: the funnel-steps CTEs, ms latencies (ns div 1e6),
    // histogram lower-median + exact mean/min/max per transition
    "q_funnel_latency" ->
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
        |), fla AS (
        |    SELECT '1_signup_to_click' AS step,
        |           (s2.t2 - s1.t1) // 1000000 AS lat_ms
        |    FROM s2 JOIN s1 USING (user_id)
        |    UNION ALL
        |    SELECT '2_click_to_purchase',
        |           (s3.t3 - s2.t2) // 1000000
        |    FROM s3 JOIN s2 USING (user_id)
        |), flh AS (
        |    SELECT step, lat_ms, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM fla GROUP BY 1, 2
        |), flc AS (
        |    SELECT step, lat_ms, c,
        |           SUM(c) OVER (PARTITION BY step ORDER BY lat_ms) AS cum,
        |           SUM(c) OVER (PARTITION BY step) AS n
        |    FROM flh
        |), fmd AS (
        |    SELECT step, lat_ms AS p50_ms FROM flc
        |    WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum
        |), ftt AS (
        |    SELECT step, CAST(SUM(c) AS BIGINT) AS n_users,
        |           CAST(SUM(CAST(lat_ms AS HUGEINT) * c) AS HUGEINT)
        |               AS lsum,
        |           CAST(MIN(lat_ms) AS BIGINT) AS min_ms,
        |           CAST(MAX(lat_ms) AS BIGINT) AS max_ms
        |    FROM flh GROUP BY 1
        |)
        |SELECT t.step, t.n_users,
        |       CAST(t.lsum // t.n_users AS BIGINT) AS mean_ms,
        |       CAST(m.p50_ms AS BIGINT) AS p50_ms, t.min_ms, t.max_ms
        |FROM ftt t JOIN fmd m USING (step)
        |ORDER BY step""".stripMargin,
    // Holt level+trend: the monthly grid (gaps 0-filled), then the
    // dyadic recurrence replayed per row as a list_reduce over the
    // prefix — acc and elements both LIST(BIGINT) so types unify; >>
    // is an arithmetic (flooring) shift in BOTH engines, the reason
    // alpha = beta = 1/2 (signed div/floor semantics differ otherwise)
    "q_holt_smooth" -> {
      val S = graft.ops.TimeSeriesOps.HoltScale
      s"""WITH hmr AS (
        |    SELECT r.r_name,
        |           (date_part('year', o.o_orderdate) - 1995) * 12
        |             + date_part('month', o.o_orderdate) - 1 AS mx,
        |           SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
        |    FROM orders o
        |    JOIN customer c ON c.c_custkey = o.o_custkey
        |    JOIN nation n ON n.n_nationkey = c.c_nationkey
        |    JOIN region r ON r.r_regionkey = n.n_regionkey
        |    GROUP BY 1, 2
        |), hgr AS (
        |    SELECT r_name, unnest(range(mn, mh + 1)) AS mx
        |    FROM (SELECT r_name, min(mx) AS mn, max(mx) AS mh
        |          FROM hmr GROUP BY 1)
        |), hda AS (
        |    SELECT g.r_name, g.mx,
        |           CAST(coalesce(m.y, 0) AS BIGINT) AS y
        |    FROM hgr g LEFT JOIN hmr m USING (r_name, mx)
        |), hrk AS (
        |    SELECT r_name, mx, y,
        |           CAST(row_number() OVER (PARTITION BY r_name
        |               ORDER BY mx) AS INTEGER) AS rn
        |    FROM hda
        |), har AS (
        |    SELECT r_name, list(y ORDER BY mx) AS ys FROM hda GROUP BY 1
        |), hlb AS (
        |    SELECT r.r_name, r.mx, r.y,
        |           list_reduce(
        |             list_prepend([a.ys[1] * $S, 0::BIGINT],
        |               list_transform(list_slice(a.ys, 2, r.rn),
        |                 x -> [x * $S, 0::BIGINT])),
        |             (acc, e) -> [
        |               (e[1] + acc[1] + acc[2]) >> 1,
        |               (((e[1] + acc[1] + acc[2]) >> 1) - acc[1]
        |                 + acc[2]) >> 1 ]) AS lb
        |    FROM hrk r JOIN har a USING (r_name)
        |)
        |SELECT r_name, CAST(mx AS BIGINT) AS mx, y AS revenue_cents,
        |       CAST(lb[1] AS BIGINT) AS level_fp,
        |       CAST(lb[2] AS BIGINT) AS trend_fp
        |FROM hlb ORDER BY r_name, mx""".stripMargin
    },
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
    // U-shaped attribution: the linear gate's pair join, two position
    // ranks, the exact 40/20/40 CASE (conservation by construction;
    // credits positive so // == Spark div)
    "q_attribution_position" ->
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
        |               ORDER BY cts ASC, click_id ASC) AS rn_asc,
        |           row_number() OVER (PARTITION BY purchase_id
        |               ORDER BY cts DESC, click_id DESC) AS rn_desc
        |    FROM apd
        |), acr AS (
        |    SELECT click_id, c_user,
        |           CASE
        |             WHEN n = 1 THEN credit_total
        |             WHEN n = 2 AND rn_asc = 1 THEN credit_total // 2
        |             WHEN n = 2 THEN credit_total - credit_total // 2
        |             WHEN rn_asc = 1 OR rn_desc = 1
        |               THEN (credit_total * 2) // 5
        |             ELSE (credit_total - 2 * ((credit_total * 2) // 5))
        |                    // (n - 2)
        |                  + CASE WHEN rn_desc = 2 THEN
        |                      (credit_total - 2 * ((credit_total * 2) // 5))
        |                      - ((credit_total
        |                          - 2 * ((credit_total * 2) // 5))
        |                         // (n - 2)) * (n - 2)
        |                    ELSE 0 END
        |           END AS credit
        |    FROM asp
        |)
        |SELECT click_id, c_user AS user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(credit) AS BIGINT) AS credit_micro_cents
        |FROM acr GROUP BY 1, 2 ORDER BY click_id""".stripMargin,
    // monetary-quintile migration between calendar halves: per half a
    // custkey spend agg + the RFM rank-quintile formula, inner join,
    // 5x5 rollup with exact row-share ppm
    "q_rfm_migration" ->
      s"""WITH rmb AS (
        |    SELECT o_custkey,
        |           epoch_ns(o_orderdate) // ${EventOps.DayNs} AS day,
        |           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |    FROM orders
        |), rmh AS (
        |    SELECT (min(day) + max(day)) // 2 AS half FROM rmb
        |), rm1 AS (
        |    SELECT o_custkey AS c_custkey, CAST(SUM(cents) AS BIGINT) AS m
        |    FROM rmb, rmh WHERE day <= half GROUP BY 1
        |), rm2 AS (
        |    SELECT o_custkey AS c_custkey, CAST(SUM(cents) AS BIGINT) AS m
        |    FROM rmb, rmh WHERE day > half GROUP BY 1
        |), rq1 AS (
        |    SELECT c_custkey,
        |           CAST(1 + (5 * (row_number() OVER (ORDER BY m, c_custkey)
        |               - 1)) // (SELECT COUNT(*) FROM rm1) AS INTEGER)
        |             AS q_from
        |    FROM rm1
        |), rq2 AS (
        |    SELECT c_custkey,
        |           CAST(1 + (5 * (row_number() OVER (ORDER BY m, c_custkey)
        |               - 1)) // (SELECT COUNT(*) FROM rm2) AS INTEGER)
        |             AS q_to
        |    FROM rm2
        |), rmc AS (
        |    SELECT q_from, q_to, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM rq1 JOIN rq2 USING (c_custkey) GROUP BY 1, 2
        |), rmt AS (
        |    SELECT q_from, CAST(SUM(n) AS BIGINT) AS n_from
        |    FROM rmc GROUP BY 1
        |)
        |SELECT c.q_from, c.q_to, c.n,
        |       CAST(c.n * 1000000 // t.n_from AS BIGINT) AS row_ppm
        |FROM rmc c JOIN rmt t USING (q_from)
        |ORDER BY q_from, q_to""".stripMargin,
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
    // stored skyline maintenance: the SAME fresh replay as q_skyline
    // gates the merge-law fold + stored serve (double-use posture)
    "q_skyline_incremental" -> skylineOracleSql,
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
    // Fano factor over the global day grid: zero days enter only
    // through D, fano_ppm = 10⁶·(D·Σc² − S²) // (D·S), numerator ≥ 0
    // by Cauchy-Schwarz so truncating // == floor == Spark div
    "q_burstiness" ->
      s"""WITH bde AS (
        |    SELECT event_type, epoch_ns(ts) // ${graft.ops.EventOps.DayNs}
        |               AS day
        |    FROM events
        |), bdc AS (
        |    SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
        |    FROM bde GROUP BY 1, 2
        |), bdg AS (
        |    SELECT CAST(max(day) - min(day) + 1 AS BIGINT) AS n_days
        |    FROM bde
        |), bdt AS (
        |    SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
        |           CAST(COUNT(*) AS BIGINT) AS days_active,
        |           CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
        |    FROM bdc GROUP BY 1
        |)
        |SELECT t.event_type, t.n_events, g.n_days, t.days_active,
        |       CAST((g.n_days * t.s2
        |             - CAST(t.n_events AS HUGEINT) * t.n_events) * 1000000
        |            // (CAST(g.n_days AS HUGEINT) * t.n_events) AS BIGINT)
        |           AS fano_ppm
        |FROM bdt t CROSS JOIN bdg g ORDER BY event_type""".stripMargin,
    // stationary distribution: the transition-matrix CTEs + 8 unrolled
    // power-iteration rounds in exact ppm (sum of HUGEINT products,
    // ONE // per state per round; acc ≥ 0 so // == Spark div)
    "q_markov_stationary" -> {
      val rounds = (1 to graft.ops.EventOps.MarkovIters).map { i =>
        s""", mk$i AS MATERIALIZED (
           |    SELECT t.state,
           |           CAST(COALESCE(x.acc // 1000000, 0) AS BIGINT) AS pi
           |    FROM mts t LEFT JOIN (
           |        SELECT p.dst AS state,
           |               SUM(CAST(m.pi AS HUGEINT) * p.p_ppm) AS acc
           |        FROM mk${i - 1} m JOIN mpp p ON p.src = m.state
           |        GROUP BY 1) x USING (state)
           |)""".stripMargin
      }.mkString
      s"""WITH mts AS MATERIALIZED (
         |    SELECT DISTINCT event_type AS state FROM events
         |), mev AS (
         |    SELECT user_id, event_type, epoch_ns(ts) AS ts, event_id
         |    FROM events
         |), mpr AS (
         |    SELECT event_type,
         |           lag(event_type) OVER (PARTITION BY user_id
         |               ORDER BY ts, event_id) AS prev
         |    FROM mev
         |), mtn AS (
         |    SELECT prev AS src, event_type AS dst,
         |           CAST(COUNT(*) AS BIGINT) AS n
         |    FROM mpr WHERE prev IS NOT NULL GROUP BY 1, 2
         |), mto AS (
         |    SELECT src, SUM(n) AS tot FROM mtn GROUP BY 1
         |), mpp AS MATERIALIZED (
         |    SELECT n.src, n.dst, CAST(n.n * 1000000 // t.tot AS BIGINT)
         |               AS p_ppm
         |    FROM mtn n JOIN mto t USING (src)
         |), mk0 AS MATERIALIZED (
         |    SELECT state,
         |           CAST(1000000 // (SELECT COUNT(*) FROM mts) AS BIGINT)
         |               AS pi
         |    FROM mts
         |)""".stripMargin + rounds +
        s"""
           |SELECT state AS event_type, pi AS pi_ppm
           |FROM mk${graft.ops.EventOps.MarkovIters}
           |ORDER BY event_type""".stripMargin
    },
  )
}
