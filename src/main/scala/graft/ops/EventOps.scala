package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Event-time operators over the `events` fixture (SURVEY.md §2.D streaming
  * row): JSON extraction, tumbling windows, session windows — all
  * batch-evaluable (the same expressions run under Structured Streaming; see
  * graft.streaming for the readStream path).
  *
  * `events.ts` is an exact ns-epoch Long (see graft.Tables); event-time
  * columns are derived with integer `div`, never double division, so no
  * precision is lost on 1.7e18-scale nanos.
  */
object EventOps {

  /** JSON scalar extraction + aggregation over `events.props`
    * (`{"k": <int>}`).
    */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("k").as("k_sum"))
      .orderBy("event_type")

  /** 1-hour tumbling event-time window (batch `window()` — identical
    * semantics under readStream with a watermark).
    */
  def eventTumblingWindow(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts_us"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .select(col("window.start").as("ws"), col("cnt"), col("value_sum"))
      .orderBy("ws")

  /** As-of join composed from primitives Spark has (an operator Spark lacks
    * natively): for each purchase event, the user's most recent click at or
    * before it. Implemented as the single-shuffle union-and-running-last
    * trick — both sides union, one window pass per user ordered by time
    * carries the latest click forward — NOT a range join (which explodes to
    * per-pair comparisons) and not a per-row subquery. One shuffle on
    * user_id regardless of data size.
    *
    * Ordering contract at equal timestamps: clicks sort before purchases
    * (`is_click desc`), matching ASOF's inclusive `<=` bound.
    */
  def asofLastClick(s: SparkSession, d: String): DataFrame = {
    // µs-epoch integers on both sides: the oracle's ASOF join coerces
    // timestamps through a µs common type, so the engine compares the same
    // exact integers (integer div, no double math on 1.7e18 ns).
    val ev = t(s, d, "events").withColumn("tsu", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("tsu"), col("event_id").as("purchase_id"),
      lit(null).cast("long").as("click_id"), lit(0).as("is_click"))
    val clicks = ev.filter(col("event_type") === "click").select(
      col("user_id"), col("tsu"), lit(null).cast("long").as("purchase_id"),
      col("event_id").as("click_id"), lit(1).as("is_click"))
    // click_id tiebreak makes the order total: two same-user clicks in the
    // same microsecond would otherwise leave last() shuffle-order-dependent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("tsu").asc, col("is_click").desc, col("click_id").asc_nulls_last)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    purchases.unionByName(clicks)
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_tsu",
        last(when(col("is_click") === 1, col("tsu")), ignoreNulls = true).over(w))
      .filter(col("is_click") === 0)
      .select(col("purchase_id"), col("user_id"), col("last_click_id"),
        (col("tsu") - col("last_click_tsu")).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** Bounded-interval range join: for every click, how many purchases the
    * same user made within the following 10 minutes (attribution window).
    * Scale shape: the EQUI key (user_id) carries the one shuffle; the time
    * range rides along as a join filter evaluated within each user's
    * co-partitioned rows — candidates are bounded per user, never a
    * time-only cross product. The unbounded "latest before" variant is the
    * as-of union trick above; this is the finite-window variant.
    * Arithmetic stays on exact ns-epoch longs (integer compare, no double).
    */
  def rangeJoinFollowups(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"))
    val windowNs = 600L * 1000000000L
    clicks.join(purchases,
        col("p_user") === col("user_id") &&
          col("pts") > col("cts") && col("pts") <= col("cts") + lit(windowNs),
        "left")
      .groupBy("click_id").agg(count(col("pts")).as("n_purchases_10m"))
      .orderBy("click_id")
  }

  /** 30-minute-gap session windows per user. Output times as exact µs-epoch
    * longs so the oracle's gaps-and-islands SQL compares integers, not
    * mixed-precision timestamps.
    */
  def sessionWindow(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("cnt"))
      .orderBy("user_id", "session_start_us")

  /** Session inactivity gap for [[sessionSequences]] (30 min, in ns). */
  val SessionGapNs = 1800000000000L

  /** Session trajectory assembly — the interaction-tuning data shape: each
    * user's event stream cut at [[SessionGapNs]] inactivity gaps, every
    * session emitted as its ORDERED event-type sequence ("view>click>
    * purchase") plus span stats — the per-session training example a
    * behavioral/agentic fine-tune consumes (the multi-turn analogue of
    * document packing; q_session_window's aggregate only counts, this
    * materializes the trajectory itself).
    *
    * Determinism: events order by (ts, event_id) — the engine-wide
    * total-order tie-break; the sequence string is assembled from the
    * SORTED struct array, identically to the oracle's ordered string_agg.
    * Timestamps emitted at ms (ts div 1e6) per the engine contract.
    *
    * Scale shape: ONE user_id hash exchange carries the gap window AND
    * the session group (same key — the SCD2 exchange-reuse posture);
    * session boundaries are a lag + running sum, never a self-join. The
    * sequence string is bounded by the session's own event count (a
    * runaway bot session makes a long string, not a shuffle problem —
    * cap downstream if serving constrains row width).
    */
  def sessionSequences(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("new_s",
        (col("ts") - lag("ts", 1).over(w) > SessionGapNs).cast("int"))
      .withColumn("session_idx",
        coalesce(sum("new_s").over(w), lit(0L)).cast("int"))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        expr("min(ts) div 1000000").as("start_ms"),
        expr("max(ts) div 1000000").as("end_ms"),
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          e => e.getField("event_type")), ">").as("seq"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
      .select("user_id", "session_idx", "n_events", "start_ms", "end_ms",
        "duration_ms", "seq")
      .orderBy("user_id", "session_idx")
  }

  /** ns per day — the survival grid unit. */
  val DayNs = 86400000000000L

  /** Survival fixed-point scale. */
  val KmScale = 1000000L

  /** Kaplan-Meier survival estimate (Kaplan & Meier 1958) for
    * time-to-conversion WITH right-censoring — the estimator plain
    * conversion rates get wrong when observation windows are uneven:
    * cohort = users with a signup; event = their first QUALIFYING
    * purchase after signup (props.k ≡ 0 mod 7 — the deterministic
    * qualifying rule that leaves a censored tail); users without one are
    * censored at the corpus observation end.
    *
    *   S(d) = Π_{days e ≤ d} (n_risk(e) − d_events(e)) / n_risk(e)
    *
    * in [[KmScale]] fixed point, each factor truncating once and the
    * product FOLDING IN DAY ORDER — the same explicit-order fold in both
    * engines (`aggregate(slice(...), S, ...)` vs
    * `list_reduce(list_prepend(S, list_slice(...)))`), so the curve
    * replays bit-exactly; a commutative float product would not.
    * Censored users leave the risk set without contributing an event —
    * at-risk at their own censor day (the standard convention).
    *
    * Scale shape: two user-keyed aggregations (cohort t0, first
    * qualifying purchase) + one exit-day agg; the curve math runs on the
    * DAY-GRID-bounded frame (the approx-percentile posture: windows and
    * the prefix-product fold are grid-sized, never event-sized).
    */
  def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val t0 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t0"))
    val q = ev.filter(col("event_type") === "purchase" &&
        get_json_object(col("props"), "$.k").cast("long") % 7 === 0)
      .select("user_id", "ts")
    val firstQ = q.join(t0, "user_id").filter(col("ts") > col("t0"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    val obsEnd = ev.agg(max("ts").as("obs_end"))
    val perUser = t0.join(firstQ, Seq("user_id"), "left")
      .crossJoin(broadcast(obsEnd))
      .withColumn("observed", col("tp").isNotNull.cast("long"))
      .withColumn("exit_day",
        when(col("observed") === 1, expr(s"(tp - t0) div $DayNs"))
          .otherwise(expr(s"(obs_end - t0) div $DayNs")))
    val nTotal = perUser.agg(count(lit(1)).as("n_total"))
    val exits = perUser.groupBy("exit_day").agg(
      count(lit(1)).as("n_exit"), sum("observed").as("d_ev"))
    val wd = Window.orderBy("exit_day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = exits.crossJoin(broadcast(nTotal))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("n_exit").over(wd), lit(0L)))
      .filter(col("d_ev") > 0)
      .withColumn("factor_fp",
        expr(s"$KmScale * (n_risk - d_ev) div n_risk"))
      .withColumn("rn", row_number().over(Window.orderBy("exit_day")))
    // day-ordered factor array: sort the collected structs — a bare
    // ordered collect_list is shuffle-order-dependent
    val facs = grid.agg(expr(
      "transform(array_sort(collect_list(struct(exit_day, factor_fp))), " +
        "e -> e.factor_fp)").as("facs"))
    grid.crossJoin(broadcast(facs))
      .withColumn("surv_fp", expr(
        s"aggregate(slice(facs, 1, rn), ${KmScale}L, " +
          s"(acc, x) -> acc * x div $KmScale)"))
      .select(col("exit_day").as("day"), col("n_risk"),
        col("d_ev").as("n_events"), col("factor_fp"), col("surv_fp"))
      .orderBy("day")
  }

  /** χ² fixed-point scale (ppm) and the 95% / df=1 critical value in
    * thousandths (3.841) — the comparison cross-multiplies, no float.
    */
  val Chi2Scale = 1000000L
  val Chi2CritThousandths = 3841L

  /** Exact Pearson χ² independence test per event type — the A/B-test
    * analytics primitive: does event-type incidence differ between the
    * two experiment arms (user_id parity — the deterministic assignment
    * [[graft.ops.SamplingOps]]'s split family would produce)? For the
    * 2×2 table (a, b; c, d):
    *
    *   χ² = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * — an exact RATIONAL, so the engine emits it in [[Chi2Scale]] fixed
    * point through DECIMAL(38) products (n·(ad−bc)²·10⁶ reaches ~10³³ at
    * corpus scale — past Long, inside DECIMAL(38); the tfidfKnn
    * precedent) and the significance verdict cross-multiplies against
    * the χ²₀.₉₅(1) = 3.841 critical value — no float, no sqrt, no
    * p-value interpolation anywhere, and DuckDB replays through HUGEINT.
    *
    * Scale shape: ONE (arm, event_type) count aggregation (map-side
    * combined); everything downstream is K-row (event-type count)
    * arithmetic on broadcast totals.
    */
  def abChiSquare(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .withColumn("arm", (col("user_id") % 2).cast("int"))
    val cells = ev.groupBy("arm", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val arms = cells.groupBy("event_type").agg(
      sum(when(col("arm") === 0, col("cnt")).otherwise(0L)).as("a"),
      sum(when(col("arm") === 1, col("cnt")).otherwise(0L)).as("c"))
    val tot = cells.agg(
      sum(when(col("arm") === 0, col("cnt")).otherwise(0L)).as("tot_a"),
      sum(when(col("arm") === 1, col("cnt")).otherwise(0L)).as("tot_b"))
    arms.crossJoin(broadcast(tot))
      .withColumn("b", col("tot_a") - col("a"))
      .withColumn("d", col("tot_b") - col("c"))
      .withColumn("n", col("tot_a") + col("tot_b"))
      .withColumn("chi2_ppm", expr(
        s"""CAST(CAST(n AS DECIMAL(38,0))
           | * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)
           | * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)
           | * $Chi2Scale
           | div (CAST(a+b AS DECIMAL(38,0)) * CAST(c+d AS DECIMAL(38,0))
           |      * CAST(a+c AS DECIMAL(38,0)) * CAST(b+d AS DECIMAL(38,0)))
           | AS BIGINT)""".stripMargin.replace("\n", " ")))
      .withColumn("significant", expr(
        s"""CAST(CAST(n AS DECIMAL(38,0))
           | * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)
           | * (CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c)
           | * 1000
           | >= $Chi2CritThousandths
           |    * CAST(a+b AS DECIMAL(38,0)) * CAST(c+d AS DECIMAL(38,0))
           |    * CAST(a+c AS DECIMAL(38,0)) * CAST(b+d AS DECIMAL(38,0))
           | AS INT)""".stripMargin.replace("\n", " ")))
      .select("event_type", "a", "b", "c", "d", "n", "chi2_ppm",
        "significant")
      .orderBy("event_type")
  }

  /** Mann-Whitney U between the A/B arms' purchase values — the
    * NONPARAMETRIC location test next to [[abChiSquare]]'s categorical
    * one (rates can match while the SPEND DISTRIBUTION shifts; U is the
    * standard detector and assumes nothing about the shape). Exact
    * integer end to end via DOUBLED midranks (the spearman device:
    * 2·midrank(v) = 2·cnt_lt(v) + cnt_eq(v) + 1 stays integral under
    * ties):
    *
    *   2·U₁ = Σ_{arm 0} 2r(v) − n₁(n₁+1),   2·μ_U = n₁n₂
    *   z² = (2U₁ − n₁n₂)² · 3n(n−1) / (n₁n₂·((n+1)n(n−1) − T))
    *
    * with T = Σ_ties (t³ − t) the tie correction — emitted in exact
    * milli units through DECIMAL(38) (numerator ≈ n⁶: exact to ~10⁶
    * observations, the spearman/eval-sample scoping), and the verdict
    * `significant` decided by the SAME cross-multiplied comparison
    * against z²·1000 = [[Chi2CritThousandths]] (χ²₁ ≡ z² — one shared
    * critical constant, no float compare anywhere).
    *
    * Scale shape: midranks come from the VALUE HISTOGRAM (one value
    * count aggregation + a bounded-frame cumulative — the spearman
    * posture), rank sums are one keyed agg; nothing pairwise, never
    * the O(n²) textbook U. Gate `q_mann_whitney`.
    */
  def mannWhitney(s: SparkSession, d: String): DataFrame = {
    val v = t(s, d, "events").filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val hist = v.groupBy("cents").agg(
      count(lit(1)).as("nat"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0v"))
    val ow = Window.orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // the histogram is value-cardinality-sized: its global window is a
    // bounded-frame sort, not a fact-volume single partition
    val ranked = hist
      .withColumn("cnt_lt", coalesce(sum("nat").over(ow), lit(0L)))
      .withColumn("r2", lit(2L) * col("cnt_lt") + col("nat") + 1L)
    val agg = ranked.agg(
      sum(expr("n0v * r2")).as("r1d"),
      sum("n0v").as("n1"),
      sum(expr("nat - n0v")).as("n2"),
      sum(expr("nat * nat * nat - nat")).as("tcorr"))
    agg.select(col("n1"), col("n2"),
        expr("r1d - n1 * (n1 + 1)").as("u1_doubled"),
        expr("n1 * n2").as("mu_doubled"), col("tcorr"),
        // the second guard is the all-values-tied degenerate table
        // (T = (n+1)n(n-1) makes the variance 0): no ordering signal
        // exists, z2 = 0 — refusing the division keeps non-ANSI Spark
        // (NULL) and DuckDB (error) from diverging
        expr("CAST(CASE WHEN n1 = 0 OR n2 = 0 OR " +
          "(CAST(n1 + n2 + 1 AS DECIMAL(38,0)) * (n1 + n2) " +
          " * (n1 + n2 - 1)) - tcorr = 0 THEN 0 ELSE " +
          "(CAST(r1d - n1 * (n1 + 1) - n1 * n2 AS DECIMAL(38,0)) " +
          " * (r1d - n1 * (n1 + 1) - n1 * n2) " +
          " * 3000 * (n1 + n2) * (n1 + n2 - 1)) div " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2 * " +
          " ((CAST(n1 + n2 + 1 AS DECIMAL(38,0)) * (n1 + n2) " +
          "   * (n1 + n2 - 1)) - tcorr)) END AS BIGINT)").as("z2_milli"))
      .withColumn("significant",
        (col("z2_milli") >= Chi2CritThousandths).cast("int"))
  }

  /** KS critical value c(0.05)² in thousandths (1.3581² = 1.8444). */
  val KsCritSqThousandths = 1845L

  /** Two-sample Kolmogorov-Smirnov over the A/B arms' purchase values —
    * the DISTRIBUTIONAL test completing the two-sample family
    * ([[abChiSquare]] rates, [[mannWhitney]] location, KS any-shape
    * difference): D = max_v |F₁(v) − F₂(v)| over the pooled support.
    * Exact integers throughout: the ECDF difference is kept as the
    * cross-multiplied numerator
    *
    *   D_num = max_v |cnt₁_≤(v)·n₂ − cnt₂_≤(v)·n₁|,   D = D_num/(n₁n₂)
    *
    * and the α = 0.05 verdict compares D_num²·1000 ≥
    * [[KsCritSqThousandths]]·(n₁+n₂)·n₁n₂ (the Smirnov large-sample
    * criterion, cross-multiplied like the chi-square/MW verdicts — no
    * float anywhere; DECIMAL(38) holds to ~10⁶ observations, the
    * eval-sample scoping).
    *
    * Scale shape: ONE value-count aggregation (map-side combined) —
    * the only fact-volume pass; cumulatives run over the
    * value-cardinality-bounded histogram frame. Gate `q_ks_test`.
    */
  def ksTest(s: SparkSession, d: String): DataFrame = {
    val hist = t(s, d, "events").filter(col("event_type") === "purchase")
      .select((col("user_id") % 2).cast("int").as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("cents").agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"))
    val pinned = graft.ops.PlanCache.swap("ks_hist", hist)
    val ow = Window.orderBy(col("cents").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = pinned.agg(sum("c0").as("n1"), sum("c1").as("n2"))
    // histogram frame: the global window is value-cardinality-bounded
    val dNum = pinned
      .withColumn("f0", sum("c0").over(ow))
      .withColumn("f1", sum("c1").over(ow))
      .crossJoin(broadcast(tot))
      .agg(max(expr("abs(f0 * n2 - f1 * n1)")).as("d_num"))
    dNum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        coalesce(col("d_num"), lit(0L)).as("d_num"),
        expr("CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0 ELSE " +
          "coalesce(d_num, 0L) * 1000000 div (n1 * n2) END AS BIGINT)")
          .as("d_ppm"),
        expr("CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN 0 " +
          "WHEN CAST(coalesce(d_num, 0L) AS DECIMAL(38,0)) " +
          s"* coalesce(d_num, 0L) * 1000 >= $KsCritSqThousandths " +
          "* CAST(n1 + n2 AS DECIMAL(38,0)) * n1 * n2 " +
          "THEN 1 ELSE 0 END AS INTEGER)").as("significant"))
  }

  /** Fixed-point scale for [[cramersV]]'s per-cell χ² terms. */
  val CramerScale = 1000000000000L

  /** Cramér's V between event type and epoch weekday — the r×c
    * contingency ASSOCIATION measure (Cramér 1946) that [[abChiSquare]]'s
    * per-type 2×2 tests can't express (it answers "is behavior
    * day-of-week-patterned AT ALL", normalized to [0,1] so tables of
    * different shape compare). Exact integer posture via the identity
    * χ²/n = Σ_ij O_ij²/(r_i·c_j) − 1:
    *
    *   phi2_fp = Σ_ij (O_ij² · 10¹² div (r_i·c_j)) − 10¹²
    *   V²_ppm  = phi2_fp div ((min(r,c) − 1) · 10⁶)
    *
    * — each cell's term is an INDEPENDENT floor (order-free sum, exact
    * replay; O_ij ≤ min(r_i, c_j) keeps every term ≤ 10¹², and the
    * DECIMAL(38) numerator holds to n = 10¹³ rows), with the floor-sum
    * clamped at 0 (mathematically ≥ 0; per-cell truncation can dip a
    * hair under).
    *
    * Scale shape: ONE (type, weekday) count aggregation (map-side
    * combined) — the only fact-volume pass; marginals and the term sum
    * run over the ≤ r·c cell frame. Gate `q_cramers_v`.
    */
  def cramersV(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .select(col("event_type"), expr(s"(ts div $DayNs) % 7").as("wd"))
      .groupBy("event_type", "wd").agg(count(lit(1)).as("o"))
    val pinned = graft.ops.PlanCache.swap("cramers_cells", cells)
    val rm = pinned.groupBy("event_type").agg(sum("o").as("ri"))
    val cm = pinned.groupBy("wd").agg(sum("o").as("cj"))
    val nn = pinned.agg(sum("o").as("n"),
      countDistinct("event_type").as("r"), countDistinct("wd").as("c"))
    pinned.join(rm, "event_type").join(cm, "wd")
      .agg(sum(expr(s"CAST(o AS DECIMAL(38,0)) * o * $CramerScale " +
        "div (CAST(ri AS DECIMAL(38,0)) * cj)")).as("s_fp"))
      .crossJoin(broadcast(nn))
      .select(col("n"), col("r").as("n_rows"), col("c").as("n_cols"),
        expr(s"CAST(greatest(s_fp - $CramerScale, 0) AS BIGINT)")
          .as("phi2_fp"),
        expr(s"CAST(CASE WHEN least(r, c) <= 1 THEN 0 ELSE " +
          s"greatest(s_fp - $CramerScale, 0) div " +
          "((least(r, c) - 1) * 1000000) END AS BIGINT)").as("v2_ppm"))
  }

  /** ns per epoch week (7 · 86400 · 1e9) — the exact integer week index
    * both engines derive from the ns-epoch ts contract.
    */
  val WeekNs = 604800000000000L

  /** Cohort retention: users grouped by their FIRST active epoch week,
    * counted per week offset — the classic retention triangle. Two keyed
    * shuffles (user_id for the cohort min, then (cohort, offset)) over
    * the distinct (user, week) activity set; no window, no self-join.
    * Gate `q_retention_cohorts`.
    */
  def retentionCohorts(s: SparkSession, d: String): DataFrame =
    retentionOver(t(s, d, "events")).orderBy("cohort_week", "week_offset")

  private[graft] def retentionOver(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), expr(s"ts div $WeekNs").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Burst threshold for [[slidingRate]]: events-per-trailing-hour
    * above this flag the row.
    */
  val BurstThreshold = 5L

  /** Debounce gap (5 s, ns): same-(user, type) events closer than this
    * collapse into one burst.
    */
  val DebounceNs = 5000000000L

  /** Value-distribution drift between the first and second half of the
    * time range, per event type, as EXACT total-variation distance —
    * the drift monitor the float-based PSI can't give a hash gate
    * (PSI needs ln; TVD is a rational):
    *
    *   TVD = ½ Σ_buckets |c₁(b)/n₁ − c₂(b)/n₂|
    *       = Σ|c₁(b)·n₂ − c₂(b)·n₁| · 10⁶ div (2·n₁·n₂)   [ppm]
    *
    * through DECIMAL(38) (c·n ≈ 10²⁰ at corpus scale). Buckets are
    * exact value cents; a type missing from one half contributes its
    * whole mass (TVD = 1e6 — the loudest possible drift).
    *
    * Scale shape: ONE (type, cents, half) count aggregation (map-side
    * combined), a (type, cents)-keyed full outer merge, broadcast
    * per-type totals, one per-type rollup. Gate `q_histogram_drift`.
    */
  def histogramDrift(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val b = Guards.anchored(ev.agg(min("ts"), max("ts")).head,
      "histogramDrift", "min(ts)")
    val thr = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    val counts = ev.select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        (col("ts") >= thr).cast("int").as("late"))
      .groupBy("event_type", "cents")
      .agg(sum(when(col("late") === 0, 1L).otherwise(0L)).as("c1"),
        sum(when(col("late") === 1, 1L).otherwise(0L)).as("c2"))
    val tots = counts.groupBy("event_type")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
    counts.join(broadcast(tots), "event_type")
      .groupBy("event_type")
      .agg(first("n1").as("n_early"), first("n2").as("n_late"),
        count(lit(1)).as("n_buckets"),
        sum(expr("abs(CAST(c1 AS DECIMAL(38,0)) * n2 " +
          "- CAST(c2 AS DECIMAL(38,0)) * n1)")).as("num"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        col("n_buckets"),
        expr("CAST(CASE WHEN n_early = 0 OR n_late = 0 THEN 1000000 " +
          "ELSE (num * 1000000) div (2 * CAST(n_early AS DECIMAL(38,0))" +
          " * n_late) END AS BIGINT)").as("tvd_ppm"))
      .orderBy("event_type")
  }

  /** Session-scoped funnel signup → click → purchase: every step must
    * land inside the SAME [[SessionGapNs]] session (the visit-level
    * conversion metric — [[funnelSteps]] credits a purchase days later,
    * [[funnelWindowed]] within a wall-clock window; this one within the
    * behavioral visit). First-touch chaining per (user, session); the
    * funnel top is sessions containing a signup.
    *
    * Scale shape: ONE user-keyed exchange assigns sessions (lag +
    * running sum); each step is a (user, session)-keyed min aggregate
    * joined to the previous step's survivor set — the funnelSteps shape
    * on the composite key. Gate `q_session_funnel`.
    */
  def sessionFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = t(s, d, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("new_s",
        (col("ts") - lag("ts", 1).over(w) > SessionGapNs).cast("int"))
      .withColumn("session_idx",
        coalesce(sum("new_s").over(w), lit(0L)).cast("int"))
    val key = Seq("user_id", "session_idx")
    val s1 = sess.where(col("event_type") === "signup")
      .groupBy(key.map(col): _*).agg(min("ts").as("t1"))
    val s2 = sess.where(col("event_type") === "click")
      .join(s1, key).where(col("ts") > col("t1"))
      .groupBy(key.map(col): _*).agg(min("ts").as("t2"))
    val s3 = sess.where(col("event_type") === "purchase")
      .join(s2, key).where(col("ts") > col("t2"))
      .groupBy(key.map(col): _*).agg(min("ts").as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("step", lit(1))
      .withColumn("event_type", lit("signup"))
      .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("step", lit(2))
        .withColumn("event_type", lit("click")))
      .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("step", lit(3))
        .withColumn("event_type", lit("purchase")))
    val top = s1.agg(count(lit(1)).as("n_top"))
    counts.crossJoin(broadcast(top))
      .select(col("step"), col("event_type"), col("n").as("n_sessions"),
        when(col("n_top") === 0L, 0L)
          .otherwise(expr("n * 1000000L div n_top")).as("conv_ppm"))
      .orderBy("step")
  }

  /** Bot-flag threshold: modal-gap share above this marks the user. */
  val BotShareThresholdPpm = 800000L

  /** Periodicity-based bot signal: humans' inter-event gaps spread; a
    * scripted client fires on a timer, so ONE gap value (rounded to the
    * second) dominates. Per user: gap count, the modal rounded gap, its
    * share in exact ppm, and the flag share > [[BotShareThresholdPpm]].
    * Ties on the modal gap break to the SMALLEST gap (deterministic).
    *
    * Scale shape: ONE user-keyed exchange (lag window), one
    * (user, gap)-keyed count, one per-user argmax window over the
    * user's own distinct-gap frame — never a self-join.
    * Gate `q_bot_periodicity`.
    */
  def botPeriodicity(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = t(s, d, "events")
      .select("user_id", "ts", "event_id")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .where(col("prev_ts").isNotNull)
      .withColumn("gap_s", expr("(ts - prev_ts) div 1000000000"))
    val counts = gaps.groupBy("user_id", "gap_s")
      .agg(count(lit(1)).as("c"))
    val tot = counts.groupBy("user_id").agg(sum("c").as("n_gaps"))
    val modal = counts.withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("c").desc, col("gap_s").asc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("gap_s").as("modal_gap_s"),
        col("c").as("modal_n"))
    modal.join(tot, "user_id")
      .select(col("user_id"), col("n_gaps"), col("modal_gap_s"),
        expr("modal_n * 1000000 div n_gaps").as("modal_share_ppm"))
      .withColumn("is_bot",
        (col("modal_share_ppm") > BotShareThresholdPpm).cast("int"))
      .orderBy("user_id")
  }

  /** Telemetry debouncing: same-user same-type events within
    * [[DebounceNs]] of the previous one are retries/double-fires, not
    * signal — collapse each burst run to one row carrying the burst's
    * first instant and its size (the gaps-and-islands cut, per
    * (user, type)). The kept-row rule is FIRST-of-burst — the
    * at-least-once-delivery convention (the first observation is the
    * real event; the tail is the noise).
    *
    * Scale shape: ONE (user, type)-keyed exchange shared by the lag
    * window and the burst group (the session-assembly posture).
    * Gate `q_event_debounce`.
    */
  def eventDebounce(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select("user_id", "event_type", "ts", "event_id")
      .withColumn("new_burst",
        (coalesce(col("ts") - lag("ts", 1).over(w), lit(Long.MaxValue))
          >= DebounceNs).cast("long"))
      .withColumn("burst_idx", sum("new_burst").over(w))
      .groupBy("user_id", "event_type", "burst_idx")
      .agg(expr("min(ts) div 1000000").as("burst_start_ms"),
        count(lit(1)).as("n_in_burst"),
        // first-of-burst by (ts, event_id) — a bare min(event_id) could
        // name a later-ts row that happens to carry a smaller id
        min(struct(col("ts"), col("event_id")))
          .getField("event_id").as("kept_event_id"))
      .select("user_id", "event_type", "burst_start_ms", "kept_event_id",
        "n_in_burst")
      .orderBy("user_id", "event_type", "burst_start_ms", "kept_event_id")
  }

  /** Per-event trailing-hour rate (the abuse/fraud primitive — "how
    * many requests did THIS user make in the hour ending here"): a
    * user-keyed RANGE-framed count over exact ns timestamps, with rows
    * past [[BurstThreshold]] flagged. The frame is
    * `RANGE (HourNs−1) PRECEDING .. CURRENT ROW` — inclusive of equal
    * timestamps (a burst AT one instant counts whole).
    *
    * Scale shape: ONE user-keyed exchange + in-partition ts sort; the
    * range frame is a sliding two-pointer inside each partition, never
    * a self-join. Output is event-sized by contract (each event gets
    * its rate). Gate `q_sliding_rate`.
    */
  def slidingRate(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
      .rangeBetween(-(graft.ops.TimeSeriesOps.HourNs - 1), 0)
    t(s, d, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("n_trailing_1h"),
        (col("n_trailing_1h") > BurstThreshold).cast("int").as("burst"))
      .orderBy("event_id")
  }

  /** Trailing-7-day distinct active users per day (rolling WAU) — the
    * engagement metric exact COUNT DISTINCT over a sliding window,
    * which no window frame computes directly (distinct does not
    * decompose over frame slides). The distributed rendering: the
    * DISTINCT (user, day) activity set fans each row out to the ≤ 7
    * target days it supports (a CONSTANT-bounded explode — the inverse
    * of the interval sweep's reasoning: here the window is fixed and
    * small, so fan-out beats re-scanning), then one (target-day)-keyed
    * countDistinct. Target days clamp to the observed range.
    *
    * Scale shape: one (user, day) distinct shuffle, a ≤7× row fan-out,
    * one day-keyed exact distinct aggregation. Gate `q_trailing_wau`.
    */
  def trailingWau(s: SparkSession, d: String): DataFrame = {
    val uw = t(s, d, "events")
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
      .distinct()
    val b = Guards.anchored(uw.agg(min("day"), max("day")).head,
      "trailingWau", "min(day)")
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    uw.select(col("user_id"),
        explode(sequence(col("day"),
          least(col("day") + 6, lit(mx)))).as("target_day"))
      .where(col("target_day") >= mn)
      .groupBy("target_day")
      .agg(countDistinct("user_id").as("wau"))
      .orderBy("target_day")
  }

  /** Interval-concurrency sweep over order fulfillment windows: each
    * order is an interval [orderdate, orderdate + (o_orderkey mod 7 + 1)
    * days) (the crafted-duration posture — deterministic from key
    * arithmetic, so the oracle replays it), and the output is the
    * classic concurrency profile: per day, how many intervals OPEN,
    * CLOSE and are ACTIVE.
    *
    * Scale shape — the sweep-line rendering, not the explode: each
    * interval contributes exactly TWO delta rows (+1 at start, −1 at
    * end) regardless of its span, one (day)-keyed aggregation collapses
    * them, and the running sum rides the DAY-GRID-bounded frame. The
    * alternative (explode each interval into its covered days) is
    * span×rows and dies on long intervals; the sweep is 2×rows always.
    * The lone unpartitioned window is over the day grid (the theta
    * posture). Gate `q_interval_concurrency`.
    */
  def intervalConcurrency(s: SparkSession, d: String): DataFrame = {
    val iv = t(s, d, "orders").select(
      expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) * 1000 div $DayNs")
        .as("d0"),
      col("o_orderkey"))
      .select(col("d0"), (col("d0") + col("o_orderkey") % 7 + 1).as("d1"))
    val deltas = iv.select(col("d0").as("day"), lit(1L).as("opened"),
        lit(0L).as("closed"))
      .unionByName(iv.select(col("d1").as("day"), lit(0L).as("opened"),
        lit(1L).as("closed")))
      .groupBy("day").agg(sum("opened").as("n_open"),
        sum("closed").as("n_close"))
    deltas
      .withColumn("n_active", sum(col("n_open") - col("n_close"))
        .over(Window.orderBy("day")))
      .orderBy("day")
  }

  /** Windowed-step gate for [[funnelWindowed]] (3 days, ns). */
  val FunnelStepNs = 3L * DayNs

  /** Time-constrained funnel signup → click → purchase: like
    * [[funnelSteps]] but each step must land within [[FunnelStepNs]] of
    * the previous step's conversion instant (the windowFunnel
    * semantics product analytics actually uses — an unbounded funnel
    * credits conversions months later). Same first-touch chaining
    * (earliest qualifying instant per step), same per-step user-keyed
    * aggregates; exact ns-integer window arithmetic.
    * Gate `q_funnel_windowed`.
    */
  def funnelWindowed(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("user_id"), col("event_type"),
      col("ts"))
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id")
      .where(col("ts") > col("t1") && col("ts") <= col("t1") + FunnelStepNs)
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id")
      .where(col("ts") > col("t2") && col("ts") <= col("t2") + FunnelStepNs)
      .groupBy("user_id").agg(min("ts").as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("step", lit(1))
      .withColumn("event_type", lit("signup"))
      .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("step", lit(2))
        .withColumn("event_type", lit("click")))
      .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("step", lit(3))
        .withColumn("event_type", lit("purchase")))
    val top = s1.agg(count(lit(1)).as("n_top"))
    counts.crossJoin(broadcast(top))
      .select(col("step"), col("event_type"), col("n").as("n_users"),
        when(col("n_top") === 0L, 0L)
          .otherwise(expr("n * 1000000L div n_top")).as("conv_ppm"))
      .orderBy("step")
  }

  /** WEEKDAY SEASONALITY profile — per (event_type, weekday 0=Mon..6=Sun)
    * the event count, the exact within-type share in ppm and the summed
    * purchase value in cents: the dayparting baseline every anomaly
    * screen ([[histogramDrift]], [[botPeriodicity]]) implicitly compares
    * against, made explicit. Weekday from exact epoch-day arithmetic
    * ((day + 3) mod 7 — 1970-01-01 was a Thursday), never a timezone-
    * dependent date function.
    *
    * Scale shape: one (type, weekday) aggregation, map-side combined;
    * the share join runs on the 7×|types| frame.
    * Gate `q_weekday_profile`.
    */
  def weekdayProfile(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "events")
      .select(col("event_type"),
        expr(s"pmod(ts div $DayNs + 3, 7)").as("weekday"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "weekday")
      .agg(count(lit(1)).as("n"), sum("cents").as("value_cents"))
    val tot = cells.groupBy("event_type").agg(sum("n").as("n_type"))
    cells.join(tot, Seq("event_type"))
      .select(col("event_type"), col("weekday"), col("n"),
        expr("n * 1000000L div n_type").as("share_ppm"),
        col("value_cents"))
      .orderBy("event_type", "weekday")
  }

  /** FUNNEL LATENCY — the time-between-steps distribution the
    * conversion COUNTS ([[funnelSteps]]) don't show: per step
    * transition (signup→click, click→purchase, first-touch chaining
    * exactly as the funnel gates), the converter count, exact mean,
    * exact LOWER-MEDIAN, min and max latency in ms (the determinism
    * contract: ts-derived output never finer than ms). The median
    * comes off the VALUE HISTOGRAM — first latency value whose
    * cumulative count reaches (n+1) div 2 — so no per-user global
    * sort exists.
    *
    * Scale shape: the funnel's user-keyed step aggregates, one
    * (step, lat_ms) histogram aggregation, prefix windows over the
    * HISTOGRAM frame. Gate `q_funnel_latency`.
    */
  def funnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("user_id"), col("event_type"),
      col("ts"))
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2.select("user_id", "t2"), "user_id")
      .where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val lat = s2.join(s1, "user_id")
      .select(lit("1_signup_to_click").as("step"),
        expr("(t2 - t1) div 1000000").as("lat_ms"))
      .unionByName(s3.join(s2, "user_id")
        .select(lit("2_click_to_purchase").as("step"),
          expr("(t3 - t2) div 1000000").as("lat_ms")))
    val hist = lat.groupBy("step", "lat_ms").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("step").orderBy("lat_ms")
      .rowsBetween(Window.unboundedPreceding, 0)
    val h2 = hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(Window.partitionBy("step")))
    val med = h2
      .where(col("cum") - col("c") < expr("(n + 1) div 2") &&
        expr("(n + 1) div 2") <= col("cum"))
      .select(col("step"), col("lat_ms").as("p50_ms"))
    val tot = hist.groupBy("step")
      .agg(sum("c").as("n_users"),
        sum(expr("CAST(lat_ms AS DECIMAL(38,0)) * c")).as("lsum"),
        min("lat_ms").as("min_ms"), max("lat_ms").as("max_ms"))
    tot.join(med, Seq("step"))
      .select(col("step"), col("n_users"),
        expr("CAST(lsum div n_users AS BIGINT)").as("mean_ms"),
        col("p50_ms"), col("min_ms"), col("max_ms"))
      .orderBy("step")
  }

  /** Cohort lifetime value: users grouped by their FIRST active epoch
    * week (the [[retentionCohorts]] cohort rule), purchase revenue
    * summed per week offset, plus the cumulative LTV curve — the
    * money-weighted retention triangle, exact cents end to end.
    *
    * Scale shape: the cohort min is one user-keyed aggregate over the
    * DISTINCT (user, week) activity set; revenue cells are one
    * (cohort, offset) aggregate; the cumulative curve is a running sum
    * over the COHORT-GRID-bounded cell frame (weeks², not events).
    * Gate `q_cohort_ltv`.
    */
  def cohortLtv(s: SparkSession, d: String): DataFrame =
    cohortLtvOver(t(s, d, "events"))

  private[graft] def cohortLtvOver(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), expr(s"ts div $WeekNs").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
    val rev = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts div $WeekNs").as("week"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cells = rev.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(sum("cents").as("revenue_cents"),
        countDistinct("user_id").as("n_buyers"))
    cells.withColumn("ltv_cum_cents",
        sum("revenue_cents").over(Window.partitionBy("cohort_week")
          .orderBy("week_offset")))
      .orderBy("cohort_week", "week_offset")
  }

  /** Strictly-ordered funnel signup → click → purchase: a user converts
    * step k only with an event STRICTLY AFTER their earliest step-k−1
    * conversion time (the first-touch rule, so re-orderings can't fake a
    * funnel). Per-step user counts + exact per-million conversion from
    * the funnel top. Each step is one user-keyed aggregate joined to the
    * previous step's (small) survivor set. Gate `q_funnel_steps`.
    */
  def funnelSteps(s: SparkSession, d: String): DataFrame =
    funnelOver(t(s, d, "events"))

  private[graft] def funnelOver(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val counts = s1.agg(count(lit(1)).as("n")).withColumn("step", lit(1))
      .withColumn("event_type", lit("signup"))
      .unionByName(s2.agg(count(lit(1)).as("n")).withColumn("step", lit(2))
        .withColumn("event_type", lit("click")))
      .unionByName(s3.agg(count(lit(1)).as("n")).withColumn("step", lit(3))
        .withColumn("event_type", lit("purchase")))
    val top = s1.agg(count(lit(1)).as("n_top"))
    counts.crossJoin(broadcast(top))
      .select(col("step"), col("event_type"), col("n").as("n_users"),
        when(col("n_top") === 0L, 0L)
          .otherwise(expr("n * 1000000L div n_top")).as("conv_ppm"))
      .orderBy("step")
  }

  /** Third-order path mining: per-user contiguous event-type TRIGRAMS in
    * (ts, event_id) order, counted with the conditional
    * P(next | prev two) in exact ppm — the sequential-pattern depth
    * [[eventTransitions]]' bigrams can't see (the "view→click→purchase
    * vs view→click→view" distinction a recommendation loop reads).
    * Same shape as transitions: one user-keyed window (two lags ride the
    * SAME sort) + one K³-bounded aggregate. Gate `q_event_trigrams`.
    */
  def eventTrigrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tri = t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("p1", lag(col("event_type"), 1).over(w))
      .withColumn("p2", lag(col("event_type"), 2).over(w))
      .where(col("p2").isNotNull)
      .groupBy(col("p2").as("t1"), col("p1").as("t2"),
        col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
    val ctx = tri.groupBy("t1", "t2").agg(sum("n").as("ctx_n"))
    tri.join(ctx, Seq("t1", "t2"))
      .select(col("t1"), col("t2"), col("t3"), col("n"),
        expr("n * 1000000 div ctx_n").as("p_ppm"))
      .orderBy("t1", "t2", "t3")
  }

  /** First-order Markov transition matrix between event types: per-user
    * (prev, cur) bigrams in (ts, event_id) order, counts and the exact
    * per-million row-conditional probability. One user-keyed window +
    * one K²-sized aggregate (K = event-type count — constant at scale).
    * Gate `q_event_transitions`.
    */
  def eventTransitions(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val n = ev.withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("prev_type"), col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("n"))
    val tot = n.groupBy("prev_type").agg(sum("n").as("tot"))
    n.join(tot, Seq("prev_type"))
      .select(col("prev_type"), col("cur_type"), col("n"),
        expr("n * 1000000L div tot").as("p_ppm"))
      .orderBy("prev_type", "cur_type")
  }

  /** Per-type BURSTINESS of the event stream — the Fano factor
    * (variance-to-mean ratio) of daily event counts over the GLOBAL
    * observed day grid: a Poisson-uniform type scores ≈ 10⁶ (ppm), a
    * bursty type (bot storms, campaign spikes) far above, a
    * metronome-regular one below. Days inside the grid with zero events
    * of a type count as 0 — algebraically, via
    *
    *   fano_ppm = 10⁶ · (D·Σc² − S²) div (D·S)
    *
    * (D = grid days, S = type total, Σc² over ACTIVE days only — zero
    * days add nothing to either sum), so no day-grid rows are ever
    * generated. Exact integers end-to-end; Cauchy-Schwarz keeps the
    * numerator ≥ 0. DECIMAL(38) holds D·Σc² to 10¹⁸ events/day.
    *
    * Scale shape: one (type, day) count aggregation (map-side combined)
    * — the only fact-volume pass; the grid bounds are a broadcast 1-row
    * aggregate; the rollup runs over the bounded (type, day) frame.
    * Gate `q_burstiness`.
    */
  def burstiness(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_type"), expr(s"ts div $DayNs").as("day"))
    val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    val grid = ev.agg((max("day") - min("day") + lit(1L)).as("n_days"))
    daily.groupBy("event_type")
      .agg(sum("c").as("n_events"), count(lit(1)).as("days_active"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
      .crossJoin(broadcast(grid))
      .select(col("event_type"), col("n_events"), col("n_days"),
        col("days_active"),
        expr("CAST((n_days * s2 - CAST(n_events AS DECIMAL(38,0)) " +
          "* n_events) * 1000000 div (CAST(n_days AS DECIMAL(38,0)) " +
          "* n_events) AS BIGINT)").as("fano_ppm"))
      .orderBy("event_type")
  }

  /** Power-iteration rounds for [[markovStationary]] — fixed by contract
    * (the [[graft.ops.GraphOps.labelPropagation]] posture: a bounded
    * unroll the declarative oracle replays round for round).
    */
  val MarkovIters = 8

  /** Stationary distribution of the event-type MARKOV CHAIN — the
    * long-run "where does a user's session settle" answer that the raw
    * transition matrix ([[eventTransitions]]) only implies: start
    * uniform, apply the observed row-stochastic transition matrix for
    * [[MarkovIters]] exact-integer rounds. The PageRank arithmetic
    * exactly (mass in ppm; per round π'_j = Σ_i π_i·p_ij div 10⁶ —
    * ONE floor per target state per round), so both engines land on
    * identical integers. States with no outgoing transition lose their
    * mass (the dangling contract, documented like the walk gates);
    * floor truncation bleeds ≤ |states| ppm per round — deterministic
    * on both sides, and the spec pins conservation bounds.
    *
    * Scale shape: ONE fact-volume pass (the lag window per user — the
    * session-sequence shuffle class) builds the |types|²-bounded
    * transition matrix; the matrix is BOUNDED METADATA (the centroid
    * doctrine — require-guarded), so the 8 rounds fold driver-side in
    * exact Long arithmetic with zero extra Spark jobs: at any corpus
    * size the iteration cost is |types|², not a per-round job.
    * Gate `q_markov_stationary`.
    */
  def markovStationary(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = ev.withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy("src").agg(sum("n").as("tot"))
    val p = trans.join(tot, Seq("src"))
      .select(col("src"), col("dst"), expr("n * 1000000L div tot").as("p_ppm"))
      .collect()
    require(p.length <= 65536, s"markovStationary: ${p.length} transition " +
      "cells exceed the bounded-metadata contract (event-type vocabulary " +
      "is expected to be small; refusing a driver-side fold that isn't)")
    val pm = p.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val states = p.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    // dangling isolates: types that never border a transition still get
    // initial mass (they are chain states with no edges either way)
    val iso = ev.select(col("event_type")).distinct().collect()
      .map(_.getString(0)).sorted
    val all = (states ++ iso).distinct.sorted
    import s.implicits._
    if (all.isEmpty) // empty stream → empty distribution, like the oracle
      return Seq.empty[(String, Long)].toDF("event_type", "pi_ppm")
    var pi: Map[String, Long] = all.map(_ -> 1000000L / all.length).toMap
    for (_ <- 1 to MarkovIters)
      pi = all.map { j =>
        // acc ≤ 10⁶·10⁶·|types| — Long-safe under the 65536-cell guard
        j -> all.map(i => pi(i) * pm.getOrElse((i, j), 0L)).sum / 1000000L
      }.toMap
    all.map(st => (st, pi(st))).toSeq.toDF("event_type", "pi_ppm")
      .orderBy("event_type")
  }

  /** Attribution lookback window (7 days, ns) and the micro-cent scale
    * credits are split in.
    */
  val AttribWindowNs = 7L * DayNs
  val AttribScale = 1000000L

  /** Linear multi-touch attribution: each purchase's value is split
    * EQUALLY across the user's clicks in the preceding 7 days — the
    * multi-touch counterpart of the as-of last-click gate, in exact
    * micro-cents with CONSERVATION: per click the base share is
    * `cents·10⁶ div n`, and the division remainder goes to the MOST
    * RECENT click (largest (ts, event_id)) — so the credits of every
    * purchase sum to exactly `cents·10⁶`, a property a per-share
    * round() would break (and the spec pins).
    *
    * Scale shape: the purchase×click pairing is the bounded-interval
    * range join ([[rangeJoinFollowups]]): ONE equi shuffle on user_id
    * with the time window as a co-partitioned join filter — candidates
    * per purchase are that user's clicks in 7 days, never a time-only
    * product. The per-purchase split (count + recency rank) and the
    * final per-click rollup ride keyed aggregations.
    */
  def attributionLinear(s: SparkSession, d: String): DataFrame =
    attributionOver(t(s, d, "events"))

  /** POSITION-BASED (U-shaped) multi-touch attribution — the 40/20/40
    * recipe next to [[attributionLinear]]'s equal split: the FIRST
    * click (the discovery touch) and the LAST click (the closer) each
    * take 40% of a purchase's value; the middles share the remaining
    * 20%. Exact micro-cents with CONSERVATION: 40% legs are
    * `credit·2 div 5`; the middle pool is the exact remainder
    * `credit − 2·(credit·2 div 5)` split `div (n−2)` with the division
    * remainder going to the MOST RECENT middle; n = 1 takes everything,
    * n = 2 splits half/half with the odd micro-cent to the last — every
    * purchase's credits sum to exactly `credit_total`, the property the
    * spec pins. Same 7-day first-touch window join as the linear gate.
    *
    * Scale shape: identical to [[attributionLinear]] — the in-window
    * pair join + two per-purchase windows (purchase-keyed, bounded by
    * the 7-day click fan). Gate `q_attribution_position`.
    */
  def attributionPosition(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"),
        expr("CAST(round(value * 100) AS BIGINT) * " + AttribScale)
          .as("credit_total"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val paired = purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("cts") < col("pts") &&
        col("cts") >= col("pts") - lit(AttribWindowNs))
    val byPurchase = Window.partitionBy("purchase_id")
    val split = paired
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rn_asc", row_number().over(
        byPurchase.orderBy(col("cts").asc, col("click_id").asc)))
      .withColumn("rn_desc", row_number().over(
        byPurchase.orderBy(col("cts").desc, col("click_id").desc)))
      .withColumn("credit", expr(
        """CASE
          |  WHEN n = 1 THEN credit_total
          |  WHEN n = 2 AND rn_asc = 1 THEN credit_total div 2
          |  WHEN n = 2 THEN credit_total - credit_total div 2
          |  WHEN rn_asc = 1 OR rn_desc = 1 THEN (credit_total * 2) div 5
          |  ELSE (credit_total - 2 * ((credit_total * 2) div 5))
          |         div (n - 2)
          |       + CASE WHEN rn_desc = 2 THEN
          |           (credit_total - 2 * ((credit_total * 2) div 5))
          |           - ((credit_total - 2 * ((credit_total * 2) div 5))
          |              div (n - 2)) * (n - 2)
          |         ELSE 0 END
          |END""".stripMargin))
    split.groupBy(col("click_id"), col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum("credit").as("credit_micro_cents"))
      .orderBy("click_id")
  }

  private[graft] def attributionOver(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("pts"),
        expr("CAST(round(value * 100) AS BIGINT) * " + AttribScale)
          .as("credit_total"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("cts"))
    val paired = purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("cts") < col("pts") &&
        col("cts") >= col("pts") - lit(AttribWindowNs))
    val byPurchase = Window.partitionBy("purchase_id")
    val split = paired
      .withColumn("n", count(lit(1)).over(byPurchase))
      .withColumn("rn", row_number().over(
        byPurchase.orderBy(col("cts").desc, col("click_id").desc)))
      .withColumn("credit", expr("credit_total div n") +
        when(col("rn") === 1,
          expr("credit_total - (credit_total div n) * n")).otherwise(0L))
    split.groupBy(col("click_id"), col("c_user").as("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum("credit").as("credit_micro_cents"))
      .orderBy("click_id")
  }
}
