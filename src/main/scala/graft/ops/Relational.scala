package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Capability queries (SURVEY.md §2.5 table 2) — the relational surface the
  * reference delegates wholesale to Trino (SURVEY §2.D): joins, windows,
  * sort/top-k, set ops, rollup, distinct.
  *
  * Determinism: double-typed aggregates go through DECIMAL so accumulation
  * order can't perturb low bits (sum over decimal is exact; the final cast
  * back to DOUBLE is a single deterministic conversion).
  */
object Relational {

  /** Exact double sum: accumulate in DECIMAL, emit DOUBLE. */
  private def exactSum(c: String, scale: Int = 2) =
    sum(col(c).cast(s"decimal(18,$scale)")).cast("double")

  /** Equi join + aggregation — lineitem ⋈ orders on orderkey. At scale both
    * sides are large → shuffle hash/SMJ on the join key is the right plan;
    * no broadcast hint on purpose.
    */
  def joinEqui(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"), exactSum("l_extendedprice").as("revenue"))
      .orderBy("o_orderstatus")

  /** Star-schema lookup: fact ⋈ three small dims, all explicitly broadcast —
    * at 100 TB the fact side streams, dims ship to every executor, zero
    * shuffle on the fact until the final small aggregation.
    */
  def joinBroadcastDim(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"), exactSum("o_totalprice").as("total_price"))
      .orderBy("r_name", "n_name")

  /** Left-semi + left-anti in one result: customers with / without orders.
    * Single-pass form — one left join against the distinct key set tags
    * both populations (running semi and anti separately would scan both
    * tables twice and join twice for the same answer).
    */
  def joinSemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").select("c_custkey", "c_name")
    val o = t(s, d, "orders").select("o_custkey").distinct()
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        when(col("o_custkey").isNotNull, "HAS_ORDERS")
          .otherwise("NO_ORDERS").as("tag"))
      .orderBy("c_custkey")
  }

  /** Latest-wins dedup by PK — the correct incremental-merge the reference's
    * PK + update_datetime columns imply (SURVEY §2.D windows row). Single
    * shuffle on the partition key; ts is the exact ns-epoch long.
    */
  def windowLatestByPk(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    t(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** Running aggregate with an explicit frame spec (exact decimal accum). */
  def windowRunningAgg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "events").select(
      col("user_id"), col("event_id"),
      sum(col("value").cast("decimal(18,6)")).over(w).cast("double").as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Top-3 orders per customer — rank + filter, one shuffle on the group
    * key, no global sort of the fact table.
    */
  def sortTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, d, "orders")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rnk")
  }

  /** Two tenants' conformed slices unioned — the platform's stated purpose
    * (docs/tenant-onboarding-architecture.md:169-175). unionByName so column
    * order can never silently misalign.
    */
  def unionTwoTenants(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select(lit("tenant_a").as("tenant_id"), col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val b = c.filter(col("c_mktsegment") === "MACHINERY")
      .select(lit("tenant_b").as("tenant_id"), col("c_custkey"), col("c_name"), col("c_mktsegment"))
    a.unionByName(b).orderBy("tenant_id", "c_custkey")
  }

  /** EXCEPT + INTERSECT over key sets, as one single-pass aggregation:
    * per key, membership flags for each side, then the set operations are
    * flag predicates. One scan and one shuffle where the naive
    * intersect-plus-except plan scans the fact twice and shuffles four
    * times for the same answer.
    */
  def exceptIntersect(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy("o_custkey")
      .agg(max(col("o_orderstatus") === "F").as("has_f"),
        max(col("o_orderstatus") === "O").as("has_o"))
      .filter(col("has_f"))
      .select(col("o_custkey"),
        when(col("has_o"), "BOTH").otherwise("F_ONLY").as("tag"))
      .orderBy("tag", "o_custkey")

  /** ROLLUP over (event_type, day) — grouping-set aggregation. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .withColumn("day", to_date(timestamp_millis(expr("ts div 1000000"))))
      .rollup("event_type", "day")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("day"))

  /** Exact distinct — PK hygiene. */
  def distinctExact(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact interpolated percentiles per group — the order-statistics leg of
    * the aggregate family (median/p90 monitoring of a mart column).
    *
    * Built-in `percentile`/`quantile_cont` are NOT cross-engine stable:
    * the position fraction (n-1)·p is a binary double, and the two engines
    * interpolate with different formulas ((1-f)·lo + f·hi vs
    * lo + f·(hi-lo)), so a mathematically-half result can round to
    * integers 1 apart. This computes the SAME continuous percentile in
    * pure integer arithmetic instead: with p = k/10, the 0-based position
    * is idx + frac/10 where idx = (n-1)·k div 10, frac = (n-1)·k mod 10,
    * and the interpolated value ×10 is lo·(10-frac) + hi·frac — exact
    * BIGINT deci-cents, no float anywhere.
    *
    * Scale shape — exact percentiles without sorting the fact table: first
    * a (status, cents) frequency aggregation (map-side combinable; output
    * is DISTINCT VALUES per group, ≪ row count), then the running-count
    * window and the order-statistic selection run over that small
    * frequency table. value@pos = min cents with cumulative count > pos.
    */
  def percentileByStatus(s: SparkSession, d: String): DataFrame = {
    val freq = t(s, d, "orders")
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy("o_orderstatus", "cents").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderstatus").orderBy("cents")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("o_orderstatus")
    freq
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(wn))
      // group-constant integer positions: 0-based idx + frac/10
      .withColumn("idx50", expr("(n - 1) * 5 div 10"))
      .withColumn("frac50", expr("(n - 1) * 5 % 10"))
      .withColumn("idx90", expr("(n - 1) * 9 div 10"))
      .withColumn("frac90", expr("(n - 1) * 9 % 10"))
      .groupBy("o_orderstatus")
      .agg(
        max("n").as("n_orders"),
        min(when(col("cum") > col("idx50"), col("cents"))).as("lo50"),
        min(when(col("cum") > col("idx50") + 1, col("cents"))).as("hi50"),
        max("frac50").as("f50"),
        min(when(col("cum") > col("idx90"), col("cents"))).as("lo90"),
        min(when(col("cum") > col("idx90") + 1, col("cents"))).as("hi90"),
        max("frac90").as("f90"))
      .select(
        col("o_orderstatus"), col("n_orders"),
        (col("lo50") * (lit(10L) - col("f50")) +
          coalesce(col("hi50"), col("lo50")) * col("f50")).as("p50_x10"),
        (col("lo90") * (lit(10L) - col("f90")) +
          coalesce(col("hi90"), col("lo90")) * col("f90")).as("p90_x10"))
      .orderBy("o_orderstatus")
  }

  /** HLL approximate distinct under a BOUNDED-TOLERANCE oracle: the raw
    * estimate is engine-specific (HLL++ register layout), but its
    * documented accuracy is not — Spark's default relativeSD is 0.05, so
    * the estimate must sit within 3·rsd of the exact count
    * (three-sigma of the HLL error model). The query emits the exact
    * count plus an integer within-tolerance verdict; the oracle recomputes
    * the exact count and ASSERTS the verdict is 1 — an out-of-tolerance
    * sketch hash-mismatches and fails the gate, which is precisely the
    * tolerance check expressed through an equality harness.
    */
  val ApproxDistinctRsd = 0.05
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").agg(
      approx_count_distinct("l_orderkey", ApproxDistinctRsd).as("approx"),
      countDistinct("l_orderkey").as("exact_orderkeys"))
      .select(col("exact_orderkeys"),
        (abs(col("approx") - col("exact_orderkeys")).cast("double")
          <= lit(3 * ApproxDistinctRsd) * col("exact_orderkeys").cast("double"))
          .cast("int").as("within_3rsd"))

  /** Skew-safe two-phase aggregation: pre-aggregate on (key, salt) so a hot
    * key's rows spread over 16 reducers, then combine partials per key.
    * The salt derives deterministically from row identity (xxhash64), never
    * rand() — results stay reproducible; decimal partials make the two-phase
    * sum exactly equal to the direct one. l_returnflag (3 values over 600k
    * rows) is a genuinely skewed key.
    */
  def saltedGroupAgg(s: SparkSession, d: String): DataFrame = {
    val salted = t(s, d, "lineitem")
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy("l_returnflag", "salt")
      .agg(count(lit(1)).as("pcnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("psum"))
    salted.groupBy("l_returnflag")
      .agg(sum("pcnt").as("cnt"), sum("psum").cast("double").as("qty_sum"))
      .orderBy("l_returnflag")
  }

  /** CUBE over (status, priority) — all four grouping sets in one shuffle. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), exactSum("o_totalprice").as("total_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Explicit GROUPING SETS — the two single-dimension aggregates in one
    * shuffle, with grouping_id distinguishing the sets.
    */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    graft.Tables.registerViews(s, d, Seq("orders"))
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       COUNT(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        |""".stripMargin)
  }

  /** Row→column pivot: order counts per priority pivoted by status, with an
    * explicit value list so the output schema is static (the scale-safe
    * form — no extra pass to discover pivot values).
    */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(lit(1)))
      .orderBy("o_orderpriority")

  /** Co-located fact-fact join via BUCKETED tables: both sides land with
    * `bucketBy(join key) + sortBy`, so the SortMergeJoin reads bucket i
    * against bucket i with NO Exchange on either side. At 100 TB this is
    * the pattern for every RECURRING large-large join on a stable key:
    * the shuffle is paid once at write time and amortized over every
    * subsequent join/aggregation on that key (broadcast only rescues
    * small dims; two big fact tables must otherwise re-shuffle per join).
    * The `merge` hint pins SMJ so the plan demonstrates the bucketed path
    * even at fixture scale, where broadcast would win on size alone.
    *
    * The table WRITES are idempotent setup ([[ensureBucketedTables]]), not
    * part of the query: re-creating both tables every run would make the
    * bench time the amortized-away write and hide the steady-state join
    * cost it models. Bench's min-over-passes therefore reports the
    * join-only time (the first pass pays the one-time write; later passes
    * reuse the catalog tables), with the write cost printed separately.
    */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val db = ensureBucketedTables(s, d)
    s.table(s"`$db`.`lineitem_bkt`")
      .join(s.table(s"`$db`.`orders_bkt`").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), exactSum("l_quantity").as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Source dir the bucketed tables were last built from, per session —
    * a different dir in the same session forces a rebuild (never serve a
    * join over the wrong scale's data). WEAK keys: a strong session
    * reference here would pin every session the map ever sees (and its
    * whole catalog) for the JVM lifetime; a collected session's entry is
    * simply rebuilt on next use. All access goes through the
    * [[ensureBucketedTables]] lock.
    */
  private val bucketedBuiltFrom =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Write-once setup for [[joinBucketed]]: (re)creates the two bucketed
    * tables only when this session hasn't already built them from `d`.
    * Synchronized: the check-then-build would otherwise race two
    * concurrent first calls into clobbering each other's table writes
    * (builds are rare one-time setup, so one coarse lock is fine).
    * The one-time write cost goes to stderr so bench runs keep a separate
    * write number next to the steady-state join timing.
    */
  private def ensureBucketedTables(s: SparkSession, d: String): String =
    bucketedBuiltFrom.synchronized {
      val db = "graft_bucketed"
      val fresh = bucketedBuiltFrom.get(s) != d ||
        !s.catalog.tableExists(s"$db.lineitem_bkt") ||
        !s.catalog.tableExists(s"$db.orders_bkt")
      if (fresh) {
        val t0 = System.nanoTime()
        graft.store.Warehouse.saveBucketed(
          t(s, d, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice"),
          db, "lineitem_bkt", Seq("l_orderkey"), numBuckets = 8)
        graft.store.Warehouse.saveBucketed(
          t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
          db, "orders_bkt", Seq("o_orderkey"), numBuckets = 8)
        bucketedBuiltFrom.put(s, d)
        System.err.println(f"[joinBucketed] bucketed-table write (one-time " +
          f"setup, amortized at steady state): ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      db
    }

  /** ONE-PASS column profile — the data-quality surface every warehouse
    * table needs monitored (null rates, cardinalities, value bounds): all
    * per-column aggregates compute in a single scan (map-side partials;
    * the multi-column exact distincts expand to one Expand + aggregation,
    * not one job per column), then `stack` melts the single row into one
    * row per column. min/max are stringified for the uniform schema —
    * callers profile drift by comparing successive snapshots.
    *
    * `exactDistinct = false` swaps the cardinalities to
    * approx_count_distinct — the 100 TB posture: the exact mode's Expand
    * multiplies the scan by the profiled column count, while HLL partials
    * keep the single-scan profile flat at any width (the registered query
    * stays exact because the oracle gate needs reproducible integers).
    */
  def profile(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def dst(c: String) =
      if (exactDistinct) countDistinct(col(c)) else approx_count_distinct(c)
    val aggs = count(lit(1)).as("__total") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__cnt"),
      dst(c).as(s"${c}__dst"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val stackArgs = cols.map(c =>
      s"'$c', __total - ${c}__cnt, ${c}__dst, ${c}__min, ${c}__max")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_value, max_value)"))
      .orderBy("col_name")
  }

  /** Registered profile query over orders. Doubles/timestamps profile
    * through integer derivations (cents) — a raw double min/max would
    * stringify with engine-specific float formatting and break the hash
    * gate; integer/varchar casts are format-stable in both engines.
    */
  def profileOrders(s: SparkSession, d: String): DataFrame =
    profile(
      t(s, d, "orders").withColumn("o_totalprice_cents",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice_cents"))

  /** Registered profile over the north-star corpus table: scalar columns
    * plus the text LENGTH as a derived integer — the 100 TB data-quality
    * entry point for a documents pipeline (null text, collapsed sources,
    * out-of-range lengths all surface here before any operator runs).
    */
  def profileDocuments(s: SparkSession, d: String): DataFrame =
    profile(
      t(s, d, "documents").withColumn("text_len", length(col("text"))),
      Seq("doc_id", "lang", "source", "n_chars", "text_len"))

  /** Scalar date/time functions over the ms-precision orders timestamps. */
  def scalarDatetimeMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").select(
      col("o_orderkey"),
      to_date(date_trunc("DAY", col("o_orderdate"))).as("order_day"),
      month(col("o_orderdate")).as("order_month"),
      year(col("o_orderdate")).as("order_year"),
      date_add(col("o_orderdate").cast("date"), 30).as("due_date"))
      .orderBy("o_orderkey")

  /** Gaps-and-islands over the document id sequence: contiguous doc_id
    * runs collapse to (island_start, island_end, island_len) rows — the
    * completeness check an ingest pipeline runs to see WHICH ranges a
    * feed dropped, not just how many rows ([[ExpectationOps]] counts;
    * this locates). The classic id − row_number() grouping key: constant
    * within a contiguous run, distinct across gaps.
    *
    * Scale shape: one global-order window (a RANGE exchange + local
    * sorts — the export/z-order posture; ids are near-uniform so range
    * partitions balance) and one (grp)-keyed aggregate. Output is
    * island-count-sized. Gate `q_id_islands`.
    */
  /** Benford first-digit ppm expectations, log10(1+1/d) at ppm scale —
    * FIXED integer literals (they sum to exactly 10⁶), so the whole
    * screen is integer arithmetic on constants, no log anywhere.
    */
  val BenfordPpm: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law screen over order totals — the fraud/fabrication
    * smell test (organically-grown amounts lead with 1 ~30% of the
    * time; invented ones don't): per first digit of the cents amount,
    * the observed share vs the Benford expectation and the absolute
    * deviation, all exact ppm. One digit-keyed aggregation off the
    * orders scan; the 9-row expectation table is inlined constants.
    * Gate `q_benford`.
    */
  def benfordOrders(s: SparkSession, d: String): DataFrame = {
    val counts = t(s, d, "orders")
      .select(expr("CAST(substr(CAST(CAST(round(o_totalprice * 100) " +
        "AS BIGINT) AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    import s.implicits._
    val expected = BenfordPpm.toSeq.sortBy(_._1)
      .toDF("digit", "benford_ppm")
    expected.crossJoin(broadcast(counts.agg(sum("n").as("total"))))
      .join(broadcast(counts), Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        expr("coalesce(n, 0L) * 1000000 div total").as("obs_ppm"),
        col("benford_ppm"))
      .withColumn("dev_ppm", abs(col("obs_ppm") - col("benford_ppm")))
      .orderBy("digit")
  }

  /** Exact Spearman rank correlation between part size and price — the
    * dependence measure for ordinal/monotone relationships (Pearson
    * needs linearity; chi-square needs categories): both columns rank
    * with MIDRANK tie handling kept integer by doubling (the
    * classifier-AUC trick: midrank2 = 2·cnt_lt + n_at + 1), and the
    * correlation is the exact rational
    *
    *   ρ = (n·Σxy − Σx·Σy) / √((n·Σx²−(Σx)²)(n·Σy²−(Σy)²))
    *
    * emitted sqrt-free as the SIGN plus ρ²·10⁶ staged as
    * ((|num|·10⁶ div denx)·|num|) div deny through DECIMAL(38) — each
    * stage an exact nonnegative integer division (abs first: Spark's
    * `div` truncates toward zero while DuckDB's `//` floors, so a
    * negative intermediate would diverge), within 1 ppm of the single
    * rational num²·10⁶ div (denx·deny) (first-stage truncation loses
    * < denx, i.e. < 1 ppm of the product). Staging is what keeps the
    * fold inside 38 digits: the single form squares num (~4n⁴, past
    * DECIMAL(38) at ~300k rows — the round-14 25× Verify caught it at
    * 4.3e44), while the staged intermediates are bounded by
    * max(|num|·10⁶, 10⁶·deny) (Cauchy-Schwarz: num² ≤ denx·deny), good
    * to ~2·10⁷ catalog rows.
    *
    * Scale shape: ranks come off per-column VALUE HISTOGRAMS (two
    * value-keyed aggs + broadcast joins back), one final sum — no
    * row-level rank window. Gate `q_spearman`.
    */
  def spearmanSizePrice(s: SparkSession, d: String): DataFrame = {
    val rows = t(s, d, "part").select(col("p_partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price"),
      col("p_size").cast("long").as("size"))
    def withMidrank(df: DataFrame, c: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(c)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val ranks = df.groupBy(c).agg(count(lit(1)).as("nat"))
        .withColumn("cnt_lt", coalesce(sum("nat").over(w), lit(0L)))
        .select(col(c), (lit(2L) * col("cnt_lt") + col("nat") + 1).as(out))
      df.join(broadcast(ranks), c)
    }
    val ranked = withMidrank(withMidrank(rows, "price", "rx"), "size", "ry")
    ranked.agg(count(lit(1)).as("n"), sum("rx").as("sx"), sum("ry").as("sy"),
        sum(expr("CAST(rx AS DECIMAL(38,0)) * rx")).as("sxx"),
        sum(expr("CAST(ry AS DECIMAL(38,0)) * ry")).as("syy"),
        sum(expr("CAST(rx AS DECIMAL(38,0)) * ry")).as("sxy"))
      .select(col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
          .as("num"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
          .as("denx"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy")
          .as("deny"))
      .select(col("n"),
        expr("CAST(CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1 " +
          "ELSE 0 END AS INTEGER)").as("rho_sign"),
        expr("CAST(CASE WHEN denx = 0 OR deny = 0 THEN 0 " +
          "ELSE (((abs(num) * 1000000) div denx) * abs(num)) div deny " +
          "END AS BIGINT)").as("rho2_ppm"))
  }

  /** Exact Kendall τ-b between part size and price — the concordance
    * complement of [[spearmanSizePrice]] (Spearman correlates the RANKS;
    * Kendall counts pairwise ORDER agreements, the more robust and more
    * interpretable of the two for heavy ties):
    *
    *   τ-b = (C − D) / √((n₀ − n₁)(n₀ − n₂))
    *
    * with C/D the concordant/discordant pair counts, n₀ = C(n,2), n₁/n₂
    * the tied-pair counts per column — emitted sqrt-free as the SIGN of
    * C − D plus τ²·10⁶ = (C−D)²·10⁶ div ((n₀−n₁)(n₀−n₂)) through
    * DECIMAL(38) (the spearman posture exactly).
    *
    * Scale shape: pair counting via the 2-D dominance decomposition
    * over the (size, price) cell histogram — pivot on the BOUNDED size
    * domain, one two-phase prefix sum over the global price order for
    * every size column at once, one y-keyed join back (details at the
    * implementation comment). O(cells · |sizes|) total, linear in the
    * catalog; the naive cell-pair self-join is O(cells²) and the cell
    * count tracks the CATALOG when prices are near-continuous — the
    * quadratic shape this decomposition exists to avoid. Tie terms come
    * from the two marginals. Same exactness scoping as spearman
    * (DECIMAL(38) frames). Gate `q_kendall_tau`.
    */
  def kendallTauSizePrice(s: SparkSession, d: String): DataFrame = {
    val cells = t(s, d, "part").select(
        col("p_size").cast("long").as("x"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val pinned = PlanCache.swap("kendall_cells", cells)
    // Pair counting WITHOUT the cell-pair self-join: the naive
    // `a.x < b.x` join is O(cells²) with a BNLJ — and the (size, price)
    // joint histogram is NOT catalog-bounded when the y side is
    // near-continuous (cells ≈ n on real prices), so the quadratic
    // shape dies at scale. Instead, each unordered pair is charged to
    // its higher-x member via the 2-D DOMINANCE COUNT
    //
    //   nc = Σ_cells c(x,y) · #{rows: x' > x, y' > y}
    //   nd = Σ_cells c(x,y) · #{rows: x' > x, y' < y}
    //
    // computed by PIVOTING on the BOUNDED x domain (p_size — collected
    // like IVF centroids, loudly refused past the bound) and running
    // ONE two-phase prefix sum over the global y order for all x
    // columns at once (the packTokens posture: equi-depth y buckets,
    // bucket totals to the driver, parallel within-bucket windows —
    // zero Exchange SinglePartition). Unpivot + one y-keyed join with
    // the cells closes the sum. Work: O(cells · |x-domain|) rows,
    // linear in the catalog at the bounded fan-out — never cells².
    val xs = pinned.select("x").distinct().orderBy("x")
      .collect().map(_.getLong(0))
    require(xs.length <= 1000,
      s"kendallTau: x-domain has ${xs.length} distinct values — the " +
        "bounded-pivot fan-out contract (<= 1000) does not hold, refusing")
    val xCols = xs.map(v => s"x_$v")
    val piv = pinned.groupBy("y").pivot("x", xs.map(v => v: Any).toSeq)
      .sum("c").na.fill(0L)
      .toDF(("y" +: xCols.toSeq): _*)
    // two-phase prefix over the global y order, all x columns at once
    val bucketed = SamplingOps.equiDepthBucketed(piv, 32, keyCol = "y")
    val totals = bucketed.groupBy("bucket")
      .agg(xCols.head -> "sum", xCols.tail.map(_ -> "sum").toSeq: _*)
      .collect().map(r => r.getInt(0) -> xs.indices.map(i =>
        r.getLong(i + 1)).toArray).sortBy(_._1)
    val grand = xs.indices.map(i => totals.map(_._2(i)).sum).toArray
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(xs.indices.map(_ => 0L).toArray) {
        (acc, t) => acc.zip(t).map { case (a, b) => a + b } }.init)
    val offsetDf = s.createDataFrame(
        offsets.map { case (b, arr) => (b, arr.toSeq) }.toSeq)
      .toDF("bucket", "offs")
    val w = Window.partitionBy("bucket").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = bucketed.join(broadcast(offsetDf), Seq("bucket"))
    // per (y, x'): lt = rows of x' strictly below this y; gt = strictly
    // above. ONE select carries every column's window (same window spec
    // → one Window operator, one pass), then stack() unpivots — a d-way
    // union would recompute the pivot d times.
    val withCums = pref.select(
      col("y") +: xs.indices.flatMap { i =>
        val below = coalesce(sum(col(xCols(i))).over(w), lit(0L)) +
          element_at(col("offs"), i + 1)
        Seq(below.as(s"lt_$i"),
          (lit(grand(i)) - below - col(xCols(i))).as(s"gt_$i"))
      }.toSeq: _*)
    val stackExpr = s"stack(${xs.length}, " + xs.indices.map(i =>
      s"${xs(i)}L, lt_$i, gt_$i").mkString(", ") +
      ") AS (xv, lt_cnt, gt_cnt)"
    val longForm = withCums.select(col("y"), expr(stackExpr))
    val pairAgg = pinned
      .join(longForm.withColumnRenamed("y", "y2"),
        col("y") === col("y2") && col("xv") > col("x"))
      .agg(
        coalesce(sum(expr("c * gt_cnt")), lit(0L)).as("nc"),
        coalesce(sum(expr("c * lt_cnt")), lit(0L)).as("nd"))
    val margins = pinned.agg(
      sum("c").as("n"),
      sum(expr("c * (c - 1) div 2")).as("txy"))
    val tx = pinned.groupBy("x").agg(sum("c").as("cx"))
      .agg(sum(expr("cx * (cx - 1) div 2")).as("n1"))
    val ty = pinned.groupBy("y").agg(sum("c").as("cy"))
      .agg(sum(expr("cy * (cy - 1) div 2")).as("n2"))
    pairAgg.crossJoin(broadcast(margins))
      .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"), col("nc"), col("nd"),
        expr("CAST(CASE WHEN nc < nd THEN -1 WHEN nc > nd THEN 1 " +
          "ELSE 0 END AS INTEGER)").as("tau_sign"),
        expr("CAST(CASE WHEN (n * (n - 1) div 2 - n1) = 0 " +
          "OR (n * (n - 1) div 2 - n2) = 0 THEN 0 ELSE " +
          "(CAST(nc - nd AS DECIMAL(38,0)) * (nc - nd) * 1000000) div " +
          "(CAST(n * (n - 1) div 2 - n1 AS DECIMAL(38,0)) * " +
          "(n * (n - 1) div 2 - n2)) END AS BIGINT)").as("tau2_ppm"))
  }

  /** Trim fraction denominator for [[trimmedStats]] (10% each side). */
  val TrimDen = 10L

  /** Trimmed and winsorized order-value means per region — the robust
    * location estimates (Tukey 1962) a metrics pipeline reports next to
    * the raw mean when heavy tails are suspected: drop (trimmed) or
    * clamp (winsorized) the lowest/highest n div [[TrimDen]] values per
    * group. Everything exact integer: per-region rank with the orderkey
    * tie-break (total order), boundary values lifted by conditional
    * window max, means as `sum div count` — cell-identical in both
    * engines, no float percentile anywhere.
    *
    * Scale shape: ONE region-keyed exchange shared by the rank and the
    * boundary windows (same partitioning), then a region-keyed agg —
    * no global sort, no broadcast of fact volume. Groups here are
    * regions; any high-cardinality group key shards the same way.
    * Gate `q_trimmed_stats`.
    */
  def trimmedStats(s: SparkSession, d: String): DataFrame = {
    val rows = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(t(s, d, "customer").select(
        col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
      .join(broadcast(t(s, d, "nation").select(
        col("n_nationkey").as("c_nationkey"), col("n_regionkey"))),
        "c_nationkey")
      .join(broadcast(t(s, d, "region").select(
        col("r_regionkey").as("n_regionkey"), col("r_name"))),
        "n_regionkey")
    val byR = Window.partitionBy("r_name")
    val ranked = rows
      .withColumn("rnk", row_number().over(
        byR.orderBy(col("cents"), col("o_orderkey"))))
      .withColumn("nr", count(lit(1)).over(byR))
      .withColumn("lo", expr(s"nr div $TrimDen"))
      .withColumn("hi", col("nr") - col("lo"))
      .withColumn("lo_val",
        max(when(col("rnk") === col("lo") + 1, col("cents"))).over(byR))
      .withColumn("hi_val",
        max(when(col("rnk") === col("hi"), col("cents"))).over(byR))
      .withColumn("wins", when(col("rnk") <= col("lo"), col("lo_val"))
        .when(col("rnk") > col("hi"), col("hi_val"))
        .otherwise(col("cents")))
    ranked.groupBy("r_name")
      .agg(count(lit(1)).as("n"), max("lo").as("n_trim_side"),
        sum("cents").as("sum_cents"),
        sum(when(col("rnk") > col("lo") && col("rnk") <= col("hi"),
          col("cents")).otherwise(0L)).as("trim_sum"),
        sum(when(col("rnk") > col("lo") && col("rnk") <= col("hi"), 1L)
          .otherwise(0L)).as("trim_n"),
        sum("wins").as("wins_sum"))
      .select(col("r_name"), col("n"), col("n_trim_side"),
        expr("sum_cents div n").as("mean_cents"),
        expr("CASE WHEN trim_n = 0 THEN 0 ELSE trim_sum div trim_n END")
          .as("trimmed_mean_cents"),
        expr("wins_sum div n").as("winsor_mean_cents"))
      .orderBy("r_name")
  }

  /** Join-key skew report for the lineitem fact's order key — the
    * pre-shuffle diagnostic that predicts whether a straight hash join
    * needs salting ([[saltedGroupAgg]]) before anyone pays for the
    * skewed run: per-key counts collapse to a COUNT-OF-COUNTS histogram
    * (keys with equal counts are interchangeable in sorted order), and
    * every statistic — max share, lower-rank p50/p99, the exact Gini —
    * derives from that bounded frame:
    *
    *   gini = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx),   x sorted ascending
    *
    * with the doubled form T = Σ_runs cnt·(2·cumk·nk + nk·(nk+1)) kept
    * in DECIMAL(38) throughout (cumk·nk ≈ 10²⁰ at corpus scale — past
    * Long; no intermediate division anywhere, so no truncation-order
    * trap). All ppm fields are exact non-negative integer divisions.
    *
    * Scale shape: one key-keyed count (the only data-sized shuffle),
    * one histogram aggregation, windows over the DISTINCT-COUNT-VALUES
    * frame (bounded by the count range, not by keys — the
    * madFromHistogram posture). Gate `q_key_skew`.
    */
  def keySkew(s: SparkSession, d: String): DataFrame = {
    val counts = t(s, d, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
    val hist = counts.groupBy("cnt").agg(count(lit(1)).as("nk"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("cnt")
    val h2 = hist
      .withColumn("cumk_before", coalesce(sum("nk").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .withColumn("cumk", col("cumk_before") + col("nk"))
      .withColumn("t_run", expr(
        "CAST(cnt AS DECIMAL(38,0)) * (2 * CAST(cumk_before AS " +
          "DECIMAL(38,0)) * nk + CAST(nk AS DECIMAL(38,0)) * (nk + 1))"))
    val tot = h2.agg(sum("nk").as("n_keys"),
      sum(expr("CAST(cnt AS DECIMAL(38,0)) * nk")).as("n_rows_d"),
      max("cnt").as("max_cnt"), sum("t_run").as("t2"))
      .withColumn("n_rows", col("n_rows_d").cast("long"))
    def rankPick(rankExpr: String, out: String) =
      h2.crossJoin(broadcast(tot.select("n_keys")))
        .where(col("cumk") >= expr(rankExpr))
        .agg(min("cnt").as(out))
    val p50 = rankPick("(n_keys + 1) div 2", "p50_cnt")
    val p99 = rankPick("(99 * n_keys + 99) div 100", "p99_cnt")
    tot.crossJoin(broadcast(p50)).crossJoin(broadcast(p99))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        expr("max_cnt * 1000000 div n_rows").as("max_share_ppm"),
        col("p50_cnt"), col("p99_cnt"),
        expr("CAST((t2 - (n_keys + 1) * CAST(n_rows AS DECIMAL(38,0))) " +
          "* 1000000 div (CAST(n_keys AS DECIMAL(38,0)) * n_rows) " +
          "AS BIGINT)").as("gini_ppm"))
  }

  /** Snapshot reconciliation: diff two versions of the orders table by
    * primary key and classify every key as added / removed / changed /
    * unchanged with per-class counts and value sums — the audit a
    * pipeline runs after a load to see WHAT a refresh did (the
    * row-count-only check merge modes get for free misses silent value
    * drift). v2 is CRAFTED from v1 by key arithmetic (the oracle
    * replays it): keys ≡ 3 (mod 97) deleted, keys ≡ 5 (mod 13) get
    * +500 cents, keys ≡ 7 (mod 101) re-inserted under fresh ids past
    * the key max.
    *
    * Scale shape: ONE full outer join on the primary key (both sides
    * hash-partition on it) comparing integer cents; the classification
    * is per-row; output is 4 summary rows. Gate `q_snapshot_diff`.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = t(s, d, "orders").select(col("o_orderkey").as("k"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val maxK = v1.agg(max("k")).head.getLong(0)
    val kept = v1.where(col("k") % 97 =!= 3)
      .select(col("k"),
        when(col("k") % 13 === 5, col("cents") + 500)
          .otherwise(col("cents")).as("cents"))
    val inserted = v1.where(col("k") % 101 === 7)
      .select((col("k") + maxK + 1).as("k"), col("cents"))
    val v2 = kept.unionByName(inserted)
    v1.select(col("k"), col("cents").as("c1"))
      .join(v2.select(col("k"), col("cents").as("c2")), Seq("k"), "full_outer")
      .withColumn("change_type",
        when(col("c2").isNull, "removed")
          .when(col("c1").isNull, "added")
          .when(col("c1") =!= col("c2"), "changed")
          .otherwise("unchanged"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n"),
        coalesce(sum("c1"), lit(0L)).as("sum_cents_v1"),
        coalesce(sum("c2"), lit(0L)).as("sum_cents_v2"))
      .orderBy("change_type")
  }

  /** ABC (Pareto) classification of parts by revenue: parts sorted by
    * revenue descending, class A while the running revenue share stays
    * ≤ 80%, B ≤ 95%, C for the tail — the inventory-analytics banding,
    * with the share comparison CROSS-MULTIPLIED (cum·100 vs pct·total)
    * so no division happens at all. Ties order by (revenue desc,
    * partkey) — total and deterministic.
    *
    * Scale shape: one lineitem aggregation keyed on partkey, then a
    * global-order running sum over the CATALOG-sized part frame (a
    * range exchange — the id-islands posture; catalogs sort, fact
    * tables wouldn't). Gate `q_abc_classification`.
    */
  def abcClassification(s: SparkSession, d: String): DataFrame = {
    val rev = t(s, d, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .groupBy("l_partkey").agg(sum("cents").as("revenue_cents"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("revenue_cents").desc, col("l_partkey"))
    rev.crossJoin(broadcast(rev.agg(sum("revenue_cents").as("total"))))
      .withColumn("cum_cents", sum("revenue_cents").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .withColumn("abc_class",
        when(col("cum_cents") * 100 <= col("total") * 80, "A")
          .when(col("cum_cents") * 100 <= col("total") * 95, "B")
          .otherwise("C"))
      .select(col("l_partkey").as("p_partkey"), col("revenue_cents"),
        col("cum_cents"), col("abc_class"))
      .orderBy(col("revenue_cents").desc, col("p_partkey"))
  }

  /** GINI COEFFICIENT of customer spend per region — the inequality
    * profile of the revenue base (Gini 0 = every customer spends the
    * same; → 1 = one whale carries the region), via the exact
    * rank-weighted identity on the VALUE HISTOGRAM:
    *
    *   G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx)          (x ascending)
    *     = ( Σ_v x·c·(2F + c) − n·S ) / (n·S)
    *
    * where per distinct value v: c = customers at v, F = customers
    * strictly below v, S = total cents — so the rank sum needs NO
    * per-customer global sort, only a prefix sum over the
    * value-histogram frame (the calibration/RFM two-phase posture).
    * Ties collapse into one histogram row, making the result
    * order-independent; exact integers end-to-end (gini_ppm =
    * num·10⁶ div (n·S); DECIMAL(38) holds x·c·2n to 10²⁷-scale).
    *
    * Scale shape: one custkey aggregation over orders (map-side
    * combined), one custkey-keyed join against customer (both sides
    * key-partitioned; nation/region broadcast), then ONE histogram
    * aggregation — the per-region prefix window runs over distinct
    * spend values, not customers. Gate `q_gini_spend`.
    */
  def giniSpend(s: SparkSession, d: String): DataFrame = {
    val spend = t(s, d, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("x"))
    val cust = t(s, d, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    val nat = t(s, d, "nation")
      .select(col("n_nationkey").as("c_nationkey"), col("n_regionkey"))
    val reg = t(s, d, "region")
      .select(col("r_regionkey").as("n_regionkey"), col("r_name"))
    val hist = spend.join(cust, "o_custkey")
      .join(broadcast(nat), "c_nationkey")
      .join(broadcast(reg), "n_regionkey")
      .groupBy("r_name", "x").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("r_name").orderBy("x")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    hist.withColumn("f", coalesce(sum("c").over(w), lit(0L)))
      .groupBy("r_name")
      .agg(sum("c").as("n_customers"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * c")).as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * c * (2 * f + c)")).as("a"))
      .select(col("r_name"), col("n_customers"),
        expr("CAST(s AS BIGINT)").as("total_cents"),
        expr("CAST((a - CAST(n_customers AS DECIMAL(38,0)) * s) * 1000000" +
          " div (CAST(n_customers AS DECIMAL(38,0)) * s) AS BIGINT)")
          .as("gini_ppm"))
      .orderBy("r_name")
  }

  /** FUNCTIONAL-DEPENDENCY profile over five candidate FDs — the schema-
    * discovery diagnostic (does X determine Y in the data?) a warehouse
    * runs before trusting a column as a grouping key or a dimension
    * attribute: per candidate X→Y, the determinant-group count, how many
    * groups carry >1 distinct dependent value (violations), the exact
    * violation share in ppm and the worst group's dependent cardinality.
    * `viol_ppm = 0` certifies the FD holds exactly on this corpus.
    *
    * Scale shape: per FD one (X, Y)-level two-phase distinct aggregation
    * (map-side combined — countDistinct plans as partial sets) and a
    * 1-row rollup; the five frames union. No joins, never all-pairs.
    * Gate `q_fd_profile`.
    */
  def fdProfile(s: SparkSession, d: String): DataFrame = {
    def fd(name: String, df: DataFrame, det: String, dep: String)
        : DataFrame =
      df.groupBy(col(det).as("k")).agg(countDistinct(col(dep)).as("card"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("card") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("card").as("max_card"))
        .select(lit(name).as("fd"), col("n_groups"), col("n_violating"),
          expr("n_violating * 1000000L div n_groups").as("viol_ppm"),
          col("max_card"))
    fd("customer.nation->segment", t(s, d, "customer"),
        "c_nationkey", "c_mktsegment")
      .unionByName(fd("documents.source->lang", t(s, d, "documents"),
        "source", "lang"))
      .unionByName(fd("events.user->type", t(s, d, "events"),
        "user_id", "event_type"))
      .unionByName(fd("lineitem.part->supp", t(s, d, "lineitem"),
        "l_partkey", "l_suppkey"))
      .unionByName(fd("orders.cust->priority", t(s, d, "orders"),
        "o_custkey", "o_orderpriority"))
      .orderBy("fd")
  }

  def idIslands(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"))
      .withColumn("grp", col("doc_id") -
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("doc_id")))
      .groupBy("grp")
      .agg(min("doc_id").as("island_start"), max("doc_id").as("island_end"),
        count(lit(1)).as("island_len"))
      .select("island_start", "island_end", "island_len")
      .orderBy("island_start")
}
