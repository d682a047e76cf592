package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * posture, re-expressed Spark-first): a constraint suite compiles to ONE
  * aggregate pass per fact table — every row-level check folds into a
  * conditional sum inside the same `agg`, so adding a constraint adds a
  * column to an existing shuffle, never a new scan. Cross-table
  * referential checks are broadcast anti-joins against the (small) dim.
  *
  * The reference's pipeline trusts its sources blindly (extraction
  * `fetchall` → landing with no validation anywhere,
  * mozart_etl/lib/extract/connectors/base.py:84); at 100 TB a silent
  * upstream regression (dangling keys, nulled columns, enum drift)
  * poisons every derived table, so validation-as-an-operator is a
  * first-class pipeline stage here: verdict rows are exact integers
  * (violation counts + per-million rates via truncating division), fully
  * DuckDB-replayable.
  */
object ExpectationOps {

  /** One row-level constraint on a single table: `name` is the stable
    * verdict id, `violated` a boolean Column that is true on rows
    * violating the constraint (null-safe: the caller's predicate must
    * decide what null means — every builder below does).
    */
  final case class RowCheck(name: String, violated: Column)

  /** NOT NULL: a null is the violation. */
  def notNull(name: String, c: Column): RowCheck =
    RowCheck(name, c.isNull)

  /** Enum membership: null or out-of-set violates (a null status is drift,
    * not a pass — same rule as the oracle's `NOT IN` + null handling).
    */
  def inSet(name: String, c: Column, values: Seq[String]): RowCheck =
    RowCheck(name, c.isNull || !c.isin(values: _*))

  /** Closed-range containment: null or outside [lo, hi] violates. */
  def between(name: String, c: Column, lo: Double, hi: Double): RowCheck =
    RowCheck(name, c.isNull || c < lo || c > hi)

  /** Fold a table's row checks into one aggregate pass: each check is a
    * conditional sum; `uniqueCol` (when set) rides the same aggregate as
    * an exact distinct count (violations = rows − distinct non-null keys −
    * null keys are counted by their own notNull check, so a null key does
    * not double-report as a uniqueness violation).
    */
  def tableVerdicts(df: DataFrame, table: String, checks: Seq[RowCheck],
                    uniqueCol: Option[(String, Column)] = None): DataFrame = {
    // internal agg column names must stay dot-free — `col("a.b")` resolves
    // as a struct path, not the literal name
    def slot(n: String) = "v_" + n.replace('.', '_')
    val rowAggs = checks.map(ch =>
      sum(when(ch.violated, 1L).otherwise(0L)).as(slot(ch.name)))
    val uniqAggs = uniqueCol.toSeq.flatMap { case (_, c) => Seq(
      countDistinct(c).as("u_distinct"),
      sum(when(c.isNull, 1L).otherwise(0L)).as("u_nulls")) }
    val agg = df.agg(count(lit(1)).as("n_rows"), (rowAggs ++ uniqAggs): _*)
    val rowVerdicts = checks.map { ch =>
      agg.select(lit(ch.name).as("check_id"), lit(table).as("tbl"),
        col("n_rows"), col(slot(ch.name)).as("violations"))
    }
    val uniqVerdicts = uniqueCol.toSeq.map { case (name, _) =>
      agg.select(lit(name).as("check_id"), lit(table).as("tbl"),
        col("n_rows"),
        (col("n_rows") - col("u_distinct") - col("u_nulls")).as("violations"))
    }
    (rowVerdicts ++ uniqVerdicts).reduce(_.unionAll(_))
  }

  /** Referential containment `fact.fk ⊆ dim.pk`: violations = fact rows
    * whose non-null key finds no dim row — a broadcast LEFT ANTI join
    * (the dim is the small side by construction; the fact is scanned
    * once, never shuffled). Null keys are the notNull check's business.
    */
  def refVerdict(name: String, fact: DataFrame, fk: Column,
                 dim: DataFrame, pk: Column, table: String): DataFrame = {
    val dangling = fact.where(fk.isNotNull)
      .join(broadcast(dim.select(pk.as("__pk")).distinct()),
        fk === col("__pk"), "left_anti")
    val total = fact.agg(count(lit(1)).as("n_rows"))
    dangling.agg(count(lit(1)).as("violations"))
      .crossJoin(total)
      .select(lit(name).as("check_id"), lit(table).as("tbl"),
        col("n_rows"), col("violations"))
  }

  /** Attach the per-million violation rate (truncating integer division —
    * exact, oracle-identical) and the 0/1 pass verdict under a
    * zero-violations policy.
    */
  def withRates(verdicts: DataFrame): DataFrame =
    verdicts.select(col("check_id"), col("tbl"), col("n_rows"),
      col("violations"),
      when(col("n_rows") === 0L, 0L)
        .otherwise(expr("violations * 1000000L div n_rows")).as("viol_ppm"),
      when(col("violations") === 0L, 1).otherwise(0).as("ok"))

  // ---- streaming data quality: verdict counts as a delta-model family
  // (graft.pipeline.DeltaModelIngest). Row-level checks are ADDITIVE
  // (n_rows and violations sum across batches), so the exactly-once
  // machinery the LM/QC/DC count models use applies verbatim. Uniqueness
  // and referential checks are NOT additive (they need cross-batch state)
  // and deliberately stay batch-only — a streaming verdict that silently
  // under-counted cross-batch duplicates would be worse than none. ----

  /** The documents-stream check suite (row-level only, see above). */
  def docChecks: Seq[RowCheck] = Seq(
    notNull("documents.text.not_null", col("text")),
    notNull("documents.lang.not_null", col("lang")),
    between("documents.n_chars.range_0_1m", col("n_chars"), 0.0, 1e6))

  val CountsTable = "expectation_counts"

  def expectationsFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, CountsTable,
      Seq("check_id", "tbl"), Seq("n_rows", "violations"))

  /** Per-batch additive verdict rows for a documents-shaped batch. */
  def docBatchVerdicts(batch: DataFrame): DataFrame =
    tableVerdicts(batch, "documents", docChecks)

  /** foreachBatch adapter: exactly-once verdict growth — one
    * (source, epoch)-named overwrite delta per batch; redelivery lands
    * identical bytes.
    */
  def expectationsDeltaSink(srcTag: String, db: String)
      : (DataFrame, Long) => Unit =
    (batch, epochId) => graft.pipeline.DeltaModelIngest.append(
      batch.sparkSession, expectationsFamily(db), srcTag, epochId,
      docBatchVerdicts(batch))

  /** Full rebuild of the stored verdict counts (the cron re-anchor). */
  def buildExpectationCounts(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    val fam = expectationsFamily(db)
    val prevGen = graft.pipeline.DeltaModelIngest.prepareRebuild(s, fam)
    graft.store.Warehouse.saveModel(docBatchVerdicts(docs), db, CountsTable)
    graft.pipeline.DeltaModelIngest.finishRebuild(s, fam, prevGen)
  }

  /** Serve the accumulated verdicts (base ∪ deltas) with rates/flags —
    * the same [[withRates]] the batch gate applies.
    */
  def expectationsFromModel(s: SparkSession, db: String): DataFrame =
    withRates(graft.pipeline.DeltaModelIngest.effectiveCounts(
      s, expectationsFamily(db)))
      .orderBy("check_id")

  /** The canonical fixture suite: 7 constraints over orders/lineitem/
    * customer — key uniqueness, null policy, enum drift, range sanity,
    * referential integrity. One aggregate pass over orders, one over
    * lineitem, one broadcast anti-join. Gate `q_expectations`.
    */
  def expectations(s: SparkSession, d: String): DataFrame = {
    val orders   = t(s, d, "orders")
    val lineitem = t(s, d, "lineitem")
    val customer = t(s, d, "customer")
    val ordersV = tableVerdicts(orders, "orders", Seq(
      notNull("orders.o_custkey.not_null", col("o_custkey")),
      inSet("orders.o_orderstatus.in_set", col("o_orderstatus"),
        Seq("O", "F", "P")),
      between("orders.o_totalprice.non_negative", col("o_totalprice"),
        0.0, 1e12)),
      uniqueCol = Some(("orders.o_orderkey.unique", col("o_orderkey"))))
    val lineV = tableVerdicts(lineitem, "lineitem", Seq(
      between("lineitem.l_quantity.range_1_50", col("l_quantity"), 1.0, 50.0),
      between("lineitem.l_discount.range_0_1", col("l_discount"), 0.0, 1.0)))
    val refV = refVerdict("orders.o_custkey.ref_customer",
      orders, col("o_custkey"), customer, col("c_custkey"), "orders")
    withRates(ordersV.unionAll(lineV).unionAll(refV))
      .orderBy("check_id")
  }
}
