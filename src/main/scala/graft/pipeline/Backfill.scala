package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.Warehouse

/** Time-partition grain for materialized assets — the reference's
  * Daily/MonthlyPartitionDefinitionModel (mozart_etl/lib/
  * executable_component.py:19-28) as partition-key derivations over a
  * date/timestamp column. Keys are zero-padded strings so lexicographic
  * order == chronological order (range predicates prune directories).
  */
sealed abstract class PartitionGrain(val name: String, pattern: String,
                                     javaPattern: String) {
  /** Partition key expression for a row's event date. */
  def key(c: Column): Column = date_format(c, pattern)
  def keyOf(d: LocalDate): String =
    java.time.format.DateTimeFormatter.ofPattern(javaPattern).format(d)
  /** All keys in `[from, untilExcl)` — the ranged run's write set. */
  def keys(from: LocalDate, untilExcl: LocalDate): Seq[String]
}
object PartitionGrain {
  case object Daily extends PartitionGrain("daily", "yyyy-MM-dd", "yyyy-MM-dd") {
    def keys(from: LocalDate, untilExcl: LocalDate): Seq[String] =
      Iterator.iterate(from)(_.plusDays(1)).takeWhile(_.isBefore(untilExcl))
        .map(keyOf).toSeq
  }
  case object Monthly extends PartitionGrain("monthly", "yyyy-MM", "yyyy-MM") {
    def keys(from: LocalDate, untilExcl: LocalDate): Seq[String] =
      Iterator.iterate(from.withDayOfMonth(1))(_.plusMonths(1))
        .takeWhile(_.isBefore(untilExcl)).map(keyOf).toSeq
  }
  def parse(s: String): PartitionGrain = s match {
    case "daily" => Daily
    case "monthly" => Monthly
    case other => throw new IllegalArgumentException(
      s"unknown partition grain: $other (daily|monthly)")
  }
}

/** Partition-aware materialization with ranged backfill — the execution of
  * the reference's partition definitions + `single_run` BackfillPolicy
  * (executable_component.py:34-41): "materialize 1996-01-01..1996-04-01"
  * runs as ONE Spark job writing every partition in the range, not one job
  * per partition.
  *
  * Scale mechanics:
  *  - the source filter is a plain timestamp range, so it pushes into the
  *    parquet scan (min/max row-group skipping);
  *  - the target is a partition-column managed table; re-runs replace the
  *    DECLARED range (every partition in it is dropped, then the batch
  *    appends), leaving all history outside the range untouched — an
  *    all-partition Overwrite would truncate it, and touched-partition
  *    overwrite could not clear a partition whose source rows vanished;
  *  - downstream equality/range filters on the partition key prune
  *    directories at plan time (PartitionFilters in the scan).
  */
object PartitionedMaterializer {

  val DefaultPartCol = "part_key"

  /** Materialize `[from, untilExcl)` of `source` (keyed by `dateCol`) into
    * the partitioned managed table `db.table` in one ranged run. Creates
    * the table on first run. Returns the partition keys of the range.
    */
  def backfill(spark: SparkSession, source: DataFrame, dateCol: String,
               grain: PartitionGrain, db: String, table: String,
               from: LocalDate, untilExcl: LocalDate,
               partCol: String = DefaultPartCol): Seq[String] = {
    require(from.isBefore(untilExcl), s"empty backfill range [$from, $untilExcl)")
    // The batch filter and the partition write-set MUST cover the same rows:
    // a range that starts or ends mid-partition would tag a PARTIAL month/day
    // with its partition key and dynamic overwrite would replace the whole
    // partition with the fragment — silent data loss. Fail loud instead.
    require(from == alignDown(grain, from) && untilExcl == alignDown(grain, untilExcl),
      s"backfill range [$from, $untilExcl) is not aligned to ${grain.name} " +
        "partition boundaries")
    val batch = rangedBatch(source, dateCol, grain, from, untilExcl, partCol)
    val fq = s"`$db`.`$table`"
    // make the table whole from any crashed maintenance op BEFORE the
    // range drop (same entry contract as merge/delete/evolve): without
    // this, a surviving partition tmp from a crashed merge would later
    // auto-recover OVER the partitions this backfill just rewrote,
    // silently regressing them to pre-crash data. UNCONDITIONAL — a
    // crashed full-swap can leave the tmp as the ONLY copy with the
    // target dropped; gating on tableExists would skip exactly that
    // state, create a batch-only table, and let the surviving tmp later
    // auto-recover OVER it (the recover calls are cheap no-ops when no
    // tmp survives and handle a missing target themselves).
    Warehouse.recoverReplacement(spark, db, table)
    Warehouse.recoverRewrite(spark, db, table)
    Warehouse.recoverEvolve(spark, db, table)
    if (!spark.catalog.tableExists(s"$db.$table")) {
      Warehouse.saveModel(batch, db, table, Seq(partCol))
    } else {
      // DECLARED-RANGE replacement, not touched-partition replacement:
      // every partition in [from, untilExcl) is dropped, then the batch
      // appends. Dynamic partition overwrite would only replace partitions
      // the batch has rows for — a corrective re-run could never CLEAR a
      // partition whose source rows disappeared, leaving stale data. Drop
      // is a metadata op (chunked multi-partition ALTER); the append is
      // one job with positional columns aligned to the catalog order
      // (partition column last after partitionBy-create). Not atomic: a
      // concurrent reader can see the range empty mid-run — same exposure
      // window as an overwrite commit, acceptable for a maintenance op.
      val cols = spark.table(fq).columns
      grain.keys(from, untilExcl).grouped(100).foreach { chunk =>
        val specs = chunk.map(k => s"PARTITION (`$partCol`='$k')").mkString(", ")
        spark.sql(s"ALTER TABLE $fq DROP IF EXISTS $specs")
      }
      batch.select(cols.map(col).toIndexedSeq: _*)
        .write.mode(SaveMode.Append).insertInto(fq)
    }
    grain.keys(from, untilExcl)
  }

  /** The ranged run's write batch: a plain timestamp-range filter (pushes
    * into the parquet scan — min/max row-group skipping) plus the derived
    * partition key. Factored out so plan audits can show the WRITE side's
    * scan shape without executing a backfill.
    */
  def rangedBatch(source: DataFrame, dateCol: String, grain: PartitionGrain,
                  from: LocalDate, untilExcl: LocalDate,
                  partCol: String = DefaultPartCol): DataFrame =
    source
      .filter(col(dateCol) >= lit(from.toString).cast("timestamp") &&
        col(dateCol) < lit(untilExcl.toString).cast("timestamp"))
      .withColumn(partCol, grain.key(col(dateCol)))

  private def alignDown(grain: PartitionGrain, d: LocalDate): LocalDate =
    grain match {
      case PartitionGrain.Daily => d
      case PartitionGrain.Monthly => d.withDayOfMonth(1)
    }

  /** Event-time-partitioned APPEND — the streaming-ingest shape: each
    * micro-batch (or incremental batch) accretes rows into the partitions
    * its event dates land in. Complements [[backfill]]: append is the
    * forward path, ranged backfill the corrective rewrite, and
    * Warehouse.compact the small-file maintenance those appends make
    * necessary.
    */
  def appendPartitioned(df: DataFrame, dateCol: String, grain: PartitionGrain,
                        db: String, table: String,
                        partCol: String = DefaultPartCol): Unit = {
    val spark = df.sparkSession
    // a null event time would land in the default (__HIVE_DEFAULT_PARTITION__)
    // partition, which no date-ranged backfill can ever clear — such rows
    // are undatable and REFUSED loudly, the same contract as the sibling
    // partition-rewriting paths (a silent filter here was strictly worse:
    // ingest-path data loss with no signal, while the same rows through
    // mergeUpsert failed with "batch has NULL partition values")
    require(df.filter(col(dateCol).isNull).limit(1).isEmpty,
      s"appendPartitioned: batch has NULL `$dateCol` values — undatable " +
        "rows cannot land in a time-partitioned table; filter or repair " +
        "them upstream")
    val withKey = df.withColumn(partCol, grain.key(col(dateCol)))
    // same crash-recovery entry contract as backfill, and UNCONDITIONAL
    // for the same reason: a crashed full-swap leaves the tmp as the only
    // copy with the target dropped — healing must run BEFORE the
    // tableExists branch or the append creates a batch-only table the
    // surviving tmp later recovers over
    Warehouse.recoverReplacement(spark, db, table)
    Warehouse.recoverRewrite(spark, db, table)
    Warehouse.recoverEvolve(spark, db, table)
    if (!spark.catalog.tableExists(s"$db.$table"))
      Warehouse.saveModel(withKey, db, table, Seq(partCol))
    else {
      val cols = spark.table(s"`$db`.`$table`").columns
      withKey.select(cols.map(col).toIndexedSeq: _*)
        .write.mode(SaveMode.Append).insertInto(s"`$db`.`$table`")
    }
  }

  /** Partition-GRAIN evolution over a bounded range — changing a table
    * from daily to monthly partitions (or back) without a manual full
    * rebuild: the range's old-grain partitions are read through plan-time
    * partition pruning (ONLY they are scanned — the bounded rewrite set),
    * the partition key is re-derived from the event date at the new
    * grain, and the swap runs through the evolve-tmp mechanics
    * ([[Warehouse.evolveReplacePartitions]]) whose manifest-carrying temp
    * table makes the drop+append window crash-recoverable — the same
    * contract as the partition-scoped merge/delete. Everything outside
    * the range keeps its grain and its FILES (bit-identical, tested).
    *
    * The range must align to the COARSER grain's boundaries (months, for
    * daily↔monthly): a mid-month cut would leave a month split across two
    * grains with the same key prefix semantics but different coverage.
    * A re-run over an already-evolved range is a no-op (the old-grain
    * keys no longer exist, the replacement slice is empty). A 100 TB
    * table evolves range-by-range on the maintenance schedule — each run
    * rewrites only its range's partitions.
    */
  def evolveGrain(spark: SparkSession, db: String, table: String,
                  dateCol: String, fromGrain: PartitionGrain,
                  toGrain: PartitionGrain, from: LocalDate,
                  untilExcl: LocalDate,
                  partCol: String = DefaultPartCol): Seq[String] = {
    require(from.isBefore(untilExcl), s"empty evolve range [$from, $untilExcl)")
    require(fromGrain != toGrain, "evolve needs two different grains")
    require(from == from.withDayOfMonth(1) &&
      untilExcl == untilExcl.withDayOfMonth(1),
      s"evolve range [$from, $untilExcl) is not aligned to month " +
        "boundaries (the coarser grain)")
    // make the table whole from any crashed maintenance op before
    // planning over it — same entry contract as merge/delete (incl. the
    // full-swap tmp: planning over a partial target left by a crashed
    // compact would evolve half a table)
    Warehouse.recoverEvolve(spark, db, table)
    Warehouse.recoverReplacement(spark, db, table)
    Warehouse.recoverRewrite(spark, db, table)
    val oldKeys = fromGrain.keys(from, untilExcl)
    val slice = spark.table(s"`$db`.`$table`")
      .filter(col(partCol).isin(oldKeys: _*))   // plan-time pruning
      .withColumn(partCol, toGrain.key(col(dateCol)))
    Warehouse.evolveReplacePartitions(spark, db, table, partCol, oldKeys, slice)
    toGrain.keys(from, untilExcl)
  }

  /** One materialized partition's rows (the per-partition inspection
    * surface; deterministic when ordered by the caller).
    */
  def partition(spark: SparkSession, db: String, table: String,
                key: String, partCol: String = DefaultPartCol): DataFrame =
    spark.table(s"`$db`.`$table`").filter(col(partCol) === key)
}
