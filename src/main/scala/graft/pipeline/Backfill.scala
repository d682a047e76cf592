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
  *  - the target is a partition-column managed table; re-runs write under
  *    dynamic partition overwrite, replacing exactly the partitions the
  *    batch touches and leaving all history outside the range untouched
  *    (an all-partition Overwrite would truncate it);
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
    val batch = source
      .filter(col(dateCol) >= lit(from.toString).cast("timestamp") &&
        col(dateCol) < lit(untilExcl.toString).cast("timestamp"))
      .withColumn(partCol, grain.key(col(dateCol)))
    val fq = s"`$db`.`$table`"
    if (!spark.catalog.tableExists(s"$db.$table")) {
      Warehouse.saveModel(batch, db, table, Seq(partCol))
    } else {
      // Positional insertInto: align to the catalog column order (data
      // columns first, partition column last after partitionBy-create).
      //
      // Dynamic overwrite needs `partitionOverwriteMode=dynamic`, which is
      // session conf — but flipping it on the SHARED session would race
      // with concurrent writers (TenantRegistry.runAll runs pipelines in
      // parallel on one session; a concurrent static Overwrite observing
      // the flip — or us observing its restore — truncates whole tables).
      // Instead the write runs on a cloned session (same SparkContext,
      // catalog and data, isolated conf); the batch crosses sessions via a
      // global temp view. insertInto ignores per-write options, so this is
      // the race-free route.
      val cols = spark.table(fq).columns
      val view = "graft_backfill_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      batch.createOrReplaceGlobalTempView(view)
      try {
        val writer = spark.newSession()
        writer.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        writer.table(s"global_temp.`$view`")
          .select(cols.map(col).toIndexedSeq: _*)
          .write.mode(SaveMode.Overwrite).insertInto(fq)
      } finally spark.catalog.dropGlobalTempView(view)
      // the write ran on the clone: drop the caller session's cached file
      // listing, or its next read resolves replaced partitions to dead files
      spark.catalog.refreshTable(s"$db.$table")
    }
    grain.keys(from, untilExcl)
  }

  private def alignDown(grain: PartitionGrain, d: LocalDate): LocalDate =
    grain match {
      case PartitionGrain.Daily => d
      case PartitionGrain.Monthly => d.withDayOfMonth(1)
    }

  /** One materialized partition's rows (the per-partition inspection
    * surface; deterministic when ordered by the caller).
    */
  def partition(spark: SparkSession, db: String, table: String,
                key: String, partCol: String = DefaultPartCol): DataFrame =
    spark.table(s"`$db`.`$table`").filter(col(partCol) === key)
}
