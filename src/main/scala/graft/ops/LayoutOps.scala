package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Data-layout operators — the write-side optimization a 100 TB corpus
  * needs beyond partitioning and bucketing: multi-dimensional clustering
  * (Morton/Z-order) so range predicates on SEVERAL columns each map to a
  * small contiguous slice of the written files, and parquet row-group
  * min/max stats can skip the rest. A lang-partitioned layout prunes lang
  * predicates only; a length-sorted layout prunes length only; the
  * interleaved key prunes both at once — the Delta/Iceberg `OPTIMIZE
  * ZORDER` posture, expressed as a plain deterministic column so the
  * arithmetic is oracle-checkable.
  *
  * Scale shape: the key is per-row bit arithmetic (whole-stage codegen,
  * zero shuffle); the export is ONE range exchange on the key + local
  * sorts — the [[SamplingOps.exportShuffledWrite]] class, never a global
  * single-partition sort.
  */
object LayoutOps {

  /** Bits kept per dimension (z key = 2·Bits wide). */
  val Bits = 16

  /** Morton interleave of two [[Bits]]-bit dimensions: x's bit b lands at
    * 2b, y's at 2b+1 — built as a literal sum of shift/mask terms so both
    * Spark codegen and the DuckDB replay evaluate the identical integer
    * expression.
    */
  private[graft] def mortonExpr(x: String, y: String): String =
    (0 until Bits).map { b =>
      s"(shiftleft(shiftright($x, $b) & 1, ${2 * b}) + " +
        s"shiftleft(shiftright($y, $b) & 1, ${2 * b + 1}))"
    }.mkString(" + ")

  /** The two clustering dimensions for the documents corpus, as exact
    * integers: the DENSE lexicographic language rank (0-based, from a
    * broadcast dimension table — sparse codes like raw ascii pairs waste
    * the bit budget and collapse the key into a few islands, the classic
    * z-order dimension-normalization rule) and the 16-bit-clamped
    * character length (the range-predicate dimension).
    */
  private[graft] def withZDims(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // language-count-sized frame: the single-partition window is over the
    // distinct dim values, never the corpus
    val langDim = docs.select("lang").distinct()
      .withColumn("lang_idx",
        (row_number().over(Window.orderBy("lang")) - 1).cast("long"))
    docs.join(broadcast(langDim), "lang")
      .withColumn("len16", least(col("n_chars"), lit(65535L)).cast("long"))
  }

  /** Per-document Z-order key + its 64-way bucket. The bucket grid spans
    * the OCCUPIED key range (width = (max_z + 1) div 64, one tiny
    * broadcast aggregate), not the full 2³²: real dimensions rarely fill
    * their bit budget, and a fixed high-bit bucket would collapse to one
    * value whenever they don't. Per-row otherwise, ordered for the gate.
    */
  def zOrderKey(s: SparkSession, d: String): DataFrame = {
    val keyed = withZDims(t(s, d, "documents"))
      .withColumn("z_key", expr(mortonExpr("lang_idx", "len16")))
    val mz = keyed.agg(coalesce(max("z_key"), lit(0L)).as("mz"))
    keyed.crossJoin(broadcast(mz))
      .withColumn("z_bucket", expr("z_key div greatest(1L, (mz + 1) div 64)"))
      .select("doc_id", "lang_idx", "len16", "z_key", "z_bucket")
      .orderBy("doc_id")
  }

  /** Write the corpus clustered by the Z-order key: one RANGE exchange on
    * the key (files get non-overlapping z slices), local sorts inside
    * each file so row groups carry tight lang/length min-max stats. A
    * reader filtering `lang = X AND n_chars BETWEEN a AND b` touches only
    * the files whose z slice intersects the query box.
    */
  def exportZOrderedWrite(s: SparkSession, d: String, outDir: String,
                          numFiles: Int = 8): Unit =
    zOrderKey(s, d)
      .repartitionByRange(numFiles, col("z_key"))
      .sortWithinPartitions("z_key")
      .write.mode("overwrite").parquet(outDir)
}
