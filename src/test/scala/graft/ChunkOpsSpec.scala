package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ChunkOps

/** Content-defined chunking laws: lossless segmentation, the
  * boundary-alignment property that makes shared runs dedup, insertion
  * locality, and degenerate totality.
  */
class ChunkOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def chunksOf(rows: (Long, String)*): Map[Long, Seq[(Int, String)]] =
    ChunkOps.chunksOf(docsDf(rows: _*))
      .orderBy("doc_id", "chunk_pos").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("segmentation is lossless and ordered for every fixture document") {
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val rebuilt = ChunkOps.chunksOf(docs)
      .groupBy("doc_id")
      .agg(concat_ws("", array_sort(collect_list(
        struct(col("chunk_pos"), col("chunk")))).getField("chunk"))
        .as("rebuilt"))
    val broken = docs.join(rebuilt, Seq("doc_id"))
      .filter(col("text") =!= col("rebuilt")).count()
    assert(broken == 0L, "chunks must concatenate back to the exact text")
  }

  test("shared interior runs produce identical chunks across documents") {
    // two documents sharing a 100+ char run behind different prefixes:
    // cuts are a function of the 8-char window alone, so the run's
    // interior boundaries align and its interior chunks dedup exactly
    val shared = Tables.t(spark, sf, "documents")
      .orderBy("doc_id").select("text").head.getString(0).take(250)
    assert(shared.length >= 100)
    val m = chunksOf(1L -> s"zq $shared", 2L -> s"totally different lead $shared")
    val h1 = m(1L).map(_._2).toSet
    val h2 = m(2L).map(_._2).toSet
    assert((h1 intersect h2).nonEmpty,
      "no shared chunk despite a 100+-char shared run — boundaries failed " +
        "to align (the content-defined property)")
  }

  test("a front insertion shifts only local boundaries: the tail still dedups") {
    val base = Tables.t(spark, sf, "documents")
      .orderBy("doc_id").select("text").head.getString(0).take(250)
    val m = chunksOf(1L -> base, 2L -> ("X" + base))
    val common = m(1L).map(_._2).toSet intersect m(2L).map(_._2).toSet
    assert(common.nonEmpty,
      "one inserted char resynchronized nothing — fixed-size blocking, " +
        "not content-defined chunking")
  }

  test("degenerate inputs: empty text is zero chunks, short text one whole chunk") {
    val m = chunksOf(1L -> "", 2L -> "tiny", 3L -> "exactly8")
    assert(!m.contains(1L) || m(1L).isEmpty)
    assert(m(2L) == Seq((0, "tiny")))
    assert(m(3L).map(_._2).mkString == "exactly8")
    // gate form keeps every document with coalesced zero counts
    val stats = ChunkOps.cdcChunkStats(spark, sf).collect()
    assert(stats.length == 500)
    assert(stats.forall(r => r.getLong(1) >= 1))
  }
}
