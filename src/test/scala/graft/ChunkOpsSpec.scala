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

  test("dedup rewrite: identical docs keep one full copy, the other collapses to markers") {
    val s0 = Tables.t(spark, sf, "documents")
      .orderBy("doc_id").select("text").head.getString(0)
    val out = graft.ops.ChunkOps.cdcDedupRewrite(spark, sf)
    // engine-level invariant on the real fixture: every document's chunk
    // count is conserved (survivors + excised), and no surviving text is
    // longer than the original
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val joined = out.join(docs, "doc_id").collect()
    assert(joined.length == 500)
    joined.foreach { r =>
      assert(r.getAs[String]("text_dedup").length
        <= r.getAs[String]("text").length)
    }
    // crafted identical pair through the raw operator pieces
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("chunk")
      .orderBy(col("doc_id").asc, col("chunk_pos").asc)
    val pieces = graft.ops.ChunkOps.chunksOf(
        docsDf(1L -> s0, 2L -> s0))
      .withColumn("rnk", row_number().over(w))
    val byDoc = pieces.groupBy("doc_id")
      .agg(sum((col("rnk") === 1).cast("long")).as("kept"),
        sum((col("rnk") > 1).cast("long")).as("cut"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byDoc(1L)._2 == 0L, "first doc must keep every chunk")
    assert(byDoc(2L)._1 == 0L, "identical second doc must keep none")
    // and across the corpus no chunk string survives twice
    val multiSurvivors = pieces.filter(col("rnk") === 1)
      .groupBy("chunk").count().filter(col("count") > 1).count()
    assert(multiSurvivors == 0L)
  }

  test("chunk-index appends feed later rewrites exactly; replays absorb; rogue dbs refuse") {
    import graft.ops.ChunkOps
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val c0 = docs.filter(col("doc_id") < 200)
    val b1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
    val b2 = docs.filter(col("doc_id") >= 350)
    for (db <- Seq("cdc_idx_grown", "cdc_idx_fresh"))
      spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    ChunkOps.buildChunkIndex(c0, "cdc_idx_grown")
    ChunkOps.appendToChunkIndex(spark, "cdc_idx_grown", b1)
    val grown = ChunkOps.cdcRewriteAgainst(b2, spark, "cdc_idx_grown")
      .collect().toSeq.map(_.toSeq)
    ChunkOps.buildChunkIndex(c0.unionByName(b1), "cdc_idx_fresh")
    assert(grown == ChunkOps.cdcRewriteAgainst(b2, spark, "cdc_idx_fresh")
      .collect().toSeq.map(_.toSeq),
      "append-grown index rewrite diverged from a fresh build over the union")
    // replayed append is absorbed by the existence anti-join
    val before = spark.table(s"cdc_idx_grown.${ChunkOps.ChunkIndexTable}")
      .count()
    ChunkOps.appendToChunkIndex(spark, "cdc_idx_grown", b1)
    graft.store.Warehouse.refreshDb(spark, "cdc_idx_grown")
    assert(spark.table(s"cdc_idx_grown.${ChunkOps.ChunkIndexTable}")
      .count() == before)
    // a table without the frozen layout property never serves
    spark.sql("CREATE DATABASE IF NOT EXISTS cdc_idx_rogue")
    spark.sql(s"CREATE TABLE cdc_idx_rogue.${ChunkOps.ChunkIndexTable} " +
      "(h STRING, bkt INT) USING parquet")
    val e = intercept[IllegalArgumentException](
      ChunkOps.cdcRewriteAgainst(b2, spark, "cdc_idx_rogue"))
    assert(e.getMessage.contains("num_buckets"))
  }

  test("law: native cdc_chunks ≡ the HOF SQL formulation, fixture + edges") {
    // the r14 native expression must reproduce the SQL-primitive
    // formulation bit for bit: whole fixture corpus plus adversarial
    // edges (empty, sub-window, exactly-window, multibyte incl. a
    // surrogate-pair emoji, boundary-at-end, long repetitive run)
    val edges = docsDf(
      1000L -> "", 1001L -> "x", 1002L -> "exactly8",
      1003L -> "한글 텍스트와 English가 섞인 문서입니다. 청크 규칙은 코드포인트 단위로 동작해야 합니다.",
      1004L -> "emoji 😀 inside 😀😀 the text",
      1005L -> ("ab" * 300), 1006L -> ("the quick brown fox " * 40))
    val fixture = Tables.t(spark, sf, "documents").select("doc_id", "text")
    for (docs <- Seq(fixture, edges)) {
      val native = ChunkOps.chunksOf(docs)
        .orderBy("doc_id", "chunk_pos").collect().toSeq
      val hof = ChunkOps.chunksOfHof(docs)
        .orderBy("doc_id", "chunk_pos").collect().toSeq
      assert(native == hof)
    }
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

  test("rag chunks: full coverage, overlap, last-window-short rule") {
    import ChunkOps.{RagChunkSize, RagStride}
    def toks(n: Int) = (1 to n).map("t" + _)
    // n = 100: chunks at 1..64 and 49..100 (short last window)
    val got = ChunkOps.ragChunks(docsDf((1L, toks(100).mkString(" "))))
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length === 2)
    assert(got(0) === ((0L, RagChunkSize.toLong,
      toks(100).take(RagChunkSize).mkString(" "))))
    assert(got(1) === ((1L, 100L - RagStride,
      toks(100).drop(RagStride).mkString(" "))))
    // short doc: one chunk, whole text
    val one = ChunkOps.ragChunks(docsDf((2L, "a b c"))).collect()
    assert(one.length === 1 && one.head.getString(3) === "a b c")
    // exact-boundary doc: exactly one chunk, no empty trailing window
    val exact = ChunkOps.ragChunks(
      docsDf((3L, toks(RagChunkSize).mkString(" ")))).collect()
    assert(exact.length === 1)
  }

  test("rag chunks: every token position is covered by some chunk") {
    val n = 200
    val text = (1 to n).map("w" + _).mkString(" ")
    val covered = ChunkOps.ragChunks(docsDf((1L, text)))
      .collect().flatMap(_.getString(3).split(" ")).toSet
    assert(covered === (1 to n).map("w" + _).toSet)
  }
}
