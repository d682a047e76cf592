package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.pipeline.LinkIngest
import graft.ops.LinkOps

/** Streaming link-graph maintenance: streamed fact state bit-equal to a
  * fresh full build (facts AND the derived authority walk), crash-window
  * healing through the row-idempotent append + rebuild, and the loud
  * refusals (append-only fence, rogue-overlap content proof).
  */
class LinkIngestSpec extends SparkSpec {

  import spark.implicits._

  private def dump(db: String, tbl: String, cols: String*): Seq[Seq[Any]] =
    spark.table(s"`$db`.`$tbl`").select(cols.map(col).toIndexedSeq: _*)
      .orderBy(cols.map(col).toIndexedSeq: _*)
      .collect().toSeq.map(_.toSeq)

  private val FactCols =
    Seq("doc_id", "page_domain", "target_domain", "is_external")
  private val AuthCols = Seq("domain", "n_out", "n_in", "rank_fp")

  test("streamed graph bit-equal to fresh build; crash heals; refusals") {
    implicit val sq = spark.sqlContext
    val db = "links_stream_db"
    for (d <- Seq(db, "links_stream_full", "links_stream_full2"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "source")
    LinkIngest.buildLinkFacts(spark, docs.filter(col("doc_id") < 300), db)
    val rest = docs.filter(col("doc_id") >= 300)
      .as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "source").writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch(LinkIngest.linkIngestSink("linkStream", db))
      .start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // this session read the tables during the base build; re-list what the
    // stream's cloned session appended (the refresh contract)
    graft.store.Warehouse.refreshDb(spark, db)
    LinkIngest.buildLinkFacts(spark, docs, "links_stream_full")
    assert(dump(db, LinkIngest.LinkFactsTable, FactCols: _*) ==
      dump("links_stream_full", LinkIngest.LinkFactsTable, FactCols: _*),
      "streamed facts diverged from the fresh build")
    assert(dump(db, LinkOps.AuthorityTable, AuthCols: _*) ==
      dump("links_stream_full", LinkOps.AuthorityTable, AuthCols: _*),
      "streamed authority diverged from the fresh walk")

    // committed-epoch replay is a pure no-op
    val before = spark.table(s"$db.${LinkIngest.LinkFactsTable}").count()
    LinkIngest.linkIngestBatch(spark, "linkStream",
      b2.toIndexedSeq.toDF("doc_id", "source"), db, epochId = 1L)
    assert(spark.table(s"$db.${LinkIngest.LinkFactsTable}").count() == before)

    // a fully-stale batch under a FRESH epoch trips the append-only fence
    val e = intercept[IllegalArgumentException] {
      LinkIngest.linkIngestBatch(spark, "linkStream",
        b1.take(1).toIndexedSeq.toDF("doc_id", "source"), db, epochId = 7L)
    }
    assert(e.getMessage.contains("append-only"))

    // crash between the fact append and the rebuild/fence — redelivery
    // heals: the row-idempotent append lands nothing twice, the rebuild
    // lands the authority the facts imply
    val b3 = Seq((9000L, "src3"), (9001L, "src4")).toDF("doc_id", "source")
    intercept[RuntimeException] {
      LinkIngest.linkIngestBatch(spark, "linkStream", b3, db,
        epochId = 2L, failAfter = true)
    }
    LinkIngest.linkIngestBatch(spark, "linkStream", b3, db, epochId = 2L)
    graft.store.Warehouse.refreshDb(spark, db)
    // NOTE: per-(doc, page, target, ext) duplicates are NOT evidence of a
    // double-append here — b3's sources are decoupled from the doc_id
    // arithmetic, so a promo link can legitimately self-loop onto the
    // page's own domain and shadow the /about fact projection in ANY
    // build. The double-append detector is bit-equality of the whole fact
    // table against the fresh union build (a replayed append would carry
    // every b3 row twice and fail it).
    LinkIngest.buildLinkFacts(spark,
      docs.unionByName(b3), "links_stream_full2")
    assert(dump(db, LinkIngest.LinkFactsTable, FactCols: _*) ==
      dump("links_stream_full2", LinkIngest.LinkFactsTable, FactCols: _*),
      "post-crash facts diverged from the fresh build over the union")
    assert(dump(db, LinkOps.AuthorityTable, AuthCols: _*) ==
      dump("links_stream_full2", LinkOps.AuthorityTable, AuthCols: _*),
      "post-crash authority diverged from the fresh walk over the union")

    // an overlapping id with a DIFFERENT source emits different link rows
    // (same row COUNT — doc_id arithmetic — which is exactly why the
    // proof compares the rows, not the count): refused loudly
    val rogue = Seq((9001L, "src15"), (9050L, "src2"))
      .toDF("doc_id", "source")
    val e2 = intercept[IllegalArgumentException] {
      LinkIngest.linkIngestBatch(spark, "linkStream", rogue, db,
        epochId = 3L)
    }
    assert(e2.getMessage.contains("DIFFERENT link rows"))
    for (d <- Seq(db, "links_stream_full", "links_stream_full2"))
      spark.sql(s"DROP DATABASE IF EXISTS `$d` CASCADE")
  }

  test("ingest without a prior build is refused") {
    spark.sql("DROP DATABASE IF EXISTS `links_nobuild` CASCADE")
    val e = intercept[IllegalArgumentException] {
      LinkIngest.linkIngestBatch(spark, "x",
        Seq((1L, "src1")).toDF("doc_id", "source"), "links_nobuild")
    }
    assert(e.getMessage.contains("buildLinkFacts first"))
  }
}
