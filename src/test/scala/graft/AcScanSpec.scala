package graft

import org.apache.spark.sql.functions._
import graft.ops.BlocklistOps
import graft.functions.AcScan

/** Aho-Corasick laws: nested/overlapping match completeness, the packed
  * order contract (end position, then term_id), the 1-based BYTE offset
  * contract on non-ASCII text, and the exploded gate shape.
  */
class AcScanSpec extends SparkSpec {

  import spark.implicits._

  private def spansOf(text: String): Seq[(Long, Int)] = {
    graft.functions.GraftFunctions.register(spark)
    val blob = AcScan.compile(BlocklistOps.AcTerms)
    spark.range(1).select(
        explode(call_function("ac_scan", lit(blob), lit(text))).as("m"))
      .select((col("m") bitwiseAND AcScan.TermMask).cast("int").as("tid"),
        shiftright(col("m"), AcScan.PosShift).as("pos"))
      .collect().map(r => (r.getLong(1), r.getInt(0))).toSeq
  }

  test("nested matches all surface: 'table' carries 'able'") {
    // terms: 0=able 1=table 2=an 3=scan 4='slow scan' 5='key agg'
    val got = spansOf("a table")
    assert(got.toSet == Set((4L, 0), (3L, 1)), got)
    // same end byte (7): term_id breaks the tie in the packed order
    assert(got == Seq((4L, 0), (3L, 1)))
  }

  test("phrase and word overlap: 'slow scan' yields phrase + word + 'an'") {
    val got = spansOf("slow scan")
    assert(got.toSet == Set((1L, 4), (6L, 3), (8L, 2)), got)
    // all three end at byte 9 — packed order is term_id ascending
    assert(got == Seq((8L, 2), (6L, 3), (1L, 4)))
  }

  test("positions are 1-based BYTE offsets (UTF-8), by contract") {
    // 'é' is two UTF-8 bytes: 'table' sits at char 7 but byte 8
    val got = spansOf("héllo table")
    assert(got.contains((8L, 1)), got)
  }

  test("no match → empty array; multiple occurrences all reported") {
    assert(spansOf("zzz").isEmpty)
    val got = spansOf("scan a scan")
    assert(got.filter(_._2 == 3).map(_._1).sorted == Seq(1L, 8L))
  }

  test("gate shape: exploded spans are (doc, pos, term)-deterministic") {
    val a = BlocklistOps.acScanSpans(spark, sf).collect()
    assert(a.nonEmpty)
    // substring truth: every reported span really is the term at that
    // byte position (ASCII fixture — substring arithmetic is exact)
    val texts = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    for (r <- a.take(500)) {
      val text = texts(r.getAs[Long]("doc_id"))
      val pos = r.getAs[Long]("pos").toInt
      val term = r.getAs[String]("term")
      assert(text.slice(pos - 1, pos - 1 + term.length) == term,
        s"span mismatch at $r")
    }
    val b = BlocklistOps.acScanSpans(spark, sf).collect()
    assert(a.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
  }

  test("randomized brute-force equivalence: 300 seeded texts, adversarial " +
      "term set with shared prefixes/suffixes") {
    // the DFA's fail links and merged outputs must agree with naive
    // substring search on EVERY text — a seeded sweep over a tiny
    // alphabet maximizes overlap collisions the fixture can't reach
    val terms = Seq("ab", "aba", "bab", "abab", "b", "aab", "ba")
    val blob = AcScan.compile(terms)
    val rnd = new scala.util.Random(421)
    for (_ <- 1 to 300) {
      val text = Seq.fill(rnd.nextInt(40))("ab".charAt(rnd.nextInt(2))).mkString
      val got = AcScan.scan(blob,
          org.apache.spark.unsafe.types.UTF8String.fromString(text))
        .toLongArray.toSeq
        .map(m => ((m >> AcScan.PosShift), (m & AcScan.TermMask).toInt))
        .sorted
      val want = (for {
        (t, tid) <- terms.zipWithIndex
        i <- 0 to text.length - t.length
        if text.startsWith(t, i)
      } yield ((i + 1).toLong, tid)).sorted
      assert(got == want, s"text '$text': got $got want $want")
    }
  }

  test("compile refuses empty terms and oversized term ids") {
    intercept[IllegalArgumentException](AcScan.compile(Seq.empty))
    intercept[IllegalArgumentException](AcScan.compile(Seq("a", "")))
  }
}
