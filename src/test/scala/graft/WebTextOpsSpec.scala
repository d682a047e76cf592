package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.WebTextOps

/** Line-structure operator laws: the crafted-view fixture shape, the Gopher
  * repetition/format rule arithmetic on hand-built documents, corpus-level
  * line-dedup semantics (distinct-document counting, order-preserving
  * rewrite, full-drop totality) and the leakage-safe split's structural
  * no-straddle property over the real candidate pair set.
  */
class WebTextOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private def gopherRows(rows: (Long, String, String)*) =
    WebTextOps.gopherQualityFor(docsDf(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("lined fixture shape: base text is single-space delimited, non-empty") {
    // The crafted line view breaks lines at every 8th inter-token SPACE —
    // exact lines-of-8 semantics only on single-space text. Pin the
    // fixture shape so a future testdata change fails here, loudly.
    val bad = Tables.t(spark, sf, "documents")
      .filter(length(trim(col("text"))) === 0 ||
        col("text").rlike("  ") || col("text").rlike("^ ") ||
        col("text").rlike(" $"))
      .count()
    assert(bad == 0, s"$bad documents violate the lined-view fixture shape")
  }

  test("gopher: line accounting on a hand-built document") {
    // 16 tokens → 2 content lines; doc_id 60 ≡ 0 mod 3,4,5 → bullet +
    // ellipsis + newsletter×2 + header + footer = 8 lines total, the
    // newsletter pair the only within-doc duplicate.
    val toks = (1 to 16).map(i => s"tok$i").mkString(" ")
    val r = gopherRows((60L, toks, "src1"))(60L)
    assert(r.getAs[Long]("n_lines") == 8L)
    assert(r.getAs[Long]("n_dup_lines") == 1L)
    assert(r.getAs[Long]("dup_chars") == "subscribe to our newsletter".length.toLong)
    assert(r.getAs[Long]("n_bullet") == 1L)
    assert(r.getAs[Long]("n_ellipsis") == 1L)
  }

  test("gopher: each format rule drops independently at its threshold") {
    // A 100-token doc (passes word-count bounds; 4-char tokens pass mean
    // word length) whose id selects NO optional crafted lines (1 mod
    // 3,4,5): header + 13 content lines + footer = 15 distinct lines.
    val base = (1 to 100).map(i => f"t$i%03d").mkString(" ")
    val ids = Seq(1L, 7L, 11L, 13L)
    ids.foreach { id => assert(id % 3 != 0 && id % 4 != 0 && id % 5 != 0) }

    // keep: no rule trips
    val keep = gopherRows((1L, base, "s"))(1L)
    assert(keep.getAs[Int]("keep") == 1, s"clean doc must keep: $keep")

    // word count below 50 → drop (7 tokens, otherwise clean)
    val short = gopherRows((7L, (1 to 7).map(i => s"tk$i").mkString(" "), "s"))(7L)
    assert(short.getAs[Int]("keep") == 0, "under-50-token doc must drop")

    // mean word length over 10 → drop
    val longTok = (1 to 60).map(i => s"verylongtoken$i").mkString(" ")
    val fat = gopherRows((11L, longTok, "s"))(11L)
    assert(fat.getAs[Int]("n_nonspace").toLong >
      fat.getAs[Int]("n_tokens").toLong * 10)
    assert(fat.getAs[Int]("keep") == 0, "mean-word-length>10 doc must drop")

    // dup-line fraction over 30%: same 8-token line repeated 13× among
    // 16 crafted lines → 12 dup occurrences, 12*10 > 16*3
    val dupLine = (1 to 8).map(i => s"dup$i").mkString(" ")
    val dupDoc = Seq.fill(13)(dupLine).mkString(" ") + " " +
      (1 to 8).map(i => s"uniq$i").mkString(" ")
    val dup = gopherRows((13L, dupDoc, "s"))(13L)
    assert(dup.getAs[Long]("n_dup_lines") * 10 >
      dup.getAs[Long]("n_lines") * 3)
    assert(dup.getAs[Int]("keep") == 0, "dup-line-heavy doc must drop")
  }

  test("gopher: fixture newsletter docs carry the in-doc duplicate") {
    val rows = WebTextOps.gopherQuality(spark, sf)
      .filter(col("doc_id") % 5 === 0)
      .agg(min("n_dup_lines")).head.getLong(0)
    assert(rows >= 1L,
      "every doc_id % 5 == 0 doc crafts the newsletter line twice")
  }

  test("line dedup: cross-document lines drop, in-document repeats survive") {
    // doc 1 and doc 2 share their content line (plus header/footer — all
    // docs share those); doc 4's content lines are unique but one repeats
    // WITHIN the doc only — MinLineDocs counts distinct documents, so it
    // must survive.
    val shared = (1 to 8).map(i => s"sh$i").mkString(" ")
    val solo = (1 to 8).map(i => s"solo$i").mkString(" ")
    val out = WebTextOps.lineDedupFor(docsDf(
        (1L, shared, "sA"), (2L, shared, "sB"),
        (4L, s"$solo $solo", "sC")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    // docs 1/2: header unique per source, shared content + footer drop
    assert(out(1L).getAs[Long]("n_removed") == 2L, s"${out(1L)}")
    assert(out(1L).getAs[String]("text_clean") == "home about contact sA")
    // doc 4 (≡0 mod 4): bullet line is its own; the in-doc repeated solo
    // line survives twice in original order; footer dropped
    assert(out(4L).getAs[String]("text_clean") ==
      s"home about contact sC\n$solo\n$solo\n- related links")
    assert(out(4L).getAs[Long]("n_removed") == 1L)
  }

  test("line dedup: a fully-boilerplate document rewrites to empty") {
    // two docs, same source, same text → every line (incl. header) is
    // shared by 2 distinct docs → all drop; totality: text_clean = ''
    val txt = (1 to 8).map(i => s"w$i").mkString(" ")
    val out = WebTextOps.lineDedupFor(docsDf((1L, txt, "s"), (2L, txt, "s")))
      .collect()
    assert(out.forall(_.getAs[String]("text_clean") == ""))
    assert(out.forall(r =>
      r.getAs[Long]("n_removed") == r.getAs[Long]("n_lines")))
  }

  test("line dedup: fixture boilerplate is removed corpus-wide") {
    val out = WebTextOps.lineDedup(spark, sf)
    // footer is in every doc; header in every doc of a source (>1 doc per
    // source at sf0.001); newsletter in every %5 doc → none may survive
    val survivors = out.filter(
      col("text_clean").contains("copyright 2024 all rights reserved") ||
        col("text_clean").contains("home about contact") ||
        col("text_clean").contains("subscribe to our newsletter")).count()
    assert(survivors == 0L, "corpus-shared boilerplate must not survive")
    // but the rewrite is not vacuous: most docs keep their content lines
    val kept = out.filter(length(col("text_clean")) > 0).count()
    assert(kept > 400L, s"only $kept docs kept any content")
  }

  test("leakage-safe split: no candidate pair straddles a split boundary") {
    val assign = WebTextOps.leakageSafeSplit(spark, sf)
      .select(col("doc_id"), col("split"))
    val pairs = spark.read.parquet(OracleInputs.path(sf, "split_pairs"))
    val straddling = pairs
      .join(assign.withColumnRenamed("doc_id", "src")
        .withColumnRenamed("split", "split_a"), Seq("src"))
      .join(assign.withColumnRenamed("doc_id", "dst")
        .withColumnRenamed("split", "split_b"), Seq("dst"))
      .filter(col("split_a") =!= col("split_b")).count()
    assert(straddling == 0L,
      "near-dup candidate pair assigned to different splits — leakage")
    // non-vacuous: the pair set is non-empty and all three splits exist
    assert(pairs.count() > 0L)
    val splits = WebTextOps.leakageSafeSplit(spark, sf)
      .select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val", "test"), s"got $splits")
  }

  test("html extract: body text survives exactly, tags and blocks do not") {
    val out = WebTextOps.htmlExtractFor(docsDf(
        (3L, "alpha beta gamma", "srcx"), (7L, "delta epsilon", "srcy")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 7 (no ad block): nav + h1 + body + decoded © footer
    assert(out(7L).getAs[String]("text_main") ==
      "Home | About Doc 7 delta epsilon © 2024 srcy")
    assert(out(7L).getAs[String]("title") == "srcy 7")
    // doc 3 (≡0 mod 3): the ad block's entities decode, incl. the angle
    // brackets — proof the tag strip ran BEFORE entity decode (a decoded
    // &lt;50%&gt; must not be eaten as a tag)
    assert(out(3L).getAs[String]("text_main") ==
      "Home | About Doc 3 alpha beta gamma Buy now & save <50%> © 2024 srcx")
    // script/style interiors are gone
    assert(!out(3L).getAs[String]("text_main").contains("var t"))
    assert(!out(3L).getAs[String]("text_main").contains("color:red"))
  }

  test("html extract: ratio arithmetic and fixture-wide tag absence") {
    val rows = WebTextOps.htmlExtract(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (h, t, p) = (r.getAs[Int]("n_chars_html"),
        r.getAs[Int]("n_chars_text"), r.getAs[Long]("text_permille"))
      assert(p == t.toLong * 1000 / h)
      assert(t < h)
      // no tag-like remnant survives extraction
      assert(!r.getAs[String]("text_main").matches(".*<[A-Za-z/].*"))
    }
  }

  test("line-family plans stay join-sane (no cartesian, no BNLJ)") {
    Seq(WebTextOps.gopherQuality(spark, sf),
        WebTextOps.lineDedup(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"line-family plan degraded:\n$plan")
    }
  }

  test("mojibake repair inverts the Latin-1 misdecode and honors its guards") {
    import spark.implicits._
    def run(rows: (Long, String)*): Map[Long, (Long, Int, String, Long)] =
      WebTextOps.mojibakeRepairFor(rows.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getInt(2), r.getString(3), r.getLong(4)))).toMap
    def m(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    val moji2 = "cafÃ©" // UTF-8 'é' bytes shown as Latin-1
    val moji3 = "\u00ED\u0095\u009C" // UTF-8 '한' bytes shown as Latin-1
    val got = run(
      (1L, s"plain $moji2 text"), // 2-byte repair
      (2L, s"x $moji3 y"), // 3-byte repair
      (3L, "café real accent"), // genuine Latin-1: keep
      (4L, "pure ascii"), // nothing to do
      (5L, "한 plus Ã©")) // non-Latin-1-able: guard refuses
    assert(got(1L) === ((1L, 1, m("plain café text"), 15L)))
    assert(got(2L) === ((1L, 1, m("x 한 y"), 5L)))
    assert(got(3L)._2 === 0) // redecode would produce U+FFFD -> kept
    assert(got(3L)._3 === m("café real accent"))
    assert(got(4L) === ((0L, 0, m("pure ascii"), 10L)))
    assert(got(5L)._1 === 1L) // suspect pattern present...
    assert(got(5L)._2 === 0) // ...but the Latin-1-representable guard holds
    assert(got(5L)._3 === m("한 plus Ã©"))
  }

  test("crafted mojibake corpus: repaired docs strictly shrink, others stay") {
    val docs = Tables.t(spark, sf, "documents")
    val out = WebTextOps.mojibakeRepairFor(WebTextOps.craftedMojibake(docs))
    import org.apache.spark.sql.functions._
    val byArm = out.withColumn("arm", pmod(col("doc_id"), lit(7)))
      .groupBy("arm").agg(sum("repaired").as("nrep"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(byArm(2L)._1 === byArm(2)._2, "every 2-byte arm doc repairs")
    assert(byArm(3L)._1 === byArm(3)._2, "every 3-byte arm doc repairs")
    assert(byArm(4L)._1 === 0L, "genuine Latin-1 arm never repairs")
    assert(byArm(0L)._1 === 0L)
  }

  test("line quality: stopword-density rule on a hand-built document") {
    // id 1 selects no optional crafted lines: header (4 toks, 0 stops),
    // one 8-token body line carrying 'the', footer (5 toks, 0 stops)
    val r = WebTextOps.lineQualityFor(docsDf(
      (1L, "the quick brown fox jumps over lazy dogs", "s1"))).head
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("n_content") == 1L)
    assert(r.getAs[Long]("n_boiler") == 2L)
    assert(r.getAs[String]("text_content")
      === "the quick brown fox jumps over lazy dogs")
  }

  test("c4: terminal-punct/word-count line rules and the kept-line page floor") {
    // id 1, 16 tokens -> header + 2 body lines + footer; period schedule
    // (p + 1) % 3 = 1 marks only p=3, so exactly one line survives and
    // the page fails the 3-kept floor
    val toks16 = (1 to 16).map(i => s"tok$i").mkString(" ")
    val a = WebTextOps.c4FiltersFor(docsDf((1L, toks16, "s"))).head
    assert(a.getAs[Long]("n_lines") == 4L)
    assert(a.getAs[Long]("n_kept") == 1L)
    assert(a.getAs[Int]("page_keep") == 0)
    assert(a.getAs[String]("text_c4") === "")

    // id 2, 72 tokens -> 9 body lines p2..p10 + footer p11; periods at
    // p = 2,5,8,11 -> three 8-word body lines + the footer survive
    val toks72 = (1 to 72).map(i => s"tok$i").mkString(" ")
    val b = WebTextOps.c4FiltersFor(docsDf((2L, toks72, "s"))).head
    assert(b.getAs[Long]("n_lines") == 11L)
    assert(b.getAs[Long]("n_kept") == 4L)
    assert(b.getAs[Int]("page_keep") == 1)
    val kept = b.getAs[String]("text_c4").split("\n")
    assert(kept.length == 4)
    assert(kept.last === "copyright 2024 all rights reserved.")
    assert(kept.forall(_.endsWith(".")))
  }

  test("c4: lorem/brace kills the page; javascript and policy kill the line") {
    val toks72 = (1 to 72).map(i => s"tok$i").mkString(" ")
    // id 26 = 2 mod 3 (same period schedule shape as id 2 shifted) and
    // 26 % 13 = 0 -> lorem line injected -> page dropped regardless of
    // how many lines the line rules keep
    val lorem = WebTextOps.c4FiltersFor(docsDf((26L, toks72, "s"))).head
    assert(lorem.getAs[Int]("page_keep") == 0)
    assert(lorem.getAs[String]("text_c4") === "")
    // id 9 -> javascript notice injected; id 10 -> privacy-policy line:
    // both end with '.' and pass the word count, but the phrase rules
    // must keep them out of the cleaned text
    for (id <- Seq(9L, 10L)) {
      val r = WebTextOps.c4FiltersFor(docsDf((id, toks72, "s"))).head
      val txt = r.getAs[String]("text_c4")
      assert(!txt.contains("javascript") && !txt.contains("privacy policy"))
      assert(r.getAs[Long]("n_kept") < r.getAs[Long]("n_lines"))
    }
  }
}
