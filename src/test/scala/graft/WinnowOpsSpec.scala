package graft

import org.apache.spark.sql.functions._
import graft.ops.WinnowOps

/** Winnowing: differential vs an independent in-memory reference, the
  * detection guarantee, the rightmost tie rule, and candidate pruning.
  */
class WinnowOpsSpec extends SparkSpec {

  import spark.implicits._
  import WinnowOps.{K, W}

  // independent reference implementation (plain Scala, no Spark)
  private def md5p(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString.take(16)
  }

  private def refFingerprints(text: String): Set[(Long, String)] = {
    val toks = text.trim.split("\\s+").toSeq
    if (toks.length < K) return Set.empty
    val hs = (0 to toks.length - K)
      .map(i => md5p(toks.slice(i, i + K).mkString(" ")))
    (0 to hs.length - W).flatMap { s =>
      val win = (s until s + W).map(p => (hs(p), p))
      // min hash, rightmost position on ties
      val m = win.minBy { case (h, p) => (h, -p) }
      Some((m._2 + 1L, m._1))
    }.toSet
  }

  private def engineFingerprints(docs: Seq[(Long, String)]): Map[Long, Set[(Long, String)]] =
    WinnowOps.fingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("engine matches the independent reference on fixture docs") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = engineFingerprints(docs)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === refFingerprints(text),
        s"doc $id selection mismatch")
    }
  }

  test("detection guarantee: a shared run of W+K-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    def rtoks(n: Int, tag: String) =
      (1 to n).map(_ => tag + rnd.nextInt(1000))
    val cases = (1 to 20).map { i =>
      val run = rtoks(W + K - 1, "shared")
      val a = (rtoks(rnd.nextInt(10), s"a$i") ++ run ++ rtoks(rnd.nextInt(10), s"a$i")).mkString(" ")
      val b = (rtoks(rnd.nextInt(10), s"b$i") ++ run ++ rtoks(rnd.nextInt(10), s"b$i")).mkString(" ")
      (i.toLong * 2, a, i.toLong * 2 + 1, b)
    }
    val docs = cases.flatMap { case (ia, a, ib, b) => Seq((ia, a), (ib, b)) }
    val got = engineFingerprints(docs)
    cases.foreach { case (ia, _, ib, _) =>
      val shared = got(ia).map(_._2) intersect got(ib).map(_._2)
      assert(shared.nonEmpty, s"docs $ia/$ib share a W+K-1 run but no fingerprint")
    }
  }

  test("rightmost tie rule: an all-identical doc selects each window's last gram") {
    val n = 12 // tokens -> 10 grams, all identical hash
    val got = engineFingerprints(Seq((1L, Seq.fill(n)("x").mkString(" "))))
    val grams = n - K + 1
    assert(got(1L).map(_._1) === (W.toLong to grams.toLong).toSet)
  }

  test("density: winnowing selects far fewer prints than grams") {
    val docs = Tables.t(spark, sf, "documents")
    val grams = WinnowOps.gramHashes(docs).count()
    val prints = WinnowOps.fingerprints(docs).count()
    assert(prints < grams / 2, s"$prints prints vs $grams grams")
    assert(prints > 0)
  }

  test("incremental probe equals the fresh run restricted to batch pairs") {
    val db = "winnow_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val base = (1 to 30).map(i => "tok" + i).mkString(" ")
    val other = (1 to 30).map(i => "oth" + i).mkString(" ")
    val corpus = Seq((1L, base), (2L, other), (3L, "x " + base)).toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, other + " tail"), (12L, "zz yy ww"))
      .toDF("doc_id", "text")
    WinnowOps.buildPrintIndex(corpus, db)
    val got = WinnowOps.probeCopyCandidates(spark, batch, db)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fresh = WinnowOps.copyCandidates(corpus.unionByName(batch))
      .where(col("doc_a") >= 10 || col("doc_b") >= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === fresh)
    assert(got.nonEmpty, "fixture must produce batch-involving pairs")
    assert(got.exists { case (a, b, _) => a < 10 && b >= 10 },
      "a corpus-batch pair must exist") // non-vacuous cross leg
  }

  test("index appends: fence refuses replays; probe sees appended docs") {
    val db = "winnow_spec2"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val base = (1 to 30).map(i => "w" + i).mkString(" ")
    WinnowOps.buildPrintIndex(Seq((1L, base)).toDF("doc_id", "text"), db)
    val b1 = Seq((5L, base)).toDF("doc_id", "text")
    WinnowOps.appendToPrintIndex(spark, b1, db)
    val e = intercept[IllegalArgumentException] {
      WinnowOps.appendToPrintIndex(spark, b1, db) // full replay
    }
    assert(e.getMessage.contains("append-only"))
    // a later batch probes against BOTH the built and the appended docs
    val got = WinnowOps.probeCopyCandidates(spark,
        Seq((9L, base)).toDF("doc_id", "text"), db)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 9L), (5L, 9L)))
  }

  test("probe scans only the batch prints' buckets (partition pruned)") {
    val db = "winnow_spec3"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val docs = Tables.t(spark, sf, "documents")
    WinnowOps.buildPrintIndex(docs.where(col("doc_id") < 100), db)
    val plan = WinnowOps.probeCopyCandidates(spark,
      docs.where(col("doc_id") === 200), db)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), "probe plan must filter on bucket")
  }

  test("copy candidates: identical docs pair up; hot prints are pruned") {
    val base = (1 to 30).map(i => "tok" + i).mkString(" ")
    val noise = (1 to 30).map(i => "zzz" + i).mkString(" ")
    // docs 1/2 identical; 3 unrelated; 10 docs sharing one boilerplate run
    // long enough to winnow identically everywhere (hot prints)
    val boiler = (1 to 30).map(_ => "b").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, noise)) ++
      (4L to 30L).map(i => (i, boiler))
    val got = WinnowOps.copyCandidates(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)),
      "identical docs must pair; boilerplate-only pairs must be pruned")
  }
}
