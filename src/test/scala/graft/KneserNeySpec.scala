package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Interpolated Kneser-Ney laws on a hand-computed corpus: every staged
  * fixed-point probability, the doc means, the keep rule, and (via the
  * same constants) discount monotonicity and near-unit mass.
  */
class KneserNeySpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed corpus: staged KN arithmetic lands exactly") {
    // corpus: doc 1 "a b a b", doc 2 "a c"
    //   c2: (a,b)=2 (b,a)=1 (a,c)=1 ; c1(a)=3 n1p(a)=2 ; c1(b)=1 n1p(b)=1
    //   n1m: a=1 b=1 c=1 ; NB=3 ; p_cont = 333333 for every word
    //   p(b|a) = 416666 + (500000*333333)//1e6 = 583332
    //   p(a|b) = 250000 + (750000*333333)//1e6 = 499999
    //   p(c|a) =  83333 + (500000*333333)//1e6 = 249999
    //   doc1 kn = (583332+499999+583332)//3 = 555554 ; doc2 kn = 249999
    //   tot = 805553, n = 2 → keep(doc1)=1, keep(doc2)=0
    val dir = TempDirs.create("graft-kn-spec")
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.kneserNeyScore(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(got == Seq((1L, 3L, 555554L, 1), (2L, 1L, 249999L, 0)), got)
  }

  test("discounted seen mass + interpolated unseen mass ≈ unit (prev=a)") {
    // same corpus constants: seen p(b|a)+p(c|a) = 833331; the one unseen
    // continuation (a|a) carries lam(a)*p_cont//S = 166666 — total
    // 999997, i.e. KnScale minus 3 one-ulp truncations. The slack IS the
    // documented contract (truncating stages, never floats).
    val total = 583332L + 249999L + 166666L
    assert(total <= TextOps.KnScale && total >= TextOps.KnScale - 10)
  }

  test("stored-model serve ≡ in-query gate when the model is the corpus; " +
      "unseen contexts back off to continuation mass") {
    val db = "kn_model_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    TextOps.buildLmModel(Tables.t(spark, sf, "documents"), db)
    val served = TextOps.kneserNeyFromModel(spark, sf, db)
      .collect().toSeq.map(_.toSeq)
    val gate = TextOps.kneserNeyScore(spark, sf).collect().toSeq.map(_.toSeq)
    assert(served == gate,
      "one stored count table must serve the KN law identically")
    // foreign corpus: a fully-unseen context scores p_cont alone — for a
    // word the model never saw as a continuation, exactly 0
    val dir = TempDirs.create("graft-kn-serve-spec")
    Seq((1L, "zz qq")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val foreign = TextOps.kneserNeyFromModel(spark, dir, db).head()
    assert(foreign.getAs[Long]("kn_fp") == 0L,
      s"unseen continuation must carry zero mass: $foreign")
  }

  test("pruned model: hapax bigrams drop, pruned transitions back off " +
      "through the serve law (hand-computed)") {
    // same corpus as above; threshold 2 keeps only (a,b)=2:
    //   pruned c1(a)=2, n1p(a)=1; n1m(b)=1; NB=1 → p_cont(b)=10⁶, else 0
    //   (a,b): term1 = (10⁶·5)//8 = 625000, λ(a) = (3·10⁶)//8 = 375000,
    //          p = 625000 + 375000 = 1000000
    //   (b,a): context b fully pruned → p_cont(a) = 0
    //   (a,c): context a survives, pair pruned → λ(a)·p_cont(c)//S = 0
    //   doc1 kn = 2000000//3 = 666666 keep=1; doc2 kn = 0 keep=0
    val dir = TempDirs.create("graft-kn-prune-spec")
    Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.kneserNeyScorePruned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(got == Seq((1L, 3L, 666666L, 1), (2L, 1L, 0L, 0)), got)
  }

  test("pruning an ALL-hapax corpus empties the model without NULLs: " +
      "every doc scores zero mass and the degenerate mean keeps all") {
    // every bigram type occurs once ⇒ the cut empties c2, nb = 0 — the
    // `div 0` edge that went NULL before the p_cont guard (review
    // finding): both engines must agree on kn_fp = 0, keep = 1
    val dir = TempDirs.create("graft-kn-empty-spec")
    Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.kneserNeyScorePruned(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(got == Seq((1L, 1L, 0L, 1), (2L, 1L, 0L, 1)), got)
  }

  test("pruning is the identity on a hapax-free corpus") {
    // every bigram type occurs ≥ KnPruneMinCount ⇒ the cut removes
    // nothing and the pruned law must reproduce the unpruned gate
    val dir = TempDirs.create("graft-kn-nohapax-spec")
    Seq((1L, "a b a b a b"), (2L, "b a b a")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pruned = TextOps.kneserNeyScorePruned(spark, dir)
      .collect().toSeq.map(_.toSeq)
    val full = TextOps.kneserNeyScore(spark, dir)
      .collect().toSeq.map(_.toSeq)
    assert(pruned == full,
      "a cut that removes no bigram type must not change any score")
  }

  test("gate shape on the fixture: deterministic, keep splits the corpus") {
    val a = TextOps.kneserNeyScore(spark, sf)
    val rows = a.collect()
    assert(rows.length > 0)
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    assert(kept > 0 && kept < rows.length,
      s"keep must split the corpus: $kept/${rows.length}")
    val b = TextOps.kneserNeyScore(spark, sf).collect()
    assert(rows.toSeq.map(_.toSeq) == b.toSeq.map(_.toSeq))
  }
}
