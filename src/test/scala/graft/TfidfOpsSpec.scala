package graft

import org.apache.spark.sql.functions._
import graft.ops.TfidfOps

/** Hashed TF-IDF embeddings: hand-computed weights on a crafted corpus,
  * normalization/truncation bounds, identical-doc ⇒ identical-vector law,
  * and kNN self-similarity (an exact twin scores cos² = 1 exactly in
  * fixed point).
  */
class TfidfOpsSpec extends SparkSpec {

  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("hand-computed ratio-idf weights and L1 normalization") {
    // N=3; df: alpha=3, bravo=2, charlie=1
    // idf_fp: alpha (1000*3)//3=1000, bravo 3000//2=1500, charlie 3000//1=3000
    // d1 = alpha bravo: l1=2500 -> v_fp {1000e6//2500=400000, 600000}
    val vecs = TfidfOps.hashedVectors(corpus(
      1L -> "alpha bravo", 2L -> "alpha charlie", 3L -> "alpha bravo"))
    val d1 = vecs.where(col("doc_id") === 1L)
      .select("v_fp").as[Long].collect().sorted.toSeq
    // guard: the three tokens must not collide into one dim for the
    // arithmetic below to be the two-component case
    assert(vecs.where(col("doc_id") === 1L).count() == 2L)
    assert(d1 == Seq(400000L, 600000L))
    // d2 = alpha charlie: l1=4000 -> {250000, 750000}
    val d2 = vecs.where(col("doc_id") === 2L)
      .select("v_fp").as[Long].collect().sorted.toSeq
    assert(d2 == Seq(250000L, 750000L))
  }

  test("identical documents produce identical vectors") {
    val vecs = TfidfOps.hashedVectors(corpus(
      1L -> "alpha bravo", 2L -> "alpha charlie", 3L -> "alpha bravo"))
    val v1 = vecs.where(col("doc_id") === 1L).select("dim", "v_fp")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val v3 = vecs.where(col("doc_id") === 3L).select("dim", "v_fp")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(v1 == v3 && v1.nonEmpty)
  }

  test("L1 norm lands within Dims truncation units of NormScale") {
    val vecs = TfidfOps.hashedVectors(
      Tables.t(spark, sf, "documents").select("doc_id", "text"))
    val sums = vecs.groupBy("doc_id").agg(sum("v_fp").as("l1"))
      .select("l1").as[Long].collect()
    assert(sums.forall(s =>
      s <= TfidfOps.NormScale && s > TfidfOps.NormScale - TfidfOps.Dims))
  }

  test("dims stay inside [0, Dims) on the fixture vocabulary") {
    val vecs = TfidfOps.hashedVectors(
      Tables.t(spark, sf, "documents").select("doc_id", "text"))
    val bad = vecs.where(col("dim") < 0 || col("dim") >= TfidfOps.Dims).count()
    assert(bad == 0L)
  }

  test("kNN: an exact twin ranks first with cos² = 1e12 exactly") {
    val vecs = TfidfOps.hashedVectors(corpus(
      1L -> "alpha bravo delta echo",
      7L -> "alpha bravo delta echo",   // twin of probe 1
      8L -> "alpha charlie foxtrot golf",
      9L -> "zulu yankee xray whiskey"))
    val top = TfidfOps.tfidfKnn(vecs)
      .where(col("probe_id") === 1L && col("rnk") === 1)
      .select("other_id", "score_fp").collect().head
    assert(top.getLong(0) == 7L)
    assert(top.getLong(1) == 1000000000000L)
  }

  test("kNN scores never exceed 1e12 (Cauchy-Schwarz in fixed point)") {
    val vecs = TfidfOps.hashedVectors(
      Tables.t(spark, sf, "documents").select("doc_id", "text"))
    val over = TfidfOps.tfidfKnn(vecs)
      .where(col("score_fp") > 1000000000000L).count()
    assert(over == 0L)
  }
}
