package graft

import org.apache.spark.sql.functions._
import graft.ops.CurriculumOps

/** Curriculum laws: hand-computed difficulty components, stage
  * monotonicity in difficulty, tertile balance and the deterministic
  * within-stage permutation on the fixture.
  */
class CurriculumOpsSpec extends SparkSpec {

  import spark.implicits._

  test("difficulty components land on the hand formula") {
    // one doc, no rarity (every token repeated: all counts share the
    // corpus, none below 0.1%): "aa bb. cc!" → tokens [aa bb. cc!]
    // n_tokens=3 chars_sum=3+3+3? tokens split on \s+: "aa","bb.","cc!"
    //   chars 2+3+3=8 → awl = 8000 div 3 = 2666
    //   sentences: split [.!?]+ → ["aa bb", " cc"] → 2 → asl = 1500
    //   rare: corpus volume 3, every cw=1, 1·1000 > 3 → n_rare=0
    //   difficulty = 2666 + 150 + 0 = 2816
    val dir = TempDirs.create("graft-curr-spec")
    Seq((1L, "aa bb. cc!")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CurriculumOps.curriculumOrder(spark, dir).head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("awl_pm") == 2666L)
    assert(r.getAs[Long]("asl_pm") == 1500L)
    assert(r.getAs[Long]("rare_pm") == 0L)
    assert(r.getAs[Long]("difficulty_fp") == 2816L)
    assert(r.getAs[Int]("stage") == 0)
  }

  test("stages are monotone in difficulty and roughly balanced") {
    val rows = CurriculumOps.curriculumOrder(spark, sf).collect()
    val byStage = rows.groupBy(_.getAs[Int]("stage"))
      .view.mapValues(_.map(_.getAs[Long]("difficulty_fp"))).toMap
    assert(byStage.keySet == Set(0, 1, 2), s"stages: ${byStage.keySet}")
    assert(byStage(0).max <= byStage(1).min)
    assert(byStage(1).max <= byStage(2).min)
    val n = rows.length
    for (st <- 0 to 2)
      assert(byStage(st).length * 5 >= n,
        s"stage $st holds ${byStage(st).length} of $n — not a tertile")
  }

  test("within-stage order is the md5 permutation, deterministically") {
    val a = CurriculumOps.curriculumOrder(spark, sf).collect().toSeq
    for (stage <- a.groupBy(_.getAs[Int]("stage")).values) {
      val keys = stage.map(r => (r.getAs[String]("sk"),
        r.getAs[Long]("doc_id")))
      assert(keys == keys.sortBy(identity), "rows must arrive sk-sorted")
    }
    val b = CurriculumOps.curriculumOrder(spark, sf).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }
}
