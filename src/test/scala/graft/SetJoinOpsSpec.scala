package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SetJoinOps

/** Prefix-filtered exact Jaccard join: threshold boundary exactness,
  * completeness vs a brute-force join on synthetic sets, prefix-length
  * arithmetic, and the fixture-level engine≡brute-force law (the gate's
  * oracle restated in-engine).
  */
class SetJoinOpsSpec extends SparkSpec {

  import spark.implicits._

  /** Brute force: every pair sharing ≥1 element, exact Jaccard filter. */
  private def brute(sh: DataFrame): Seq[(Long, Long, Long)] = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.as("a").join(sh.as("b"), Seq("sh"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("overlap"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("size_b")), Seq("doc_b"))
      .where(lit(SetJoinOps.JacDen) * col("overlap") >=
        lit(SetJoinOps.JacNum) * (col("size_a") + col("size_b") - col("overlap")))
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
  }

  private def setsOf(m: Map[Long, Seq[String]]): DataFrame =
    m.toSeq.flatMap { case (id, els) => els.map((id, _)) }
      .toDF("doc_id", "sh")

  test("threshold boundary is exact: J = t kept, J just below dropped") {
    // A,B: |8|,|8| overlap 6 → J = 6/10 = 0.60 exactly (kept)
    // A,C: |8|,|8| overlap 5 → J = 5/11 < 0.6 (dropped)
    val a = (1 to 8).map(i => s"e$i")
    val b = (1 to 6).map(i => s"e$i") ++ Seq("x1", "x2")
    val c = (1 to 5).map(i => s"e$i") ++ Seq("y1", "y2", "y3")
    val sh = setsOf(Map(1L -> a, 2L -> b, 3L -> c))
    val out = SetJoinOps.jaccardPairs(sh)
      .select("doc_a", "doc_b", "overlap", "jac_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 6L, 600000L)))
  }

  test("complete vs brute force on overlapping synthetic sets") {
    // doc i = {w_i .. w_{i+11}}: adjacent docs overlap 11/13 ≈ 0.85,
    // distance-2 overlap 10/14 ≈ 0.71, distance-5 overlap 7/17 < 0.6
    val sets = (0L to 20L).map(i =>
      i -> (i until i + 12).map(j => f"w$j%03d")).toMap
    val sh = setsOf(sets)
    val engine = SetJoinOps.jaccardPairs(sh)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val bf = brute(sh)
    assert(engine.nonEmpty && engine == bf)
  }

  test("prefix length arithmetic: |d|=10 at t=6/10 → 5 rarest elements") {
    val sh = setsOf(Map(1L -> (1 to 10).map(i => s"p$i")))
    val n = SetJoinOps.prefixesOf(sh).count()
    // 10 − ceil(6) + 1 = 5
    assert(n == 5L)
  }

  test("prefix filter actually prunes: prefixes are a strict subset") {
    val sets = (0L to 20L).map(i =>
      i -> (i until i + 12).map(j => f"w$j%03d")).toMap
    val sh = setsOf(sets)
    val total = sh.count()
    val pref = SetJoinOps.prefixesOf(sh).count()
    assert(pref < total && pref > 0)
  }

  test("incremental: in-query gate == fresh pairs restricted to batch") {
    val docs = Tables.t(spark, sf, "documents")
    val inc = SetJoinOps.jaccardJoinIncrement(spark, sf)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val fresh = SetJoinOps.jaccardPairs(SetJoinOps.docShingles(docs))
      .where(col("doc_a") % 5 === 0 || col("doc_b") % 5 === 0)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(inc == fresh && inc.nonEmpty)
  }

  test("incremental stored lifecycle: pruned serve == gate, append " +
      "extends exactly, fence refuses overlap") {
    val db = "jac_idx_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val docs = Tables.t(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") < 300)
    val batch1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    val batch2 = docs.filter(col("doc_id") >= 400)
    SetJoinOps.buildJaccardIndex(corpus, db)
    // serve batch1 against the stored index: equals the frame-built path,
    // and the prefix probe is partition-pruned to the batch's buckets
    val served = SetJoinOps.jaccardIncrementFromIndex(spark, db, batch1)
    val plan = served.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*bkt".r.findFirstIn(plan).isDefined,
      "prefix probe not partition-pruned:\n" + plan.take(2000))
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val frames = SetJoinOps.incrementalPairs(
      SetJoinOps.indexOver(SetJoinOps.docShingles(corpus)),
      SetJoinOps.docShingles(batch1))
    assert(dump(served) == dump(frames))
    // append batch1, then serving batch2 must equal the frame path over
    // the grown corpus — the frozen order changes candidates, never pairs
    SetJoinOps.appendToJaccardIndex(spark, db, batch1)
    val served2 = dump(SetJoinOps.jaccardIncrementFromIndex(spark, db, batch2))
    val frames2 = dump(SetJoinOps.incrementalPairs(
      SetJoinOps.indexOver(SetJoinOps.docShingles(
        corpus.unionByName(batch1))),
      SetJoinOps.docShingles(batch2)))
    assert(served2 == frames2)
    // replaying batch1 trips the fence loudly
    val e = intercept[IllegalArgumentException] {
      SetJoinOps.appendToJaccardIndex(spark, db, batch1)
    }
    assert(e.getMessage.contains("fence"))
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("fixture law: engine pairs == brute-force pairs") {
    val sh = SetJoinOps.docShingles(Tables.t(spark, sf, "documents"))
    val engine = SetJoinOps.jaccardPairs(sh)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(engine == brute(sh))
    assert(engine.nonEmpty)
  }

  test("containment is directional: the quoted-inside case Jaccard " +
      "misses, and the one-sided prefix filter stays complete") {
    // A's 2 shingles both inside B's 4: C(A→B)=1.0, C(B→A)=0.5,
    // J(A,B)=0.5 < 0.6 — invisible to the symmetric join
    val sets = setsOf(Map(
      1L -> Seq("s1", "s2"),
      2L -> Seq("s1", "s2", "s3", "s4"),
      3L -> Seq("x1", "x2")))
    val got = SetJoinOps.containmentPairs(sets).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        -> r.getAs[Long]("containment_ppm")).toMap
    assert(got == Map((1L, 2L) -> 1000000L), got)
    assert(SetJoinOps.jaccardPairs(sets).count() == 0,
      "the motivating pair must be invisible to the symmetric join")
    // completeness on the fixture: engine == brute force (ordered pairs)
    val sh = SetJoinOps.docShingles(Tables.t(spark, sf, "documents"))
    val engine = SetJoinOps.containmentPairs(sh)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val bruteC = sh.as("a").join(sh.as("b"), Seq("sh"))
      .where(col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("overlap"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("size_a")),
        Seq("doc_a"))
      .where(lit(SetJoinOps.ConDen) * col("overlap") >=
        lit(SetJoinOps.ConNum) * col("size_a"))
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(engine == bruteC && engine.nonEmpty)
  }

  test("containment df cap: hot-probe fall-back keeps capped grams exact") {
    // cap = 1 makes EVERY shared shingle heavy (each appears in >= 2
    // docs). Pair (1 -> 2): all of doc 1's shingles are heavy, so the
    // rarest common shingle is heavy and the light branch alone would
    // MISS the pair — only the hot-probe branch can emit it. Doc 4's
    // containment in 5 rides a unique (light) witness s9 and must come
    // through the light branch (4 is not hot: 1 heavy of 2 < ceil(.8*2)).
    val sets = setsOf(Map(
      1L -> Seq("h1", "h2"),             // fully inside 2 and 3's shared pool
      2L -> Seq("h1", "h2", "h3", "h4"),
      3L -> Seq("h1", "h2", "h3", "h4"), // forces df(h*) = 2..3 > cap
      4L -> Seq("h1", "s9"),             // NOT hot, but s9 alone can't reach
                                         // 80% of 2 shingles -> needs both
      5L -> Seq("h1", "s9", "z1", "z2")))
    val got = SetJoinOps.containmentPairs(sets, cap = 1L).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    // brute truth: containment >= 0.8 means FULL overlap at these sizes
    // 1->2, 1->3 (2/2); 2<->3 (4/4); 4->5 (2/2); 1->4? overlap {h1} 1/2 no
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 2L), (4L, 5L)))
    // the capped engine equals brute force on the fixture too
    val sh = SetJoinOps.docShingles(Tables.t(spark, sf, "documents"))
    val capped = SetJoinOps.containmentPairs(sh, cap = 2L)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    val default = SetJoinOps.containmentPairs(sh)
      .select("doc_a", "doc_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    assert(capped == default && capped.nonEmpty,
      "pair set must be cap-invariant (exactness does not depend on cap)")
  }
}
