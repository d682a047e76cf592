package graft

import org.apache.spark.sql.functions._
import graft.ops.ThetaOps

/** KMV theta-sketch laws: the shard-merge identity (K smallest of a
  * union equals the merge of the shards' K-min samples), the
  * fully-sampled-exactness degeneration, tolerance verdicts on the real
  * fixture, and hand-computed estimator arithmetic.
  */
class ThetaOpsSpec extends SparkSpec {

  import spark.implicits._

  test("merge law: kMin(S1 ∪ S2) = merge(kMin(S1), kMin(S2))") {
    val li = Tables.t(spark, sf, "lineitem")
      .select(lit("t").as("tag"), col("l_orderkey").as("k")).distinct()
    val hv = li.withColumn("hv", ThetaOps.hvOf(col("k")))
      .select("tag", "hv").distinct()
    val s1 = ThetaOps.kMin(hv.filter(col("hv") % 3 =!= 0))
    val s2 = ThetaOps.kMin(hv.filter(col("hv") % 3 === 0))
    val merged = ThetaOps.mergeSamples(s1, s2)
      .orderBy("hv").select("hv").as[Long].collect().toSeq
    val direct = ThetaOps.kMin(hv)
      .orderBy("hv").select("hv").as[Long].collect().toSeq
    assert(merged == direct && merged.size == ThetaOps.K)
  }

  test("fully-sampled sets degrade to exact counts (est = cnt < K)") {
    // suppliers: 10 distinct keys at sf0.001 — far below K, so the
    // estimator must return the exact count, not (K-1)M/theta
    val sup = Tables.t(spark, sf, "supplier")
      .select(lit("s").as("tag"), col("s_suppkey").as("k")).distinct()
    val hv = sup.withColumn("hv", ThetaOps.hvOf(col("k")))
      .select("tag", "hv").distinct()
    val n = ThetaOps.kMin(hv).count()
    assert(n == sup.count() && n < ThetaOps.K)
  }

  test("estimator arithmetic matches the hand formula on a crafted set") {
    // hash values 1..K planted directly: theta = K, est = (K-1)*M div K
    val hv = spark.range(1, ThetaOps.K + 1)
      .select(lit("x").as("tag"), col("id").as("hv"))
    val samp = ThetaOps.kMin(hv)
    val theta = samp.agg(max("hv")).head.getLong(0)
    assert(theta == ThetaOps.K.toLong)
    val est = (ThetaOps.K - 1).toLong * ThetaOps.M / theta
    // K uniform values ending at K estimate a (K-1)*M/K ≈ M universe —
    // the formula's exact integer value, no float anywhere
    assert(est == (ThetaOps.K - 1).toLong * ThetaOps.M / ThetaOps.K)
  }

  test("gate verdicts hold on the fixture: every estimate within ±30%") {
    val row = ThetaOps.thetaSketchOverlap(spark, sf).head()
    for (c <- Seq("r_ok", "a_ok", "union_ok", "common_ok"))
      assert(row.getAs[Int](c) == 1, s"$c failed: $row")
    // non-vacuous: the R/A sets are genuinely sketched (above K) at
    // sf0.001 and genuinely overlap partially
    assert(row.getAs[Long]("exact_r") > ThetaOps.K)
    val common = row.getAs[Long]("exact_common")
    assert(common > 0 && common < row.getAs[Long]("exact_union"))
  }

  test("streamed sketch folds ≡ fresh full build, and redelivery is a " +
      "no-op (set-union K-min is idempotent — no epoch ledger needed)") {
    val db = "theta_stream_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val keys = Tables.t(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag").as("tag"), col("l_orderkey").as("key"))
    val sink = ThetaOps.thetaSink(db)
    val batches = Seq(
      keys.filter(col("key") % 3 === 0), keys.filter(col("key") % 3 === 1),
      keys.filter(col("key") % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) => sink(b, i.toLong) }
    def dump() = spark.table(s"`$db`.`${ThetaOps.ThetaTable}`")
      .orderBy("tag", "hv").collect().toSeq.map(_.toSeq)
    val streamed = dump()
    // redeliver the last batch (crash-replay window): bit-identical
    sink(batches.last, 2L)
    assert(dump() == streamed, "redelivered batch must fold to a no-op")
    // fresh full build over the union
    val db2 = "theta_fresh_spec"
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    ThetaOps.buildThetaSketch(keys, db2)
    val fresh = spark.table(s"`$db2`.`${ThetaOps.ThetaTable}`")
      .orderBy("tag", "hv").collect().toSeq.map(_.toSeq)
    assert(streamed == fresh)
    // serve: estimates come straight off the ≤2K-row stored sample
    val est = ThetaOps.thetaEstimatesFromModel(spark, db)
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Long]("est")).toMap
    assert(est.keySet == Set("R", "A") && est.values.forall(_ > 0))
  }

  test("daily rollup: the range row equals a from-scratch range sketch " +
      "(merging per-day samples loses nothing) and days cover the span") {
    val rows = ThetaOps.thetaDaily(spark, sf).collect()
    val days = rows.map(_.getAs[Long]("day")).filter(_ >= 0)
    assert(days.nonEmpty && days.distinct.length == days.length)
    val rangeRow = rows.find(_.getAs[Long]("day") == -1L).get
    // recompute the range estimate directly from the raw per-day keys —
    // the merge law instantiated on this operator
    val direct = Tables.t(spark, sf, "events")
      .select(expr("ts div 86400000000000").as("day"),
        concat_ws(":", col("user_id"),
          expr("(ts % 86400000000000) div 60000000000")).as("k"))
      .filter(col("day") >= ThetaOps.DailyRangeLo &&
        col("day") < ThetaOps.DailyRangeHi)
      .select(lit("r").as("tag"), ThetaOps.hvOf(col("k")).as("hv"))
      .distinct()
    val ds = ThetaOps.kMin(direct)
      .agg(max("hv").as("theta"), count(lit(1)).as("cnt")).head()
    assert(rangeRow.getAs[Long]("theta") == ds.getAs[Long]("theta")
      && rangeRow.getAs[Long]("cnt") == ds.getAs[Long]("cnt"),
      s"merged-range sample must equal the direct range sketch: " +
        s"$rangeRow vs $ds")
  }

  test("hash is the documented 48-bit md5 fold (cross-engine contract)") {
    val got = spark.range(1).select(ThetaOps.hvOf(lit(42L)))
      .head.getLong(0)
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = java.lang.Long.parseLong(md5hex.take(12), 16) + 1
    assert(got == want)
  }
}
