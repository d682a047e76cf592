package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._

/** The corpus-assembly DAG's staging/lineage/recovery contract: stages
  * materialize once, stamps gate the resume path, a mid-pipeline crash
  * recomputes exactly the unfinished suffix, and the scheduled entry
  * drives a fresh run. (Value correctness of the composed pipeline is the
  * q_corpus_pipeline oracle's job — these tests own the MACHINERY.)
  */
class CorpusPipelineSpec extends SparkSpec {

  private def finalRows() =
    spark.table(s"`${CorpusPipeline.Db}`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq

  private def stamps(): Map[String, String] =
    CorpusPipeline.Stages.flatMap(st =>
      CorpusPipeline.lineageOf(spark, st).map(l => st -> l._3)).toMap

  test("fresh run materializes all stages; resume skips them all") {
    val r1 = CorpusPipeline.run(spark, sf, resume = false)
    assert(r1.map(_.stage) == CorpusPipeline.Stages)
    assert(r1.forall(!_.skipped))
    val rows = finalRows()
    assert(rows.nonEmpty, "pipeline produced an empty packed corpus")
    // every stage stamped with its lineage key + recipe
    val keys = CorpusPipeline.lineageKeys(sf)
    CorpusPipeline.Stages.foreach { st =>
      val l = CorpusPipeline.lineageOf(spark, st)
      assert(l.exists(_._1 == keys(st)), s"$st missing/wrong lineage key")
      assert(l.exists(_._2.nonEmpty), s"$st missing human-readable lineage")
    }
    val s1 = stamps()
    // resume: nothing recomputes, stamps untouched, content identical
    val r2 = CorpusPipeline.run(spark, sf, resume = true)
    assert(r2.forall(_.skipped), s"resume recomputed: ${r2.filterNot(_.skipped)}")
    assert(stamps() == s1)
    assert(finalRows() == rows)
    // a FRESH run recomputes everything even when stamps match
    val r3 = CorpusPipeline.run(spark, sf, resume = false)
    assert(r3.forall(!_.skipped))
    assert(finalRows() == rows, "fresh re-run changed the deterministic output")
  }

  test("mid-pipeline crash: resume recomputes exactly the unfinished suffix") {
    intercept[RuntimeException] {
      CorpusPipeline.run(spark, sf, resume = false,
        failAfter = Some("s2_dedup"))
    }
    // the crashed run's prologue cleared all stamps; only the completed
    // prefix is re-stamped
    val afterCrash = stamps()
    assert(afterCrash.keySet == Set("s1_clean", "s2_dedup"),
      s"expected only the completed prefix stamped, got $afterCrash")
    val r = CorpusPipeline.run(spark, sf, resume = true)
    val skipped = r.filter(_.skipped).map(_.stage)
    assert(skipped == Seq("s1_clean", "s2_dedup"),
      s"resume should skip the stamped prefix, skipped=$skipped")
    // the prefix tables were NOT rewritten (stamps identical)...
    val afterResume = stamps()
    assert(afterResume("s1_clean") == afterCrash("s1_clean"))
    assert(afterResume("s2_dedup") == afterCrash("s2_dedup"))
    assert(afterResume.keySet == CorpusPipeline.Stages.toSet)
    // ...and the recovered output equals a pristine fresh run's
    val recovered = finalRows()
    CorpusPipeline.run(spark, sf, resume = false)
    assert(finalRows() == recovered,
      "crash-recovered output diverged from a pristine run")
  }

  test("an invalidated stage forces the whole downstream suffix to recompute") {
    CorpusPipeline.run(spark, sf, resume = false)
    // corrupt s3's stored key (stands in for any mid-chain invalidation:
    // crashed stamp-clearing, manual rebuild, recipe change). s3 must
    // recompute — and then s4/s5 MUST too, even though their stored keys
    // still match the structural chain: structural keys can't see that
    // upstream DATA was rebuilt, so trusting a stamped suffix over a
    // recomputed prefix would serve output not derived from its inputs
    spark.sql(s"ALTER TABLE `${CorpusPipeline.Db}`.`s3_decontam` " +
      s"SET TBLPROPERTIES ('${CorpusPipeline.LineageKeyProp}'='stale')")
    val r = CorpusPipeline.run(spark, sf, resume = true)
    assert(r.filter(_.skipped).map(_.stage) == Seq("s1_clean", "s2_dedup"),
      s"prefix above the invalidation should skip: $r")
    assert(r.filterNot(_.skipped).map(_.stage) ==
      Seq("s3_decontam", "s4_mix", "s5_pack"),
      s"the invalidated stage AND its downstream must recompute: $r")
  }

  test("s2 self-probe reads the bucketed index with zero exchange") {
    CorpusPipeline.run(spark, sf, resume = true)
    val idx = spark.table(
      s"`${CorpusPipeline.Db}`.`${CorpusPipeline.IndexTable}`")
    val verdicts = graft.ops.IncrementalDedup.incrementVerdicts(
      idx, idx, spark.table(s"`${CorpusPipeline.Db}`.`s1_clean`"))
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = verdicts.queryExecution.executedPlan.toString
      // the probe join itself: bucketed scan on BOTH sides — the band
      // keys carry NO exchange at all (the one hashpartitioning exchange
      // in the plan is the doc_id aggregation/join downstream)
      assert(plan.contains("SelectedBucketsCount"), plan.take(1200))
      assert(!"Exchange hashpartitioning\\(band_idx".r.findFirstIn(plan).isDefined,
        s"self-probe should read the bucketed index in place:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("jsonl export: one dir per shard, assignments agree with s5_pack, " +
      "rows are self-contained training data") {
    CorpusPipeline.run(spark, sf, resume = true)
    val out = TempDirs.create("graft-corpus-export")
    CorpusPipeline.exportJsonl(spark, out)
    val shards = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(shards.nonEmpty, "no shard directories written")
    val exported = spark.read
      .schema("doc_id LONG, source STRING, n_tokens LONG, seq_id LONG, " +
        "text STRING, shard_rank INT")
      .json(s"$out/shard=*")
    val s5 = spark.table(s"`${CorpusPipeline.Db}`.`s5_pack`")
    assert(exported.count() == s5.count())
    // per-doc (seq_id, rank) assignments identical to the stored table
    val a = exported.select("doc_id", "seq_id", "shard_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = s5.select("doc_id", "seq_id", "shard_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b, "export assignments diverged from s5_pack")
    // self-contained: every exported row carries its text
    assert(exported.filter(col("text").isNull || length(col("text")) === 0)
      .count() == 0)
  }

  test("lineage report reflects freshness without scanning stage data") {
    CorpusPipeline.run(spark, sf, resume = false)
    val rows = CorpusPipeline.report(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getBoolean(2), r.getString(4))).toMap
    assert(rows.keySet == CorpusPipeline.Stages.toSet)
    assert(rows.values.forall(_._1), s"all stages should be fresh: $rows")
    assert(rows.values.forall(_._2.nonEmpty), "stamps should be recorded")
    // corrupt one stage's key: that row (alone) reads stale
    spark.sql(s"ALTER TABLE `${CorpusPipeline.Db}`.`s4_mix` " +
      s"SET TBLPROPERTIES ('${CorpusPipeline.LineageKeyProp}'='stale')")
    val after = CorpusPipeline.report(spark, sf).collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!after("s4_mix") && after("s3_decontam") && after("s5_pack"))
  }

  private def setDbProp(k: String, v: String): Unit =
    spark.sql(s"ALTER DATABASE `${CorpusPipeline.Db}` " +
      s"SET DBPROPERTIES ('$k'='$v')")

  private def dbProp(k: String): Option[String] =
    spark.sessionState.catalog.getDatabaseMetadata(CorpusPipeline.Db)
      .properties.get(k).filter(_.nonEmpty)

  test("run lease: a held lease refuses a second run; a stale lease is " +
      "taken over; success and crash both release") {
    graft.store.Warehouse.ensureDatabase(spark, CorpusPipeline.Db)
    // someone else's UNEXPIRED lease → refused, stage tables untouched
    val before = stamps()
    setDbProp(CorpusPipeline.LeaseProp,
      s"other-runner:${System.currentTimeMillis() + 60000}")
    intercept[CorpusPipeline.LeaseHeldException] {
      CorpusPipeline.run(spark, sf, resume = true)
    }
    assert(stamps() == before, "a refused run must not touch stage state")
    // the refused run must NOT have cleared the holder's lease
    assert(dbProp(CorpusPipeline.LeaseProp).exists(_.startsWith("other-runner:")),
      "loser must not release the winner's lease")
    // a STALE lease (holder died; expiry in the past) is taken over
    setDbProp(CorpusPipeline.LeaseProp,
      s"dead-runner:${System.currentTimeMillis() - 1000}")
    CorpusPipeline.run(spark, sf, resume = true)
    // ...and a completed run releases: the property is empty again
    assert(dbProp(CorpusPipeline.LeaseProp).isEmpty,
      "a completed run must release its lease")
    // an in-JVM crash (injected failpoint) releases too — the finally path
    intercept[RuntimeException] {
      CorpusPipeline.run(spark, sf, resume = false, failAfter = Some("s1_clean"))
    }
    assert(dbProp(CorpusPipeline.LeaseProp).isEmpty,
      "a crashed (in-JVM) run must release its lease on the way out")
    // restore green state for later tests
    CorpusPipeline.run(spark, sf, resume = true)
  }

  test("prologue marker: set only while an interrupted fresh run owns the " +
      "stamps; retry-resume is honored iff it is set") {
    import java.time.LocalDateTime
    // a COMPLETED run leaves the marker clear
    CorpusPipeline.run(spark, sf, resume = false)
    assert(!CorpusPipeline.prologueDone(spark),
      "marker must clear when a run completes")
    // a crash AFTER the prologue leaves it set → scheduled retry RESUMES
    val fail = new java.util.concurrent.atomic.AtomicReference[Option[String]](
      Some("s2_dedup"))
    var attempts = 0
    val entry = CorpusPipeline.scheduleEntry("corpus2", "0 3 * * *", sf,
      failAfter = () => { attempts += 1; fail.get() })
    val runner = new pipeline.ScheduleRunner(Seq(entry),
      LocalDateTime.parse("2026-03-01T00:00:00"))
    assert(runner.tick(spark,
      LocalDateTime.parse("2026-03-01T03:00:00")).isEmpty) // fire 1 crashes
    assert(CorpusPipeline.prologueDone(spark),
      "marker must survive a post-prologue crash — it authorizes the resume")
    val prefixStamps = stamps()
    fail.set(None)
    // the retry (window not advanced) must RESUME: s1/s2 untouched
    val r2 = runner.tick(spark, LocalDateTime.parse("2026-03-01T03:05:00"))
    assert(r2 == Seq("corpus2"))
    assert(attempts == 2)
    val afterRetry = stamps()
    assert(afterRetry("s1_clean") == prefixStamps("s1_clean") &&
      afterRetry("s2_dedup") == prefixStamps("s2_dedup"),
      "retry with the marker set must RESUME — prefix stamps untouched")
    assert(afterRetry.keySet == CorpusPipeline.Stages.toSet)
    assert(!CorpusPipeline.prologueDone(spark),
      "the completing retry must clear the marker")
    // the ADVICE scenario: a fire dies BEFORE its prologue completes,
    // leaving the PREVIOUS fire's stamps standing and the marker clear
    // (a pre-prologue death never set it). The in-memory crash flag alone
    // would resume and skip every stage; the marker forces FRESH.
    val fail2 = new java.util.concurrent.atomic.AtomicReference[Option[String]](
      Some("s5_pack"))
    val entry2 = CorpusPipeline.scheduleEntry("corpus3", "0 3 * * *", sf,
      failAfter = () => fail2.get())
    val runner2 = new pipeline.ScheduleRunner(Seq(entry2),
      LocalDateTime.parse("2026-04-01T00:00:00"))
    assert(runner2.tick(spark,
      LocalDateTime.parse("2026-04-01T03:00:00")).isEmpty) // crash sets the flag
    // simulate the pre-prologue death's observable state: marker clear,
    // stamps standing (here: the crashed run's own completed stages)
    setDbProp(CorpusPipeline.PrologueProp, "")
    val stale = stamps()
    fail2.set(None)
    assert(runner2.tick(spark,
      LocalDateTime.parse("2026-04-01T03:05:00")) == Seq("corpus3"))
    // with the marker clear the retry ran FRESH: every stage carries a
    // NEW stamp — nothing was skipped over the stale prefix
    val afterFresh = stamps()
    assert(afterFresh.keySet == CorpusPipeline.Stages.toSet)
    stale.keys.foreach { st =>
      assert(afterFresh(st) != stale(st),
        s"$st was skipped on a marker-less retry — the ADVICE bug")
    }
  }

  test("incremental assembly: lease enforced, fast-path re-entry, " +
      "batch-appended state equals a fresh full run") {
    import graft.store.Warehouse
    val db = CorpusPipeline.IncDb
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    Warehouse.ensureDatabase(spark, db)
    // a held lease refuses the increment too
    CorpusPipeline.acquireLease(spark, db)
    intercept[CorpusPipeline.LeaseHeldException] {
      CorpusPipeline.runIncrement(spark, sf, db)
    }
    spark.sql(s"ALTER DATABASE `$db` SET DBPROPERTIES " +
      s"('${CorpusPipeline.LeaseProp}'='')")

    // full increment: base fresh run + batch append
    val r1 = CorpusPipeline.runIncrement(spark, sf, db)
    assert(r1.map(_.stage) == CorpusPipeline.Stages && r1.forall(!_.skipped))
    val incRows = spark.table(s"`$db`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    assert(incRows.nonEmpty)

    // fast path: a second call skips everything (state already appended)
    val r2 = CorpusPipeline.runIncrement(spark, sf, db)
    assert(r2.forall(_.skipped), s"re-increment must fast-path: $r2")

    // EQUIVALENCE: the appended state must equal a fresh run over the
    // WHOLE corpus (the oracle proves this at sf0.01; this is the fast
    // in-suite version at sf0.001)
    CorpusPipeline.run(spark, sf, resume = false)
    val freshRows = spark.table(s"`${CorpusPipeline.Db}`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    assert(incRows == freshRows,
      "batch-appended packed corpus diverged from the fresh full run")
  }

  test("incremental assembly: base state is reused, and unaffected " +
      "export shards are file-bit-identical after the append") {
    import graft.store.Warehouse
    import org.apache.spark.sql.functions.{col, length}
    val db = "graft_corpus_synth"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")

    // synthetic corpus engineered so the batch delta is CONFINED to one
    // shard: srcA's docs (and the one batch doc) all hash to the same
    // shard; the other sources spread across the rest
    def shardOf(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hx = "0123456789abcdef"
      (hx.indexOf(hex(0)) * 13 + hx.indexOf(hex(1))) % 8
    }
    // quality-gate-passing text: >= 20 tokens, stop ratio in [0.05, 0.6]
    def text(id: Long) = s"the quick document $id of a series to index " +
      s"and measure with twenty or more unique tokens alpha$id beta$id " +
      s"gamma$id delta$id epsilon$id zeta$id eta$id theta$id"
    val targetShard = shardOf(10011L)
    // batch doc id: > 9/10 of maxId; base srcA ids: same shard, <= threshold
    val batchId = 10011L
    val srcAIds = (1000L to 8000L)
      .filter(i => shardOf(i) == targetShard && i % 100 != 7).take(3)
    val otherIds = (1L to 400L)
      .filter(i => shardOf(i) != targetShard && i % 100 != 7).take(12)
    val baseIds = srcAIds ++ otherIds
    import spark.implicits._
    def mkDocs(ids: Seq[Long], batched: Boolean) = {
      val rows = ids.map(i => (i,
        text(i),
        "en",
        if (srcAIds.contains(i) || i == batchId) "srcA"
        else s"src${(i % 3).toInt}")) ++
        (if (batched) Seq((batchId, text(batchId), "en", "srcA")) else Nil)
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    val baseDocs = mkDocs(baseIds, batched = false)
    val allDocs = mkDocs(baseIds, batched = true)
    val maxId = batchId
    val threshold = maxId * 9L / 10L
    assert(baseIds.forall(_ <= threshold), "base ids must stay below the split")

    // 1. seed the base state (yesterday's scheduled run)
    CorpusPipeline.runFresh(spark, baseDocs, s"syn#base<=$threshold", db)
    val s5Dir = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("s5_pack",
          Some(db))).location.toString))
    def fileState(): Map[String, Seq[(String, Long, Long)]] =
      Option(s5Dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("shard=")).map { d =>
          d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.length(), f.lastModified())).toSeq.sorted
        }.toMap
    val before = fileState()
    assert(before.size > 1, s"need multiple shard partitions, got $before")

    // 2. the increment REUSES the base (no rebuild) and appends the batch
    val r = CorpusPipeline.runIncrementFrom(spark, allDocs, "syn", db)
    assert(r.forall(!_.skipped))
    val after = fileState()

    // the delta is confined to srcA -> exactly the target shard reshapes;
    // every other shard partition keeps its files BYTE-IDENTICAL (same
    // names, sizes, mtimes -- never rewritten)
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed == Set(s"shard=$targetShard"),
      s"expected only shard=$targetShard to change, got $changed " +
        s"(before=${before.keySet}, after=${after.keySet})")

    // and the appended state still equals a fresh run over the union
    val incRows = spark.table(s"`$db`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    val db2 = "graft_corpus_synth_fresh"
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    CorpusPipeline.runFresh(spark, allDocs, "syn-all", db2)
    val freshRows = spark.table(s"`$db2`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    assert(incRows == freshRows,
      "synthetic increment diverged from the fresh union run")
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("incremental assembly: a shard fully emptied by retro-flag " +
      "eviction drops its s5 partition (increment still equals fresh)") {
    import org.apache.spark.sql.functions.{col, length}
    val db = "graft_corpus_synth_empty"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    def shardOf(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hx = "0123456789abcdef"
      (hx.indexOf(hex(0)) * 13 + hx.indexOf(hex(1))) % 8
    }
    // three space-separated Hangul WORDS: the decontam gram is a word
    // trigram (unspaced CJK runs stay single tokens), so the shared
    // phrase must span three tokens to collide
    val cjk = "데이터 품질 평가"
    def text(id: Long) = s"the quick document $id of a series to index " +
      s"and measure with twenty or more unique tokens alpha$id beta$id " +
      s"gamma$id delta$id epsilon$id zeta$id eta$id theta$id"
    // victim: sole occupant of its shard, sharing a CJK trigram with the
    // batch's eval doc — the increment retro-evicts it, leaving the shard
    // with zero s4 rows (the r10 dynamic-overwrite stale-partition edge)
    val victimId = (1000L to 8000L).find(_ % 100 != 7).get
    val targetShard = shardOf(victimId)
    val otherIds = (1L to 400L)
      .filter(i => shardOf(i) != targetShard && i % 100 != 7).take(10)
    val batchEvalId = 10007L
    val batchAddId = (10010L to 10200L)
      .find(i => i % 100 != 7 && shardOf(i) != targetShard).get
    val threshold = math.max(batchEvalId, batchAddId) * 9L / 10L
    assert(victimId <= threshold && otherIds.forall(_ <= threshold))
    assert(batchEvalId > threshold && batchAddId > threshold)
    import spark.implicits._
    def df(rows: Seq[(Long, String, String, String)]) =
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
    val baseRows =
      (victimId, text(victimId) + " " + cjk, "en", "srcA") +:
        otherIds.map(i => (i, text(i), "en", s"src${(i % 3).toInt}"))
    val batchRows = Seq(
      (batchEvalId, s"evaluation reference $cjk", "en", "srcEval"),
      (batchAddId, text(batchAddId), "en", "srcB"))

    CorpusPipeline.runFresh(spark, df(baseRows), s"synE#base<=$threshold", db)
    assert(spark.table(s"`$db`.`s5_pack`")
      .filter(col("shard") === targetShard)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(victimId),
      "victim must be the target shard's sole occupant in the base state")
    val s5Dir = new java.io.File(new java.net.URI(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("s5_pack",
          Some(db))).location.toString))
    assert(new java.io.File(s5Dir, s"shard=$targetShard").exists())

    val r = CorpusPipeline.runIncrementFrom(
      spark, df(baseRows ++ batchRows), "synE", db)
    assert(r.forall(!_.skipped))
    // the emptied shard's partition is gone — rows AND files
    assert(spark.table(s"`$db`.`s5_pack`")
      .filter(col("shard") === targetShard).count() === 0L)
    assert(!new java.io.File(s5Dir, s"shard=$targetShard").exists(),
      "stale s5 partition directory survived the increment")
    // and the increment still equals a fresh run over the union
    val incRows = spark.table(s"`$db`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    val db2 = "graft_corpus_synth_empty_fresh"
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    CorpusPipeline.runFresh(spark, df(baseRows ++ batchRows), "synE-all", db2)
    val freshRows = spark.table(s"`$db2`.`s5_pack`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    assert(incRows == freshRows,
      "emptied-shard increment diverged from the fresh union run")
    spark.sql(s"DROP DATABASE IF EXISTS `$db2` CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("incremental assembly advances the ingest guard past the batch ids") {
    import org.apache.spark.sql.functions.{col, length}
    val db = "graft_corpus_synth_guard"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    def text(id: Long) = s"the quick document $id of a series to index " +
      s"and measure with twenty or more unique tokens alpha$id beta$id " +
      s"gamma$id delta$id epsilon$id zeta$id eta$id theta$id"
    import spark.implicits._
    def df(ids: Seq[Long]) = ids.map(i => (i, text(i), "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val ids = (1L to 30L).filter(_ % 100 != 7)
    CorpusPipeline.runIncrementFrom(spark, df(ids), "synG", db)
    // the guard must sit at the increment's maxId, not the base threshold:
    // a replayed ingest of ids inside (threshold, maxId] must be refused
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.corpusIngestBatch(spark, "replay", df(Seq(30L)), db)
    }
    assert(e.getMessage.toLowerCase.contains("append-only"),
      s"expected the append-only guard, got: ${e.getMessage}")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("streaming ingest: micro-batches advance s1/s2 + indexes through a " +
      "real streaming query, the scheduled remix recomputes the suffix, " +
      "and the final state equals a fresh run over the whole corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, max => smax}
    import spark.implicits._
    import java.time.LocalDateTime
    val db = "graft_corpus_stream"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")

    val docs = Tables.t(spark, sf, "documents")
    val maxId = docs.agg(smax("doc_id")).head.getLong(0)
    val (t0, t1) = (maxId / 3, 2 * maxId / 3)
    // yesterday's scheduled run: the base third, stamped for `sf`
    CorpusPipeline.runFresh(spark, docs.filter(col("doc_id") <= t0), sf, db)

    // the middle and top thirds arrive as STREAM micro-batches (ascending
    // ids across batches — the append-only contract)
    val rows = docs.filter(col("doc_id") > t0)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val (b1, b2) = rows.partition(_._1 <= t1)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = mem.toDF()
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch(CorpusPipeline.corpusIngestSink(sf, db))
      .start()
    try {
      mem.addData(b1.toIndexedSeq); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()

    // prefix stamped for sf, suffix invalidated
    val keys = CorpusPipeline.lineageKeys(sf)
    assert(CorpusPipeline.lineageOf(spark, "s1_clean", db)
      .exists(_._1 == keys("s1_clean")))
    assert(CorpusPipeline.lineageOf(spark, "s3_decontam", db).isEmpty,
      "ingest must invalidate the mix/pack suffix")
    // out-of-order ingest refused (append-only guard)
    intercept[IllegalArgumentException] {
      CorpusPipeline.corpusIngestBatch(spark, sf,
        Seq((1L, "dup text of an already seen id with enough tokens",
          "en", "src0", 40L))
          .toDF("doc_id", "text", "lang", "source", "n_chars"), db)
    }
    // a REPLAYED committed epoch (at-least-once recovery) is a no-op:
    // the stream ran epochs 0 and 1, so re-delivering epoch 1 must not
    // double-append (and must not trip the append-only guard either)
    val s1Before = spark.table(s"`$db`.`s1_clean`").count()
    CorpusPipeline.corpusIngestBatch(spark, sf,
      b2.toIndexedSeq.toDF("doc_id", "text", "lang", "source", "n_chars"),
      db, epochId = 1L)
    assert(spark.table(s"`$db`.`s1_clean`").count() == s1Before,
      "committed-epoch replay must append nothing")

    // the remix fires: resumes (s1/s2 skip), recomputes s3..s5 from the
    // streamed state without touching the accumulated blocklist
    val runner = new pipeline.ScheduleRunner(
      Seq(CorpusPipeline.remixEntry("remix", "0 4 * * *", sf, db)),
      LocalDateTime.parse("2026-05-01T00:00:00"))
    assert(runner.tick(spark,
      LocalDateTime.parse("2026-05-01T04:00:00")) == Seq("remix"))

    // equivalence: streamed-then-remixed state == a fresh full run
    def key(t: String, d0: String) = spark.table(s"`$d0`.`$t`")
      .select("doc_id", "source", "n_tokens", "seq_id", "shard", "shard_rank")
      .orderBy("doc_id").collect().toSeq
    CorpusPipeline.run(spark, sf, resume = false) // pristine, in Db
    assert(key("s5_pack", db) == key("s5_pack", CorpusPipeline.Db),
      "streamed + remixed corpus diverged from the fresh full run")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("per-source epoch ledgers: stream A's committed epoch does not " +
      "mask stream B's, and each stream's own replays still skip") {
    import org.apache.spark.sql.functions.{col, max => smax}
    import spark.implicits._
    val db = "graft_corpus_twostream"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val docs = Tables.t(spark, sf, "documents")
    val maxId = docs.agg(smax("doc_id")).head.getLong(0)
    val t0 = maxId / 2
    CorpusPipeline.runFresh(spark, docs.filter(col("doc_id") <= t0), sf, db)
    val rest = docs.filter(col("doc_id") > t0)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    def toDf(x: Seq[(Long, String, String, String, Long)]) =
      x.toDF("doc_id", "text", "lang", "source", "n_chars")
    val n = rest.length
    // two DIFFERENT streams deliver jointly-ascending id ranges; both use
    // the streaming engine's per-query epoch numbering, which starts at 0
    val aBatch = rest.slice(0, n / 3).toIndexedSeq
    val bBatch = rest.slice(n / 3, 2 * n / 3).toIndexedSeq
    CorpusPipeline.corpusIngestBatch(spark, "streamA", toDf(aBatch), db,
      epochId = 0L)
    val afterA = spark.table(s"`$db`.`s1_clean`").count()
    // a SCALAR ledger would classify B's epoch 0 as a committed replay of
    // A's and silently drop the batch — the per-source ledger must not
    CorpusPipeline.corpusIngestBatch(spark, "streamB", toDf(bBatch), db,
      epochId = 0L)
    val afterB = spark.table(s"`$db`.`s1_clean`").count()
    assert(afterB > afterA,
      "stream B's first epoch was masked by stream A's committed ledger")
    // each stream's OWN committed-epoch replays are still exact no-ops
    // (the skip also precedes the append-only guard, which a genuine
    // re-delivery of old ids would otherwise trip)
    CorpusPipeline.corpusIngestBatch(spark, "streamA", toDf(aBatch), db,
      epochId = 0L)
    CorpusPipeline.corpusIngestBatch(spark, "streamB", toDf(bBatch), db,
      epochId = 0L)
    assert(spark.table(s"`$db`.`s1_clean`").count() == afterB,
      "a committed-epoch replay appended rows")
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("legacy scalar epoch ledger: suppresses only PROVABLE redeliveries " +
      "(ids inside the ingested range), migrates to the replaying source " +
      "and retires; never masks fresh first-contact data") {
    import org.apache.spark.sql.functions.{col, max => smax}
    import spark.implicits._
    val db = "graft_corpus_legacy"
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    val docs = Tables.t(spark, sf, "documents")
    val maxId = docs.agg(smax("doc_id")).head.getLong(0)
    val t0 = maxId / 2
    CorpusPipeline.runFresh(spark, docs.filter(col("doc_id") <= t0), sf, db)
    def toDf(x: Seq[(Long, String, String, String, Long)]) =
      x.toDF("doc_id", "text", "lang", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    val old = rows(docs.filter(col("doc_id") <= t0)) // pre-upgrade range
    val (b0, b1) = rows(docs.filter(col("doc_id") > t0)).splitAt(
      rows(docs.filter(col("doc_id") > t0)).length / 2)
    def props = spark.sessionState.catalog.getDatabaseMetadata(db).properties
    // simulate a pre-upgrade db: the SCALAR ledger says epoch 3 committed
    spark.sql(s"ALTER DATABASE `$db` SET DBPROPERTIES " +
      s"('${CorpusPipeline.LastEpochProp}'='3')")
    val before = spark.table(s"`$db`.`s1_clean`").count()
    // a NEW stream's FRESH data at epoch 0 ≤ 3: the scalar must NOT mask
    // first-contact data (its ids lie beyond the ingested range — this
    // cannot be a redelivery, so a skip here would be silent data loss)
    CorpusPipeline.corpusIngestBatch(spark, "newStream", toDf(b0.toIndexedSeq),
      db, epochId = 0L)
    val afterNew = spark.table(s"`$db`.`s1_clean`").count()
    assert(afterNew > before,
      "the legacy scalar masked a new stream's first-contact data")
    // a MISCONFIGURED new source whose ids overlap the ingested range but
    // whose CONTENT was never ingested: the content proof (all text
    // hashes known) fails → falls through to the loud append-only guard
    // instead of a silent skip, and the scalar must NOT migrate
    val rogue = old.take(3).map { case (id, _, l, s, n) =>
      (id, s"rogue-first-contact-text-$id", l, s, n) }
    val rogueErr = intercept[IllegalArgumentException] {
      CorpusPipeline.corpusIngestBatch(spark, "rogueStream",
        toDf(rogue.toIndexedSeq), db, epochId = 1L)
    }
    assert(rogueErr.getMessage.contains("append-only"),
      "an overlapping-but-not-identical batch must trip the loud guard")
    assert(props.get(CorpusPipeline.LastEpochProp).exists(_.nonEmpty),
      "the scalar ledger must not migrate on a failed content proof")
    // the legacy stream redelivers its committed epoch 3 with ids wholly
    // INSIDE the pre-upgrade range: provably a redelivery → skipped, and
    // the scalar MIGRATES to this source's key and retires
    CorpusPipeline.corpusIngestBatch(spark, "legacyStream",
      toDf(old.toIndexedSeq), db, epochId = 3L)
    assert(spark.table(s"`$db`.`s1_clean`").count() == afterNew,
      "a provable legacy redelivery was re-processed")
    assert(!props.get(CorpusPipeline.LastEpochProp).exists(_.nonEmpty),
      "the scalar ledger must retire on migration")
    // the migrated stream advances normally...
    CorpusPipeline.corpusIngestBatch(spark, "legacyStream",
      toDf(b1.toIndexedSeq), db, epochId = 4L)
    val afterAdvance = spark.table(s"`$db`.`s1_clean`").count()
    assert(afterAdvance > afterNew)
    // ...and its old-epoch replays keep skipping via the MIGRATED key
    CorpusPipeline.corpusIngestBatch(spark, "legacyStream",
      toDf(old.toIndexedSeq), db, epochId = 3L)
    assert(spark.table(s"`$db`.`s1_clean`").count() == afterAdvance)
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
  }

  test("scheduled entry fires a fresh run on its cron") {
    import java.time.LocalDateTime
    spark.sql(s"DROP TABLE IF EXISTS `${CorpusPipeline.Db}`.`s5_pack`")
    val entry = CorpusPipeline.scheduleEntry("corpus", "0 3 * * *", sf)
    assert(entry.target == s"${CorpusPipeline.Db}.s5_pack")
    val runner = new pipeline.ScheduleRunner(Seq(entry),
      LocalDateTime.parse("2026-02-01T00:00:00"))
    val fired = runner.tick(spark, LocalDateTime.parse("2026-02-01T03:00:00"))
    assert(fired == Seq("corpus"))
    assert(finalRows().nonEmpty)
  }
}
