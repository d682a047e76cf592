package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Hermetic managed-table storage (same rationale as Verify): a stale
      // cwd/spark-warehouse must not fail the pipeline query's create path.
      .config("spark.sql.warehouse.dir", TempDirs.create("graft-bench-wh"))
      // Partition-listing goes driver-side up to 1024 paths (default 32):
      // the partitioned state tables (cluster labels ~TargetParts dirs,
      // the bucketed band/chunk indexes) pay a 0.3-0.6 s listing JOB per
      // read under the default, pure scheduling overhead on a local FS
      // where the driver lists hundreds of dirs in ms (guide §6). A real
      // deployment on an object store keeps the distributed listing by
      // lowering SPARK_GRAFT_LIST_THRESHOLD (or relies on manifest-based
      // table formats); >1024-partition tables still list distributed.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_THRESHOLD", "1024"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The split-gate queries materialize engine intermediates so the ORACLE
    // can read them — gate plumbing, not operator work (it inflated the
    // ANN family 2.4-3.7× in r6). Bench serves those frames UN-CHECKPOINTED
    // (identity gate) so per-query numbers measure the operator DAG alone;
    // Verify keeps the durable oracle contract. `ckpt_sec` below stays as
    // the audit trail that the gate share is actually ~0.
    // Scoped (withDurability), not a bare assignment: the flag is process-
    // global, and any future same-JVM verify after the bench must get the
    // durable contract back.
    OracleInputs.withDurability(false) {
    // Untimed engine warm-up: first parquet read + a shuffle compile so
    // per-query timings measure steady-state execution, not one-off JVM/
    // session initialization landing on whichever query runs first.
    try graft.Tables.t(spark, sfDir, "region")
      .groupBy("r_name").count().count()
    catch { case _: Throwable => () }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // In-band host-load evidence (three rounds of driver-vs-quiet-host
    // bench disputes needed an out-of-band re-run to adjudicate): a FIXED
    // pure-CPU calibration probe — no I/O, no shuffle, fully parallel —
    // interleaved through every pass. TWO signals, validated under a
    // 64-spinner hog (2x oversubscription, queries ~3x slower):
    //  1. `calib.min` (absolute): the best-case probe time. Identical
    //     code+config on the same host reproduces it, so two disputed
    //     runs compare DIRECTLY — the hogged run's min read 1.4-2.1x the
    //     quiet min. This is the adjudicator for load that spans the
    //     whole run (the r10 dispute shape), which any within-run
    //     statistic is structurally blind to.
    //  2. `host_load_index` (relative): max/min over per-pass probe
    //     minima — catches load that starts or stops mid-run without any
    //     cross-run reference. ~1.0-1.4 quiet (the probe inherits some
    //     of the neighbor queries' GC wake); >2 = a whole pass never saw
    //     an uncontended window.
    // samples grouped BY PASS: the reported index compares each pass's
    // own minimum against the global minimum — a quiet pass always lands
    // at least one clean probe among its ~9, while genuine external
    // contention inflates even the pass minimum. (Raw per-point
    // median/min read ~1.9 on a QUIET host at sf0.1: probes inherit the
    // neighbor queries' GC/page-cache wake, which is self-load.)
    val calibPasses =
      scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Double]]
    def calibSamples = calibPasses.flatten
    def calibrate(): Unit = {
      // bit_xor, not sum: the xor fold can never overflow under ANSI.
      // A failed probe records no sample — it must never abort the bench.
      // Each point is a MIN-OF-2: the first probe absorbs whatever GC the
      // preceding query left pending (at sf0.1 that self-load alone read
      // as index ~2 on a quiet host), the second measures CPU
      // availability — external contention still inflates both.
      try {
        val pair = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          spark.range(1L << 27).selectExpr("bit_xor(xxhash64(id)) AS h").collect()
          (System.nanoTime() - t0) / 1e9
        }
        calibPasses.last += pair.min
      } catch { case _: Throwable => () }
    }
    // one untimed probe run first: its codegen compile must not pollute
    // the first sample
    try spark.range(1L << 20).selectExpr("bit_xor(xxhash64(id)) AS h").collect()
    catch { case _: Throwable => () }
    // DISK calibration probe (round-13): the CPU probe is blind to I/O
    // contention, and the checkpoint-bound gates (connected components'
    // per-round localCheckpoint) are exactly the ones host disk pressure
    // inflates — a quiet-CPU run once flagged q_dedup_clusters 2.4× while
    // an A/B of identical code on the same host reproduced the 2× on BOTH
    // commits (BENCHLOG r13 false-regressed adjudication). One 64 MiB
    // write+read+delete per PASS through java.io.tmpdir (the same device
    // Spark's local dirs use here); min across passes anchors the same
    // way calib.min does. Best-effort — a probe failure records nothing.
    val ioSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ioPayload = Array.fill[Byte](64 << 20)(0x5a)
    def calibrateIo(): Unit =
      try {
        val f = java.nio.file.Files.createTempFile("graft-bench-io", ".bin")
        val t0 = System.nanoTime()
        java.nio.file.Files.write(f, ioPayload)
        val n = java.nio.file.Files.readAllBytes(f).length
        ioSamples += (System.nanoTime() - t0) / 1e9 + (n - n) // keep `n` live
        java.nio.file.Files.deleteIfExists(f)
      } catch { case _: Throwable => () }
    val CalibEvery = 15
    // (name, seconds, error). A failing query must surface its error, not a
    // fast wall-time — a swallowed exception here once masqueraded as the
    // round's cheapest pipeline run.
    def oneRun(): Seq[(String, Double, Option[String])] =
      SparkEntry.queries.toSeq.zipWithIndex.map { case ((name, fn), i) =>
        if (i % CalibEvery == 0) calibrate()
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        }
        (name, (System.nanoTime() - t0) / 1e9, err)
      }
    // Per-query MIN over `runs` passes: one loaded-machine spike must not
    // read as a regression (sf0.1 wall times vary up to ~3× with host
    // load). Cached state resets between passes so every pass measures a
    // cold plan, not the previous pass's persisted frames.
    val runs = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt, 1)
    // parsed BEFORE any timed work: a malformed value must fail fast, not
    // after minutes of passes with the JSON line still unprinted
    val extraPasses = math.max(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIVIAL_EXTRA", "2").toInt, 0)
    // seconds spent inside OracleInputs.checkpoint per main pass (local
    // mode) — reported so the operator/checkpoint split stays visible
    val ckptSecPerPass = scala.collection.mutable.ArrayBuffer.empty[Double]
    val perRun = (1 to runs).map { r =>
      OracleInputs.checkpointNanos.set(0L)
      calibPasses += scala.collection.mutable.ArrayBuffer.empty[Double]
      calibrateIo()
      val res = oneRun()
      ckptSecPerPass += OracleInputs.checkpointNanos.get / 1e9
      if (r < runs) {
        graft.ops.PlanCache.release(spark)
        spark.catalog.clearCache()
      }
      res
    }
    val names = perRun.head.map(_._1)
    val results = names.map { n =>
      val samples = perRun.map(_.find(_._1 == n).get)
      // min over SUCCESSFUL passes only — a failing pass aborts early, and
      // its fast wall time must not masquerade as the query's cheapest run.
      // The errors map reports a query only when EVERY pass failed; a query
      // that failed SOME passes surfaces in the flaky map instead
      // (intermittent OOM/race must not vanish behind its fastest success).
      val ok = samples.filter(_._3.isEmpty)
      val nFailed = samples.size - ok.size
      if (ok.nonEmpty) (n, ok.map(_._2).min, None, nFailed)
      else (n, samples.map(_._2).min, samples.flatMap(_._3).headOption, nFailed)
    }
    // Sub-second queries sit at the host-noise floor: a GC pause or
    // neighbor-query page-cache eviction is a 3× swing on a 0.15 s query
    // while it's invisible on a 3 s one, and two passes under-sample that
    // noise (r4 showed 0.13↔0.47 s drift on untouched trivial queries —
    // the per-pass resets were ruled out: they run OUTSIDE the timed
    // section). Extra min-passes for cheap queries only: total added cost
    // is bounded by (number of sub-second queries × 1 s × passes), and the
    // reported min converges to the real floor. Resets are skipped here —
    // PlanCache/persist only matter for the heavy queries, which never
    // take this path. A pass that FAILS counts into the flaky map like a
    // failed main pass — the stabilizer must not hide intermittent errors
    // behind the fastest success.
    // 1.5, not 1.0: the cutoff is a CLIFF — a query whose min-of-2 lands
    // just past it gets no stabilizer samples at all. r6's driver run
    // showed the failure: q_pack_sequences (true hot-JVM cost ~0.45 s, but
    // JIT-convergence-bound — cold floor ~0.8 s) was pushed to 1.42 s by
    // host contention, missed the 1.0 s gate, and recorded a phantom 3.6×
    // regression on unchanged code. 1.5 s gives the sub-second JIT-bound
    // queries contention headroom at a bounded price (only the handful of
    // 1-1.5 s queries gain extra passes).
    val ExtraPassCutoffSec = 1.5
    val stabilized = results.map {
      case (n, v, None, f) if v < ExtraPassCutoffSec && extraPasses > 0 =>
        val extra = (1 to extraPasses).map { _ =>
          val t0 = System.nanoTime()
          val err = try { SparkEntry.queries(n)(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e) }
          (if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else Double.MaxValue,
            err)
        }
        (n, math.min(v, extra.map(_._1).min), None,
          f + extra.count(_._2.nonEmpty))
      case other => other
    }
    // 4 decimals (0.1 ms): keeps the single JSON line well inside the
    // driver's tail-capture window (full double reprs pushed the r4 line's
    // head past it) without losing bench-relevant precision
    def r4(v: Double): Double = math.rint(v * 1e4) / 1e4
    // Entries CHEAPEST-FIRST: the capture window is a bytes-bounded TAIL of
    // stdout with post-program sbt noise after us, so when the full line
    // overflows it, the clip lands on the line's HEAD — ordering by cost
    // puts the sub-noise-floor entries there and keeps every expensive
    // entry (the ones a round is judged on) inside the window.
    val qs = stabilized.sortBy(_._2)
      .map { case (k, v, _, _) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val errs = stabilized.collect { case (k, _, Some(e), _) =>
      "\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val flaky = stabilized.collect { case (k, _, None, f) if f > 0 =>
      "\"" + k + "\":" + f }.mkString("{", ",", "}")
    val total = r4(stabilized.map(_._2).sum)
    val ckptSec = r4(ckptSecPerPass.min)
    // host_load_index: max over passes of (pass min / global min).
    // ~1.0-1.3 = quiet host (every pass found a clean probe window); >2 =
    // at least one whole pass ran without ANY uncontended moment — i.e.
    // sustained external CPU contention (the r10 dispute: 4× on identical
    // bytes), and that pass's per-query numbers are suspect. Raw min/max
    // over all points is still reported in `calib`.
    val passMins = calibPasses.filter(_.nonEmpty).map(_.min)
    val hostLoadIndex =
      if (passMins.size >= 2 && passMins.min > 0) r4(passMins.max / passMins.min)
      else {
        // single-pass run: no cross-pass baseline — fall back to
        // median/min within the pass (noisier: carries some self-load)
        val pts = calibSamples.toSeq.sorted
        if (pts.size >= 2) r4(pts(pts.size / 2) / pts.head) else 1.0
      }
    // ONE definition of the measured calib floor — the quiet verdict and
    // both JSON fields read it (two empty-case defaults once disagreed).
    val measuredCalibMin: Option[Double] =
      if (calibSamples.nonEmpty) Some(calibSamples.min) else None
    val calibJson = s"""{"n":${calibSamples.size},"min":${r4(
      measuredCalibMin.getOrElse(0.0))},"max":${r4(
      if (calibSamples.nonEmpty) calibSamples.max else 0.0)}}"""
    val measuredIoMin: Option[Double] =
      if (ioSamples.nonEmpty) Some(ioSamples.min) else None
    val calibIoJson = s"""{"n":${ioSamples.size},"min":${r4(
      measuredIoMin.getOrElse(0.0))},"max":${r4(
      if (ioSamples.nonEmpty) ioSamples.max else 0.0)}}"""
    // Stored-model build/serve split IN the bench record (round-12
    // verdict #4): the gate totals above conflate build+serve by design
    // (the oracle replays training), so a serve-path regression was
    // visible only to someone who ran PerfProbe. Timed AFTER the passes —
    // it must not perturb the per-query numbers — and best-effort: a
    // model-split failure must not lose the whole bench line.
    val modelRows = try Right(PerfProbe.modelSplitRows(spark, sfDir))
      catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
    val modelsJson = modelRows match {
      case Right(rows) => rows.map { case (name, phases) =>
        "\"" + name + "\":" + phases.map { case (p, v) =>
          "\"" + p + "\":" + r4(v) }.mkString("{", ",", "}")
      }.mkString("{", ",", "}")
      case Left(msg) => s"""{"error":"${esc(msg)}"}"""
    }
    // Quiet-reference adjudication + serve budgets (round-12 verdict #2
    // and #4, machinery in BenchQuiet): verdict in-band / contended /
    // regressed against the committed BENCH_QUIET.json anchors, and the
    // stored-model serve times checked against their budgets. Best-effort
    // by construction: no reference file → "no-ref", nothing fails.
    // sf gate: anchors are only comparable against the SAME corpus — a
    // run at another sf must read "no-ref", not "contended"/"regressed"
    // (per-query wall times and the calib's GC neighborhood both shift
    // with corpus size; the sf0.01 smoke run proved the confusion).
    val quietRef = BenchQuiet.load().filter(_.sf == sfDir)
    val measuredMap = stabilized.map { case (n, v, _, _) => n -> v }.toMap
    // No samples = the run cannot prove quietness: the verdict side
    // reads MaxValue (→ contended), the record side -1 (absent).
    val (quietVerdict, regressed) = quietRef
      .map(r => BenchQuiet.adjudicate(r, measuredMap,
        measuredCalibMin.getOrElse(Double.MaxValue), hostLoadIndex,
        measuredIoMin))
      .getOrElse(("no-ref", Map.empty[String, Double]))
    val serveBreach = quietRef.map(r => BenchQuiet.serveBreaches(
      modelRows.getOrElse(Seq.empty), r.serveBudgets)).getOrElse(Seq.empty)
    // round-14 verdict #6: the build and append legs get the same budget
    // guard as serve — an append-path regression (the most state-
    // sensitive leg) must land as a FLAG, not a number someone must read
    val buildBreach = quietRef.map(r => BenchQuiet.phaseBreaches(
      modelRows.getOrElse(Seq.empty), r.buildBudgets, "build_s"))
      .getOrElse(Seq.empty)
    val appendBreach = quietRef.map(r => BenchQuiet.phaseBreaches(
      modelRows.getOrElse(Seq.empty), r.appendBudgets, "append_s"))
      .getOrElse(Seq.empty)
    val regressedJson = regressed.toSeq.sortBy(-_._2).map { case (n, r) =>
      "\"" + n + "\":" + r }.mkString("{", ",", "}")
    val quietJson = quietRef match {
      case Some(r) =>
        s"""{"verdict":"$quietVerdict","anchor_calib_min":${r.calibMin},"measured_calib_min":${r4(
          measuredCalibMin.getOrElse(-1.0))},"n_anchored":${
          measuredMap.keys.count(r.queries.contains)},"regressed":$regressedJson}"""
      case None => s"""{"verdict":"no-ref"}"""
    }
    def breachJson(b: Seq[String]): String =
      b.map("\"" + _ + "\"").mkString("[", ",", "]")
    val serveBreachJson = breachJson(serveBreach)
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"flaky":$flaky,"gate_ckpt":"local","ckpt_sec":$ckptSec,"host_load_index":$hostLoadIndex,"calib":$calibJson,"calib_io":$calibIoJson,"models":$modelsJson,"quiet":$quietJson,"serve_breach":$serveBreachJson,"build_breach":${breachJson(buildBreach)},"append_breach":${breachJson(appendBreach)},"sf":"$sfDir","runs":$runs}"""
    // Full line to a file too — the lossless record when the stdout window
    // still clips (best-effort: a read-only checkout must not fail the run).
    val fullPath = "target/bench_full.json"
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), full)
    } catch { case _: Throwable => () }
    println(full)
    // Compact summary as the FINAL stdout line (stop() noise goes to
    // stderr): ~150 bytes, so the tail window always contains the totals
    // even when the full per-query line overflows it.
    println(s"""{"metric":"total_compact","value":$total,"unit":"sec","n":${stabilized.size},"n_err":${stabilized.count(_._3.nonEmpty)},"n_flaky":${stabilized.count(r => r._3.isEmpty && r._4 > 0)},"host_load_index":$hostLoadIndex,"quiet_verdict":"$quietVerdict","n_regressed":${regressed.size},"n_serve_breach":${serveBreach.size},"n_build_breach":${buildBreach.size},"n_append_breach":${appendBreach.size},"sf":"$sfDir","runs":$runs,"full":"$fullPath"}""")
    } // end withDurability(false)
    spark.stop()
  }
}
