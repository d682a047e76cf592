package graft

import org.scalatest.funsuite.AnyFunSuite

/** The quiet-reference adjudication and serve-budget machinery must turn
  * the BENCHLOG prose rules into decisions: a planted slow serve
  * breaches its budget, a loaded-host run reads "contended" (never
  * "regressed"), and the committed BENCH_QUIET.json parses.
  */
class BenchQuietSpec extends AnyFunSuite {

  private val ref = BenchQuiet.Ref(
    calibMin = 0.065,
    sf = "/root/testdata/sf0.1",
    queries = Map("q_big" -> 3.0, "q_small" -> 0.2, "q_mid" -> 1.0),
    serveBudgets = Map("lm" -> 1.5, "bpe" -> 1.0))

  test("quiet host, no growth: in-band") {
    val (v, r) = BenchQuiet.adjudicate(ref,
      Map("q_big" -> 3.2, "q_small" -> 0.5, "q_mid" -> 1.1), 0.066, 1.2)
    assert(v == "in-band" && r.isEmpty)
  }

  test("quiet host, 2x growth with real seconds: regressed, ratio named") {
    val (v, r) = BenchQuiet.adjudicate(ref,
      Map("q_big" -> 7.0, "q_mid" -> 1.1), 0.066, 1.2)
    assert(v == "regressed" && r == Map("q_big" -> 2.33), (v, r))
  }

  test("sub-noise-floor anchors never adjudicate by ratio") {
    // 0.2 s → 0.9 s is 4.5x but under both the anchor floor and the
    // absolute-delta gate — the r4/r6 phantom-regression shape
    val (v, r) = BenchQuiet.adjudicate(ref, Map("q_small" -> 0.9), 0.066, 1.2)
    assert(v == "in-band" && r.isEmpty, (v, r))
  }

  test("loaded host: contended takes precedence over apparent regressions") {
    val (v, r) = BenchQuiet.adjudicate(ref,
      Map("q_big" -> 9.0), calibMin = 0.13, hostLoadIndex = 1.2)
    assert(v == "contended", (v, r))
    val (v2, _) = BenchQuiet.adjudicate(ref,
      Map("q_big" -> 9.0), calibMin = 0.066, hostLoadIndex = 2.5)
    assert(v2 == "contended")
  }

  test("disk-probe contention reads contended even when the CPU probe " +
      "is quiet (the q_dedup_clusters false-regressed shape)") {
    val withIo = ref.copy(calibIoMin = Some(0.2))
    // quiet CPU, 2x+ disk floor, a checkpoint-bound gate inflated 2.4x:
    // the verdict must blame the HOST, not the code
    val (v, _) = BenchQuiet.adjudicate(withIo, Map("q_big" -> 7.2),
      calibMin = 0.066, hostLoadIndex = 1.2, calibIoMin = Some(0.45))
    assert(v == "contended", v)
    // same run without an anchored I/O floor: CPU gates only (pre-r13
    // anchors), so the flag surfaces as regressed for the A/B escalation
    val (v2, r2) = BenchQuiet.adjudicate(ref, Map("q_big" -> 7.2),
      calibMin = 0.066, hostLoadIndex = 1.2, calibIoMin = Some(0.45))
    assert(v2 == "regressed" && r2.nonEmpty, (v2, r2))
  }

  test("deliberate slow serve breaches its budget; others do not") {
    val models = Seq(
      "lm" -> Seq("build_s" -> 5.0, "serve_s" -> 4.0),  // planted breach
      "bpe" -> Seq("build_s" -> 2.0, "serve_s" -> 0.3),
      "unbudgeted" -> Seq("build_s" -> 1.0, "serve_s" -> 99.0))
    assert(BenchQuiet.serveBreaches(models, ref.serveBudgets) == Seq("lm"))
  }

  test("planted slow build and append breach their own budgets") {
    // round-14 verdict #6: the same rule shape guards the build leg and
    // the state-sensitive incremental append leg
    val buildBudgets = Map("lm" -> 4.0, "cluster_state" -> 8.0)
    val appendBudgets = Map("cluster_state" -> 9.5)
    val models = Seq(
      "lm" -> Seq("build_s" -> 9.0, "serve_s" -> 0.5),   // planted breach
      "cluster_state" -> Seq("build_s" -> 4.0,
        "append_s" -> 22.0, "serve_s" -> 0.4))           // planted breach
    assert(BenchQuiet.phaseBreaches(models, buildBudgets, "build_s") ==
      Seq("lm"))
    assert(BenchQuiet.phaseBreaches(models, appendBudgets, "append_s") ==
      Seq("cluster_state"))
    // a family with no budget for the phase never breaches
    assert(BenchQuiet.phaseBreaches(models, Map.empty, "append_s").isEmpty)
  }

  test("breadth fallback: uniform inflation reads contended even when " +
      "both probes sit under their gates (the r13 false-regressed shape)") {
    val wide = BenchQuiet.Ref(calibMin = 0.0577, sf = "sf",
      queries = (1 to 6).flatMap(i => Seq(
        s"q_fama${i}_x" -> 2.0, s"q_famb${i}_y" -> 3.0)).toMap,
      serveBudgets = Map.empty)
    // 12 anchored queries across 12 families at 1.6-1.8x, CPU calib at
    // 1.22x (under the 1.25 gate — exactly the r13 driver run's shape)
    val measured = wide.queries.map { case (n, a) => n -> a * 1.7 }
    val (v, _) = BenchQuiet.adjudicate(wide, measured,
      calibMin = 0.0577 * 1.22, hostLoadIndex = 1.3)
    assert(v == "contended", v)
    // the same inflation confined to ONE family stays regressed — a real
    // code regression clusters in the changed operator's family
    val narrow = BenchQuiet.Ref(calibMin = 0.0577, sf = "sf",
      queries = (1 to 12).map(i => s"q_fama_v$i" -> 2.0).toMap,
      serveBudgets = Map.empty)
    val (v2, r2) = BenchQuiet.adjudicate(narrow,
      narrow.queries.map { case (n, a) => n -> a * 2.5 },
      calibMin = 0.0577 * 1.22, hostLoadIndex = 1.3)
    assert(v2 == "regressed" && r2.size == 12, (v2, r2.size))
  }

  test("committed BENCH_QUIET.json loads: every registry gate anchored, " +
      "ten budgets") {
    val r = BenchQuiet.load("BENCH_QUIET.json")
    assert(r.nonEmpty, "committed reference must parse")
    // anchors regenerate per quiet close (tools/make_quiet.py); every
    // CURRENT registry gate must carry one — a gate added without a
    // fresh quiet anchor escapes regression adjudication silently
    val unanchored = SparkEntry.queries.keySet -- r.get.queries.keySet
    assert(unanchored.isEmpty,
      s"registry gates without a quiet anchor: $unanchored")
    assert(r.get.serveBudgets.size == 10, r.get.serveBudgets)
    assert(r.get.calibMin > 0.03 && r.get.calibMin < 0.1)
    // anchors carry their corpus — Bench refuses cross-sf adjudication
    assert(r.get.sf == "/root/testdata/sf0.1", r.get.sf)
    // every budget honors the documented floor
    assert(r.get.serveBudgets.values.forall(_ >= 1.0))
  }

  test("missing reference degrades to None, never throws") {
    assert(BenchQuiet.load("/nonexistent/BENCH_QUIET.json").isEmpty)
  }
}
