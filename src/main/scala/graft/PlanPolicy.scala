package graft

/** Machine-checked physical-plan policy (round-12 verdict #1): the scan
  * for scale-killing plan shapes used to be a human eye over PLANS.md —
  * BENCHLOG records it catching q_kendall_tau's global window by luck of
  * attention. This encodes the policy and [[PlanAudit]] FAILS on a
  * violation, so a Cartesian product or an unbounded single-partition
  * exchange cannot ship with plan evidence attached.
  *
  * Policy, applied to every registry query's FULL explain string (the
  * PLANS.md sections are 6000-char-truncated; the check is not):
  *
  *  - `CartesianProduct` — never legal. The engine has no unbounded
  *    cross shape anywhere; the knn probes use BroadcastNestedLoopJoin
  *    with a bounded broadcast side by design.
  *  - `Exchange SinglePartition` — legal only when its immediate child
  *    is a (partial) aggregate: that is the global-aggregate shape,
  *    whose exchange moves one pre-combined row per upstream partition
  *    (bounded by partition count, not data). Every other producer
  *    (sort, window, project, scan) would funnel DATA through one task
  *    and must be explicitly allowlisted below with the boundedness
  *    argument.
  *
  * Scalar subqueries/broadcast exchanges are not flagged: a broadcast is
  * bounded by the autoBroadcastJoinThreshold and the driver guards in
  * Guards.scala.
  */
object PlanPolicy {

  /** Queries allowed N non-aggregate-child SinglePartition exchanges.
    * Every entry carries the boundedness argument — the frame that
    * funnels through one task is NOT the corpus:
    *
    *  - q_abc_classification: one global cumulative-share window over
    *    the revenue-ranked PART CATALOG (dimension-bounded, ~2k rows at
    *    sf1; catalogs grow with SKUs, not with fact volume).
    *  - q_survival_km: the day-grid risk-set windows (2 sites) —
    *    day-bounded (≤ observation span), events fold into the grid
    *    beforehand (the sites sit above scalar-cross BNLJ frames).
    *  - q_interval_concurrency: running concurrency over the ±delta
    *    DAY grid (2 rows per day, span-bounded).
    *  - q_id_islands: gaps-and-islands needs one global id ordering by
    *    definition; the input is the doc_id COLUMN only (8 bytes/row),
    *    and production runs it per partition-range slice.
    *  - q_ks_test: the two-sample CDF merge over the distinct-CENTS
    *    value histogram (value-domain-bounded, ≤ 10⁵ cells).
    *  - q_calibration_bins / q_isotonic_calibration: ONE global rank
    *    over the scored EVAL SAMPLE (the reliability diagram ranks an
    *    eval slice, not the corpus — the operators' documented
    *    contract; offline-eval posture). Isotonic's count is 5 because
    *    the rank exchange sits inside the PlanCache-pinned bin frame,
    *    whose cached plan the explain prints once per reference — it
    *    EXECUTES once (round-13 audit: the same scan also caught this
    *    query's theta joins planning as CartesianProduct — fixed with
    *    broadcast hints on the bin-bounded sides, see
    *    TextOps.isotonicCalibration).
    *  - q_split_proportional: the Hamilton largest-remainder draw — a
    *    CONSTANT N rows (the requested sample) through one task.
    *
    * (Families one might expect here but which need NO entry because
    * their single-partition exchanges all sit above partial aggregates
    * — the structural exemption: the theta-sketch tails, key-skew's
    * count-of-counts, spearman/kendall's histogram ranks, the funnel
    * step summaries.)
    *
    * The counts pin today's plans EXACTLY: a new single-partition
    * exchange fails (count exceeded), and a plan that improves BELOW
    * its pin also fails — stale headroom would otherwise let future
    * data-funneling exchanges ship silently under the old allowance.
    */
  val singlePartitionAllow: Map[String, Int] = Map(
    "q_abc_classification" -> 1,
    "q_survival_km" -> 2,
    "q_interval_concurrency" -> 1,
    "q_id_islands" -> 1,
    "q_ks_test" -> 1,
    "q_calibration_bins" -> 1,
    "q_isotonic_calibration" -> 5,
    "q_split_proportional" -> 1)

  private val TreeArt = "^[\\s:+\\-]*".r
  private val CodegenTag = "^\\*\\(\\d+\\)\\s*".r

  /** Strip explain tree art + the whole-stage-codegen star tag from a
    * plan line, leaving the node name at the head.
    */
  private[graft] def nodeOf(line: String): String =
    CodegenTag.replaceFirstIn(TreeArt.replaceFirstIn(line, ""), "")

  private def isAggregate(node: String): Boolean =
    node.startsWith("HashAggregate") || node.startsWith("SortAggregate") ||
      node.startsWith("ObjectHashAggregate")

  /** Policy violations for one query's explain string. Empty = clean.
    * Pure text → text so the planted-violation spec can drive it with a
    * crafted plan and [[PlanAudit]] with the live registry.
    */
  def violations(name: String, explain: String): Seq[String] = {
    val lines = explain.linesIterator.toVector
    val cart = lines.count(l => nodeOf(l).startsWith("CartesianProduct"))
    val cartV =
      if (cart > 0) Seq(s"$name: $cart CartesianProduct node(s) — never legal")
      else Seq.empty
    val spIdx = lines.zipWithIndex.collect {
      case (l, i) if nodeOf(l).startsWith("Exchange SinglePartition") => i
    }
    val unexempt = spIdx.filterNot { i =>
      i + 1 < lines.size && isAggregate(nodeOf(lines(i + 1)))
    }
    val allowed = singlePartitionAllow.getOrElse(name, 0)
    val spV =
      if (unexempt.size > allowed)
        Seq(s"$name: ${unexempt.size} non-aggregate-child Exchange " +
          s"SinglePartition node(s) (allowlisted: $allowed) — children: " +
          unexempt.map(i => nodeOf(lines.lift(i + 1).getOrElse("<eof>"))
            .take(60)).mkString("[", " | ", "]"))
      else if (unexempt.size < allowed)
        Seq(s"$name: plan improved below its allowlist pin " +
          s"(${unexempt.size} < $allowed) — lower the PlanPolicy entry " +
          "so the stale headroom cannot absorb a future data-funneling " +
          "exchange")
      else Seq.empty
    cartV ++ spV
  }
}
