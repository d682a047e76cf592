package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** IVF (inverted-file) coarse quantization: k-means index build/serve/
  * append (flat + sharded), nProbe tuning curve, and the cell-bucketed
  * semantic dedup / decontamination compositions.
  *
  * Mixin part of [[VectorOps]] (round-12 verdict #7 file-size pass:
  * split by family — pure moves; every call site still reads
  * `VectorOps.member`).
  */
private[graft] trait VectorIvfPart extends VectorCorePart {

  /** IVF (inverted-file) approximate nearest neighbor — the data-adaptive
    * complement to the hyperplane-LSH path: a k-means coarse quantizer
    * (hand-rolled Lloyd's in DataFrame ops, deterministic) learns
    * `nCells` centroids over the corpus, every vector lands in its
    * nearest centroid's inverted list, and a query probes only the
    * `nProbe` nearest cells, running exact cosine within them.
    *
    * Scale shape: train once (the "build the index" job), then search is
    * probe×centroid scoring against a BROADCAST 16-row centroid table
    * followed by a cell-keyed equi-join into the corpus — candidates ~
    * corpus × nProbe/nCells, never corpus×corpus. Top-1 of a probe is
    * always itself (its own cell is by definition its nearest centroid).
    * No oracle (centroids are engine-trained); property-tested: self-hit
    * invariant + recall floor vs the exact brute-force path.
    */
  val IvfCells = 16
  val IvfProbe = 4

  /** (cell assignments keyed by vec_id, centroid table (cell, centroid
    * array)). Assignments persist via PlanCache — the in-process analog of
    * writing the inverted lists to a table.
    *
    * The quantizer is Lloyd's k-means hand-rolled in DataFrame ops: each
    * iteration assigns vectors to their nearest centroid through a
    * BROADCAST join against the nCells-row centroid table (min(struct)
    * argmin — no window sort), then recomputes centroids with the
    * fixed-point exact aggregation from [[labelCentroid]] (order-
    * independent long sums → bit-deterministic across shuffles, unlike a
    * double avg). Only the nCells×dims centroid matrix ever reaches the
    * driver — index metadata, not data. Seeding is a deterministic
    * hash-ordered sample, so the whole index is reproducible run-to-run.
    * Cells that lose all members keep their previous centroid.
    */
  def ivfIndex(vectors: DataFrame, nCells: Int = IvfCells,
               iterations: Int = 2): (DataFrame, DataFrame) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // null/empty embeddings are unindexable (same contract as sketch());
    // a null seed centroid would otherwise win every NULLS-FIRST argmin
    // and silently collapse the index to one cell. Persist: the frame
    // feeds the seed sample, every Lloyd's iteration (twice each), and
    // the final assignment — one scan instead of ~6.
    val emb = PlanCache.swap("ivf-emb", vectors
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec")))
    // vec_id tie-break: two ids hashing equal would otherwise make the
    // seed sample depend on partition layout (orderBy is not stable)
    var cents: Map[Int, Seq[Double]] = emb
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nCells).collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1) }.toMap
    def centroidDf = cents.toSeq.sortBy(_._1).toDF("cell", "centroid")
    graft.functions.GraftFunctions.register(spark)
    def assign(cDf: DataFrame): DataFrame = assignToCells(emb, cDf)
    for (_ <- 1 to iterations) {
      val updated = emb.join(assign(centroidDf), "vec_id")
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .withColumn("xq", floor(col("x") * lit(1e9)).cast("bigint"))
        .groupBy("cell", "dim")
        .agg(sum("xq").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1))
            .map(r => r.getLong(2).toDouble / 1e9 / r.getLong(3)).toSeq
        }
      cents = cents ++ updated
    }
    val assignments = PlanCache.swap("ivf-assignments",
      emb.join(assign(centroidDf), "vec_id")
        .select(col("vec_id"), col("cell"), col("vec").as("embedding")))
    (assignments, centroidDf)
  }

  /** Frozen-centroid argmin assignment of a (vec_id, vec) frame against a
    * broadcast centroid table — the shared inner loop of the Lloyd's
    * build AND the incremental index appends (one definition, so an
    * appended vector gets EXACTLY the cell a rebuild at the same
    * centroids would give it). Native codegen fold; the corpus side is
    * never exchanged.
    */
  private[graft] def assignToCells(emb: DataFrame, cDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.crossJoin(broadcast(cDf))
      .withColumn("dist", call_function("vec_sqdist", col("vec"), col("centroid")))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"))
  }

  /** Names of the persisted IVF index tables ([[buildIvfIndex]]). */
  val IvfAssignmentsTable = "ivf_assignments"
  val IvfCentroidsTable = "ivf_centroids"

  /** Train-once made real: train the quantizer and land the inverted
    * lists + centroid table as warehouse tables, so any LATER session (or
    * a scheduled refresh job) serves searches from storage without
    * retraining. The session-lifetime PlanCache in [[ivfIndex]] is the
    * within-job analog; this is the cross-job index.
    */
  def buildIvfIndex(vectors: DataFrame, db: String, nCells: Int = IvfCells,
                    iterations: Int = 2): Unit = {
    val (assignments, centroids) = ivfIndex(vectors, nCells, iterations)
    graft.store.Warehouse.saveModel(assignments, db, IvfAssignmentsTable)
    graft.store.Warehouse.saveModel(centroids, db, IvfCentroidsTable)
  }

  /** Scheduled index refresh — composes with [[graft.pipeline.ScheduleRunner]]
    * so the IVF index rebuilds on a cron cadence like any other
    * materialization (the production posture for an ANN index over a
    * growing corpus: search always reads the stored tables; training cost
    * is paid on the schedule, not per query).
    */
  def ivfRefreshEntry(id: String, cronExpr: String, db: String,
                      vectors: SparkSession => DataFrame,
                      nCells: Int = IvfCells): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildIvfIndex(vectors(s), db, nCells))

  /** Serve top-k search from a stored index ([[buildIvfIndex]]) — no
    * training, no PlanCache: the inverted lists and centroids come off the
    * warehouse tables.
    */
  def ivfCosineTopkFromIndex(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val probes = t(s, d, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    searchIvf(s.table(s"`$db`.`$IvfAssignmentsTable`"),
      s.table(s"`$db`.`$IvfCentroidsTable`"), probes)
  }

  /** Top-k cosine search through the IVF index for the probe set
    * (vec_id < 5, same contract as [[knnCosineTopk]] so recall is directly
    * comparable).
    */
  def ivfCosineTopk(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val (assignments, centroids) = ivfIndex(emb)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    // split gate: WHICH neighbors the probed cells surface is
    // quantizer-dependent (rows-only), but given the materialized top-k
    // sets the cosines AND the rank order are exact — the oracle
    // recomputes both from the raw embeddings
    graft.OracleInputs.checkpoint(searchIvf(assignments, centroids, probes),
      d, "ivf_topk")
      .orderBy("probe_id", "rnk")
  }

  /** Probe-row count above which the probe side of the IVF search join is
    * too big to broadcast (probes × IvfProbe rows of id + 64-dim vector ≈
    * hundreds of MB at this limit — past it the broadcast would approach
    * the executor/driver memory ceiling). Below: broadcast-probe plan
    * (corpus streams, zero exchange). Above: salted shuffled join
    * ([[searchIvfCandidates]]).
    */
  val IvfBroadcastProbeLimit = 100000L

  /** Target corpus rows per (cell, salt) key in the large-probe shuffled
    * search join. The per-cell salt factor is ceil(occupancy / this) —
    * constant expected rows per join key regardless of corpus size or cell
    * skew, the same constant-occupancy law as [[adaptiveBandBits]].
    */
  val IvfSaltTargetRows = 4096L

  /** nProbe nearest cells per probe: scored against the broadcast centroid
    * table (nCells rows), ranked, kept — all on executors. `nProbe` above
    * the cell count degrades gracefully to probing every cell.
    */
  private[ops] def probeNearestCells(centroids: DataFrame, probes: DataFrame,
                                nProbe: Int = IvfProbe): DataFrame = {
    graft.functions.GraftFunctions.register(probes.sparkSession)
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cdist").asc, col("cell").asc)
    probes.crossJoin(broadcast(centroids))
      // native fold (bit-identical) — runs probes×nCells times, which for
      // corpus-sized probe batches is another O(n×nCells) interpreted loop
      .withColumn("cdist",
        call_function("vec_sqdist", col("probe_vec"), col("centroid")))
      .withColumn("crnk", row_number().over(wc))
      .filter(col("crnk") <= nProbe)
      .select(col("probe_id"), col("probe_vec"), col("cell"))
  }

  /** Exact-cosine candidates within the probed cells' inverted lists —
    * (probe_id, neighbor_id, cosine), one row per (probe, corpus vector in
    * a probed cell). Two plans by probe scale:
    *
    *  - `largeProbeSide = false` (query-style probe sets): the probe side
    *    (~probes×nProbe rows) is the BROADCAST side; the corpus-sized
    *    assignments frame must never be hash-partitioned on the
    *    nCells-value `cell` key (a SortMergeJoin there would funnel the
    *    whole corpus into ≤ nCells partitions — parallelism capped at
    *    nCells, hot cells skew).
    *  - `largeProbeSide = true` (corpus-sized probe batches, e.g. global
    *    semantic dedup): broadcasting the probe side would blow the
    *    broadcast limit, so the join shuffles BOTH sides — but on a SALTED
    *    key (cell, salt), not the raw nCells-value cell: each corpus row
    *    takes one deterministic salt in [0, saltN(cell)), each probe-cell
    *    row fans out across that cell's salts, so every (probe, corpus
    *    row) pair still meets exactly once while a hot cell's rows spread
    *    over saltN partitions. saltN comes from measured cell occupancy
    *    (an nCells-row broadcast side table), so parallelism tracks data
    *    volume instead of capping at nCells.
    */
  private[ops] def searchIvfCandidates(assignments: DataFrame, probeCells: DataFrame,
                                  largeProbeSide: Boolean): DataFrame = {
    graft.functions.GraftFunctions.register(assignments.sparkSession)
    // norms hoisted to ONCE per corpus row / probe-cell row BEFORE the
    // join: computed per candidate they'd run occupancy× redundant
    // 64-element folds (measured 3× the per-candidate cost of the dot
    // product alone). Same expression on the same values — bit-identical
    // cosines, just not recomputed.
    val corpus = assignments.select(col("cell"), col("vec_id").as("neighbor_id"),
        col("embedding").as("cand_vec"))
      .withColumn("cand_l2", sqrt(sumSq(col("cand_vec"))))
    val probed = probeCells.withColumn("probe_l2", sqrt(sumSq(col("probe_vec"))))
    val joined =
      if (!largeProbeSide) corpus.join(broadcast(probed), Seq("cell"))
      else {
        val salts = assignments.groupBy("cell")
          .agg(count(lit(1)).as("cell_n"))
          .select(col("cell"), greatest(lit(1L),
            ceil(col("cell_n") / lit(IvfSaltTargetRows)).cast("bigint")).as("salt_n"))
        val corpusSalted = corpus.join(broadcast(salts), Seq("cell"))
          .withColumn("salt", pmod(xxhash64(col("neighbor_id")), col("salt_n")))
          .drop("salt_n")
        val probesSalted = probed.join(broadcast(salts), Seq("cell"))
          .select(col("cell"), col("probe_id"), col("probe_vec"), col("probe_l2"),
            explode(sequence(lit(0L), col("salt_n") - 1)).as("salt"))
        corpusSalted.join(probesSalted, Seq("cell", "salt")).drop("salt")
      }
    joined.withColumn("cosine",
      dot(col("probe_vec"), col("cand_vec"))
        / (col("probe_l2") * col("cand_l2")))
      .select("probe_id", "neighbor_id", "cosine")
  }

  /** Probe budget for QUERY-style top-k search over an index of `nCells`
    * cells. The cell count adapts to corpus size (constant occupancy), so
    * a FIXED nProbe would probe a vanishing fraction of an ever-finer
    * grid — recall decays with corpus growth exactly like the fixed
    * per-shard budget did with S (the round-7 sharded fix). √nCells is
    * the standard IVF dial: per-probe candidate volume grows only
    * √C × occupancy (≈ 16√n at held occupancy — trivial for query-sized
    * probe batches), and at the nCells floor it degrades to exactly
    * IvfProbe, so fixture-scale behavior is unchanged.
    *
    * Corpus×corpus DEDUP deliberately keeps the FIXED budget: its scale
    * contract is candidate-volume LINEARITY (n × nProbe × occupancy — a
    * √C budget would make it O(n^1.5)), and its recall guarantee (an
    * exact duplicate always pairs: same cell assignment, own cell always
    * probed) holds at any budget.
    */
  private[graft] def adaptiveProbe(nCells: Long): Int =
    math.max(IvfProbe, math.ceil(math.sqrt(nCells.toDouble)).toInt)

  /** The top-k search leg, over trained-in-session or warehouse-stored
    * index frames alike. The probe budget scales √nCells
    * ([[adaptiveProbe]]; the centroid count is an nCells-row action —
    * index metadata, not data).
    */
  private def searchIvf(assignments: DataFrame, centroids: DataFrame,
                        probes: DataFrame,
                        largeProbeSide: Boolean = false): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    searchIvfCandidates(assignments,
        probeNearestCells(centroids, probes, adaptiveProbe(centroids.count())),
        largeProbeSide)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("probe_id", "rnk", "neighbor_id", "cosine")
      .orderBy("probe_id", "rnk")
  }

  /** IVF nPROBE TUNING CURVE — recall against the exact top-5 and the
    * candidate volume (the cost a probed cell actually buys) at
    * nProbe ∈ {1, 2, 4, 8}: the table an operator reads to PICK the
    * probe budget instead of trusting the default — the √K serving-cost
    * law only holds if nProbe sits where recall saturates
    * ([[annRecall]]'s sibling: that gate measures ONE operating point,
    * this one the curve).
    *
    * Split gate (the [[ivfCosineTopk]] contract): which candidates each
    * probe budget surfaces is quantizer-dependent, so the per-nProbe
    * candidate frames are materialized; given them, the counts, the
    * top-k rank order and the recall arithmetic are exact and the
    * oracle replays all three from the parquet + raw embeddings.
    *
    * Scale shape: per budget one broadcast-probe candidate join
    * (corpus × nProbe/nCells rows) + a probe-keyed WindowGroupLimit;
    * the curve is 4 one-row aggregates. Gate `q_ivf_nprobe_curve`.
    */
  def ivfNprobeCurve(s: SparkSession, d: String): DataFrame = {
    val emb = t(s, d, "embeddings")
    val (assignments, centroids) = ivfIndex(emb)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val exact = PlanCache.swap(s"ivf-curve-exact-$d",
      knnCosineTopk(s, d).select("probe_id", "neighbor_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    Seq(1, 2, 4, 8).map { np =>
      val cands = graft.OracleInputs.checkpoint(
        searchIvfCandidates(assignments,
          probeNearestCells(centroids, probes, np),
          largeProbeSide = false)
          .select("probe_id", "neighbor_id", "cosine"),
        d, s"ivf_curve_cand_np$np")
      val topk = cands.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5).select("probe_id", "neighbor_id")
      val hit = exact.join(topk, Seq("probe_id", "neighbor_id"),
        "left_semi").agg(count(lit(1)).as("n_hit"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(hit))
        .crossJoin(broadcast(cands.agg(count(lit(1)).as("n_candidates"))))
        .select(lit(np).as("nprobe"), col("n_candidates"), col("n_exact"),
          col("n_hit"),
          expr("n_hit * 1000000L div n_exact").as("recall_ppm"))
    }.reduce(_ unionByName _).orderBy("nprobe")
  }

  /** Auto-thresholded search over a stored or in-session index: counts the
    * probe side (one scan — callers that already know the probe scale call
    * the explicit-flag paths and stay lazy) and picks the broadcast plan
    * below [[IvfBroadcastProbeLimit]] probes, the salted shuffled plan
    * above it.
    */
  def ivfSearch(assignments: DataFrame, centroids: DataFrame,
                probes: DataFrame): DataFrame =
    searchIvf(assignments, centroids, probes,
      largeProbeSide = probes.count() > IvfBroadcastProbeLimit)

  // ==================== incremental index appends ====================

  /** Append-only growth for the stored ANN indexes — the band index's
    * [[IncrementalDedup.appendBatch]] contract transplanted: new vectors
    * are assigned against the STORED centroids and encoded with the
    * STORED codebooks (zero training jobs anywhere), and the resulting
    * rows append to the index tables, so the index serves the grown
    * corpus immediately without a retrain. Exact under frozen parameters:
    * the appended index is bit-equal to re-assigning the union corpus at
    * the same centroids/codebooks (spec-tested); drift of the parameters
    * themselves against a full retrain is bounded by the scheduled
    * rebuild ([[ivfRefreshEntry]]/[[pqRefreshEntry]]) — the same caveat
    * the band index documents for per-append hot-bucket pruning.
    *
    * Appends are row-level IDEMPOTENT: each call first anti-joins the
    * batch against the ids the target already holds WITHIN THE BATCH'S
    * ID RANGE — the probe scans only that range (parquet min/max stats
    * prune to the files a crashed earlier attempt wrote, since batches
    * are id-ascending), so a streaming retry after a mid-batch crash
    * re-appends exactly the missing rows instead of duplicating a
    * family ([[graft.pipeline.VectorIngest]]'s recovery path). A
    * duplicated code row would be a duplicated CANDIDATE the exact
    * re-rank does not collapse, so this is a correctness guard, not an
    * optimization.
    */
  def appendToIvfIndex(s: SparkSession, db: String, vectors: DataFrame,
                       suffix: String = ""): Unit = {
    val target = s"`$db`.`$IvfAssignmentsTable$suffix`"
    val emb = freshOnly(s, target, indexableVecs(vectors))
    val rows = emb
      .join(assignToCells(emb,
        s.table(s"`$db`.`$IvfCentroidsTable$suffix`")), "vec_id")
      .select(col("vec_id"), col("cell"), col("vec").as("embedding"))
    rows.select(s.table(target).columns.map(col).toIndexedSeq: _*)
      .write.mode("append").insertInto(target)
  }

  /** Sharded-index appends — [[graft.ops.IncrementalDedup]]'s
    * `appendBandsSharded` contract for the ANN families: route each new
    * vector to its hash slice (the SAME deterministic pmod(xxhash64) law
    * the sharded builders partition by — membership never drifts) and run
    * that shard's frozen-parameter append against ITS stored
    * centroids/codebooks. A grown sharded index serves immediately; the
    * sharded refresh entries re-anchor parameter drift on their cadence.
    * Row-level idempotent per shard (the shared [[freshOnly]] probe).
    */
  def appendToShardedIvfIndex(s: SparkSession, db: String, nShards: Int,
                              vectors: DataFrame): Unit =
    foreachShardSlice(nShards, vectors)((sh, slice) =>
      appendToIvfIndex(s, db, slice, suffix = s"_$sh"))

  /** Corpus rows per cell the ADAPTIVE quantizer targets for corpus-sized
    * probe workloads: with a FIXED cell count, corpus×corpus search is
    * quadratic (candidates = n × nProbe × n/nCells); holding occupancy
    * near a constant keeps candidates ~linear — the same
    * constant-occupancy law as [[adaptiveBandBits]]. The cap bounds the
    * driver-resident centroid matrix (IvfMaxCells × 64 doubles ≈ 2 MB) and
    * the per-iteration centroid-update collect; past it (n > ~1M vectors
    * per index) occupancy grows again — shard the index, don't widen the
    * driver.
    */
  val IvfTargetCellOccupancy = 256L
  val IvfMaxCells = 4096
  private[graft] def adaptiveIvfCells(n: Long): Int =
    math.min(IvfMaxCells, math.max(IvfCells,
      (n / IvfTargetCellOccupancy).toInt))

  /** Global semantic dedup through the IVF index — the probe set IS the
    * corpus, so this runs the large-probe salted-shuffle plan
    * ([[searchIvfCandidates]]), never a corpus-sized broadcast, over an
    * index whose cell count adapts to the corpus ([[adaptiveIvfCells]] —
    * fixed cells would make corpus×corpus quadratic). Emits candidate
    * pairs whose EXACT cosine clears `threshold`, canonicalized
    * (vec_a < vec_b) and deduplicated across the two probing directions
    * (the two directions compute bit-identical cosines: pairwise products
    * commute and the fold order is fixed). Approximate recall (a pair is
    * only seen if one endpoint probes the other's cell — identical
    * vectors always pair: same assignment, and a probe's own cell is
    * always probed), deterministic output (deterministic quantizer +
    * exact in-order cosine folds).
    */
  def ivfSemanticDedup(s: SparkSession, d: String,
                       threshold: Double = CosineDupThreshold): DataFrame =
    // split gate like nearDupCosine: pair discovery is quantizer-dependent
    // (rows-only); the materialized pairs' cosines + threshold are oracled
    graft.OracleInputs.checkpoint(
      ivfSemanticDedupPairs(t(s, d, "embeddings"), threshold),
      d, "ivf_dedup_pairs")
      .orderBy("vec_a", "vec_b")

  /** [[ivfSemanticDedup]] over any (vec_id, embedding) frame. The corpus
    * count that sizes the adaptive cell grid is one scan — noise next to
    * the index build's own seed-sample and Lloyd's jobs.
    */
  def ivfSemanticDedupPairs(vectors: DataFrame, threshold: Double,
                            nCells: Option[Int] = None): DataFrame = {
    val cells = nCells.getOrElse(adaptiveIvfCells(vectors.count()))
    val (assignments, centroids) = ivfIndex(vectors, cells)
    semanticDedupOverIndex(assignments, centroids, vectors, threshold)
  }

  /** Semantic decontamination — the embedding-space twin of the n-gram
    * decontam probe (same eval convention: vec_id % 100 = 7): corpus
    * vectors whose cosine against ANY eval vector clears `threshold` are
    * flagged with their eval-hit count — eval examples paraphrased into
    * the training corpus evade n-gram matching but not embedding
    * similarity (the standard reason pretraining pipelines run both).
    *
    * Scale shape: the EVAL side broadcasts (eval sets are bounded — the
    * decontam contract, like the broadcast gram set) and one corpus scan
    * computes the native codegen cosine fold per (corpus, eval) pair —
    * n × |eval| work with no shuffle before the per-vector aggregation.
    * Integer output (hit counts); the cosines themselves are the
    * bit-identical in-order folds the oracle replays, so the threshold
    * boundary cannot drift between engines.
    */
  def semanticDecontam(s: SparkSession, d: String,
                       threshold: Double = 0.3): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
    val ev = emb.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("eval_id"), col("embedding").as("eval_vec"))
    emb.filter(col("vec_id") % 100 =!= 7)
      .crossJoin(broadcast(ev))
      .withColumn("cosine", dot(col("embedding"), col("eval_vec")) /
        (sqrt(sumSq(col("embedding"))) * sqrt(sumSq(col("eval_vec")))))
      .filter(col("cosine") >= threshold)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_eval_hits"))
      .orderBy("vec_id")
  }

  /** Sharded IVF — the documented single-index ceiling is the nCells cap
    * (driver-resident centroid matrix + the probe-side centroid broadcast
    * both grow with nCells), which pins occupancy once the corpus passes
    * ~IvfMaxCells × target rows. S independent indexes over deterministic
    * hash-slices of the corpus (pmod(xxhash64(vec_id), S)) relax that
    * ceiling to S× without widening the driver: each shard trains only on
    * its slice, and a search probes EVERY shard and merges by exact
    * cosine — a vector's true neighbors are spread across shards, and
    * each shard surfaces its own, so the self-hit guarantee and recall
    * compose. Shard builds are independent jobs (a scheduled refresh can
    * run them serially or as separate submissions).
    */
  def buildShardedIvfIndex(vectors: DataFrame, db: String, nShards: Int,
                           iterations: Int = 2): Unit =
    foreachShardSlice(nShards, vectors, Some("buildShardedIvfIndex")) {
      (sh, slice) =>
        val cells = adaptiveIvfCells(slice.count())
        val (assignments, centroids) = ivfIndex(slice, cells, iterations)
        graft.store.Warehouse.saveModel(assignments, db,
          s"${IvfAssignmentsTable}_$sh")
        graft.store.Warehouse.saveModel(centroids, db,
          s"${IvfCentroidsTable}_$sh")
    }

  /** Top-k search across a sharded index: per-shard candidates union into
    * ONE global rank — exact cosine makes the merge trivially correct
    * (no per-shard score calibration needed). Each shard is probed with
    * the √S-scaled [[shardProbeBudget]] so the merged recall holds the
    * single-index floor instead of silently decaying with S.
    */
  def ivfCosineTopkFromShardedIndex(s: SparkSession, d: String, db: String,
                                    nShards: Int): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val probes = t(s, d, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    // the union + global-rank tail is the one merge law every sharded
    // serving path shares (mergeShardTopk — exact cosine needs no
    // per-shard calibration)
    mergeShardTopk((0 until nShards).map { sh =>
      val cents = s.table(s"`$db`.`${IvfCentroidsTable}_$sh`")
      searchIvfCandidates(
        s.table(s"`$db`.`${IvfAssignmentsTable}_$sh`"),
        probeNearestCells(cents, probes,
          shardTopkBudget(nShards, cents.count())),
        largeProbeSide = false)
    })
  }

  /** Per-probe candidate volume across the shard merge — the skew
    * evidence for the sharded search: each shard contributes its own
    * probed-cell candidates and the merge unions them per probe, so the
    * volume per probe must stay ~Σ shards' probed-cell occupancies, never
    * concentrate on one key. Probes = vec_id < 5 (the topk contract).
    */
  private[graft] def shardedCandidatesPerProbe(s: SparkSession, d: String,
                                               db: String,
                                               nShards: Int): DataFrame = {
    val probes = t(s, d, "embeddings").filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    (0 until nShards).map { sh =>
      val cents = s.table(s"`$db`.`${IvfCentroidsTable}_$sh`")
      searchIvfCandidates(
        s.table(s"`$db`.`${IvfAssignmentsTable}_$sh`"),
        probeNearestCells(cents, probes,
          shardTopkBudget(nShards, cents.count())),
        largeProbeSide = false)
    }.reduce(_ unionByName _)
      .groupBy("probe_id").agg(count(lit(1)).as("n_cands"))
  }

  /** Corpus×corpus semantic dedup across a SHARDED index
    * ([[buildShardedIvfIndex]]): every vector probes EVERY shard —
    * cross-shard duplicate pairs would otherwise be invisible, and hash
    * slicing deliberately separates equal content carrying different ids —
    * each shard runs the large-probe SALTED search over its own inverted
    * lists, and the per-shard candidates union before the exact-cosine
    * threshold, canonicalization and distinct.
    *
    * Scale shape: S independent salted-shuffle searches, each holding the
    * constant-occupancy law over its own slice (adaptive cells per shard),
    * so total candidate volume stays ~linear with an S× probe fan-out —
    * the price of exactness across shard boundaries. Recall law: an exact
    * duplicate pair ALWAYS surfaces regardless of shard placement (the
    * probe's nearest centroid in the duplicate's shard is the duplicate's
    * own cell — property-tested with a planted cross-shard dup). At S=1
    * this reproduces the single-index dedup bit-for-bit (same quantizer,
    * same adaptive cell count — property-tested).
    */
  def ivfSemanticDedupFromShardedIndex(s: SparkSession, db: String,
                                       nShards: Int,
                                       threshold: Double = CosineDupThreshold): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val corpus = (0 until nShards).map(sh =>
      s.table(s"`$db`.`${IvfAssignmentsTable}_$sh`")
        .select(col("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val probes = corpus.select(col("vec_id").as("probe_id"),
      col("embedding").as("probe_vec"))
    val cands = (0 until nShards).map { sh =>
      // same √S-scaled budget as the sharded top-k: near-dup pairs below
      // exact equality are subject to the same per-shard quantization
      // noise, so a fixed nProbe would silently shed pairs as S grows
      searchIvfCandidates(
        s.table(s"`$db`.`${IvfAssignmentsTable}_$sh`"),
        probeNearestCells(s.table(s"`$db`.`${IvfCentroidsTable}_$sh`"), probes,
          shardProbeBudget(nShards)),
        largeProbeSide = true)
    }.reduce(_ unionByName _)
    cands
      .filter(col("probe_id") =!= col("neighbor_id")
        && col("cosine") >= threshold)
      .select(least(col("probe_id"), col("neighbor_id")).as("vec_a"),
        greatest(col("probe_id"), col("neighbor_id")).as("vec_b"),
        col("cosine"))
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Semantic dedup served from a PERSISTED index ([[buildIvfIndex]]) —
    * the scheduled-maintenance posture: the quantizer trains on the index
    * refresh cadence, and the (possibly much more frequent) dedup sweep
    * reads the stored inverted lists instead of retraining. Probes are the
    * stored corpus itself, so results match [[ivfSemanticDedupPairs]] over
    * the same rows with the same cell count.
    */
  def ivfSemanticDedupFromIndex(s: SparkSession, db: String,
                                threshold: Double = CosineDupThreshold): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val assignments = s.table(s"`$db`.`$IvfAssignmentsTable`")
    val corpus = assignments.select(col("vec_id"), col("embedding"))
    semanticDedupOverIndex(assignments,
      s.table(s"`$db`.`$IvfCentroidsTable`"), corpus, threshold)
  }

  private def semanticDedupOverIndex(assignments: DataFrame,
                                     centroids: DataFrame, vectors: DataFrame,
                                     threshold: Double): DataFrame = {
    val probes = vectors.select(col("vec_id").as("probe_id"),
      col("embedding").as("probe_vec"))
    searchIvfCandidates(assignments, probeNearestCells(centroids, probes),
        largeProbeSide = true)
      .filter(col("probe_id") =!= col("neighbor_id")
        && col("cosine") >= threshold)
      .select(least(col("probe_id"), col("neighbor_id")).as("vec_a"),
        greatest(col("probe_id"), col("neighbor_id")).as("vec_b"),
        col("cosine"))
      .distinct()
      .orderBy("vec_a", "vec_b")
  }


  /** Cluster-balanced corpus downsampling: keep a deterministic k per IVF
    * cell — the coverage-preserving subsample (every embedding-space
    * region keeps representatives; uniform sampling would thin sparse
    * regions to zero exactly where diversity lives). Within each cell the
    * pick is the md5(vec_id) permutation with id tie-break — the SAME
    * engine-independent sampling order as the stratified text sampler, so
    * the oracle replays it verbatim over the materialized assignments.
    * Split gate: cell assignment is quantizer-specific (rows-only,
    * materialized); the per-cell permutation top-k is hash-gated.
    *
    * Scale shape: assignment inherits the IVF build (broadcast centroids,
    * corpus never exchanged on the cell key); the top-k filter compiles
    * to WindowGroupLimit — map-side per-cell limits before the one hash
    * exchange on `cell`. Never a global sort.
    */
  def clusterBalancedSample(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val (assignments, _) = ivfIndex(t(s, d, "embeddings"))
    val assign = graft.OracleInputs.checkpoint(
      assignments.select("vec_id", "cell"), d, "cell_assignments")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cell")
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
    assign
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .select("cell", "sample_rank", "vec_id")
      .orderBy("cell", "sample_rank")
  }

  private[graft] def shardProbeBudget(nShards: Int): Int =
    IvfProbe * ceilSqrt(nShards)


  /** Per-shard budget for the sharded TOP-K search: the √S shard-noise
    * factor on top of the √nCells query-search base ([[adaptiveProbe]]) —
    * both corrections compose, and at the cell-count floor this reduces
    * to exactly [[shardProbeBudget]]. The sharded DEDUP stays on the
    * fixed-base [[shardProbeBudget]] for the linearity contract
    * (see [[adaptiveProbe]]).
    */
  private[graft] def shardTopkBudget(nShards: Int, shardCells: Long): Int =
    adaptiveProbe(shardCells) * ceilSqrt(nShards)
}

