package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Embedding-similarity operators over `embeddings` (64-dim float vectors).
  *
  * Numeric determinism contract: every reduction is an explicit *in-order
  * left fold* in double precision (float→double widening is exact), so the
  * DuckDB oracle can reproduce the bits with the same fold. No `round()`
  * fudging needed.
  *
  * Scale posture: brute-force top-k is a broadcast-probe block join
  * (small probe set ships to executors; the corpus streams — no corpus×corpus
  * pair materialization, no driver collect). The LSH-bucketed variant for
  * corpus-scale all-neighbors runs the same expressions keyed by hash bucket
  * (see lshCosineBuckets).
  */
object VectorOps {

  /** Σ x_i² as an in-order double fold — the native codegen
    * [[graft.functions.VecDot]] loop (bit-identical to the
    * transform+aggregate HOF chain it replaced; callers must have
    * registered GraftFunctions on the session).
    */
  private def sumSq(v: Column): Column = call_function("vec_dot", v, v)

  private def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Per-label embedding centroids: posexplode → groupBy(label, dim) with
    * decimal-exact sums (order-independent) → mean. The scale shape for
    * class statistics over embedding corpora — the shuffle carries
    * labels×dims partials via map-side combine, never whole vectors.
    */
  def labelCentroid(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "x")))
      // fixed-point via floor (identical IEEE op in every engine — decimal
      // casts differ in tie-rounding mode across engines): exact long sums,
      // order-independent
      .withColumn("xq", floor(col("x").cast("double") * lit(1e9)).cast("bigint"))
      .groupBy("label", "dim_idx")
      .agg(count(lit(1)).as("cnt"), sum("xq").as("xsum"))
      .select(col("label"), col("dim_idx"),
        (col("xsum").cast("double") / lit(1e9) / col("cnt")).as("centroid"))
      .orderBy("label", "dim_idx")

  /** L2 norm + first normalized component per vector. */
  def embedNorm(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "embeddings")
      .withColumn("l2_norm", sqrt(sumSq(col("embedding"))))
      .select(
        col("vec_id"), col("l2_norm"),
        (element_at(col("embedding"), 1).cast("double") / col("l2_norm"))
          .as("first_component_norm"))
      .orderBy("vec_id")
  }

  /** Registered profile over the embeddings table — the array-typed
    * complement of the scalar profiler: dimension count (a ragged corpus
    * surfaces as min ≠ max) and the squared L2 norm as a fixed-point
    * integer (µ-scale floor of the bit-exact [[sumSq]] fold — a raw double
    * min/max would stringify with engine-specific float formatting and
    * break the hash gate; zero/exploding norms surface in the integer
    * bounds just as well). One scan, same shared-Expand shape as the
    * scalar profile.
    */
  def profileEmbeddings(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Relational.profile(
      t(s, d, "embeddings")
        .withColumn("emb_dim", size(col("embedding")))
        .withColumn("norm_sq_micro",
          floor(sumSq(col("embedding")) * lit(1e6)).cast("bigint")),
      Seq("vec_id", "label", "emb_dim", "norm_sq_micro"))
  }

  /** Brute-force cosine top-k: probe set (vec_id < 5) broadcast against the
    * full corpus; rank by exact-fold cosine, ties by neighbor id. Top-1 of
    * each probe is itself (self-check invariant).
    */
  def knnCosineTopk(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cand_vec"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus.crossJoin(broadcast(probes))
      .withColumn("cosine",
        dot(col("probe_vec"), col("cand_vec"))
          / (sqrt(sumSq(col("probe_vec"))) * sqrt(sumSq(col("cand_vec")))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("probe_id", "rnk", "neighbor_id", "cosine")
      .orderBy("probe_id", "rnk")
  }

  /** Deterministic hyperplane weight — delegates to the native sketch's
    * weight matrix so the DataFrame path and the codegen expression can
    * never drift (graft.functions.HyperplaneSketch.planeWeight).
    */
  private[graft] def planeWeight(p: Int, i: Int): Double =
    graft.functions.HyperplaneSketch.planeWeight(p, i)

  private[ops] val MaxDims = graft.functions.HyperplaneSketch.MaxDims

  /** Sign-bit sketch: ONE native codegen expression per row
    * (graft.functions.HyperplaneSketch) producing all 64 plane bits packed
    * in a long plus the L2 norm. Replaces the former explode → weights-join
    * → 65-column hash aggregation: same bit values (identical fixed-point
    * terms, exact long addition), but zero shuffles and a codegen surface
    * of one tight loop instead of 65 aggregate columns (~10 s of one-time
    * janino compile at 64 planes).
    * Output: (vec_id, sketch: long, l2: double).
    */
  private[ops] def sketch(vectors: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    // Null/empty embeddings have no sketch (same semantics as the former
    // explode→groupBy path, which dropped them for lack of rows). Without
    // this, an empty array would sketch to all-ones bits (zero dots pass
    // `>= 0`) and flood one bucket in every band.
    vectors
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"), expr("hyperplane_sketch(embedding)").as("sk"))
      .select(col("vec_id"), col("sk.bits").as("sketch"), col("sk.l2").as("l2"))
  }

  /** Scale path for corpus×corpus near-neighbor search: random-hyperplane
    * LSH sign-bit sketch, so candidate pairs come from a bucket-keyed
    * equi-join exactly like MinHash bands. Returns (bucket, vec_id)
    * assignments; the join-side composition is nearDupCosine below.
    */
  val NumPlanes = 16
  def lshCosineBuckets(s: SparkSession, d: String): DataFrame =
    // bucket = the sketch's low NumPlanes bits (plane p at bit p — the
    // same key the former per-bit shiftleft sum produced)
    sketch(t(s, d, "embeddings"))
      .select(col("vec_id"),
        col("sketch").bitwiseAND(lit((1L << NumPlanes) - 1)).as("bucket"))
      .orderBy("vec_id")

  /** Embedding-cosine near-dup detection, banded: disjoint sign-bit slices
    * of the sketch generate candidate pairs through a band-keyed equi-join
    * (OR over bands boosts recall like MinHash banding), then the *exact*
    * cosine confirms ≥ threshold. Band width adapts to corpus size
    * ([[adaptiveBandBits]]) so candidate volume stays linear; DupBands ×
    * BitsPerBand is the fixture-scale floor. Never corpus×corpus: the
    * shuffle is keyed by (band, band_key), candidates are verified per
    * bucket. Probabilistic recall, deterministic output (fixed hash planes).
    */
  val DupBands = 8
  val BitsPerBand = 8

  /** The default exact-cosine duplicate threshold, shared by every dedup
    * entry point AND interpolated into their oracle SQL (a literal drift
    * between engine and oracle must be impossible).
    */
  val CosineDupThreshold = 0.45

  /** SPLIT ORACLE GATE (same family as the survivor queries): WHICH pairs
    * surface is sketch-recall-dependent (rows-only), but each pair's
    * cosine and the threshold verdict are exact — the query materializes
    * its result ([[graft.OracleInputs]]) and the oracle recomputes every
    * pair's cosine from the raw embeddings with the same in-order fold,
    * re-applying the threshold: a wrong cosine or a below-threshold pair
    * hash-mismatches.
    */
  def nearDupCosine(s: SparkSession, d: String, threshold: Double = CosineDupThreshold): DataFrame =
    graft.OracleInputs.checkpoint(
      nearDupPairs(t(s, d, "embeddings"), threshold), d, "neardup_pairs")
      .orderBy("vec_a", "vec_b")

  /** One-call SEMANTIC dedup canon — the embedding-side mirror of
    * graft.ops.TextOps.dedupSurvivors: near-dup cosine pairs → connected
    * components → cluster-min canon per vector. Same composition law:
    * transitive closure canonicalizes what pairwise output can't (A~B,
    * B~C puts A,B,C in ONE cluster even when A~C is below threshold).
    * The PAIR set is rows-only (hyperplane sketch family) and
    * property-tested like the text side; the components → cluster-min
    * canon derivation is hash-gated against DuckDB's recursive-CTE
    * closure over the materialized pairs
    * ([[graft.OracleInputs.checkpoint]] — same split gate as
    * [[graft.ops.TextOps.dedupSurvivors]]).
    */
  def semanticSurvivors(s: SparkSession, d: String,
                        threshold: Double = CosineDupThreshold): DataFrame = {
    val vecs = t(s, d, "embeddings")
    GraphOps.survivorsOf(
      graft.OracleInputs.checkpoint(
        nearDupPairs(vecs, threshold)
          .select(col("vec_a").as("src"), col("vec_b").as("dst")),
        d, "vec_pairs"),
      vecs.select(col("vec_id").as("id")),
      idName = "vec_id")
  }

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

  /** The (vec_id, vec) projection every index path assigns/encodes from:
    * unindexable null/empty embeddings dropped, elements cast to double.
    */
  private def indexableVecs(vectors: DataFrame): DataFrame =
    vectors.filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))

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
  private def probeNearestCells(centroids: DataFrame, probes: DataFrame,
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
  private def searchIvfCandidates(assignments: DataFrame, probeCells: DataFrame,
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

  /** Product quantization (PQ) with exact re-rank — the MEMORY-BOUND
    * regime's ANN: at 100 TB the raw embeddings (256 B/vector at 64×f32)
    * don't fit executor memory next to the working set, but their PQ
    * codes do ([[PqSubspaces]] sub-vector codebook ids = 8 small ints,
    * a 32× compression). The standard retrieve-then-re-rank shape:
    *
    *  1. TRAIN: the 64-dim space splits into M=[[PqSubspaces]] 8-dim
    *     subspaces; each gets its own K=[[PqCodebookSize]] k-means
    *     codebook via the SAME deterministic Lloyd's recipe as the IVF
    *     quantizer, batched over all subspaces at once ([[pqIndex]] —
    *     recipe equivalence law-tested against [[ivfIndex]] at nSub=1).
    *     Only M×K×8 doubles (the codebooks) ever reach the driver.
    *  2. ENCODE: one pass over the corpus computes all M argmin codes per
    *     row against the BROADCAST (literal) codebooks — no joins, no
    *     shuffle, pure codegen expressions; the codes table is what a
    *     production deployment persists (and all the search scan reads).
    *  3. SEARCH: approximate score per (probe, corpus row) =
    *     Σ_m probe_sub_m · codebook_m[code_m] — M native vec_dot folds
    *     against literal-array lookups, linear in the corpus with probes
    *     broadcast; per-probe top-[[PqRerank]] candidates by approx
    *     score (WindowGroupLimit), then EXACT cosine re-ranks the final
    *     top-5 from the raw vectors of just those candidates.
    *
    * Self-hit invariant: a probe's own row has the minimal quantization
    * error possible for its codes, but PQ approx scores do NOT guarantee
    * rank-1 for self — the EXACT re-rank does (cosine(self)=1 is the
    * global maximum, and the approx score of self is the best
    * reconstruction of the true maximum, so self survives any sane
    * candidate budget; property-tested, as is a recall floor vs exact
    * brute force). SPLIT ORACLE GATE like the IVF path: WHICH candidates
    * surface is codebook-dependent (rows-only), the cosines and rank
    * order of the materialized sets are recomputed exactly by DuckDB.
    */
  val PqSubspaces = 8
  val PqCodebookSize = 16
  val PqRerank = 25

  /** ADC codebook lookups inline as plan literals up to this many doubles
    * (Σ_m K_m × subDim). The fixture configuration (8×16×8 = 1024) sits
    * under it; a production-sized codebook (K=256, M≥16) rides broadcast
    * joins instead, keeping the plan string, Kryo task binaries and
    * codegen method sizes bounded — same exact lookup either way
    * (equivalence spec-tested). `var` only so specs can force the
    * broadcast path at fixture scale.
    */
  private[graft] var PqCodebookLiteralMaxDoubles: Int = 4096

  /** Per-subspace codebooks trained on the corpus: m → K centroids of
    * subDim doubles. ONE Lloyd's over the EXPLODED (vec_id, m, sub-vector)
    * frame — all M codebooks train simultaneously with centroid key
    * (m, cell), so the whole training is ~5 jobs instead of M separate
    * [[ivfIndex]] runs (~5M jobs; measured 8.5 → 3.0 s steady at sf0.1).
    * Same deterministic RECIPE as [[ivfIndex]], re-batched over (m, cell):
    * hash-ordered seeds per subspace (the same seed VECTORS for every m —
    * the ordering key ignores m), broadcast argmin via min(struct),
    * fixed-point exact centroid aggregation; only M×K centroid rows reach
    * the driver. The recipe equivalence is LAW-TESTED, not assumed: an
    * nSub=1 run over full vectors must produce ivfIndex's centroids
    * bit-for-bit, so a quantization change to either implementation that
    * misses the other fails the suite. Fewer usable vectors than K seeds
    * degrade to a smaller codebook per subspace (same contract as
    * ivfIndex's limit(nCells) seeding).
    */
  private[graft] def pqIndex(emb: DataFrame, subDim: Int,
                             iterations: Int = 2,
                             nSub: Int = PqSubspaces)
      : (DataFrame, Map[Int, Seq[Seq[Double]]]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val sub = PlanCache.swap("pq-subvecs", emb
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(nSub - 1))).as("m"),
        col("embedding"))
      .select(col("vec_id"), col("m"),
        transform(slice(col("embedding"), col("m") * subDim + 1, lit(subDim)),
          x => x.cast("double")).as("vec")))
    val ws = org.apache.spark.sql.expressions.Window.partitionBy("m")
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
    var cents: Map[(Int, Int), Seq[Double]] = sub
      .withColumn("rk", row_number().over(ws))
      .filter(col("rk") <= PqCodebookSize)
      .select(col("m"), (col("rk") - 1).as("cell"), col("vec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq)
      .toMap
    def centroidDf = cents.toSeq
      .map { case ((m, k), c) => (m, k, c) }.toDF("m", "cell", "centroid")
    def assign(cDf: DataFrame) = sub.join(broadcast(cDf), Seq("m"))
      .withColumn("dist", call_function("vec_sqdist", col("vec"), col("centroid")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("cell"))).as("am"))
      .select(col("vec_id"), col("m"), col("am.cell").as("cell"))
    for (_ <- 1 to iterations) {
      val updated = sub.join(assign(centroidDf), Seq("vec_id", "m"))
        .select(col("m"), col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .withColumn("xq", floor(col("x") * lit(1e9)).cast("bigint"))
        .groupBy("m", "cell", "dim")
        .agg(sum("xq").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2))
            .map(r => r.getLong(3).toDouble / 1e9 / r.getLong(4)).toSeq
        }
      cents = cents ++ updated
    }
    // small-corpus degrade: fewer usable vectors than K seeds means a
    // smaller codebook per subspace — take the cells that exist instead
    // of throwing on a fixed range (ivfIndex's limit(nCells) contract)
    val books = (0 until nSub).map(m =>
      m -> cents.keys.collect { case (`m`, k) => k }.toSeq.sorted
        .map(k => cents((m, k)))).toMap
    // final codes from ONE more assignment pass against the FINAL
    // centroids (required — the loop's last assign scored the
    // pre-update centroids; pqEncode parity depends on final-centroid
    // codes). Still no wide literal-codebook codegen on this path, and
    // the aggregate's exchange on vec_id is map-side combined.
    val codes = assign(centroidDf)
      .groupBy("vec_id")
      .agg(
        max(when(col("m") === 0, col("cell"))).cast("int").as("code_0"),
        (1 until nSub).map(m =>
          max(when(col("m") === m, col("cell"))).cast("int")
            .as(s"code_$m")): _*)
    (codes, books)
  }

  /** Codebooks only — the stored-index surface ([[pqEncode]] consumers). */
  private[graft] def pqCodebooks(emb: DataFrame, subDim: Int)
      : Map[Int, Seq[Seq[Double]]] = pqIndex(emb, subDim)._2

  /** One-pass PQ encode: M argmin-code columns against literal codebooks
    * (zero joins/shuffles — the production scan shape).
    */
  private[graft] def pqEncode(emb: DataFrame, books: Map[Int, Seq[Seq[Double]]],
                              subDim: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val vec = transform(col("embedding"), x => x.cast("double"))
    val withCodes = (0 until PqSubspaces).foldLeft(
      emb.select(col("vec_id"), col("embedding"))) { (df, m) =>
      val sub = slice(vec, m * subDim + 1, subDim)
      val dists = array(books(m).map(c =>
        call_function("vec_sqdist", sub, typedLit(c))): _*)
      df.withColumn(s"code_$m",
        (array_position(dists, array_min(dists)) - 1).cast("int"))
    }
    withCodes.select(col("vec_id") +:
      (0 until PqSubspaces).map(m => col(s"code_$m")): _*)
  }

  /** Registered query: PQ-approximate top-k with exact re-rank over the
    * standard probe set (vec_id < 5 — recall directly comparable to
    * [[knnCosineTopk]]/[[ivfCosineTopk]]).
    */
  def pqCosineTopk(s: SparkSession, d: String): DataFrame =
    graft.OracleInputs.checkpoint(pqTopkFrame(s, d), d, "pq_topk")
      .orderBy("probe_id", "rnk")

  /** The search frame WITHOUT the oracle-gate checkpoint — what the plan
    * audit inspects (the gated query's executed plan is just the
    * checkpoint read-back).
    */
  private[graft] def pqTopkFrame(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val subDim = OracleDims / PqSubspaces
    val (codesDf, books) = pqIndex(emb, subDim)
    searchPq(codesDf, books, emb, probesOf(emb), subDim)
  }

  private def probesOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"),
        transform(col("embedding"), x => x.cast("double")).as("probe_vec"))

  /** The PQ search leg shared by the in-session and stored-index paths:
    * ADC scan (Σ_m probe_sub · codebook_m[code_m] against LITERAL
    * codebooks — no join for the lookup), per-probe top-[[PqRerank]] by
    * approximate score (map-side WindowGroupLimit before the one probe_id
    * exchange), then EXACT cosine re-rank of just those candidates from
    * the raw vectors. `cellFilter`, when set, prunes the code scan to the
    * probed IVF cells first (the IVF-PQ composition — see
    * [[ivfPqTopkFrame]]); the flat path scans all codes (pure PQ).
    */
  private[graft] def searchPq(codesDf: DataFrame, books: Map[Int, Seq[Seq[Double]]],
                       corpus: DataFrame, probes: DataFrame, subDim: Int,
                       cellFilter: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(codesDf.sparkSession)
    val codes = codesDf.withColumnRenamed("vec_id", "neighbor_id")
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id")
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val scanned = cellFilter match {
      // IVF-PQ: the broadcast (probe_id, cell) pairs prune the code scan
      // to the probed cells — candidates ≈ codes × nProbe/nCells, and a
      // code row pairs only with probes that probed ITS cell
      case Some(pc) => codes.join(broadcast(pc), Seq("cell"))
        .join(broadcast(probes), Seq("probe_id"))
      case None => codes.crossJoin(broadcast(probes))
    }
    // approximate ADC score: Σ_m probe_sub · codebook_m[code_m]. Small
    // codebooks inline as plan literals (zero joins); past the size
    // threshold (production K=256, M≥16) literal inlining would bloat the
    // plan string, task binaries and codegen method size, so the lookup
    // rides M broadcast hash joins instead — same exact per-code centroid,
    // no extra exchange (broadcast sides are K-row relations).
    val litDoubles = books.valuesIterator
      .map(b => b.iterator.map(_.size).sum).sum
    val scored =
      if (litDoubles <= PqCodebookLiteralMaxDoubles)
        scanned.withColumn("approx", (0 until PqSubspaces).map { m =>
          call_function("vec_dot",
            slice(col("probe_vec"), m * subDim + 1, subDim),
            element_at(typedLit(books(m)), col(s"code_$m") + 1))
        }.reduce(_ + _))
      else {
        import codesDf.sparkSession.implicits._
        (0 until PqSubspaces).foldLeft(scanned) { (df, m) =>
          val bm = books(m).zipWithIndex
            .map { case (c, k) => (k, c) }.toDF(s"__cell_$m", s"__cent_$m")
          df.join(broadcast(bm), col(s"code_$m") === col(s"__cell_$m"))
        }.withColumn("approx", (0 until PqSubspaces).map(m =>
          call_function("vec_dot",
            slice(col("probe_vec"), m * subDim + 1, subDim),
            col(s"__cent_$m"))).reduce(_ + _))
      }
    val cands = scored
      .withColumn("arnk", row_number().over(wApprox))
      .filter(col("arnk") <= PqRerank)
      .select("probe_id", "neighbor_id")
    exactCosineRerank(cands, corpus, probes)
  }

  /** Exact-cosine re-rank of a retrieved (probe_id, neighbor_id) candidate
    * set — the shared back half of every approximate search (PQ ADC, SQ
    * decode): only the ≤ probes × rerank-budget candidate rows touch raw
    * vectors, so the raw corpus is point-read, never scanned, in a serving
    * path.
    */
  private def exactCosineRerank(cands: DataFrame, corpus: DataFrame,
                                probes: DataFrame): DataFrame = {
    val rerank = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("cand_vec"))
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands
      .join(rerank, Seq("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .withColumn("cosine",
        dot(col("probe_vec"), col("cand_vec"))
          / (sqrt(sumSq(col("probe_vec"))) * sqrt(sumSq(col("cand_vec")))))
      .withColumn("rnk", row_number().over(wExact))
      .filter(col("rnk") <= 5)
      .select("probe_id", "rnk", "neighbor_id", "cosine")
  }

  /** Names of the persisted PQ index tables ([[buildPqIndex]]). */
  val PqCodebooksTable = "pq_codebooks"
  val PqCodesTable = "pq_codes"

  /** Train-once for PQ, mirroring [[buildIvfIndex]]: ONE Lloyd's pass
    * trains all M codebooks, the one-pass literal-codebook encode signs
    * the corpus, and both land as warehouse tables — the codes table is
    * the 32×-compressed scan a serving session reads (vec_id + M small
    * ints per row; the raw vectors are NOT stored in it — the exact
    * re-rank point-reads them from the corpus, the memory-bound regime's
    * whole point). Any later session (or the scheduled refresh) serves
    * searches from storage without retraining ([[pqCosineTopkFromIndex]]).
    */
  def buildPqIndex(vectors: DataFrame, db: String,
                   subDim: Int = OracleDims / PqSubspaces,
                   suffix: String = ""): Unit = {
    val emb = vectors
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (codes, books) = pqIndex(emb, subDim)
    import vectors.sparkSession.implicits._
    graft.store.Warehouse.saveModel(codes, db, PqCodesTable + suffix)
    graft.store.Warehouse.saveModel(
      books.toSeq.flatMap { case (m, cents) =>
        cents.zipWithIndex.map { case (c, k) => (m, k, c) }
      }.toDF("m", "cell", "centroid"),
      db, PqCodebooksTable + suffix)
  }

  /** Stored codebooks → the in-memory M→centroids map the ADC scan
    * inlines as literals. M×K rows — index metadata, not data.
    */
  private[graft] def loadPqBooks(s: SparkSession, db: String,
                          table: String = PqCodebooksTable): Map[Int, Seq[Seq[Double]]] =
    s.table(s"`$db`.`$table`")
      .select("m", "cell", "centroid").collect()
      .groupBy(_.getInt(0))
      .map { case (m, rows) =>
        m -> rows.sortBy(_.getInt(1)).map(_.getSeq[Double](2)).toSeq
      }

  /** Serve PQ top-k from a stored index ([[buildPqIndex]]) — no Lloyd's
    * jobs anywhere in the query path: codebooks come off the (M×K-row)
    * codebook table as literals, the ADC scan reads the stored codes, and
    * only the ≤ probes×[[PqRerank]] re-rank candidates touch raw vectors.
    */
  def pqCosineTopkFromIndex(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    searchPq(s.table(s"`$db`.`$PqCodesTable`"), loadPqBooks(s, db),
      emb, probesOf(emb), OracleDims / PqSubspaces)
      .orderBy("probe_id", "rnk")
  }

  /** Sharded PQ serving index — [[buildShardedIvfIndex]]'s hash-slice law
    * applied to the PQ family: the single-index ceiling is the Lloyd's
    * training corpus (and the per-query ADC scan, linear in codes), so S
    * independent codebook+codes table pairs over deterministic slices
    * relax it S-fold. Each shard trains only on its slice; a search runs
    * every shard's ADC scan + exact re-rank and merges by exact cosine —
    * calibration-free, so the S=1 case reproduces the single index
    * bit-for-bit (spec-tested, the sharded-band equality standard).
    */
  def buildShardedPqIndex(vectors: DataFrame, db: String, nShards: Int,
                          subDim: Int = OracleDims / PqSubspaces): Unit =
    foreachShardSlice(nShards, vectors, Some("buildShardedPqIndex"))(
      (sh, slice) => buildPqIndex(slice, db, subDim, suffix = s"_$sh"))

  /** Serve PQ top-k across a sharded index: per-shard exact-re-ranked
    * top-5s union into one global rank (exact cosine → trivially correct
    * merge, like [[ivfCosineTopkFromShardedIndex]]). Per-shard subDim is
    * read off the stored codebooks, so a corpus with its own dims serves
    * unchanged. Zero Lloyd's jobs anywhere in the path.
    */
  def pqCosineTopkFromShardedIndex(s: SparkSession, d: String, db: String,
                                   nShards: Int): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val probes = probesOf(emb)
    mergeShardTopk((0 until nShards).map { sh =>
      val books = loadPqBooks(s, db, s"${PqCodebooksTable}_$sh")
      searchPq(s.table(s"`$db`.`${PqCodesTable}_$sh`"), books, emb, probes,
        books(0).head.size)
    })
  }

  /** Global exact-cosine re-rank over per-shard top-k unions — the merge
    * shared by the sharded PQ and sharded IVF-PQ serving paths.
    */
  private def mergeShardTopk(perShard: Seq[DataFrame]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    perShard.map(_.select("probe_id", "neighbor_id", "cosine"))
      .reduce(_ unionByName _)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("probe_id", "rnk", "neighbor_id", "cosine")
      .orderBy("probe_id", "rnk")
  }

  /** Scheduled PQ index refresh — the serving posture for a growing
    * corpus: training cost is paid on the cron cadence, searches read the
    * stored codes/codebooks (mirrors [[ivfRefreshEntry]]).
    */
  def pqRefreshEntry(id: String, cronExpr: String, db: String,
                     vectors: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildPqIndex(vectors(s), db),
      name = "pq_index_refresh", target = s"$db.$PqCodesTable",
      tags = Map("pipeline" -> "ann-index"))

  // ─────────────────────── SQ8 scalar quantization ───────────────────────
  // Completes the quantization spectrum between flat (exact, 4 B/dim) and
  // PQ (32×, coarse): per-dimension 8-bit affine codes — 4× less scan I/O
  // than raw float32 (parquet dictionary/bit-packs the 0..255 ints to
  // ~1 B/dim on disk), near-exact candidate ranking, and NO Lloyd's
  // anywhere: training is ONE min/max aggregation, which — unlike k-means —
  // is order-independent and exactly replayable, so q_sq_cosine_topk gets a
  // FULL-pipeline DuckDB hash gate (train + encode + ADC cut + exact
  // re-rank), not a materialized-candidate split gate.

  /** Names of the persisted SQ index tables ([[buildSqIndex]]). */
  val SqParamsTable = "sq_params"
  val SqCodesTable = "sq_codes"

  /** Candidates per probe the SQ ADC cut retains for the exact re-rank —
    * the [[PqRerank]] budget: SQ's 8-bit-per-dim score is far tighter than
    * PQ's, so the same budget holds a higher recall floor (spec-tested
    * against the exact [[knnCosineTopk]]).
    */
  val SqRerank = 25

  /** Per-dimension (min, width) over the corpus: ONE aggregation on the
    * posexploded dims (map-side combined — dims × partials on the wire),
    * and only `dims` rows reach the driver (bounded index metadata, the
    * [[ivfIndex]] centroid-collect contract).
    */
  private[graft] def sqParams(emb: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = emb
      .select(posexplode(transform(col("embedding"), x => x.cast("double")))
        .as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
      .collect().sortBy(_.getInt(0))
    (rows.map(_.getDouble(1)).toSeq,
      rows.map(r => r.getDouble(2) - r.getDouble(1)).toSeq)
  }

  /** One-pass SQ8 encode: code_i = clamp₀..₂₅₅ ⌊((x_i − mn_i) · 255) / w_i⌋
    * (degenerate dims → 0) — per-row codegen HOFs against literal params,
    * zero joins/shuffles (the production scan shape, like [[pqEncode]]).
    * The clamp runs in LONG before the int cast so a far-out-of-range
    * append value saturates instead of wrapping. Corpus min/max map the
    * corpus exactly onto [0, 255]; appended vectors outside the frozen
    * range saturate at the edges — drift vs a retrain is bounded by the
    * scheduled rebuild ([[sqRefreshEntry]]), the band-index caveat.
    */
  private[graft] def sqEncode(emb: DataFrame, mins: Seq[Double],
                              widths: Seq[Double]): DataFrame = {
    val shifted = zip_with(
      transform(col("embedding"), x => x.cast("double")), typedLit(mins),
      (x, mn) => x - mn)
    val codes = zip_with(shifted, typedLit(widths), (d, w) =>
      when(w === 0d, lit(0)).otherwise(
        least(lit(255L), greatest(lit(0L), floor((d * lit(255.0)) / w)))
          .cast("int")))
    emb.select(col("vec_id"), codes.as("codes"))
  }

  /** Decode codes back to x̂_i = mn_i + (code_i · w_i) / 255 — the
    * asymmetric-distance reconstruction the ADC score dots against the raw
    * probe vector. Expression shape is fixed so the oracle replays the
    * exact IEEE ops. The search scan runs the FUSED native form
    * ([[graft.functions.SqAdcDot]]); this HOF form is the executable
    * spec the parity law tests it against (and the reconstruction-error
    * law's reference).
    */
  private[graft] def sqDecode(codes: Column, mins: Seq[Double],
                              widths: Seq[Double]): Column =
    zip_with(
      zip_with(codes, typedLit(widths),
        (c, w) => (c.cast("double") * w) / lit(255.0)),
      typedLit(mins), (d, mn) => mn + d)

  /** The SQ search leg shared by the in-session and stored-index paths:
    * asymmetric ADC scan (probe_vec · decoded candidate — per-row codegen,
    * probes broadcast, zero extra exchange), per-probe top-[[SqRerank]] cut
    * (map-side WindowGroupLimit below the one probe_id exchange), exact
    * cosine re-rank of just those candidates from the raw vectors.
    * `cellFilter`, when set, prunes the code scan to the probed IVF cells
    * first (the IVF-SQ composition — [[ivfSqTopkFrame]]); the flat path
    * scans all codes.
    */
  private[graft] def searchSq(codesDf: DataFrame, mins: Seq[Double],
                              widths: Seq[Double], corpus: DataFrame,
                              probes: DataFrame,
                              cellFilter: Option[DataFrame] = None): DataFrame = {
    graft.functions.GraftFunctions.register(codesDf.sparkSession)
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id")
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val codes = codesDf.withColumnRenamed("vec_id", "neighbor_id")
    val scanned = cellFilter match {
      // IVF-SQ: the broadcast (probe_id, cell) pairs prune the code scan
      // to the probed cells — a code row pairs only with probes that
      // probed ITS cell (the searchPq composition shape)
      case Some(pc) => codes.join(broadcast(pc), Seq("cell"))
        .join(broadcast(probes), Seq("probe_id"))
      case None => codes.crossJoin(broadcast(probes))
    }
    // the fused native decode-and-dot (graft.functions.SqAdcDot): one
    // codegen loop per (probe, code-row) pair — bit-identical to
    // vec_dot(probe, sqDecode(codes)) (parity law-tested), minus two
    // intermediate arrays and per-element interpreted lambdas
    val cands = scanned
      .withColumn("approx",
        call_function("sq_adc_dot", col("probe_vec"), col("codes"),
          typedLit(mins), typedLit(widths)))
      .withColumn("arnk", row_number().over(wApprox))
      .filter(col("arnk") <= SqRerank)
      .select("probe_id", "neighbor_id")
    exactCosineRerank(cands, corpus, probes)
  }

  /** Registered query: SQ8-approximate top-k with exact re-rank over the
    * standard probe set (vec_id < 5 — recall directly comparable to
    * [[knnCosineTopk]]/[[pqCosineTopk]]).
    */
  def sqCosineTopk(s: SparkSession, d: String): DataFrame =
    sqTopkFrame(s, d).orderBy("probe_id", "rnk")

  /** Recall@k of the SQ8 retrieval against the exact flat scan — the
    * standard ANN evaluation, as a GATED measurement: per probe,
    * |approx top-k ∩ exact top-k| · 10⁶ div k, exact integers. Both
    * sides are individually hash-gated queries; this gate proves the
    * EVALUATION arithmetic (the number a quantization-tuning loop
    * trusts), split-style: the engine materializes the approx set
    * ([[graft.OracleInputs]]), the oracle recomputes the exact side and
    * the intersection itself.
    *
    * Scale shape: both searches are the existing probe-bounded paths;
    * the intersection is a (probe, neighbor)-keyed semi-join over
    * probes×k rows. Gate `q_ann_recall`.
    */
  def annRecall(s: SparkSession, d: String): DataFrame = {
    val exact = knnCosineTopk(s, d).select("probe_id", "neighbor_id")
    val approx = graft.OracleInputs.checkpoint(
      sqTopkFrame(s, d).select("probe_id", "neighbor_id"),
      d, "ann_recall_sq")
    val k = exact.groupBy("probe_id").agg(count(lit(1)).as("k"))
    val matched = exact
      .join(approx, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("n_match"))
    k.join(matched, Seq("probe_id"), "left")
      .select(col("probe_id"), col("k"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        expr("coalesce(n_match, 0L) * 1000000 div k").as("recall_ppm"))
      .orderBy("probe_id")
  }

  private[graft] def sqTopkFrame(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (mins, widths) = sqParams(emb)
    searchSq(sqEncode(emb, mins, widths), mins, widths, emb, probesOf(emb))
  }

  /** Train-once for SQ, mirroring [[buildPqIndex]]: the min/max pass signs
    * the corpus into the 4×-compressed codes table plus a dims-row params
    * table; any later session serves searches from storage without
    * touching the raw corpus except to point-read re-rank candidates
    * ([[sqCosineTopkFromIndex]]).
    */
  def buildSqIndex(vectors: DataFrame, db: String, suffix: String = ""): Unit = {
    val emb = vectors
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (mins, widths) = sqParams(emb)
    import vectors.sparkSession.implicits._
    graft.store.Warehouse.saveModel(
      sqEncode(emb, mins, widths), db, SqCodesTable + suffix)
    graft.store.Warehouse.saveModel(
      mins.indices.map(i => (i, mins(i), widths(i)))
        .toDF("dim", "mn", "width"),
      db, SqParamsTable + suffix)
  }

  /** Stored params → the (mins, widths) the encode/decode inline as
    * literals. `dims` rows — index metadata, not data.
    */
  private[graft] def loadSqParams(s: SparkSession, db: String,
                                  table: String = SqParamsTable): (Seq[Double], Seq[Double]) = {
    val rows = s.table(s"`$db`.`$table`")
      .select("dim", "mn", "width").collect().sortBy(_.getInt(0))
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  /** Serve SQ top-k from a stored index ([[buildSqIndex]]) — no training
    * aggregation anywhere in the query path: params come off the dims-row
    * table as literals, the ADC scan reads the stored codes, and only the
    * ≤ probes × [[SqRerank]] re-rank candidates touch raw vectors.
    */
  def sqCosineTopkFromIndex(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (mins, widths) = loadSqParams(s, db)
    searchSq(s.table(s"`$db`.`$SqCodesTable`"), mins, widths, emb, probesOf(emb))
      .orderBy("probe_id", "rnk")
  }

  /** SQ side of the incremental append: encode with the STORED params
    * (out-of-range values saturate — see [[sqEncode]]) and append to the
    * codes table; row-level idempotent via the shared [[freshOnly]]
    * range-pruned probe.
    */
  def appendToSqIndex(s: SparkSession, db: String, vectors: DataFrame): Unit = {
    val (mins, widths) = loadSqParams(s, db)
    val target = s"`$db`.`$SqCodesTable`"
    sqEncode(freshOnly(s, target, vectors.filter(
        col("embedding").isNotNull && size(col("embedding")) > 0)),
        mins, widths)
      .select(s.table(target).columns.map(col).toIndexedSeq: _*)
      .write.mode("append").insertInto(target)
  }

  /** Scheduled SQ index refresh — re-fits the min/max range to the grown
    * corpus on the cron cadence (mirrors [[pqRefreshEntry]]).
    */
  def sqRefreshEntry(id: String, cronExpr: String, db: String,
                     vectors: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildSqIndex(vectors(s), db),
      name = "sq_index_refresh", target = s"$db.$SqCodesTable",
      tags = Map("pipeline" -> "ann-index"))

  // IVF-SQ — the coarse quantizer prunes WHICH code rows the scan reads,
  // SQ8 compresses WHAT it reads: the high-recall serving point between
  // IVF-flat (exact scores, full-width vectors in the index) and IVF-PQ
  // (32× codes, coarse scores). Because the SQ score is near-exact (one
  // 8-bit level per dim), the probe budget is plain [[adaptiveProbe]] —
  // no [[IvfPqProbeSlack]] needed; recall matches exact-scoring IVF at
  // the same budget (spec-asserted).

  /** Names of the persisted IVF-SQ index tables ([[buildIvfSqIndex]]). */
  val IvfSqCodesTable = "ivfsq_codes"
  val IvfSqCentroidsTable = "ivfsq_centroids"
  val IvfSqParamsTable = "ivfsq_params"

  /** Registered query: IVF-pruned SQ8 top-k with exact re-rank — trains
    * the coarse quantizer and the per-dim ranges in-session (the oracle
    * replays the retrieved set through the shared exact-cosine gate).
    */
  def ivfSqCosineTopk(s: SparkSession, d: String): DataFrame =
    graft.OracleInputs.checkpoint(ivfSqTopkFrame(s, d), d, "ivfsq_topk")
      .orderBy("probe_id", "rnk")

  private[graft] def ivfSqTopkFrame(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (assignments, centroids) = ivfIndex(emb)
    val (mins, widths) = sqParams(emb)
    val celled = sqEncode(emb, mins, widths)
      .join(assignments.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val probes = probesOf(emb)
    val probedCells = probeNearestCells(centroids, probes,
        adaptiveProbe(centroids.count()))
      .select("probe_id", "cell")
    searchSq(celled, mins, widths, emb, probes, cellFilter = Some(probedCells))
  }

  /** Train-once for the composed index: coarse centroids, per-dim ranges,
    * and the code table WITH its coarse cell — stored PARTITIONED BY cell
    * so a serving scan reads only the probed cells' partitions (the
    * [[buildIvfPqIndex]] layout with SQ codes).
    */
  def buildIvfSqIndex(vectors: DataFrame, db: String,
                      suffix: String = ""): Unit = {
    val emb = vectors
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (assignments, centroids) = ivfIndex(emb)
    val (mins, widths) = sqParams(emb)
    import vectors.sparkSession.implicits._
    graft.store.Warehouse.saveModel(
      sqEncode(emb, mins, widths)
        .join(assignments.select(col("vec_id"), col("cell")), Seq("vec_id")),
      db, IvfSqCodesTable + suffix, partitionCols = Seq("cell"))
    graft.store.Warehouse.saveModel(centroids, db, IvfSqCentroidsTable + suffix)
    graft.store.Warehouse.saveModel(
      mins.indices.map(i => (i, mins(i), widths(i)))
        .toDF("dim", "mn", "width"),
      db, IvfSqParamsTable + suffix)
  }

  /** Serve composed IVF-SQ top-k from the stored index: centroid scoring
    * against the stored centroid table, the SQ scan statically pruned to
    * the probed cells' partitions ([[prunedCodes]] — the IN-list lands in
    * `PartitionFilters` at plan time), exact re-rank from the corpus. No
    * Lloyd's or min/max pass anywhere in the query path.
    */
  def ivfSqCosineTopkFromIndex(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val probes = probesOf(emb)
    val centroids = s.table(s"`$db`.`$IvfSqCentroidsTable`")
    val (probedCells, cells) = collectProbeCells(s, centroids, probes,
      adaptiveProbe(centroids.count()))
    val (mins, widths) = loadSqParams(s, db, IvfSqParamsTable)
    searchSq(prunedCodes(s, s"`$db`.`$IvfSqCodesTable`", cells),
      mins, widths, emb, probes, cellFilter = Some(probedCells))
      .orderBy("probe_id", "rnk")
  }

  /** Composed IVF-SQ append: stored-range encode + stored-centroid cell
    * assignment, appended into the cell partitions — only the touched
    * cells' partitions gain files ([[appendToIvfPqIndex]]'s shape).
    */
  def appendToIvfSqIndex(s: SparkSession, db: String, vectors: DataFrame,
                         suffix: String = ""): Unit = {
    val target = s"`$db`.`$IvfSqCodesTable$suffix`"
    val fresh = freshOnly(s, target, vectors.filter(
      col("embedding").isNotNull && size(col("embedding")) > 0))
    val emb = indexableVecs(fresh)
    val (mins, widths) = loadSqParams(s, db, IvfSqParamsTable + suffix)
    val celled = sqEncode(fresh, mins, widths).join(
      assignToCells(emb,
        s.table(s"`$db`.`$IvfSqCentroidsTable$suffix`")), "vec_id")
    celled.select(s.table(target).columns.map(col).toIndexedSeq: _*)
      .write.mode("append").insertInto(target)
  }

  /** Scheduled IVF-SQ index refresh (mirrors [[pqRefreshEntry]]). */
  def ivfSqRefreshEntry(id: String, cronExpr: String, db: String,
                        vectors: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildIvfSqIndex(vectors(s), db),
      name = "ivfsq_index_refresh", target = s"$db.$IvfSqCodesTable",
      tags = Map("pipeline" -> "ann-index"))

  /** Sharded IVF-SQ — the COARSE quantizer carries the same ~1M-vector
    * Lloyd's ceiling that motivates every other sharded composition
    * (SQ's own min/max training has none), so the hash-slice law applies
    * unchanged: per-shard centroids + ranges + cell-partitioned codes,
    * probe-all with the √S budget, exact-cosine merge; S=1 reproduces
    * the single composed index bit-for-bit.
    */
  def buildShardedIvfSqIndex(vectors: DataFrame, db: String,
                             nShards: Int): Unit =
    foreachShardSlice(nShards, vectors, Some("buildShardedIvfSqIndex"))(
      (sh, slice) => buildIvfSqIndex(slice, db, suffix = s"_$sh"))

  /** Serve composed IVF-SQ top-k across a sharded index: per shard, the
    * stored centroids pick probed cells under the √S shard-noise budget
    * (no PQ slack — the 8-bit score is near-exact, the single-index
    * law), the SQ scan reads only those cells' partitions, and the
    * exact-re-ranked per-shard top-5s merge globally.
    */
  def ivfSqCosineTopkFromShardedIndex(s: SparkSession, d: String, db: String,
                                      nShards: Int): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val probes = probesOf(emb)
    mergeShardTopk((0 until nShards).map { sh =>
      val cents = s.table(s"`$db`.`${IvfSqCentroidsTable}_$sh`")
      val (probedCells, cells) = collectProbeCells(s, cents, probes,
        shardTopkBudget(nShards, cents.count()))
      val (mins, widths) = loadSqParams(s, db, s"${IvfSqParamsTable}_$sh")
      searchSq(prunedCodes(s, s"`$db`.`${IvfSqCodesTable}_$sh`", cells),
        mins, widths, emb, probes, cellFilter = Some(probedCells))
    })
  }

  /** Scheduled refresh for the sharded IVF-SQ index (the
    * [[pqShardedRefreshEntry]] law).
    */
  def ivfSqShardedRefreshEntry(id: String, cronExpr: String, db: String,
                               nShards: Int,
                               vectors: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildShardedIvfSqIndex(vectors(s), db, nShards),
      name = "ivfsq_sharded_index_refresh",
      target = s"$db.${IvfSqCodesTable}_0",
      tags = Map("pipeline" -> "ann-index"))

  /** Sharded IVF-SQ append — route by the builders' hash-slice law,
    * per-shard frozen-parameter appends ([[appendToShardedIvfPqIndex]]'s
    * contract). Requires [[appendToIvfSqIndex]] with the shard's
    * suffixed tables.
    */
  def appendToShardedIvfSqIndex(s: SparkSession, db: String, nShards: Int,
                                vectors: DataFrame): Unit =
    foreachShardSlice(nShards, vectors)((sh, slice) =>
      appendToIvfSqIndex(s, db, slice, suffix = s"_$sh"))

  /** IVF-PQ — the canonical 100 TB ANN composition: the IVF coarse
    * quantizer prunes WHICH code rows the ADC scan reads (nProbe of
    * nCells cells), PQ compresses WHAT it reads (M small ints per row).
    * The flat-PQ scan is linear in the corpus per probe batch; cell
    * pruning cuts it to ~nProbe/nCells of that, which is what makes the
    * memory-bound regime's scan tractable at corpus scale. Codes are of
    * the RAW vectors (IVFFlat-style, not residual-encoded): with the
    * exact re-rank on top, the approximate score only has to get the
    * candidate SET right, and raw-vector codes keep the encode
    * shuffle-free and the oracle replayable.
    */
  /** IVF-PQ probe budget = [[adaptiveProbe]] (the √nCells query-search
    * law) × this slack factor: the ADC score is approximate ON TOP of the
    * cell pruning, so candidate sets need more cells than exact-scoring
    * IVF for the exact re-rank to recover the same recall (measured at
    * the fixture: recall@5 0.52 at the bare IVF budget, ≥ 0.6 — the
    * flat-PQ floor — at 2×).
    */
  val IvfPqProbeSlack = 2

  def ivfPqCosineTopk(s: SparkSession, d: String): DataFrame =
    graft.OracleInputs.checkpoint(ivfPqTopkFrame(s, d), d, "ivfpq_topk")
      .orderBy("probe_id", "rnk")

  /** Names of the persisted IVF-PQ index tables ([[buildIvfPqIndex]]). */
  val IvfPqCodesTable = "ivfpq_codes"
  val IvfPqCentroidsTable = "ivfpq_centroids"
  val IvfPqCodebooksTable = "ivfpq_codebooks"

  /** Train-once for the composed index: coarse centroids, per-subspace
    * codebooks, and the code table WITH its coarse cell — stored
    * PARTITIONED BY cell, so a serving scan reads ONLY the probed cells'
    * partitions (dynamic partition pruning through the broadcast cell
    * join — the file-skipping form of the cell pruning the in-session
    * path does with a hash join).
    */
  def buildIvfPqIndex(vectors: DataFrame, db: String,
                      subDim: Int = OracleDims / PqSubspaces,
                      suffix: String = ""): Unit = {
    val emb = vectors
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val (assignments, centroids) = ivfIndex(emb)
    val (codes, books) = pqIndex(emb, subDim)
    import vectors.sparkSession.implicits._
    graft.store.Warehouse.saveModel(
      codes.join(assignments.select(col("vec_id"), col("cell")), Seq("vec_id")),
      db, IvfPqCodesTable + suffix, partitionCols = Seq("cell"))
    graft.store.Warehouse.saveModel(centroids, db, IvfPqCentroidsTable + suffix)
    graft.store.Warehouse.saveModel(
      books.toSeq.flatMap { case (m, cents) =>
        cents.zipWithIndex.map { case (c, k) => (m, k, c) }
      }.toDF("m", "cell", "centroid"),
      db, IvfPqCodebooksTable + suffix)
  }

  /** Sharded IVF-PQ — all three layers compose: hash-slice shards relax
    * the training ceiling ([[buildShardedIvfIndex]]'s law), the per-shard
    * coarse quantizer prunes which code partitions each probe reads, PQ
    * compresses what it reads. Serving probes EVERY shard with the
    * √S-scaled budget and merges by exact cosine; S=1 reproduces the
    * single composed index bit-for-bit.
    */
  def buildShardedIvfPqIndex(vectors: DataFrame, db: String, nShards: Int,
                             subDim: Int = OracleDims / PqSubspaces): Unit =
    foreachShardSlice(nShards, vectors, Some("buildShardedIvfPqIndex"))(
      (sh, slice) => buildIvfPqIndex(slice, db, subDim, suffix = s"_$sh"))

  /** Serve composed IVF-PQ top-k across a sharded index: per shard, the
    * stored centroids pick probed cells under the IVF-PQ slack × the √S
    * shard-noise budget ([[shardTopkBudget]] — at S=1 this is exactly the
    * single-index budget), the ADC scan reads only those cells'
    * partitions of the shard's code table, and the exact-re-ranked
    * per-shard top-5s merge into one global rank.
    */
  def ivfPqCosineTopkFromShardedIndex(s: SparkSession, d: String, db: String,
                                      nShards: Int): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val probes = probesOf(emb)
    mergeShardTopk((0 until nShards).map { sh =>
      val cents = s.table(s"`$db`.`${IvfPqCentroidsTable}_$sh`")
      val (probedCells, cells) = collectProbeCells(s, cents, probes,
        IvfPqProbeSlack * shardTopkBudget(nShards, cents.count()))
      val books = loadPqBooks(s, db, s"${IvfPqCodebooksTable}_$sh")
      searchPq(prunedCodes(s, s"`$db`.`${IvfPqCodesTable}_$sh`", cells),
        books, emb, probes, books(0).head.size,
        cellFilter = Some(probedCells))
    })
  }

  /** Scheduled refresh entries for the SHARDED serving indexes — the
    * single-index entries' law extended: one cron fire rebuilds every
    * shard's tables (shard builds are independent jobs; a deployment
    * that wants them as separate submissions schedules S entries over
    * slice-filtered `vectors` instead).
    */
  def pqShardedRefreshEntry(id: String, cronExpr: String, db: String,
                            nShards: Int,
                            vectors: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildShardedPqIndex(vectors(s), db, nShards),
      name = "pq_sharded_index_refresh", target = s"$db.$PqCodesTable*",
      tags = Map("pipeline" -> "ann-index"))

  def ivfPqShardedRefreshEntry(id: String, cronExpr: String, db: String,
                               nShards: Int,
                               vectors: SparkSession => DataFrame): graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildShardedIvfPqIndex(vectors(s), db, nShards),
      name = "ivfpq_sharded_index_refresh", target = s"$db.$IvfPqCodesTable*",
      tags = Map("pipeline" -> "ann-index"))

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

  /** The idempotence probe shared by the three appends: batch rows whose
    * vec_id the target does NOT already hold within the batch's id range
    * (one bounded agg on the batch + a stats-pruned range scan of the
    * target — never a full-index anti-join).
    */
  private def freshOnly(s: SparkSession, target: String,
                        batch: DataFrame): DataFrame = {
    val b = batch.agg(min("vec_id"), max("vec_id")).head
    if (b.isNullAt(0)) return batch // empty batch: nothing to dedup
    val existing = s.table(target)
      .filter(col("vec_id").between(b.getLong(0), b.getLong(1)))
      .select("vec_id")
    batch.join(existing, Seq("vec_id"), "left_anti")
  }

  /** PQ side of the append: encode with the stored codebooks (the
    * [[pqEncode]] one-pass argmin — parity with the build's final-centroid
    * codes is property-tested) and append to the codes table.
    */
  def appendToPqIndex(s: SparkSession, db: String, vectors: DataFrame,
                      suffix: String = ""): Unit = {
    val books = loadPqBooks(s, db, PqCodebooksTable + suffix)
    val target = s"`$db`.`$PqCodesTable$suffix`"
    pqEncode(freshOnly(s, target, vectors.filter(
        col("embedding").isNotNull && size(col("embedding")) > 0)),
        books, books(0).head.size)
      .select(s.table(target).columns.map(col).toIndexedSeq: _*)
      .write.mode("append").insertInto(target)
  }

  /** Composed IVF-PQ append: stored-codebook encode + stored-centroid
    * cell assignment, appended into the cell-partitioned code table —
    * only the touched cells' partitions gain files.
    */
  def appendToIvfPqIndex(s: SparkSession, db: String, vectors: DataFrame,
                         suffix: String = ""): Unit = {
    val target = s"`$db`.`$IvfPqCodesTable$suffix`"
    val fresh = freshOnly(s, target, vectors.filter(
      col("embedding").isNotNull && size(col("embedding")) > 0))
    val emb = indexableVecs(fresh)
    val books = loadPqBooks(s, db, IvfPqCodebooksTable + suffix)
    val codes = pqEncode(fresh, books, books(0).head.size)
    val celled = codes.join(
      assignToCells(emb,
        s.table(s"`$db`.`$IvfPqCentroidsTable$suffix`")), "vec_id")
    celled.select(s.table(target).columns.map(col).toIndexedSeq: _*)
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

  def appendToShardedPqIndex(s: SparkSession, db: String, nShards: Int,
                             vectors: DataFrame): Unit =
    foreachShardSlice(nShards, vectors)((sh, slice) =>
      appendToPqIndex(s, db, slice, suffix = s"_$sh"))

  def appendToShardedIvfPqIndex(s: SparkSession, db: String, nShards: Int,
                                vectors: DataFrame): Unit =
    foreachShardSlice(nShards, vectors)((sh, slice) =>
      appendToIvfPqIndex(s, db, slice, suffix = s"_$sh"))

  /** Deterministic hash-slice iteration — the ONE definition of shard
    * membership every sharded builder and append composes, so the law can
    * never drift between build and append. `requireNonEmpty` names the
    * calling BUILDER: an empty hash slice (corpus smaller than the shard
    * grid) would train an empty index and fail obscurely at serve time;
    * appends pass None — a batch legitimately misses some shards.
    */
  private def foreachShardSlice(nShards: Int, vectors: DataFrame,
                                requireNonEmpty: Option[String] = None)
                               (f: (Int, DataFrame) => Unit): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    for (sh <- 0 until nShards) {
      val slice = vectors.filter(
        pmod(xxhash64(col("vec_id")), lit(nShards.toLong)) === sh)
      requireNonEmpty.foreach(caller => require(!slice.isEmpty,
        s"$caller: shard $sh of $nShards holds no vectors — " +
          "the corpus is too small to shard this finely"))
      f(sh, slice)
    }
  }

  /** Serve composed IVF-PQ top-k from the stored index: centroid scoring
    * against the (nCells-row) stored centroid table, ADC only within the
    * probed cells' PARTITIONS of the code table, exact re-rank from the
    * corpus — no Lloyd's pass anywhere.
    */
  def ivfPqCosineTopkFromIndex(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val probes = probesOf(emb)
    val centroids = s.table(s"`$db`.`$IvfPqCentroidsTable`")
    val (probedCells, cells) = collectProbeCells(s, centroids, probes,
      IvfPqProbeSlack * adaptiveProbe(centroids.count()))
    searchPq(prunedCodes(s, s"`$db`.`$IvfPqCodesTable`", cells),
      loadPqBooks(s, db, IvfPqCodebooksTable), emb, probes,
      OracleDims / PqSubspaces, cellFilter = Some(probedCells))
      .orderBy("probe_id", "rnk")
  }

  /** The serving scan of a cell-partitioned code table, statically pruned
    * to the probed cells: the IN-list on the partition column shows up in
    * the scan's `PartitionFilters` — file-level pruning guaranteed at
    * plan time, not left to runtime dynamic partition pruning. The
    * per-probe cell JOIN downstream still restricts each probe to its own
    * cells.
    */
  private def prunedCodes(s: SparkSession, table: String,
                          cells: Seq[Int]): DataFrame =
    s.table(table).filter(col("cell").isin(cells: _*))

  /** Probed (probe_id, cell) pairs COLLECTED once — bounded driver
    * metadata (≤ probes × budget ints, the serving contract's query-sized
    * probe set) — and rebuilt as a LOCAL relation plus the distinct cell
    * list. The serve paths consume the same rows twice (the static
    * partition IN-list and the broadcast cellFilter join); collecting
    * once runs the centroid-scoring job once per serve instead of twice.
    */
  private def collectProbeCells(s: SparkSession, centroids: DataFrame,
                                probes: DataFrame,
                                budget: Int): (DataFrame, Seq[Int]) = {
    import s.implicits._
    val rows = probeNearestCells(centroids, probes, budget)
      .select("probe_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    (rows.toDF("probe_id", "cell"), rows.map(_._2).distinct)
  }

  private[graft] def ivfPqTopkFrame(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = t(s, d, "embeddings")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
    val subDim = OracleDims / PqSubspaces
    val (assignments, centroids) = ivfIndex(emb)
    val (codesDf, books) = pqIndex(emb, subDim)
    // codes gain their coarse cell — the composed index row is
    // (cell, vec_id, code_0..M): partition pruning key + compressed payload
    val celled = codesDf.join(
      assignments.select(col("vec_id"), col("cell")), Seq("vec_id"))
    val probes = probesOf(emb)
    val probedCells = probeNearestCells(centroids, probes,
        IvfPqProbeSlack * adaptiveProbe(centroids.count()))
      .select("probe_id", "cell")
    searchPq(celled, books, emb, probes, subDim, cellFilter = Some(probedCells))
  }

  /** Fixture embedding dimensionality the PQ split assumes (matches the
    * oracle-side constant in SparkEntry; a different corpus passes its
    * own subDim through the private API).
    */
  private val OracleDims = 64

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

  /** Per-shard probe budget for the sharded corpus DEDUP. A shard's
    * quantizer trains on n/S samples, so its centroid estimates — and with
    * them the probe's nearest-cell ranking — carry ~√S the noise of the
    * single index's (standard error of a k-means cell mean scales with
    * 1/√samples). A fixed nProbe therefore loses recall exactly when the
    * user reaches for sharding (observed: recall@5 0.52 at S=4 vs the 0.60
    * single-index baseline on a 5× corpus); widening the per-shard budget
    * √S-fold restores it. Cost shape: merged candidate volume grows
    * S^0.5 per shard on top of the S× probe fan-out (occupancy is held by
    * the per-shard adaptive cell count), a sublinear price that keeps the
    * dedup linear in corpus size — which is why the base here stays the
    * FIXED IvfProbe, not the √nCells query-search base (see
    * [[adaptiveProbe]]). Budgets above a shard's cell count degrade
    * gracefully to probing the whole shard.
    */
  private def ceilSqrt(n: Int): Int = math.ceil(math.sqrt(n.toDouble)).toInt
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

  /** Core of nearDupCosine over any (vec_id, embedding) frame.
    *
    * Stages (each the codegen'd, shuffle-minimal shape):
    *  1. sign-bit sketch via [[sketch]] (one native expression per row);
    *  2. band keys = the sketch's byte slices → posexplode → hot-bucket
    *     guard → self-equi-join on (band, key) → DISTINCT candidate pairs
    *     *before* any vector math (band overlap would otherwise recompute
    *     each pair's cosine up to DupBands×);
    *  3. exact-cosine confirm: candidates rejoin the vectors, the dot
    *     product runs as explode + element_at + fixed-point sum (codegen'd
    *     hash agg, order-independent, no interpreted lambdas).
    *
    * Hot-bucket guard: a degenerate band key (thousands of identical or
    * near-zero vectors) would make the within-bucket pair expansion
    * quadratic at corpus scale. Buckets larger than `maxBucketSize` are
    * dropped from candidate generation (anti-join against the small hot
    * set). Recall note: members of a dropped bucket can still pair through
    * their other DupBands-1 bands; content degenerate enough to flood ALL
    * its bands (exact duplicates at >cap multiplicity) is exact-dedup's
    * job, which runs first in a real pipeline.
    */
  val MaxBucketSize = 1024

  /** Adaptive band width: average bucket occupancy is n / 2^bits, so the
    * within-bucket pair expansion is O(n² / 2^bits) — with FIXED band bits
    * that is quadratic in corpus size (measured: 5× corpus → ~9× wall
    * time at 8 bits). Holding occupancy near a constant target keeps the
    * candidate volume linear: bits grows with log2(n). Bounded to
    * [BitsPerBand, 32]; the band count is however many disjoint slices of
    * the 64-bit sketch that width allows (wider bands trade borderline-pair
    * recall for candidate volume — the standard LSH dial).
    */
  val TargetBucketOccupancy = 16
  private[graft] def adaptiveBandBits(n: Long): Int = {
    val needed = 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(n / TargetBucketOccupancy, 1L))
    math.min(32, math.max(BitsPerBand, needed))
  }

  /** NOTE: with `bandBits = None`, CONSTRUCTING the frame runs a Spark job
    * (persist + count of the sketch) to size the adaptive banding — that
    * work is reused by every downstream branch of the returned plan, so
    * callers that execute the query pay ~nothing extra, but plan-only
    * callers (audits, explain) should pass explicit `bandBits` to stay
    * lazy.
    */
  def nearDupPairs(vectors: DataFrame, threshold: Double,
                   maxBucketSize: Int = MaxBucketSize,
                   bandBits: Option[Int] = None): DataFrame = {
    // The sketch feeds three branches (band join sides + norms): persist it
    // so the plan computes it once (PlanCache bounds the footprint to one
    // sketch per session). At cluster scale this is the "write the sketch
    // table" step of a production near-dup job.
    val bits = PlanCache.swap("vector-near-dup-sketch", sketch(vectors))
    // the count() both materializes the persisted sketch (paid anyway by
    // every downstream branch) and sizes the adaptive banding
    val nBits = bandBits.getOrElse(adaptiveBandBits(bits.count()))
    val nBands = 64 / nBits
    val bandKeys = (0 until nBands).map(b =>
      shiftrightunsigned(col("sketch"), b * nBits)
        .bitwiseAND(lit((1L << nBits) - 1)))
    val banded = bits.select(col("vec_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
    val hot = banded.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
      .select("band_idx", "band_key")
    val pruned = banded.join(broadcast(hot), Seq("band_idx", "band_key"), "left_anti")
    val cands = pruned.alias("a")
      .join(pruned.alias("b"), Seq("band_idx", "band_key"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .filter(col("vec_a") < col("vec_b"))
      .distinct()

    // Confirm stage: candidates rejoin the vectors (two keyed equi-joins —
    // AQE broadcasts the small side when it fits) and the exact cosine is
    // ONE native codegen fold per pair (vec_dot) with norms precomputed
    // once per vector. This replaced an explode → per-dimension join →
    // fixed-point hash aggregation: that shape existed to avoid
    // interpreted HOF lambdas, which the native expression obsoletes —
    // and it shuffled pairs×dims rows where this moves pairs×2 vectors.
    val vecs = vectors.select(col("vec_id"), col("embedding"))
      .withColumn("l2n", sqrt(call_function("vec_dot",
        col("embedding"), col("embedding"))))
    cands
      .join(vecs.select(col("vec_id").as("vec_a"), col("embedding").as("va"),
        col("l2n").as("la")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"), col("embedding").as("vb"),
        col("l2n").as("lb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (call_function("vec_dot", col("va"), col("vb"))
          / (col("la") * col("lb"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_a", "vec_b")
  }
}
