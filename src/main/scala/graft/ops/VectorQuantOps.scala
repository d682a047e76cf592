package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Code-compression quantizers and their compositions: product
  * quantization (PQ), scalar quantization (SQ8), IVF-PQ and IVF-SQ
  * stored indexes (flat + sharded) with append lifecycles, and ANN
  * recall evaluation.
  *
  * Mixin part of [[VectorOps]] (round-12 verdict #7 file-size pass:
  * split by family — pure moves; every call site still reads
  * `VectorOps.member`).
  */
private[graft] trait VectorQuantPart extends VectorIvfPart {

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

  def appendToShardedPqIndex(s: SparkSession, db: String, nShards: Int,
                             vectors: DataFrame): Unit =
    foreachShardSlice(nShards, vectors)((sh, slice) =>
      appendToPqIndex(s, db, slice, suffix = s"_$sh"))

  def appendToShardedIvfPqIndex(s: SparkSession, db: String, nShards: Int,
                                vectors: DataFrame): Unit =
    foreachShardSlice(nShards, vectors)((sh, slice) =>
      appendToIvfPqIndex(s, db, slice, suffix = s"_$sh"))

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
}
