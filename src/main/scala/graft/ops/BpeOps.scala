package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Learned byte-pair-encoding tokenizer (Sennrich et al. 2016, the
  * standard LLM vocabulary construction): merges are TRAINED in-engine by
  * iterative pair-count aggregation over the word-frequency table, stored
  * as model tables, and APPLIED greedily per-row — replacing the regex
  * proxy token counts every budget operator previously ran on.
  *
  * Representation: a word's symbol sequence is one string with every
  * symbol wrapped as `chr(2) symbol chr(3)`. Merging the pair (l, r) is
  * then a plain `replace` of `[l][r]` with `[lr]` — and because each
  * match consumes exactly the two wrapped symbols (no shared delimiter),
  * SQL replace's left-to-right non-overlapping scan IS the BPE greedy
  * application order, identically in Spark and in the DuckDB oracle. The
  * wrappers also make cross-symbol false matches impossible.
  *
  * Scale shape: training aggregates over the DISTINCT-WORD table (vocab-
  * sized, not corpus-sized) — the corpus is touched exactly once to build
  * word counts (the only token-volume shuffle). Each of the K merge
  * rounds is one vocab-sized pair aggregation plus a single-row driver
  * argmax (bounded metadata); the driver holds only the K-row merge
  * table. Serving is a per-row codegen'd `aggregate` fold over the K
  * merge literals — zero joins, zero shuffles beyond the output sort.
  */
object BpeOps {

  val BpeMergesTable = "bpe_merges"
  val BpeVocabTable = "bpe_vocab"
  /** Merge-round budget for the registry gate — enough to learn real
    * multi-char pieces on the fixture while keeping the in-query training
    * cost bounded; production callers pass their own K.
    */
  val BpeNumMerges = 24

  private val L = "" // chr(2): symbol open
  private val R = "" // chr(3): symbol close

  /** Wrapped initial symbol string of a word: each character becomes
    * `[c]`. Empty words stay empty (sequence(1,0) would DESCEND in Spark,
    * hence the explicit guard).
    */
  private def wrapped(w: String): String =
    s"CASE WHEN char_length($w) = 0 THEN '' ELSE concat_ws('', " +
      s"transform(sequence(1, char_length($w)), " +
      s"i -> concat(chr(2), substring($w, i, 1), chr(3)))) END"

  /** Train K merges over the corpus' word-frequency table. Returns the
    * merge list in rank order (rank 1 = first merge). Deterministic: the
    * argmax tie-breaks by (count desc, l asc, r asc). Stops early once no
    * pair occurs twice (weighted) — further merges would be arbitrary.
    *
    * Words containing the wrapper control characters are excluded from
    * training (they would corrupt the symbol encoding); serving stays
    * deterministic on them regardless.
    */
  def trainBpe(docs: DataFrame, k: Int): Seq[(Int, String, String)] = {
    val words = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0 &&
        !col("w").contains(L) && !col("w").contains(R))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var state = words.withColumn("s", expr(wrapped("w")))
      .select("cnt", "s").localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      // adjacent symbol pairs, weighted by word count; syms parsed by
      // splitting on the `][` boundary after stripping the sentinels
      val best = state
        .withColumn("syms", expr(
          "split(substring(s, 2, char_length(s) - 2), concat(chr(3), chr(2)))"))
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] AS l, syms[i] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < 2L) done = true
      else {
        val (l, r) = (best.head.getString(0), best.head.getString(1))
        merges += ((rank, l, r))
        state = state.withColumn("s",
          call_function("replace", col("s"),
            lit(s"$L$l$R$L$r$R"), lit(s"$L$l$r$R")))
        // sever lineage periodically: each round stacks one replace
        // Project; unchecked, the argmax of round r re-runs r replaces
        if (rank % 6 == 0) state = state.localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Store a trained model: the rank-ordered merge table plus the learned
    * piece vocabulary (all distinct post-merge symbols of the training
    * words) — the [[graft.ops.TextOps.buildLmModel]] stored-table posture.
    */
  def buildBpeModel(docs: DataFrame, db: String, k: Int = BpeNumMerges): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    val merges = trainBpe(docs, k)
    graft.store.Warehouse.ensureDatabase(s, db)
    graft.store.Warehouse.saveModel(
      merges.toDF("rank", "l", "r").repartition(1), db, BpeMergesTable)
    val mdf = s.table(s"`$db`.`$BpeMergesTable`")
    val pieces = applyBpe(
      docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > 0).distinct()
        .withColumnRenamed("w", "text"),
      collectMerges(mdf))
      .select(explode(split(col("pieces"), " ")).as("piece"))
      .filter(length(col("piece")) > 0).distinct()
    graft.store.Warehouse.saveModel(pieces, db, BpeVocabTable)
  }

  /** Collect the K-row merge table in rank order — bounded driver
    * metadata, the serving contract every stored-model family carries.
    */
  private[graft] def collectMerges(mdf: DataFrame): Seq[(Int, String, String)] =
    mdf.select("rank", "l", "r").orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toIndexedSeq

  /** The merge table as a literal array<struct<pat,rep>> column — the
    * bounded-driver-metadata serving contract, shared by the native
    * fold and the HOF reference formulation.
    */
  private def mergeLitsOf(merges: Seq[(Int, String, String)]) =
    if (merges.isEmpty) array().cast("array<struct<pat:string,rep:string>>")
    else array(merges.map { case (_, l, r) =>
      struct(lit(s"$L$l$R$L$r$R").as("pat"), lit(s"$L$l$r$R").as("rep"))
    }: _*)

  /** Apply stored merges to every whitespace word of `text` via the
    * native `bpe_pieces` expression ([[graft.functions.BpePieces]]): one
    * flat Java loop per row inside whole-stage codegen (r15, guide §4 —
    * the interpreted HOF fold it replaces, [[applyBpeHof]], re-scanned
    * the word per position through `substring(w, i, 1)` and evaluated an
    * interpreted lambda chain per word; equivalence law-tested in
    * BpeOpsSpec). Adds a `pieces` column: every word's post-merge
    * symbols, space-joined in order (the wrappers stripped — symbols
    * never contain spaces, so the join is lossless). NULL text coalesces
    * to '' — exactly what the HOF form's concat_ws-over-null yielded.
    */
  private[graft] def applyBpe(docs: DataFrame,
                              merges: Seq[(Int, String, String)]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.withColumn("pieces",
      call_function("bpe_pieces",
        coalesce(col("text"), lit("")), mergeLitsOf(merges)))
  }

  /** The pre-r15 higher-order-function formulation — retained ONLY as the
    * independent reference implementation the BpeOpsSpec law test compares
    * [[applyBpe]] against (the [[graft.ops.ChunkOps.chunksOfHof]] posture:
    * one formulation from SQL primitives both engines replay, one native —
    * agreement is the evidence the native loop implements the documented
    * fold).
    */
  private[graft] def applyBpeHof(docs: DataFrame,
                                 merges: Seq[(Int, String, String)]): DataFrame =
    docs
      .withColumn("__bpe_merges", mergeLitsOf(merges))
      .withColumn("pieces", expr(
        "concat_ws(' ', transform(split(trim(text), '\\\\s+'), " +
          s"w -> CASE WHEN char_length(w) = 0 THEN '' ELSE " +
          // strip wrappers after the fold: '[he][llo]' -> 'he llo' via
          // close-open boundary -> space, then drop the sentinels
          "replace(replace(replace(" +
          s"aggregate(__bpe_merges, ${wrapped("w")}, " +
          "(acc, m) -> replace(acc, m.pat, m.rep)), " +
          "concat(chr(3), chr(2)), ' '), chr(2), ''), chr(3), '') END))"))
      .drop("__bpe_merges")

  /** Serve token counts from a STORED model ([[buildBpeModel]]): no
    * training aggregation in the query path — merges come off the K-row
    * stored table. Output per document: word count, learned-BPE piece
    * count, and the md5 of the full piece stream (the cell the oracle
    * hash-compares after replaying the merge fold over the same stored
    * table).
    */
  def bpeTokenizeFromModel(s: SparkSession, d: String, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db) // cross-session append visibility
    val mdf = graft.OracleInputs.checkpoint(
      s.table(s"`$db`.`$BpeMergesTable`").orderBy("rank"), d, "bpe_merges")
    val merges = collectMerges(mdf)
    applyBpe(t(s, d, "documents"), merges)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
        expr("CASE WHEN char_length(pieces) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(size(split(pieces, ' ')) AS BIGINT) END")
          .as("n_bpe_tokens"),
        md5(col("pieces")).as("pieces_md5"))
      .orderBy("doc_id")
  }

  /** Scheduled tokenizer retrain — merge tables are frozen between
    * cadences (budget arithmetic must not drift mid-epoch under a
    * changing vocabulary), so vocabulary growth re-anchors here, like
    * every stored-model family ([[graft.ops.TextOps.lmRefreshEntry]]).
    */
  def bpeRefreshEntry(id: String, cronExpr: String, db: String,
                      docs: SparkSession => DataFrame,
                      k: Int = BpeNumMerges)
      : graft.pipeline.ScheduleRunner.Entry =
    graft.pipeline.ScheduleRunner.Entry(id,
      graft.pipeline.CronSchedule.parse(cronExpr),
      (s, _) => buildBpeModel(docs(s), db, k),
      name = "bpe_model_refresh", target = s"$db.$BpeMergesTable",
      tags = Map("pipeline" -> "tokenizer"))

  /** The registry gate: train on the corpus, store the model, serve from
    * the stored tables — the oracle replays ONLY the application fold
    * over the materialized merge table (training correctness is spec-
    * gated on crafted corpora with hand-computed merges).
    */
  def bpeTokenize(s: SparkSession, d: String): DataFrame = {
    buildBpeModel(t(s, d, "documents"), "graft_bpe_q")
    bpeTokenizeFromModel(s, d, "graft_bpe_q")
  }

  /** Tokenizer-health telemetry per language — the go/no-go dashboard for
    * a trained tokenizer before a corpus is budgeted with it:
    * FERTILITY (pieces per word, ×1000 — high fertility means the vocab
    * fits the language badly and every token budget silently shrinks in
    * information terms) and CHAR-FALLBACK share (single-character pieces
    * per ‰ of all pieces — BPE's "OOV" signal: a word no merge covers
    * degrades to characters). Languages the merges were never trained on
    * surface immediately with fallback near 1000.
    *
    * Scale: the [[applyBpe]] fold is per-row over the K stored merge
    * literals; one lang-keyed map-side-combinable aggregation ends the
    * plan. Gate `q_tokenizer_health`: the oracle re-applies the
    * materialized merge table and replays the per-language integer
    * ratios.
    */
  def tokenizerHealth(s: SparkSession, d: String): DataFrame = {
    val db = "graft_bpe_h"
    buildBpeModel(t(s, d, "documents"), db)
    graft.store.Warehouse.refreshDb(s, db)
    val mdf = graft.OracleInputs.checkpoint(
      s.table(s"`$db`.`$BpeMergesTable`").orderBy("rank"),
      d, "bpe_merges_health")
    val merges = collectMerges(mdf)
    applyBpe(t(s, d, "documents"), merges)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_words"),
        expr("CASE WHEN char_length(pieces) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(size(split(pieces, ' ')) AS BIGINT) END")
          .as("n_pieces"),
        expr("CASE WHEN char_length(pieces) = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE CAST(size(filter(split(pieces, ' '), " +
          "p -> char_length(p) = 1)) AS BIGINT) END").as("n_single"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        sum("n_pieces").as("total_pieces"),
        sum("n_single").as("total_single"))
      .withColumn("fertility_permille", expr(
        "CASE WHEN total_words = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000 * total_pieces) div total_words END"))
      .withColumn("char_fallback_permille", expr(
        "CASE WHEN total_pieces = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000 * total_single) div total_pieces END"))
      .orderBy("lang")
  }
}
