package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Span-level operators: masking, eval-span coverage, exact substring-
  * extent dedup with its (sharded) stored gram index, repeated-span
  * mining.
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextSpanPart extends TextCorePart {

  /** Masking period for [[maskSpans]] (≈ 15% of positions, the BERT
    * recipe's rate, rendered deterministic).
    */
  val MaskEvery = 7L

  /** Deterministic MLM-style token masking — the training-data export
    * for a masked-language objective: token at 1-based position p of
    * document d is replaced by `[MASK]` when (d·31 + p) mod
    * [[MaskEvery]] = 0 (a per-document phase shift, so masks don't
    * align in a column across documents the way a bare `p mod 7` would).
    * Emits the masked text plus the mask count; zero-token documents
    * pass through with empty output.
    *
    * Scale shape: per-row transform inside one projection — no shuffle
    * before the output sort. Gate `q_mask_spans`.
    */
  def maskSpans(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(col("doc_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        // size-0 guard: Spark's sequence(1, 0) is a DESCENDING [1, 0],
        // not empty — an empty doc must short-circuit
        expr(s"""CASE WHEN size(tokens) = 0 THEN ''
          | ELSE array_join(zip_with(tokens,
          | sequence(1, size(tokens)),
          | (tk, p) -> CASE WHEN (doc_id * 31 + p) % $MaskEvery = 0
          |            THEN '[MASK]' ELSE tk END), ' ') END"""
          .stripMargin.replace("\n", " ")).as("masked_text"),
        expr(s"""CASE WHEN size(tokens) = 0 THEN 0L
          | ELSE aggregate(sequence(1, size(tokens)), 0L,
          | (acc, p) -> acc + CASE WHEN (doc_id * 31 + p) % $MaskEvery = 0
          |             THEN 1L ELSE 0L END) END"""
          .stripMargin.replace("\n", " ")).as("n_masked"))
      .orderBy("doc_id")

  /** Span-coverage dedup signal (Lee et al. 2021, the substring-level
    * complement of the repeated-spans miner): for each document, how many
    * of its tokens sit inside at least one n-gram that ALSO appears in
    * another document. Repeated-spans mines the corpus-wide spans; this
    * scores each document's exposure to them and keeps documents under
    * 20% coverage — integer cross-multiplied (covered×5 < n_tokens), so
    * the whole signal is exact-integer and the oracle replays it.
    *
    * Scale shape: grams explode n× the token stream; the duplicated-gram
    * set reduces through a per-doc DISTINCT before the gram-keyed count
    * (hot grams contribute one row per doc, not per occurrence); the
    * coverage union is an explode + doc-keyed distinct — everything
    * linear, no self-joins, no position×span quadratics.
    */
  def spanCoverage(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    val docsT = withTokens(t(s, d, "documents"))
    val nt = docsT.select(col("doc_id"),
      size(col("tokens")).cast("long").as("n_tokens"))
    val st = docsT.filter(size(col("tokens")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(tokens) - ${n - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', slice(tokens, i, $n)) AS g))"))
        .as("sg"))
      .select(col("doc_id"), col("sg.pos").as("pos"), col("sg.g").as("g"))
    val dup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val cov = st.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val covc = cov.groupBy("doc_id")
      .agg(count(lit(1)).as("covered_tokens"))
    nt.join(covc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)) * 5 < col("n_tokens"))
          .cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Marker token spliced in where a repeated extent was cut out by
    * [[substringDedup]] (U+241F SYMBOL FOR UNIT SEPARATOR): keeps the two
    * fragment edges from forming NEW n-gram adjacencies across the cut, so
    * the no-surviving-repeat guarantee is exact, and makes the fragment
    * boundaries recoverable downstream.
    */
  val SpanCutMarker = "␟"

  /** Exact substring-extent dedup — the OUTPUT-CORPUS operator of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better"): [[repeatedSpans]]/[[spanCoverage]] only SCORE repeated
    * grams; this operator EXCISES every maximal corpus-repeated extent
    * and rewrites the text. Construction:
    *
    *  1. seed: every n-gram start whose gram appears in >= 2 documents
    *     (the [[spanCoverage]] duplicated-gram set — per-doc DISTINCT
    *     before the count, so hot grams cost one row per doc);
    *  2. extension: seeds n-1 apart or closer overlap, so the union of
    *     their [pos, pos+n-1] token intervals merges chained duplicated
    *     grams into MAXIMAL extents — computed relationally: a covered
    *     flag per token position, run starts via a doc-keyed `lag`;
    *  3. cut: covered runs are replaced by a single [[SpanCutMarker]]
    *     token, survivors re-joined with single spaces.
    *
    * Exactness (the property OpsPropertySpec asserts): a surviving n-gram
    * of real tokens is n consecutive uncovered source positions; were it
    * corpus-duplicated, its own start seed would have covered them —
    * contradiction. Grams spanning a cut contain the marker and cannot
    * equal any source gram. So NO n-token corpus-repeated span survives
    * anywhere in the output corpus.
    *
    * Scale shape: one gram-keyed token-volume shuffle (the dup count —
    * same as [[spanCoverage]]), then everything rides ONE doc_id
    * partitioning: the position frame shuffles on doc_id for the lag
    * window and the final group reuses that exchange (window partition
    * key = groupBy key). No self-joins, no position×span quadratics, no
    * driver collection.
    */
  def substringDedupFor(docs: DataFrame, n: Int = SpanNgram): DataFrame = {
    val docsT = withTokens(docs)
    val st = gramStarts(docsT, n)
    val dup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    substringExcise(docsT, st, dup, n)
  }

  /** (doc_id, pos, g): every n-gram start of every document (1-based). */
  private def gramStarts(docsT: DataFrame, n: Int): DataFrame =
    docsT.filter(size(col("tokens")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(tokens) - ${n - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', slice(tokens, i, $n)) AS g))"))
        .as("sg"))
      .select(col("doc_id"), col("sg.pos").as("pos"), col("sg.g").as("g"))

  /** The excision tail shared by the batch and incremental forms: cover
    * every position under a duplicated gram start, merge runs via the
    * doc-keyed lag window, cut and re-join.
    */
  private def substringExcise(docsT: DataFrame, st: DataFrame,
                              dup: DataFrame, n: Int): DataFrame = {
    val pos = docsT.select(col("doc_id"),
        posexplode(col("tokens")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val cov = st.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
    val marked = pos
      .join(cov.withColumn("covered", lit(true)), Seq("doc_id", "p"), "left")
      .withColumn("covered", coalesce(col("covered"), lit(false)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    marked
      .withColumn("new_span", (col("covered") &&
        !coalesce(lag(col("covered"), 1).over(w), lit(false))).cast("int"))
      .withColumn("out_tok",
        when(col("new_span") === 1, lit(SpanCutMarker))
          .when(!col("covered"), col("tok")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("covered").cast("long")).as("n_removed"),
        sum(col("new_span").cast("long")).as("n_spans"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(" +
            "CASE WHEN out_tok IS NOT NULL THEN struct(p, out_tok) END))," +
            " x -> x.out_tok)")).as("text_clean"))
      .orderBy("doc_id")
  }

  def substringDedup(s: SparkSession, d: String): DataFrame =
    substringDedupFor(t(s, d, "documents"))

  /** The Lee et al. 2021 pipeline ORDER as one query: exact-dedup +
    * heuristic quality first ([[corpusClean]]), THEN excise corpus-
    * repeated extents from the kept documents — the duplicated-gram set
    * is computed over the CLEANED corpus (excising against pre-clean
    * grams would cut spans whose other occurrence was already dropped).
    */
  def corpusCleanSpans(s: SparkSession, d: String): DataFrame = {
    val kept = corpusClean(s, d).select("doc_id")
    substringDedupFor(
      t(s, d, "documents").join(kept, Seq("doc_id"), "left_semi"))
  }

  /** Name of the persisted duplicated-gram state ([[buildGramIndex]]). */
  val GramIndexDb = "graft_gram_index"
  val GramIndexTable = "gram_index"

  /** Persist the corpus's per-doc-DISTINCT gram profile, bucketed by the
    * probe key so batch probes read it in place (the band-index posture —
    * one gram-keyed shuffle paid at build, never per batch). The probe
    * only needs existence, so appends stay append-only (no count merge).
    *
    * `hashGrams`: store `xxhash64(g)` instead of the gram STRING — fixed
    * 8 bytes per gram at a 2⁻⁶⁴-per-pair false-duplicate budget (a
    * collision excises one innocent span — the same accepted-FP class as
    * the bloom blocklist, and absorbed by the scheduled rebuild).
    * MEASURED shrink on the fixture: 1.23× (PerfProbe `gramindex`) — the
    * fixture's ~100-word vocabulary lets parquet dictionary-compress the
    * strings; on natural text the distinct-gram dictionary explodes and
    * the raw ~30-byte strings converge to their entropy, where the fixed
    * 8-byte key wins harder. The in-memory probe/join side always pays
    * string width, so the hashed key also caps the probe shuffle row
    * width regardless of on-disk compression. The STRING mode stays the
    * default and the gate path: exact, and the oracle replays strings.
    * Both modes are spec-proved verdict-identical on the fixture.
    */
  def buildGramIndex(corpus: DataFrame, db: String = GramIndexDb,
                     table: String = GramIndexTable,
                     n: Int = SpanNgram,
                     hashGrams: Boolean = false): Unit = {
    val grams = gramProfile(corpus, n, hashGrams)
    val buckets = IncrementalDedup.adaptiveIndexBuckets(grams.count())
    graft.store.Warehouse.saveBucketed(grams, db, table,
      Seq(gramKeyCol(hashGrams)), buckets)
  }

  private def gramKeyCol(hashGrams: Boolean): String =
    if (hashGrams) "gh" else "g"

  private def gramProfile(docs: DataFrame, n: Int,
                          hashGrams: Boolean): DataFrame = {
    val base = gramStarts(withTokens(docs), n)
      .select("doc_id", "g").distinct()
    (if (hashGrams) base.select(col("doc_id"), xxhash64(col("g")).as("gh"))
     else base)
      .groupBy(gramKeyCol(hashGrams))
      .agg(count(lit(1)).as("nd"))
  }

  /** Fold a processed batch's grams into the index (bucket spec
    * preserved — the [[IncrementalDedup.appendBands]] contract, including
    * its at-least-once caveat: replays grow the index without changing
    * any verdict, existence being the only probe semantic). The stored
    * key column (g vs gh) tells the mode — appends can never mix them.
    */
  def appendToGramIndex(batch: DataFrame, db: String = GramIndexDb,
                        table: String = GramIndexTable,
                        n: Int = SpanNgram): Unit = {
    val s = batch.sparkSession
    val hashed = !s.table(s"`$db`.`$table`").columns.contains("g")
    val grams = gramProfile(batch, n, hashed)
    val key = gramKeyCol(hashed)
    grams.write.mode("append").format("parquet")
      .bucketBy(IncrementalDedup.currentIndexBuckets(s, db, table), key)
      .sortBy(key)
      .saveAsTable(s"`$db`.`$table`")
  }

  /** Sharded gram index — the hash-slice law the band index and every
    * ANN family carry, for corpora past the single index's bucket cap
    * (~3×10¹⁰ grams at the shared [[IncrementalDedup.adaptiveIndexBuckets]]
    * ceiling): shard s holds the grams with `pmod(xxhash64(key), S) = s`,
    * each with its own adaptive bucket spec. Existence probes query ALL
    * shards and union the hits — EXACT (a gram lives in exactly one
    * shard), unlike sharded IVF where per-shard training costs recall.
    */
  def buildShardedGramIndex(corpus: DataFrame, nShards: Int,
                            db: String = GramIndexDb,
                            table: String = GramIndexTable,
                            n: Int = SpanNgram,
                            hashGrams: Boolean = false): Unit = {
    require(nShards >= 1, "nShards must be >= 1")
    val grams = gramProfile(corpus, n, hashGrams)
    val key = gramKeyCol(hashGrams)
    (0 until nShards).foreach { sh =>
      val slice = grams.filter(pmod(xxhash64(col(key)), lit(nShards)) === sh)
      val buckets = IncrementalDedup.adaptiveIndexBuckets(slice.count())
      graft.store.Warehouse.saveBucketed(slice, db, s"${table}_$sh",
        Seq(key), buckets)
    }
  }

  /** Excise a batch against a SHARDED gram index: probe every shard (the
    * batch's distinct grams are routed by the same pmod(xxhash64) law, so
    * each shard join is slice-sized), union the existence hits. At S=1
    * the result is bit-equal to [[substringDedupAgainst]] over the single
    * index — the sharded-family standard, spec-asserted.
    */
  def substringDedupAgainstSharded(batch: DataFrame, s: SparkSession,
                                   nShards: Int,
                                   db: String = GramIndexDb,
                                   table: String = GramIndexTable,
                                   n: Int = SpanNgram): DataFrame = {
    val docsT = withTokens(batch)
    val st = gramStarts(docsT, n)
    val batchDup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    val hashed = !s.table(s"`$db`.`${table}_0`").columns.contains("g")
    val key = gramKeyCol(hashed)
    val probeKeys =
      (if (hashed) st.select(col("g"), xxhash64(col("g")).as("gh"))
       else st.select(col("g"))).distinct()
    val hits = (0 until nShards).map { sh =>
      probeKeys.filter(pmod(xxhash64(col(key)), lit(nShards)) === sh)
        .join(s.table(s"`$db`.`${table}_$sh`").select(key), Seq(key),
          "left_semi")
        .select("g")
    }.reduce(_.union(_))
    substringExcise(docsT, st, batchDup.union(hits).distinct(), n)
  }

  /** Fold a batch's grams into a sharded index: each gram routes to its
    * hash slice (membership can never drift — the same pmod law the
    * builder used), appends preserving per-shard bucket specs.
    */
  def appendToShardedGramIndex(batch: DataFrame, s: SparkSession,
                               nShards: Int,
                               db: String = GramIndexDb,
                               table: String = GramIndexTable,
                               n: Int = SpanNgram): Unit = {
    val hashed = !s.table(s"`$db`.`${table}_0`").columns.contains("g")
    val grams = gramProfile(batch, n, hashed).localCheckpoint()
    val key = gramKeyCol(hashed)
    (0 until nShards).foreach { sh =>
      val slice = grams.filter(pmod(xxhash64(col(key)), lit(nShards)) === sh)
      slice.write.mode("append").format("parquet")
        .bucketBy(IncrementalDedup.currentIndexBuckets(s, db, s"${table}_$sh"),
          key)
        .sortBy(key)
        .saveAsTable(s"`$db`.`${table}_$sh`")
    }
  }

  /** Excise a BATCH against the persisted corpus gram profile: a batch
    * gram is duplicated when the corpus already holds it (the batch doc
    * is the second occurrence) or >= 2 batch docs share it — exactly the
    * union corpus's duplicated-gram rule restricted to batch rows, so
    * the output is BIT-EQUAL to a fresh [[substringDedupFor]] over the
    * union filtered to the batch (the gate's invariant). Already-emitted
    * corpus output is append-only (a batch can make a corpus gram
    * retroactively duplicated — the scheduled rebuild re-anchors, the
    * standing incremental contract).
    *
    * Scale shape: the corpus is never re-grammed — the probe semi-joins
    * the batch's distinct grams against the bucketed index (batch-side
    * shuffle only); everything else is batch-sized.
    */
  private[graft] def substringDedupAgainst(batch: DataFrame,
                                           gramIndex: DataFrame,
                                           n: Int = SpanNgram): DataFrame = {
    val docsT = withTokens(batch)
    val st = gramStarts(docsT, n)
    val batchDup = st.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("g")
    // probe key follows the index mode: gram string (exact, the gate
    // path) or xxhash64 (the 100 TB state-compaction mode)
    val corpusHit =
      if (gramIndex.columns.contains("g"))
        st.select("g").distinct()
          .join(gramIndex.select("g"), Seq("g"), "left_semi")
      else
        st.select(col("g"), xxhash64(col("g")).as("gh")).distinct()
          .join(gramIndex.select("gh"), Seq("gh"), "left_semi")
          .select("g")
    substringExcise(docsT, st, batchDup.union(corpusHit).distinct(), n)
  }

  /** Registry gate (append-only id split, the [[graft.ops.IncrementalClusters]]
    * fixture convention): build the gram index on the ingested corpus,
    * excise the batch against it. The oracle replays the FRESH union
    * operator filtered to batch rows — a green row proves the
    * incremental path's bit-equality invariant.
    */
  def substringDedupIncrement(s: SparkSession, d: String): DataFrame = {
    val corpus = IncrementalClusters.corpusDocsRange(s, d)
    val batch = IncrementalClusters.batchDocsRange(s, d)
    buildGramIndex(corpus)
    substringDedupAgainst(batch,
      s.table(s"`$GramIndexDb`.`$GramIndexTable`"))
  }

  /** Corpus-internal repeated spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", at n-gram granularity):
    * the n-word spans shared by at least `minDocs` DISTINCT documents —
    * the signal behind substring-level dedup, and the corpus-internal
    * complement of [[decontaminateNgram]]'s cross-set overlap. word_ngrams
    * emits each doc's distinct grams, so the count per gram IS its
    * containing-document count.
    *
    * Scale shape: codegen gram expansion → ONE map-side-combined count on
    * the gram key (the only token-volume shuffle) → threshold filter →
    * bounded top-k (rank by count then gram; global limit over the tiny
    * filtered set). Linear in corpus token volume; nothing all-pairs.
    */
  val SpanNgram = 5
  val SpanMinDocs = 2
  val SpanTopK = 50
  def repeatedSpans(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, d, "documents")
      .withColumn("grams",
        call_function("word_ngrams", col("text"), lit(SpanNgram)))
      .select(explode(col("grams")).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= SpanMinDocs)
      .orderBy(col("n_docs").desc, col("gram").asc)
      .limit(SpanTopK)
  }
}
