package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Vocabulary diagnostics: top terms, token rarity, n-gram novelty,
  * skip-grams, Zipf decay, vocabulary coverage, OOV rate, and the
  * quantile-alignment histogram lifecycle (incl. forget folds).
  *
  * Mixin part of [[TextOps]] (round-12 verdict #7: the single 2.9k-line
  * file split by family — pure moves; every call site still reads
  * `TextOps.member`). Shared core helpers (tokenizer, quality gate)
  * live in [[TextCorePart]].
  */
private[graft] trait TextVocabPart extends TextCorePart {

  /** Corpus vocabulary: top-5 terms per language by frequency — explode →
    * two-level aggregation (map-side combined) → per-group top-k window.
    * The shuffle is keyed by (lang, token); no collect, no global sort.
    */
  def topTermsPerLang(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("token").asc)
    withTokens(t(s, d, "documents"))
      .select(col("lang"), explode(col("tokens")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("lang", "rnk", "token", "cnt")
      .orderBy("lang", "rnk")
  }

  /** Per-document mean corpus-frequency signal — the integer core of a
    * CCNet-style rarity filter: documents whose tokens are mostly
    * corpus-rare (low `freq_sum / n_tokens`) are gibberish/boilerplate
    * candidates; mostly corpus-common means natural running text. Emitted
    * as the exact integer pair (numerator `freq_sum` = Σ over token
    * occurrences of that token's corpus count, denominator `n_tokens`)
    * per the int/int determinism contract — the consumer picks the ratio.
    *
    * Scale shape: explode → per-(doc, token) count with map-side combine
    * (the only token-volume shuffle), corpus frequencies as a second agg
    * over the same frame, joined back WITHOUT a broadcast hint — corpus
    * vocabulary is unbounded (urls/typos), so AQE chooses broadcast vs
    * token-keyed shuffle join at runtime. Final agg is doc-keyed. Nothing
    * driver-side, nothing all-pairs.
    */
  def meanTokenFreq(s: SparkSession, d: String): DataFrame = {
    val tf = withTokens(t(s, d, "documents"))
      .select(col("doc_id"), explode(col("tokens")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val cf = tf.groupBy("token").agg(sum("tf").as("cf"))
    tf.join(cf, "token")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("cf")).as("freq_sum"))
      .orderBy("doc_id")
  }

  /** Distinct-3-gram NOVELTY of the odd-doc slice against the even-doc
    * reference — the self-BLEU-flavored memorization/novelty screen a
    * generation pipeline runs between a candidate corpus and its
    * training reference (novelty → 0 means the candidate re-treads the
    * reference's surface forms): |grams(cand) \ grams(ref)| over
    * |grams(cand)|, on the dedup family's 3-token shingles.
    *
    * Scale shape: gram explode + per-slice DISTINCT (one hash shuffle
    * on the gram), one gram-keyed anti join — the decontamination
    * shape, linear, never all-pairs. Gate `q_ngram_novelty`.
    */
  def ngramNovelty(s: SparkSession, d: String): DataFrame = {
    val grams = graft.ops.SetJoinOps.docShingles(t(s, d, "documents"))
    // both slices feed two consumers each — persist or the gram
    // distinct recomputes per branch (the theta branch-reuse lesson)
    val ref = PlanCache.swap("novelty_ref",
      grams.where(col("doc_id") % 2 === 0).select("sh").distinct())
    val cand = PlanCache.swap("novelty_cand",
      grams.where(col("doc_id") % 2 === 1).select("sh").distinct())
    val novel = cand.join(ref, Seq("sh"), "left_anti")
      .agg(count(lit(1)).as("n_novel"))
    val nr = ref.agg(count(lit(1)).as("n_grams_ref"))
    val nc = cand.agg(count(lit(1)).as("n_grams_cand"))
    novel.crossJoin(broadcast(nr)).crossJoin(broadcast(nc))
      .select(col("n_grams_ref"), col("n_grams_cand"), col("n_novel"),
        expr("CAST(CASE WHEN n_grams_cand = 0 THEN 0 ELSE " +
          "n_novel * 1000000 div n_grams_cand END AS BIGINT)")
          .as("novelty_ppm"))
  }

  /** SKIP-GRAM co-occurrence pairs (window ±2, the word2vec context
    * shape) — the training-pair export for embedding models and the
    * collocation surface wider than [[collocations]]' adjacent bigrams:
    * per ordered (center, context) pair within 2 positions, the corpus
    * count; top-100 by (count desc, pair) — a total order, so the
    * LIMIT cut is deterministic.
    *
    * Scale shape: pair generation is a PER-ROW zip_with expression
    * (offsets +1/+2 against the token array — no posexplode self-join,
    * zero shuffle before the count agg); one (w, c) count aggregation
    * (map-side combined), then the fixed top-k. Symmetric counts come
    * from unioning the swapped frame, not a second pass over text.
    * Gate `q_skipgram_pairs`.
    */
  def skipgramPairs(s: SparkSession, d: String): DataFrame = {
    def off(k: Int) =
      s"""CASE WHEN size(tokens) > $k THEN
         |  zip_with(slice(tokens, 1, size(tokens) - $k),
         |           slice(tokens, 1 + $k, size(tokens) - $k),
         |           (a, b) -> named_struct('w', a, 'c', b))
         |ELSE array() END""".stripMargin
    val fwd = withTokens(t(s, d, "documents"))
      .select(explode(expr(s"concat(${off(1)}, ${off(2)})")).as("p"))
      .select(col("p.w").as("w"), col("p.c").as("c"))
    fwd.unionAll(fwd.select(col("c").as("w"), col("w").as("c")))
      .groupBy("w", "c").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"), col("c"))
      .limit(100)
  }

  /** ZIPF DECAY PROFILE per source — token-frequency mass per rank
    * DOUBLING bucket (bucket b holds type ranks [2^b, 2^{b+1})): under
    * an ideal Zipf 1/r law every doubling bucket carries equal token
    * mass, so `decay_ppm` (next bucket's mass over this one's, exact
    * ppm) sits near 10⁶ — a collapsed tail (boilerplate floods) or a
    * missing head (tokenizer shattering) bends it far off. The bucket
    * index is exact integer arithmetic (binary-digit count of the
    * rank), never a floating log.
    *
    * Scale shape: one (source, token) count aggregation — the corpus's
    * only shuffle; the rank window and the bucket rollup run on the
    * VOCABULARY-sized frame, and the lead window on the ~log₂|V| bucket
    * frame. Gate `q_zipf_profile`.
    */
  def zipfProfile(s: SparkSession, d: String): DataFrame = {
    val freq = withTokens(t(s, d, "documents"))
      .select(col("source"), explode(col("tokens")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val ranked = freq.withColumn("rnk", row_number().over(
      Window.partitionBy("source").orderBy(col("c").desc, col("tok"))))
    val buckets = ranked
      .withColumn("bucket", (length(conv(col("rnk"), 10, 2)) - 1).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_types"), sum("c").as("bucket_tokens"))
    val w2 = Window.partitionBy("source").orderBy("bucket")
    buckets.withColumn("nxt", lead("bucket_tokens", 1).over(w2))
      .select(col("source"), col("bucket"), col("n_types"),
        col("bucket_tokens"),
        coalesce(
          expr("CAST(nxt AS DECIMAL(38,0)) * 1000000 div bucket_tokens"),
          lit(-1L)).as("decay_ppm"))
      .orderBy("source", "bucket")
  }

  /** QUANTILE ALIGNMENT table of document length across sources — the
    * exact per-source percentile grid (p = 0..100, value at within-
    * source rank ceil(p·n_s/100), rank-1 at p = 0) next to the global
    * grid and their difference: the lookup table quantile NORMALIZATION
    * applies (map a value through its source percentile onto the global
    * quantile function — the batch-effect corrector) and the drift
    * diagnostic that catches one source's length distribution walking
    * away from the corpus.
    *
    * Scale shape: histograms only — one (source, n_chars) count agg
    * (map-side combined), prefix windows over HISTOGRAM frames, and the
    * percentile lookup as an AS-OF union+window per source (cells + 101
    * rows per partition; the q_asof_last_click posture) — never a
    * per-document rank, never a histogram×grid nested-loop join.
    * Gate `q_quantile_align`.
    */
  def quantileAlign(s: SparkSession, d: String): DataFrame =
    quantileAlignFromHist(histOfDocs(t(s, d, "documents")))

  /** The (source, n_chars, c) length histogram — [[quantileAlign]]'s
    * whole state, and ADDITIVE, which is what makes the stored/
    * incremental variant exactly-once for free.
    */
  private[graft] def histOfDocs(docs: DataFrame): DataFrame =
    docs.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))

  /** [[quantileAlign]] over an explicit histogram (split out so the
    * stored delta-grown histogram serves the same computation).
    */
  private[graft] def quantileAlignFromHist(histRaw: DataFrame): DataFrame = {
    // zero cells arise only from a forget fold that exactly cancelled a
    // cell; they carry no mass but would tie two cells on the same
    // cumulative rank key, making the as-of pick order-dependent
    val histIn = histRaw.where(col("c") > 0)
    def pctValues(hist0: DataFrame): DataFrame = {
      val hist = hist0
        .withColumn("hi", sum("c").over(Window.partitionBy("source")
          .orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("lo", col("hi") - col("c") + 1)
      val grid = hist0.groupBy("source").agg(sum("c").as("n_s"))
        .select(col("source"), col("n_s"),
          explode(expr("sequence(0, 100)")).as("pct"))
        .select(col("source"), col("pct"),
          expr("greatest(1L, (pct * n_s + 99) div 100)").as("k"))
      val cells = hist.select(col("source"), col("lo").as("k"),
        lit(0).as("isg"), col("n_chars").as("v"),
        lit(null).cast("int").as("pct"))
      val probes = grid.select(col("source"), col("k"), lit(1).as("isg"),
        lit(null).cast("long").as("v"), col("pct").cast("int").as("pct"))
      cells.unionByName(probes)
        .withColumn("value", last("v", ignoreNulls = true).over(
          Window.partitionBy("source").orderBy(col("k"), col("isg"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .where(col("isg") === 1)
        .select(col("source"), col("pct"), col("value"))
    }
    val src = pctValues(histIn)
    val glob = pctValues(histIn.groupBy("n_chars").agg(sum("c").as("c"))
        .withColumn("source", lit("__all__")))
      .select(col("pct"), col("value").as("global_value"))
    src.join(broadcast(glob), Seq("pct"))
      .select(col("source"), col("pct"), col("value").as("src_value"),
        col("global_value"),
        (col("value") - col("global_value")).as("shift"))
      .orderBy("source", "pct")
  }

  /** Stored table of the quantile-alignment histogram family. */
  val QaHistTable = "qa_hist"

  /** Delta-model descriptor: the length histogram is a pure additive
    * count model, so [[graft.pipeline.DeltaModelIngest]]'s exactly-once
    * machinery applies verbatim.
    */
  def qaFamily(db: String): graft.pipeline.DeltaModelIngest.Family =
    graft.pipeline.DeltaModelIngest.Family(db, QaHistTable,
      Seq("source", "n_chars"), Seq("c"))

  /** Full rebuild of the stored histogram (the cron re-anchor). */
  def buildQaModel(docs: DataFrame, db: String): Unit = {
    val s = docs.sparkSession
    import graft.pipeline.DeltaModelIngest
    val prev = DeltaModelIngest.prepareRebuild(s, qaFamily(db))
    graft.store.Warehouse.saveModel(histOfDocs(docs), db, QaHistTable)
    DeltaModelIngest.finishRebuild(s, qaFamily(db), prev)
  }

  /** foreachBatch adapter: exactly-once histogram growth — one
    * (source, epoch)-named overwrite delta per batch.
    */
  def qaDeltaSink(srcTag: String, db: String): (DataFrame, Long) => Unit =
    (batch, epochId) => graft.pipeline.DeltaModelIngest.append(
      batch.sparkSession, qaFamily(db), srcTag, epochId,
      histOfDocs(batch))

  /** Serve the alignment from the STORED (possibly delta-grown)
    * histogram — no corpus aggregation in the query path.
    */
  def quantileAlignFromStore(s: SparkSession, db: String): DataFrame = {
    graft.store.Warehouse.refreshDb(s, db)
    import graft.pipeline.DeltaModelIngest
    val hist =
      if (DeltaModelIngest.hasDeltas(s, qaFamily(db)))
        PlanCache.swap(s"qa-delta-eff-$db",
          DeltaModelIngest.effectiveCounts(s, qaFamily(db)))
      else s.table(s"`$db`.`$QaHistTable`")
    // forget folds may cancel cells to zero (filtered downstream) but
    // must NEVER drive one negative — that means a deletion of rows
    // never ingested, and serving from it would silently misalign
    val mn = hist.agg(min("c")).head()
    require(mn.isNullAt(0) || mn.getLong(0) >= 0L,
      "quantileAlignFromStore: negative histogram cell — a forget fold " +
        "deleted rows the store never ingested; rebuild from the corpus")
    quantileAlignFromHist(hist)
  }

  /** RIGHT-TO-BE-FORGOTTEN fold — the deletion dual of
    * [[quantileAlignIncrement]]: the histogram family is ADDITIVE, so a
    * departing slice folds in as a NEGATIVE delta through the same
    * exactly-once machinery (redelivered deletion batches land
    * identical bytes — no double-forget), and the served alignment
    * equals a from-scratch build WITHOUT the deleted documents (the
    * oracle). Exactly-zero cells are filtered at serve; a cell driven
    * NEGATIVE refuses loudly ([[quantileAlignFromStore]]) — deleting
    * never-ingested rows is corruption, not maintenance. The
    * data-governance posture every stored count model at 100 TB needs:
    * retrain-scale cost for a delete would make compliance a full
    * rebuild; the additive fold makes it one delta.
    * Gate `q_quantile_align_forget`.
    */
  def quantileAlignForget(s: SparkSession, d: String): DataFrame = {
    val db = "graft_qa_fgt_q"
    buildQaModel(t(s, d, "documents"), db)
    val departing = histOfDocs(
        graft.ops.IncrementalClusters.batchDocsRange(s, d))
      .select(col("source"), col("n_chars"), (-col("c")).as("c"))
    graft.pipeline.DeltaModelIngest.append(s, qaFamily(db), "forget", 0L,
      departing)
    quantileAlignFromStore(s, db)
  }

  /** Maintenance-invariant gate: build the stored histogram on the
    * front ⅔ of the corpus, fold the back ⅓ as an exactly-once delta,
    * serve — the oracle is the FRESH full-corpus alignment, so a green
    * row proves streamed state ≡ a from-scratch build (the
    * q_link_graph_incremental posture, histogram family).
    * Gate `q_quantile_align_incremental`.
    */
  def quantileAlignIncrement(s: SparkSession, d: String): DataFrame = {
    val db = "graft_qa_inc_q"
    buildQaModel(IncrementalClusters.corpusDocsRange(s, d), db)
    graft.pipeline.DeltaModelIngest.append(s, qaFamily(db), "gate", 0L,
      histOfDocs(IncrementalClusters.batchDocsRange(s, d)))
    quantileAlignFromStore(s, db)
  }

  /** SOURCE SIMILARITY matrix — pairwise 3-gram Jaccard between the
    * sources' DISTINCT shingle sets (the corpus-mixing diagnostic one
    * level above document dedup: two provenances with high gram overlap
    * are near-redundant slices, and a mixing plan that weights both is
    * double-counting a distribution). Exact: intersection via one
    * gram-keyed self-pairing, |A∪B| = |A|+|B|−|A∩B|.
    *
    * Scale shape: gram explode + per-source DISTINCT (one hash shuffle
    * on the gram — the decontamination class); the pair fan-out per
    * gram is C(k,2) with k ≤ |sources| (provenance-bounded, never
    * corpus-bounded); per-source set sizes are one agg.
    * Gate `q_source_similarity`.
    */
  def sourceSimilarity(s: SparkSession, d: String): DataFrame = {
    val grams = graft.ops.SetJoinOps.docShingles(t(s, d, "documents"))
      .join(t(s, d, "documents").select("doc_id", "source"), "doc_id")
      .select(col("source"), col("sh")).distinct()
      .persist()
    try {
      val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = grams.select(col("source").as("sa"), col("sh"))
        .join(grams.select(col("source").as("sb"), col("sh")), "sh")
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
        .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
        .select(col("sa"), col("sb"), col("na"), col("nb"),
          col("n_inter"),
          expr("n_inter * 1000000L div (na + nb - n_inter)")
            .as("jaccard_ppm"))
        .orderBy("sa", "sb")
      out.localCheckpoint(eager = true)
    } finally grams.unpersist()
  }



  /** VOCABULARY COVERAGE CURVE — the share of token OCCURRENCES covered
    * by the top-N most frequent types for N ∈ {100, 1000, 10000}: the
    * vocab-sizing table (how big must a tokenizer's vocabulary be
    * before the OOV tail stops mattering) next to [[zipfProfile]]'s
    * decay shape. Exact ppm; rank ties broken by token so the cutoff
    * is a total order both engines replay.
    *
    * Scale shape: one token count aggregation (the corpus's only
    * shuffle); each cutoff is a TakeOrderedAndProject top-N over the
    * vocabulary frame (per-partition heaps — the heavy-ngrams posture;
    * a global rank WINDOW here would be an Exchange SinglePartition
    * over the whole vocabulary, and measured 6.2× at the 25× probe
    * before this rewrite), then a ≤N-row sum. Gate `q_vocab_coverage`.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val freq = PlanCache.swap(s"vocab-coverage-freq-$d",
      withTokens(t(s, d, "documents"))
        .select(explode(col("tokens")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")))
    val tot = freq.agg(sum("c").as("total"), count(lit(1)).as("n_types"))
    Seq(100, 1000, 10000).map { n =>
      freq.orderBy(col("c").desc, col("w")).limit(n)
        .agg(coalesce(sum("c"), lit(0L)).as("covered"))
        .crossJoin(broadcast(tot))
        .select(lit(n.toLong).as("top_n"), col("n_types"), col("total"),
          col("covered"),
          expr("CAST(covered AS DECIMAL(38,0)) * 1000000 div total")
            .as("coverage_ppm"))
    }.reduce(_ unionByName _).orderBy("top_n")
  }

  /** OUT-OF-VOCABULARY RATE of the batch slice against the training
    * slice's vocabulary — the retrain-the-tokenizer signal (an OOV
    * climb means the incoming distribution is outrunning the stored
    * vocab; [[ngramNovelty]] asks the DISTINCT-surface question, this
    * the occurrence-weighted one): front ⅔ of the corpus trains the
    * vocabulary, back ⅓ is the batch; per batch source, the OOV token
    * occurrences and exact ppm.
    *
    * Scale shape: one distinct over the training tokens (vocab-sized
    * output), one (source, token) count aggregation on the batch, one
    * token-keyed anti-flagging join — the decontamination class.
    * Gate `q_oov_rate`.
    */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val vocab = withTokens(
        graft.ops.IncrementalClusters.corpusDocsRange(s, d))
      .select(explode(col("tokens")).as("w")).distinct()
    val batch = withTokens(
        graft.ops.IncrementalClusters.batchDocsRange(s, d))
      .select(col("source"), explode(col("tokens")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    batch.join(vocab.withColumn("known", lit(1)), Seq("w"), "left")
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        sum(when(col("known").isNull, col("c")).otherwise(0L))
          .as("n_oov"),
        sum(when(col("known").isNull, 1L).otherwise(0L))
          .as("n_oov_types"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        col("n_oov_types"),
        expr("n_oov * 1000000L div n_tokens").as("oov_ppm"))
      .orderBy("source")
  }

  def vocabStats(s: SparkSession, d: String): DataFrame =
    withTokens(t(s, d, "documents"))
      .select(col("source"), explode(col("tokens")).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy("source")
}
