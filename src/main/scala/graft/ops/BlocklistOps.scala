package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Blocklist filtering for corpus curation: remove every document whose
  * content digest appears on a banned list (takedowns, license
  * revocations, known-bad content), designed for the case where BOTH
  * sides are large — a 100 TB corpus against a blocklist too big to
  * broadcast.
  *
  * The scale problem: a plain anti-join shuffles the full corpus on
  * digest. The shape here instead:
  *   1. a bloom filter of the blocklist is built DISTRIBUTED (the
  *      driver only ever collects the bitmap bytes — bounded by the
  *      bloom's size, never by blocklist cardinality) and shipped as a
  *      literal into a codegen probe;
  *   2. the corpus splits into a definite-clean stream (bloom-negative:
  *      no false negatives, so these rows are done — zero shuffle) and
  *      a bloom-positive sliver (true hits + FP rate) that alone pays
  *      the exact confirm anti-join.
  * The probe is a bandwidth gate only — false positives are resolved by
  * the confirm join, so the RESULT is exact and engine-independent even
  * though the bloom's bit pattern is not. This mirrors Spark's own
  * runtime-filter design (InjectRuntimeFilter's bloom path), expressed
  * as an explicit operator with the filter size under the caller's
  * control.
  */
object BlocklistOps {

  /** Distributed bloom build over a single LongType column named `key`
    * (pre-hashed, e.g. xxhash64 of the join key). Returns the bitmap in
    * the [[graft.functions.BloomMightContain]] layout: byte 0 = k, rest =
    * m = 8·(len−1) bits.
    *
    * Each key emits k (byte-index, bit-mask) pairs; a bit_or aggregation
    * packs them into at most m/8 rows — the ONLY driver-side collect,
    * bounded by the bloom size regardless of how many keys went in.
    * 10 bits/key with k = 7 gives ~1% false positives (standard bloom
    * sizing), i.e. the confirm join sees ~1% of the corpus.
    */
  def buildBloom(keys: DataFrame, bitsPerKey: Int = 10, k: Int = 7,
                 nKeysHint: Option[Long] = None): Array[Byte] = {
    require(k >= 1 && k <= 255, s"bloom k must be in [1, 255], got $k")
    // NOTE: sizing counts the blocklist when no hint is given — one
    // aggregate job before the plan exists (the bloom is a literal, so it
    // MUST materialize eagerly either way); production callers that track
    // blocklist cardinality pass nKeysHint and skip the count.
    val nKeys = nKeysHint.getOrElse(keys.count())
    val mBits = math.max(64L, ((nKeys * bitsPerKey + 63) / 64) * 64)
    // Loud ceiling instead of an opaque NegativeArraySizeException: at the
    // default 10 bits/key a ~1.7B-key blocklist overflows the Int-sized
    // byte array (and the multi-GB plan literal would be impractical long
    // before that — the literal ships with every task binary).
    require(1L + mBits / 8 <= Int.MaxValue,
      s"bloom bitmap would need ${mBits / 8} bytes (> Int.MaxValue) for " +
        s"$nKeys keys at $bitsPerKey bits/key — lower bitsPerKey or shard " +
        "the blocklist into multiple blooms")
    // position_i = (h1 + i·h2) mod m over non-negative terms — identical
    // arithmetic to the probe expression's Java loop
    val h1 = col("key").bitwiseAND(lit(0xffffffffL))
    val h2 = shiftrightunsigned(col("key"), 32)
    val packed = keys
      .select(explode(transform(sequence(lit(1), lit(k)),
        i => (h1 + i.cast("long") * h2) % lit(mBits))).as("pos"))
      .select(expr("CAST(pos DIV 8 AS INT)").as("byte_idx"),
        expr("shiftleft(1, CAST(pos % 8 AS INT))").as("mask"))
      .groupBy("byte_idx").agg(expr("bit_or(mask)").as("m"))
      .collect()
    val out = new Array[Byte](1 + (mBits / 8).toInt)
    out(0) = k.toByte
    packed.foreach(r => out(1 + r.getInt(0)) = r.getInt(1).toByte)
    out
  }

  /** The corpus minus blocklisted digests — exact, bloom-accelerated.
    * The fixture's blocklist is every doc_id ≡ 3 (mod 11) document's
    * content digest (production: a takedown table); any document with a
    * blocklisted digest is removed, including duplicates of banned text
    * under other ids.
    */
  def bloomBlocklistClean(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val docs = t(s, d, "documents").withColumn("digest", sha2(col("text"), 256))
    val block = docs.filter(col("doc_id") % 11 === 3).select("digest").distinct()
    cleanAgainst(docs, block)
  }

  /** [[bloomBlocklistClean]] over arbitrary frames: `docs` must carry a
    * `digest` column, `block` is a one-column `digest` blocklist.
    */
  private[graft] def cleanAgainst(docs: DataFrame, block: DataFrame,
                                  bitsPerKey: Int = 10, k: Int = 7): DataFrame =
    cleanAgainstBloom(docs, block,
      buildBloom(block.select(xxhash64(col("digest")).as("key")), bitsPerKey, k))

  /** Plan-shape core over a PREBUILT bloom: the bitmap is a literal, so
    * the plan exists without running the build jobs — plan-only callers
    * (PlanAudit) pass any layout-valid bytes; the shape is content-
    * independent.
    */
  private[graft] def cleanAgainstBloom(docs: DataFrame, block: DataFrame,
                                       bloom: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val probe = call_function("bloom_might_contain",
      lit(bloom), xxhash64(col("digest")))
    val definiteClean = docs.filter(!probe)
    val confirmClean = docs.filter(probe).join(block, Seq("digest"), "left_anti")
    definiteClean.unionByName(confirmClean)
      .select("doc_id", "digest")
      .orderBy("doc_id")
  }

  /** The span-level blocklist term list for [[acScanSpans]] — crafted so
    * the fixture exercises nested matches ("table" contains "able",
    * "scan" contains "an") and a multi-word phrase overlapping a
    * single-word term ("slow scan" vs "scan").
    */
  val AcTerms: Seq[String] =
    Seq("able", "table", "an", "scan", "slow scan", "key agg")

  /** Gate `q_ac_scan`: every occurrence of every [[AcTerms]] term in
    * every document, with its 1-based byte position — the
    * [[graft.functions.AcScan]] single-pass Aho-Corasick scan, exploded
    * and named. The automaton blob is compiled once on the driver
    * (term-volume bounded) and rides as a literal; the corpus is read
    * once, matched inside whole-stage codegen, and never joined against
    * the term list (the broadcast term-name join below fans over MATCH
    * rows, not corpus rows).
    */
  def acScanSpans(s: SparkSession, d: String): DataFrame = {
    import graft.functions.AcScan
    graft.functions.GraftFunctions.register(s)
    val blob = AcScan.compile(AcTerms)
    import s.implicits._
    val terms = AcTerms.zipWithIndex
      .map { case (t, i) => (i, t) }.toDF("term_id", "term")
    t(s, d, "documents")
      .select(col("doc_id"),
        explode(call_function("ac_scan", lit(blob), col("text"))).as("m"))
      .withColumn("term_id", (col("m") bitwiseAND AcScan.TermMask).cast("int"))
      .withColumn("pos", shiftright(col("m"), AcScan.PosShift))
      .join(broadcast(terms), Seq("term_id"))
      .select(col("doc_id"), col("pos"), col("term_id"), col("term"))
      .orderBy("doc_id", "pos", "term_id")
  }
}
