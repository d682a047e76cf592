package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Privacy-preserving release operators — the fourth leg of the corpus
  * privacy family ([[TextOps.redactPii]] masks, [[TextOps.pseudonymizeFor]]
  * pseudonymizes, [[BlocklistOps]] suppresses; this PERTURBS): when even a
  * per-group aggregate over a sensitive per-document attribute is too
  * revealing to compute exactly, each row randomizes its own report before
  * aggregation, and the aggregator debiases.
  *
  * Mechanism: Warner's randomized response — report the true bit with
  * probability 3/4, the flipped bit with probability 1/4. That is ε-local
  * differential privacy with ε = ln(3/4 ÷ 1/4) = ln 3: an adversary
  * holding a single report cannot tell the true bit apart beyond 3:1 odds,
  * yet the group rate estimator `π̂ = 2·λ̂ − 1/2` (λ̂ = observed report
  * rate) is unbiased.
  *
  * DETERMINISTIC coin: flip iff the first hex char of
  * md5(salt‖doc_id) ∈ {0,4,8,c} — exactly 4 of 16 equiprobable values, so
  * the flip probability is exactly 1/4, the whole release is replayable
  * (the oracle recomputes every coin), and a re-run releases the SAME
  * report per row — re-releasing under fresh coins would average the
  * noise away, which is the classic RR mistake; a deterministic coin per
  * (salt, id) spends the privacy budget once. Rotating the salt IS the
  * decision to spend more budget.
  *
  * Scale: per-row hash + one group-keyed map-side-combinable aggregation —
  * zero extra shuffles over the plain (non-private) rate query.
  */
object PrivacyOps {

  /** Coin salt — an engine constant the oracle replays; a deployment
    * rotates it per release epoch (each rotation spends ε again).
    */
  val RrSalt = "graft-rr-v1:"

  /** Hex chars marking a flip: 4/16 → P(flip) = 1/4 exactly. */
  val FlipHex: Seq[String] = Seq("0", "4", "8", "c")

  /** Adds `truth` (the sensitive bit: lang = 'en'), `flip` and `reported`
    * to a (doc_id, lang) frame — split out for the spec's exact-replay
    * law against a JVM-side md5.
    */
  private[graft] def withReports(docs: DataFrame): DataFrame =
    docs
      .withColumn("truth", (col("lang") === "en").cast("int"))
      .withColumn("flip", substring(md5(concat(lit(RrSalt),
        col("doc_id").cast("string")).cast("binary")), 1, 1)
        .isin(FlipHex: _*).cast("int"))
      .withColumn("reported",
        when(col("flip") === 1, lit(1) - col("truth")).otherwise(col("truth")))

  /** Per-source ε=ln3 private release of the English-document rate:
    * reports aggregate per source, the debiased estimate
    * `(2000·n_reported − 500·n) div n` lands in exact per-mille fixed
    * point, clamped to [0, 1000] BEFORE the division ever sees a negative
    * numerator (Spark `div` truncates toward zero, DuckDB `//` floors —
    * they disagree exactly on negatives, so negatives are clamped out,
    * not divided).
    */
  def rrPrivatize(s: SparkSession, d: String): DataFrame =
    withReports(t(s, d, "documents"))
      .groupBy("source").agg(
        count(lit(1)).as("n"),
        sum("reported").cast("long").as("n_reported"))
      .withColumn("est_permille", expr(
        "CASE WHEN 2000 * n_reported - 500 * n <= 0 THEN CAST(0 AS BIGINT) " +
          "WHEN 2000 * n_reported - 500 * n >= 1000 * n THEN CAST(1000 AS BIGINT) " +
          "ELSE (2000 * n_reported - 500 * n) div n END"))
      .orderBy("source")

  /** k for [[kAnonymize]]: an equivalence class smaller than this is
    * re-identifiable and must suppress its quasi-identifiers.
    */
  val KAnon = 10L

  /** l for the diversity rule: a class whose sensitive attribute takes
    * fewer than `l` distinct values leaks it by membership alone, however
    * large the class (the homogeneity attack k-anonymity misses).
    */
  val LDiv = 2L

  /** k-anonymity + l-diversity audit and suppression over the release
    * projection: quasi-identifiers = (lang, length decile) — the decile
    * generalizes exact lengths the way real releases bucket ages — and
    * the SENSITIVE attribute is the provenance `source` (published by
    * design; what l-diversity protects is that QI-class membership alone
    * must not pin it down). Every row joins its equivalence class's size
    * and source diversity; rows in classes failing k=[[KAnon]] or
    * l=[[LDiv]] release `*`/-1 for every quasi-identifier —
    * suppression, the only transform that never invents data.
    *
    * One QI-keyed aggregation + one broadcast-sized join back (class
    * count ≤ langs × 10); per-row elsewhere.
    */
  def kAnonymize(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
      .withColumn("len_decile",
        least(expr("char_length(text) div 100"), lit(9L)))
    val classes = docs
      .groupBy("lang", "len_decile").agg(
        count(lit(1)).as("class_n"),
        countDistinct(col("source")).as("class_l"))
      .withColumn("suppress",
        (col("class_n") < KAnon || col("class_l") < LDiv).cast("int"))
    docs.join(broadcast(classes), Seq("lang", "len_decile"))
      .select(
        col("doc_id"),
        when(col("suppress") === 1, lit("*")).otherwise(col("lang"))
          .as("rel_lang"),
        when(col("suppress") === 1, lit(-1L)).otherwise(col("len_decile"))
          .as("rel_decile"),
        col("source").as("sensitive_source"),
        col("class_n"), col("class_l"), col("suppress"))
      .orderBy("doc_id")
  }

  /** Checksum-validated PAN detection (Luhn 1960 / ISO 7812) — the
    * upgrade over pure-regex PII scanning: a 13–19-digit run is only a
    * payment-card candidate if its Luhn check digit verifies, so
    * order-ids and timestamps stop triggering redaction (the
    * false-positive class regex-only scanners are known for). Redaction
    * is CHECKSUM-GATED: only validated candidates are replaced.
    *
    * Fixture: document text carries no digit runs, so the gate scans a
    * crafted account view (the robots/sitemap posture): each doc embeds
    * one VALID candidate (15-digit base from doc_id arithmetic + the
    * computed Luhn check digit) and one INVALID (same base, check digit
    * +1 mod 10) — the gate proves the validator separates them 100%/0%.
    *
    * Luhn rendering (identical in both engines): digit i counted from
    * the RIGHT doubles when i is even, doubled values > 9 subtract 9,
    * valid ⇔ Σ mod 10 = 0 — a fold over the digit positions
    * (`aggregate(sequence)` in Spark, `list_sum(list_transform(range))`
    * in DuckDB), exact integer throughout.
    *
    * Scale shape: per-row regex extraction + a constant-length integer
    * fold per candidate, zero shuffles before the output sort.
    */
  def luhnScan(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .withColumn("acct_base",
        expr("substring(repeat(cast(doc_id * 7919 + 13 as string), 8), 1, 15)"))
      .withColumn("check_digit", expr(
        s"(10 - ${luhnSumSql("concat(acct_base, '0')")} % 10) % 10"))
      .withColumn("valid_pan",
        concat(col("acct_base"), col("check_digit").cast("string")))
      .withColumn("invalid_pan",
        concat(col("acct_base"),
          ((col("check_digit") + 1) % 10).cast("string")))
      .withColumn("acct_text", concat(lit("acct "), col("valid_pan"),
        lit(" ref "), col("invalid_pan")))
    base.select(col("doc_id"), col("acct_text"),
        posexplode(expr("regexp_extract_all(acct_text, '[0-9]{13,19}', 0)"))
          .as(Seq("candidate_idx", "digits")))
      .withColumn("n_digits", length(col("digits")))
      .withColumn("luhn_valid",
        expr(s"CAST(${luhnSumSql("digits")} % 10 = 0 AS INT)"))
      .withColumn("redacted",
        when(col("luhn_valid") === 1,
          expr("replace(acct_text, digits, '[PAN]')"))
          .otherwise(col("acct_text")))
      .select("doc_id", "candidate_idx", "digits", "n_digits",
        "luhn_valid", "redacted")
      .orderBy("doc_id", "candidate_idx")
  }

  /** The Luhn digit-fold as a SQL fragment over a digit-string column
    * expression — shared by candidate validation and check-digit
    * crafting so the two can never disagree.
    */
  private def luhnSumSql(c: String): String =
    s"""aggregate(sequence(1, length($c)), 0, (acc, i) ->
       | acc + CASE WHEN i % 2 = 0 THEN
       |   CASE WHEN (ascii(substring($c, length($c) + 1 - i, 1)) - 48) * 2 > 9
       |        THEN (ascii(substring($c, length($c) + 1 - i, 1)) - 48) * 2 - 9
       |        ELSE (ascii(substring($c, length($c) + 1 - i, 1)) - 48) * 2 END
       |  ELSE ascii(substring($c, length($c) + 1 - i, 1)) - 48 END)"""
      .stripMargin.replace("\n", " ")
}
