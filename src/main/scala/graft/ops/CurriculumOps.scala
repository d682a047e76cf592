package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Curriculum ordering (Bengio et al. 2009; the easy→hard data schedule
  * used for LLM pretraining warmup): score each document's DIFFICULTY from
  * integer readability proxies, cut the corpus into staged tertiles at
  * exact discrete-percentile boundaries, and order each stage by the
  * engine's deterministic md5 permutation — the training dataloader reads
  * `ORDER BY stage, sk` and gets easy docs first, hard docs last, shuffled
  * within a stage.
  *
  * Difficulty (all per-mille exact integers — no float readability
  * formula crosses an engine boundary):
  *   awl_pm  = 1000·Σ|token| div n_tokens      (mean word length)
  *   asl_pm  = 1000·n_tokens div n_sentences   (mean sentence length;
  *             sentences = [.!?]+ runs, min 1)
  *   rare_pm = 1000·n_rare div n_tokens        (corpus-rare tokens:
  *             1000·c(w) ≤ T — share below 0.1% of the token volume)
  *   difficulty_fp = awl_pm + asl_pm div 10 + 2·rare_pm
  * (fixed documented weights — a config surface, not a learned model).
  *
  * Stage boundaries are the smallest difficulties whose cumulative count
  * passes (n−1)·k div 3 (k = 1, 2) — the q_approx_percentile discrete-
  * percentile idiom, so both engines land on identical cuts with no
  * interpolation. Stage 0 ≤ t1 < stage 1 ≤ t2 < stage 2.
  *
  * Scale shape: ONE token-volume shuffle for corpus counts c(w); the
  * per-doc score is a vocab-sized broadcast-join + per-doc agg; the
  * boundary calc windows over DISTINCT difficulty values (value-bounded,
  * not corpus-bounded — the approx-percentile posture); the curriculum
  * ORDER is (stage, md5 key) — a range-partitioned write in production,
  * never a global rank window (no single-partition exchange anywhere:
  * the order is the contract, not a materialized position column).
  */
object CurriculumOps {

  /** Rarity cut: a token is rare when 1000·c(w) ≤ total token volume. */
  val RarePm = 1000L

  /** Stage count (tertiles). */
  val Stages = 3

  def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    // n_sents rides the explode as a per-doc scalar (max-folded after) —
    // the doc text itself never enters an aggregation buffer
    val toks = t(s, d, "documents")
      .withColumn("n_sents", greatest(lit(1L),
        size(filter(split(col("text"), "[.!?]+"),
          c => trim(c) =!= "")).cast("long")))
      .select(col("doc_id"), col("n_sents"),
        explode(TextOps.tokensOf(col("text"))).as("w"))
    val cw = toks.groupBy("w").agg(count(lit(1)).as("cw"))
    val tot = cw.agg(sum("cw").as("t_tot"))
    val scored = toks.join(cw, Seq("w")).crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(col("w"))).as("chars_sum"),
        sum((col("cw") * RarePm <= col("t_tot")).cast("long"))
          .as("n_rare"),
        max("n_sents").as("n_sents"))
      .withColumn("awl_pm", expr("1000 * chars_sum div n_tokens"))
      .withColumn("asl_pm", expr("1000 * n_tokens div n_sents"))
      .withColumn("rare_pm", expr("1000 * n_rare div n_tokens"))
      .withColumn("difficulty_fp",
        expr("awl_pm + asl_pm div 10 + 2 * rare_pm"))
      .drop("chars_sum", "n_sents")
    // exact discrete tertile boundaries over the DISTINCT difficulty
    // values (value-bounded window — the q_approx_percentile posture)
    val freq = scored.groupBy("difficulty_fp").agg(count(lit(1)).as("cnt"))
    val wc = Window.orderBy("difficulty_fp")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = freq.withColumn("cum", sum("cnt").over(wc))
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("n"))))
    val bounds = cum.agg(
      min(when(col("cum") * Stages > (col("n") - 1),
        col("difficulty_fp"))).as("t1"),
      min(when(col("cum") * Stages > (col("n") - 1) * 2,
        col("difficulty_fp"))).as("t2"))
    scored.crossJoin(broadcast(bounds))
      .withColumn("stage",
        when(col("difficulty_fp") <= col("t1"), 0)
          .when(col("difficulty_fp") <= col("t2"), 1)
          .otherwise(2).cast("int"))
      .withColumn("sk", md5(col("doc_id").cast("string").cast("binary")))
      .select("doc_id", "n_tokens", "awl_pm", "asl_pm", "rare_pm",
        "difficulty_fp", "stage", "sk")
      .orderBy("stage", "sk", "doc_id")
  }
}
