package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): noisy catalog listings resolved
  * back to canonical part names via BLOCKING + edit-distance
  * verification — the Fellegi-Sunter-style two-phase shape every
  * at-scale linkage uses (never all-pairs: candidates come only from
  * shared block keys).
  *
  * The dirty side is CRAFTED deterministically from `p_partkey`
  * arithmetic (the q_pii_luhn posture, so the DuckDB oracle replays the
  * corruption, the blocking, the Levenshtein verification and the
  * argmin pick cell-for-cell): listing `p` mutates its name at 1-based
  * position q = (p mod len) + 1 by DELETING the char (p ≡ 0 mod 3),
  * DUPLICATING it (p ≡ 1) or not at all (p ≡ 2).
  */
object EntityOps {

  /** Verification bound: candidates past this edit distance are noise. */
  val EditMax = 2

  /** Block key width. Two keys — name prefix and suffix — because a
    * SINGLE key is provably incomplete under single-char edits: an edit
    * inside the prefix block leaves the suffix intact and vice versa.
    * For any edit position q, the prefix key survives when q > 3 and
    * the suffix key when q ≤ len−3 — with len ≥ 6 (every fixture name)
    * at least one always holds, so blocking recall on the crafted
    * corpus is exactly 1 (the spec asserts every listing resolves).
    */
  val BlockChars = 3

  /** Dirty-listing resolution over `part`.
    *
    * Scale shape: corruption is per-row constant work; candidate
    * generation is TWO key-equi joins on 3-char block keys (candidates
    * per listing bounded by block occupancy, never |dirty|×|canon|);
    * verification is per-candidate constant work (banded-verify — the
    * MinHash-LSH posture on strings); the best-match pick is one
    * listing-keyed row_number (WindowGroupLimit). The canon side is
    * joined by key, not broadcast-assumed — catalog-sized at 100 TB.
    */
  def entityResolution(s: SparkSession, d: String): DataFrame =
    resolveOver(graft.Tables.t(s, d, "part")
      .select(col("p_partkey"), col("p_name")))

  private[graft] def corrupt(parts: DataFrame): DataFrame =
    parts
      .withColumn("q", (col("p_partkey") % length(col("p_name")) + 1)
        .cast("int"))
      .withColumn("dirty_name", expr(
        """CASE p_partkey % 3
          | WHEN 0 THEN concat(substr(p_name, 1, q - 1), substr(p_name, q + 1))
          | WHEN 1 THEN concat(substr(p_name, 1, q), substr(p_name, q))
          | ELSE p_name END""".stripMargin.replace("\n", " ")))
      .select(col("p_partkey").as("listing_id"), col("dirty_name"))

  private def blocks(df: DataFrame, nameCol: String): DataFrame = {
    val pfx = df.withColumn("bk",
      expr(s"substr($nameCol, 1, $BlockChars)"))
    val sfx = df.withColumn("bk",
      expr(s"substr($nameCol, greatest(length($nameCol) - ${BlockChars - 1}, 1))"))
    pfx.unionByName(sfx)
  }

  private[graft] def resolveOver(parts: DataFrame): DataFrame = {
    val canon = parts.select(col("p_name")).distinct()
    val dirty = corrupt(parts)
    val cand = blocks(dirty, "dirty_name")
      .join(blocks(canon, "p_name"), "bk")
      .select("listing_id", "dirty_name", "p_name").distinct()
      .withColumn("dist", levenshtein(col("dirty_name"), col("p_name")))
      .where(col("dist") <= EditMax)
    cand
      .withColumn("rn", row_number().over(Window.partitionBy("listing_id")
        .orderBy(col("dist"), col("p_name"))))
      .where(col("rn") === 1)
      .select(col("listing_id"), col("dirty_name"),
        col("p_name").as("resolved_name"), col("dist"))
      .orderBy("listing_id")
  }
}
