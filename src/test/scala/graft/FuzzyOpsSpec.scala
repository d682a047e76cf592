package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyOps

/** Deletion-neighborhood blocking: losslessness vs brute force, the three
  * edit channels, the distance-2 false-candidate filter, canonicalization.
  */
class FuzzyOpsSpec extends SparkSpec {

  import spark.implicits._

  private def pairsOf(words: Seq[(String, Long)]): Seq[(String, String)] = {
    val vocab = words.toDF("name", "freq")
    FuzzyOps.edit1Pairs(vocab).select("word_a", "word_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked join equals brute force on a random vocabulary") {
    // deterministic pseudo-random words over a 3-letter alphabet: dense
    // enough that every edit channel occurs many times
    val rnd = new scala.util.Random(42)
    val words = Iterator.continually {
      val n = 4 + rnd.nextInt(3)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }.take(400).toSeq.distinct
    val brute = (for {
      a <- words; b <- words if a < b && lev(a, b) == 1
    } yield (a, b)).sorted
    assert(brute.size > 50, "fixture must be non-vacuous")
    assert(pairsOf(words.map(w => (w, 1L))) === brute)
  }

  test("all three edit channels are found; distance-2 residue-sharers are not") {
    val vocab = Seq("spark" -> 3L, "sparks" -> 1L, // insertion
      "shark" -> 2L, // substitution vs spark
      "spak" -> 1L, // deletion vs spark
      "aaab" -> 1L, "aabc" -> 1L) // share residue "aab" but distance 2
    val got = pairsOf(vocab)
    assert(got.contains(("spark", "sparks")))
    assert(got.contains(("shark", "spark")))
    assert(got.contains(("spak", "spark")))
    assert(!got.contains(("aaab", "aabc")))
  }

  test("canon picks the higher-frequency form, ties to word_a") {
    val vocab = Seq(("word", 5L), ("wordd", 1L), ("word1", 5L)).toDF("name", "freq")
    val canon = FuzzyOps.edit1Pairs(vocab)
      .select("word_a", "word_b", "canon")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(canon(("word", "wordd")) === "word") // higher freq wins
    assert(canon(("word", "word1")) === "word") // tie -> word_a
  }

  test("vocab normalization: transitive clusters canonicalize to the best member") {
    // chain: word -1- wordx -1- wordxy (wordxy is 2 from word, linked
    // only transitively); canon = max freq then lexicographic
    import graft.ops.FuzzyOps
    val vocab = Seq(("word", 5L), ("wordx", 1L), ("wordxy", 1L),
      ("other", 9L)).toDF("name", "freq")
    val pairs = FuzzyOps.edit1Pairs(vocab)
      .select("word_a", "word_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("word", "wordx"), ("wordx", "wordxy")))
    // full composition over the crafted corpus feed: every typo'd name
    // maps to a clean canon, and no canon is itself a changed form
    val out = FuzzyOps.vocabNormalize(spark, sf)
    val changed = out.where(col("changed") === 1)
    assert(changed.count() > 0, "some typo'd docs must normalize")
    val canons = out.select(col("canon").as("name")).distinct()
    val changedNames = out.where(col("changed") === 1)
      .select("name").distinct()
    assert(canons.join(changedNames, Seq("name"), "left_semi").count() === 0,
      "a canonical form must never itself be a normalized-away name")
  }

  test("typo feed links every typo'd doc to a clean form") {
    val docs = Tables.t(spark, sf, "documents")
    val feed = FuzzyOps.nameFeed(docs)
    val vocab = FuzzyOps.vocabOf(feed)
    val pairs = FuzzyOps.edit1Pairs(vocab)
    // non-vacuous: typo'd names exist and the join links them
    val typod = feed.where(col("doc_id") % 3 === 1).select("name").distinct()
    val linked = pairs.select(col("word_a").as("name"))
      .union(pairs.select(col("word_b").as("name"))).distinct()
    val n = typod.join(linked, Seq("name"), "left_semi").count()
    assert(n > 0, "at least some typo'd forms must link to the vocabulary")
  }
}
