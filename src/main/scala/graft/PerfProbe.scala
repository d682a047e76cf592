package graft
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names = Seq("q_dedup_exact_text", "q_dedup_minhash", "q_except_intersect",
      "q_knn_cosine_topk", "q_concat_partition_key", "q_join_equi",
      "q_doc_fingerprint", "q_ngram_jaccard", "q_embedding_near_dup",
      "q_ivf_cosine_topk", "q_simhash_near_dup", "q_doc_chunking")
    for (n <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      println(f"$n%-26s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
