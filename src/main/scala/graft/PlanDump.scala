package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "plan-dump")
    val dir = "/root/testdata/sf0.001"
    Seq("q1_agg", "q2_filter_project", "q4_star_join", "q28_asof_join",
        "d2_dedup_ngram_jaccard", "s1_ann_bruteforce",
        "t6_decontaminate", "t8_mixture_sample",
        "p1_training_corpus", "d3_dedup_minhash_lsh", "d4_dedup_simhash",
        "d8_dedup_embedding_lsh", "d9_dedup_incremental",
        "d11_span_dedup", "s5_ann_pq",
        "d13_incremental_neardup", "d14_dedup_simhash_wide",
        "q43_exact_quantiles", "s9_knn_graph",
        "t21_quality_classifier", "p2_training_corpus_v2",
        "s10_knn_incremental", "s11_knn_descent",
        "d15_semantic_keep", "d15l_semantic_keep_ledger",
        "p3_training_corpus_v3", "c1_cluster_mixture",
        "t23_epoch_mixture", "c2_cluster_token_budget",
        "t24_quality_budget_fill", "s11l_knn_descent_ledger",
        "s12_ann_filtered", "t25_embedding_decontam",
        "c1l_cluster_mixture_ledger", "c2l_cluster_token_budget_ledger",
        "t26_shard_shuffle", "p4_training_corpus_v4",
        "d16_bloom_dedup", "t27_dsir_select",
        "t28_weighted_sample", "s13_ann_tombstoned",
        "c3_leakage_split", "t29_rank_fusion",
        "p5_training_corpus_v5", "s14_knn_tombstoned",
        "d17_reclaimed_reingest", "p6_takedown_refresh")
      .filter(n => args.isEmpty || args.contains(n))
      .foreach { n =>
        println(s"===== $n =====")
        println(SparkEntry.queries(n)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
          .linesIterator.take(40).mkString("\n"))
      }
    spark.stop()
  }
}
