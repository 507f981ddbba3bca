package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of the key queries for plan
  * review (pushdown, pruning, broadcast, codegen spans) → PLANS.md. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append("Reviewed for: parquet pushdown/pruning (PushedFilters, ReadSchema),\n")
    sb.append("broadcast vs shuffle joins, WholeStageCodegen spans, shuffle count.\n\n")
    Seq("extract_text", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
      "dedup_embed_cosine", "sim_topk_brute", "sim_topk_native",
      "sim_topk_ivf", "merge_ordered", "pages_subset", "join_broadcast",
      "docstats_tokens", "host_stats_salted", "text_repetition",
      "dedup_passages", "dedup_passages_clean", "vocab_topk",
      "docstats_signals", "join_anti", "agg_rollup",
      "agg_quantiles", "shard_pack", "corpus_filter", "sketch_kmv",
      "sketch_quantiles", "sim_topk_ivf_kmeans", "dedup_substrings",
      "extract_modes", "corpus_decontaminate", "sample_quota",
      "text_redact", "dedup_substrings_rolling", "dedup_substrings_clean",
      "trigram_quality", "sample_weighted", "media_resize", "media_frames",
      "text_langid_profile", "url_dedup", "dedup_substrings_keep_first",
      "dedup_substrings_keep_first_clean", "sketch_countmin",
      "media_optimize", "corpus_decontaminate_bloom",
      "index_postings", "search_tfidf", "assign_ids",
      "sim_allpairs_tokens", "pipeline_recipe",
      // bpe_train is deliberately absent: its result DataFrame is the
      // driver-assembled merge table (LocalTableScan) — the distributed
      // plans are the per-step pair-count jobs, not the returned frame
      "dedup_winnow", "lm_bigram", "graph_pagerank", "text_topic",
      "url_blocklist", "source_overlap", "vocab_growth",
      "quality_tiers", "tier_sample", "dedup_incremental",
      "dedup_keep_best", "sitemap_parse", "robots_crawl_delay",
      "crawl_schedule", "domain_stats", "signal_outliers",
      "discovery_chain", "dedup_containment",
      // fourth-wind additions
      "snapshot_diff", "cdx_revisit", "sample_host_cap", "url_trap_signal",
      "badwords_filter", "bitext_candidates",
      "corpus_decontaminate_substring", "feed_parse",
      "extract_metas", "feed_discovery", "extract_title",
      "text_script_mix", "host_boilerplate", "docstats_fused",
      "frontier_admitted",
      // fifth-wind additions
      "lm_score_heldout", "sketch_hll", "quality_classifier",
      "extract_headings", "extract_tables", "host_components",
      "table_records",
      // sixth-wind additions
      "extract_pubdate", "extract_fertility", "dedup_passages_indoc",
      "dedup_minhash_incremental", "lang_script_consistency",
      "anchor_expand", "cdx_retention", "domain_freshness", "host_rank")
      .foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sf)
      sb.append(s"## $q\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("```\n\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println("[plans] wrote PLANS.md")
    spark.stop()
  }
}
