#!/bin/bash
# Regenerate PLANS.md: formatted AQE-final physical plans for the headline
# queries. Run after `sbt compile`.
set -e
cd "$(dirname "$0")/.."
cat > /tmp/DumpPlans.scala << 'EOF'
// single line: the REPL evaluates statement-per-line
val s2 = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.sql.session.timeZone","UTC").config("spark.sql.legacy.parquet.nanosAsLong","true").config("spark.ui.enabled","false").getOrCreate()
s2.sparkContext.setLogLevel("ERROR")
val names = Seq("g2_agg_pricing_summary", "j2_join_broadcast_dims",
  "j3_join_fact_fact", "o3_topk", "l2_minhash_lsh", "l2c_ngram_jaccard",
  "l3_cosine_topk", "j9_asof_join", "t4_session_window",
  "w5b_global_rank_scalable", "graphp_degrees", "o5b_hash_sample",
  "l12_contamination_check", "l2b2_simhash_neardup", "l16_token_budget_mix",
  "l17_embedding_quantize", "t5_dedup_batch", "l18_ivf_ann",
  "l21_bloom_decontam", "g12_regression", "g13_sampled_quantiles",
  "t4b_sessionize", "l20_word_entropy", "w9_running_distinct",
  "l22_incremental_dedup", "l19_sequence_packing", "l2_prod_knobs",
  "l2b2_prod_knobs", "l2c_prod_knobs", "graphp_cypher_conn_label",
  "l30_dup_spans", "l31_ann_recall", "l33_zipf_slope",
  "l34_verified_neardup", "graphp_link_predict", "graphp_kcore",
  "mm7_phash_neardup", "l35_curriculum_interleave", "j14_lateral_topk",
  "l37_corpus_pipeline", "l38_lm_perplexity", "l39_domain_cap",
  "l40_slice_drift", "l41_semdedup", "graphp_cypher_with_having",
  "graphp_cypher_count_star", "graphp_cypher_chain",
  "graphp_cypher_multi_rel", "graphp_cypher_alias", "graphp_cypher_shortest_path",
  "l42_temperature_mix", "l43_bpe_pair_merge", "graphp_cypher_chain3",
  "graphp_cypher_multi_agg", "graphp_cypher_dual_match",
  "graphp_cypher_global_hop", "graphp_cypher_size",
  "tpch_q5", "tpch_q13", "tpch_q18", "l47_best_of_cluster",
  "graphp_node_similarity", "graphp_harmonic", "graphp_ppr",
  "graphp_cypher_match_merge", "graphp_cypher_exists_and")
val sb = new StringBuilder
sb.append("# PLANS -- formatted physical plans of headline queries (sf0.1, local[8])\n\n")
sb.append("Generated from `df.queryExecution.explainString(FormattedMode)` after execution\n(AQE final plans). Regenerate with `tools/dump_plans.sh`.\n")
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(s2, "/root/testdata/sf0.1")
  df.collect()
  val txt = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  sb.append(s"\n## $n\n\n```\n")
  sb.append(txt.linesIterator.take(60).map(_.take(200)).mkString("\n"))
  sb.append("\n```\n")
}
sb.append("\n## Hub-skew task balance (HubSkewSpec, round 7)\n\n2.2M-edge graph, one hub src holding 18% of edges, kHop(k=2)+reachable at\n32 shuffle partitions: skew-split OFF -> hub join stage max/median task\nshuffle-read 4.72 (max 2,566,831 B vs median 543,329 B over 32 tasks);\nskew-split ON -> the hub partition is split into 4 extra tasks (36 total)\nand every heavy stage lands at max/median <= 1.04 (e.g. max 561,664 B vs\nmedian 542,138 B). Asserted both directions in HubSkewSpec on every run.\n")
sb.append("\n## Scaling curve 1x -> 10x (ScaleCurveSpec, round 8)\n\nsf0.01 documents replicated 10x with token-salted copies (intra-copy\nnear-dup structure preserved exactly; cross-copy shingle sets disjoint, so\nthe true output grows linearly -- asserted: minhash pairs at 10x are\nexactly 10x the 1x pairs with zero cross-copy leaks). Wall-time observed\non local[4] (bound 15x over max(t1, 0.4s); a quadratic term would read\n~100x):\n\n| query | 1x | 10x | ratio |\n|---|---|---|---|\n| l2_minhash_lsh | 0.93s | 1.02s | 1.1 |\n| l2c_ngram_jaccard | 1.01s | 1.99s | 2.0 |\n| l30_dup_spans | 0.58s | 0.90s | 1.6 |\n| l34_verified_neardup | 0.81s | 1.52s | 1.9 |\n| l38_lm_perplexity | 0.47s | 0.95s | 2.0 |\n| l40_slice_drift | 0.39s | 0.49s | 1.2 |\n| l43_bpe_pair_merge | 0.22s | 0.26s | 0.7 |\n| kCore on 10x hub graph (220k -> 2.2M edges) | 1.09s | 7.75s | 7.1 |\n\nFixed session overhead dominates the 1x readings, which is why several\nratios sit below the 10x data growth; nothing approaches the bound.\nEmbeddings tables are deliberately NOT replicated for this spec: scaling a\nvector corpus by cloning makes every clone an exact near-dup of its\nsource (cosine 1.0), which inflates the TRUE output quadratically -- the\ncurve would then measure output size, not plan shape. The ANN family's\nscale evidence is AnnScaleSpec (20k clustered embeddings, recall 1.0).\n")
java.nio.file.Files.writeString(
  java.nio.file.Paths.get("PLANS.md"), sb.toString)
println("WROTE_PLANS")
System.exit(0)
EOF
/opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
  --driver-class-path target/scala-2.13/classes -I /tmp/DumpPlans.scala \
  2>/dev/null | grep -a WROTE_PLANS
