package graft.relational

import graft.{SparkSpec, SparkEntry}

/** Partitioning-invariance: the oracle hash-compare only works if a query's
  * result is BIT-identical under any parallelism. Exact integer-cent
  * aggregation, portable rounding, and explicit tie-breaks are the
  * mechanisms; this spec is the regression net — run the FP-sensitive
  * queries under different shuffle widths and require identical rows.
  */
class DeterminismSpec extends SparkSpec {

  private val sensitive = Seq(
    "g2_agg_pricing_summary", // cent sums + derived averages
    "w4_running_sum",         // windowed cent sums
    "g9_stats_percentiles",   // interpolated percentiles, corr, stddev
    "l3_cosine_topk",         // FP dot products + rank tie-breaks
    "l2_minhash_lsh",         // hash mins across partitions
    "x2_centroid_udaf",       // custom aggregator partial/merge
    "t4_session_window",      // session assembly across partitions
    "j9_asof_join",           // window over unioned streams
    "l18_ivf_ann",            // FP sims drive argmax cell assignment
    "l19_sequence_packing",   // batch index from cumulative-sum window
    "l20_word_entropy",       // integer-µunit inner sum must not reorder
    "g12_regression",         // second-moment merges
    "w9_running_distinct",    // first-occurrence flags across partitions
    "l51_bm25",               // micro-quantized per-term scores + top-k ties
    "l52_semdedup",           // FP cosine gate decides the removed set
    "g18_ab_test",            // z built from doubles off exact integers
    "g19_ddsketch_quantiles", // ln-binning + exp estimate rendering
    "o8_weighted_sample")     // FP ln(u)/w ranking decides the sample

  for (name <- sensitive)
    test(s"$name is identical under 3-way and 13-way shuffle") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val narrow = SparkEntry.queries(name)(spark, sf("sf0.001"))
          .collect().toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val wide = SparkEntry.queries(name)(spark, sf("sf0.001"))
          .collect().toSeq
        assert(narrow == wide,
          s"first diff: ${narrow.zip(wide).find(p => p._1 != p._2)}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
}
