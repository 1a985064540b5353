package graft.relational

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions.col

/** Plan-shape assertions (SURVEY.md §5.2.6): the optimizer must actually
  * pick the scale-critical physical operators — broadcast for dim joins,
  * partial+final aggregation, top-k fusion, parquet filter pushdown.
  * Correctness of the same queries is covered by the DuckDB oracle.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString

  test("dimension joins broadcast (J2)") {
    val p = plan("j2_join_broadcast_dims")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("fact-fact join is a shuffle join, not broadcast of the fact (J3)") {
    val p = plan("j3_join_fact_fact")
    assert(p.contains("Join"), p.take(500))
  }

  test("aggregation is partial+final (G5)") {
    val p = plan("g2_agg_pricing_summary")
    assert(p.contains("partial_"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("top-k fuses to TakeOrderedAndProject (O3)") {
    val p = plan("o3_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("filters and projection push into the parquet scan (S1)") {
    val p = plan("s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(1200))
    assert(p.contains("ReadSchema"), p.take(1200))
    // only the 4 referenced columns are read
    assert(!p.contains("l_comment") && !p.contains("l_tax"))
  }

  test("range join broadcasts the bucket side (J8)") {
    val p = plan("j8_join_range")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(500))
  }

  test("whole-stage codegen covers the hot aggregation path") {
    // AQE prints the final (codegen'd) plan only after execution
    val df = SparkEntry.queries("g2_agg_pricing_summary")(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // AQE's final plan renders whole-stage-codegen spans as "*(n)" markers
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(800))
  }

  test("sortWithinPartitions avoids a global exchange (O4)") {
    val df = graft.Tables.lineitem(spark, sf("sf0.001"))
      .repartition(col("l_suppkey"))
      .sortWithinPartitions("l_suppkey", "l_shipdate")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Sort") && !p.contains("rangepartitioning"), p.take(600))
  }

  test("l2c caps posting lists with a broadcast anti-join before the self-join") {
    val p = plan("l2c_ngram_jaccard")
    // the hot-shingle exclusion list must be broadcast and anti-joined
    // BEFORE the inverted-index self-join (the quadratic-blowup guard)
    assert(p.contains("LeftAnti"), "no anti-join in plan: " + p.take(800))
    assert(p.contains("Broadcast"), p.take(800))
  }

  test("l12 caps hot shingles with a broadcast anti-join before the semi-join") {
    val p = plan("l12_contamination_check")
    assert(p.contains("LeftAnti"), "no anti-join in plan: " + p.take(800))
    assert(p.contains("Broadcast"), p.take(800))
    assert(p.contains("LeftSemi"), p.take(800))
  }

  test("l18 IVF broadcasts the centroid table into both cross joins") {
    val p = plan("l18_ivf_ann")
    // K centroids are broadcast — assignment and probe never shuffle the
    // vector corpus; a SortMergeJoin against the centroids would mean the
    // coarse quantizer lost its O(K) broadcast shape
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("l21 bloom prefilter runs before the exact semi-join") {
    val p = plan("l21_bloom_decontam")
    // the udf bloom-membership filter must sit on the train-side scan,
    // upstream of the shuffle; the exact semi-join then seals correctness
    assert(p.contains("LeftSemi"), p.take(800))
    assert(p.contains("UDF"), "bloom prefilter missing: " + p.take(800))
  }

  test("w5b global rank runs without a single-partition window (W5 scale path)") {
    val p = plan("w5b_global_rank_scalable")
    assert(!p.contains("Window"), p.take(800))
    // the rank substrate is a range-partitioned (parallel) sort
    assert(p.contains("rangepartitioning"), p.take(800))
  }

  test("tpch_q6's predicates and projection push into the parquet scan") {
    val p = plan("tpch_q6")
    assert(p.contains("PushedFilters:"), p.take(1200))
    assert(p.contains("IsNotNull(l_shipdate)"), p.take(1200))
    // only the 4 referenced columns are read, not the full lineitem row
    assert(!p.contains("l_orderkey") && !p.contains("l_returnflag"),
      p.take(1200))
  }

  test("tpch_q3's LIMIT fuses to TakeOrderedAndProject (no global sort)") {
    val p = plan("tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("tpch_q5's fixed dims broadcast; facts never do") {
    val df = SparkEntry.queries("tpch_q5")(spark, sf("sf0.001"))
    df.collect() // AQE finalizes join strategies only after execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("tpch_q21's EXISTS/NOT-EXISTS compile to semi and anti joins") {
    val p = plan("tpch_q21")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.contains("LeftAnti"), p.take(1500))
  }

  test("tpch_q19's per-side conjuncts of the disjunction prune the scans") {
    val p = plan("tpch_q19")
    // the OR straddles the join, but brand/size (part side) and quantity
    // (lineitem side) each admit a derivable single-side filter — at
    // minimum the IsNotNull guards and the extracted per-side OR must
    // reach the scans as pushed filters
    // (plan toString truncates long filter lists — match the stable
    // prefixes of each side's pushed OR)
    // part side: the brand/size OR reaches the part scan
    assert(p.contains("Or(Or(And(EqualTo(p_brand"), p.take(4000))
    // lineitem side: the quantity-band OR reaches the fact scan
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      p.take(4000))
  }

  test("a selective build side injects a runtime bloom filter into the " +
      "probe-side fact scan (100 TB posture)") {
    // At cluster scale a fact⋈fact shuffle join with a selective filter on
    // one side should NOT stream the full probe side through the exchange:
    // Spark's InjectRuntimeFilter plants a bloom_filter_agg of the
    // filtered build keys as a might_contain predicate on the probe scan.
    // Verify the engine posture enables this — thresholds are lowered to
    // make the tiny test corpus eligible; at real scale the defaults
    // qualify the same plan.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold", "1KB")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      val o = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").count()
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"), p.take(2000))
      assert(p.contains("bloom_filter_agg"), p.take(2000))
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("l51 BM25: df broadcast, top-k fused, no cartesian scoring") {
    val p = plan("l51_bm25")
    // the inverted-index shape: candidate docs join the ≤|query|-row df
    // table by broadcast, corpus constants ride a broadcast nested-loop
    // scalar, and the final top-10 is TakeOrderedAndProject — the corpus
    // is never globally sorted and never cross-joined against itself
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("l52 SemDeDup: pair join keys on cluster id, never all-pairs") {
    val p = plan("l52_semdedup")
    // the scale argument IS this plan shape: the only quadratic term is
    // within a cluster, so the pair join must be an equi-join on the
    // cluster key (shuffled or broadcast), not a cartesian product
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("SortMergeJoin [cluster") ||
      p.contains("ShuffledHashJoin [cluster") ||
      p.contains("BroadcastHashJoin [cluster"), p.take(1200))
  }

  test("g19 sketch histogram aggregates partial+final; window runs on " +
    "bins only") {
    val p = plan("g19_ddsketch_quantiles")
    // the sketch property in plan form: rows collapse to (group, bin)
    // counts with a map-side partial BEFORE any exchange; everything
    // downstream (cumsum window, rank join) touches only the ≤~250-bin
    // histogram
    assert(p.contains("partial_count"), p.take(1500))
    assert(p.contains("Window"), p.take(1500))
  }

  test("o8 weighted sample fuses to TakeOrderedAndProject") {
    val p = plan("o8_weighted_sample")
    // the A-Res top-k must never globally sort the table
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("Cypher dual-MATCH with a cross-variable equality collapses to " +
      "one distributed equi-join — no nested loop, no cartesian") {
    // the composition is written as crossJoin + filter (CypherLite
    // runDualMatch); Catalyst must rewrite the `=` into the join
    // condition, or the plan is O(n²) at scale — this pins the rewrite
    val p = plan("graphp_cypher_dual_match_eq")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(600))
    // the genuinely non-equi `<` twin keeps its nested-loop shape — the
    // rewrite must not have been "everything broadcasts" by accident
    val lt = plan("graphp_cypher_dual_match")
    assert(lt.contains("BroadcastNestedLoopJoin") ||
      lt.contains("CartesianProduct"), lt.take(600))
  }

  test("chained WITH compiles to stacked hash aggregates — no nested " +
      "loop, no cartesian, partial+final at each stage") {
    // two pipeline stages = two distributed aggregations; anything
    // cartesian-shaped would mean a stage re-joined its own input
    val p = plan("graphp_cypher_with_chain")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
    assert(p.contains("partial_"), p.take(800))
  }

  test("skip-gram self-join is a distributed equi-join on the walk " +
      "identity — never a cartesian") {
    val p = plan("graphp_walk_skipgrams")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the pair join must key on (root_id, walk) — the window filter is a
    // residual, not the join condition. (The walks builder's own
    // |roots|×walksPerRoot fan-out legitimately broadcasts a range.)
    assert(Seq("SortMergeJoin [root_id", "ShuffledHashJoin [root_id",
      "BroadcastHashJoin [root_id").exists(p.contains), p.take(1500))
  }

  test("negative sampling carries the corpus size as a broadcast 1-row " +
      "aggregate and draws through an equi-join on the position") {
    val p = plan("graphp_walk_negatives")
    // the only nested-loop allowed is the 1-row total crossJoin
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("path-quantified expansion: per-step equi-joins, never a " +
      "cartesian product; the quantifier and uniqueness probes stay " +
      "codegen expressions (no UDF)") {
    for (q <- Seq("graphp_cypher_path_all", "graphp_cypher_path_any")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(800)}")
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
        s"$q: ${p.take(800)}")
    }
  }

  test("l57 URL canonicalization stays pure codegen expressions — no " +
      "UDF, no join, one partial+final aggregate") {
    val p = plan("l57_url_dedup")
    // the canonicalizer is built from string expressions only; a UDF
    // eval node here would break whole-stage codegen on a 100 TB-sized
    // map stage
    assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"),
      p.take(800))
    // the FULL-PSL lookup (r14) is a reference-object hash probe inside
    // the projection — if it ever degrades to a per-probe lookup JOIN,
    // this catches it
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      p.take(800))
  }

  test("every registered query has distinct name and runnable plan") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
    // analysis-only check: resolve plans without executing
    SparkEntry.allDefs.filterNot(_.name.startsWith("graph_")).foreach { q =>
      q.run(spark, sf("sf0.001")).queryExecution.analyzed
    }
  }
}
