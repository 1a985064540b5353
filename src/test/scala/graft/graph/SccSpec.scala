package graft.graph

import graft.SparkSpec

/** Unit-level pins for the convergence-checked
  * [[GraphOps.stronglyConnected]] (round-16 directive 1: the previous
  * GraphX delegation at a fixed 10 iterations silently truncated on
  * condensations deeper than the budget — the oracle twin `graphp_scc`
  * covers the parquet fixture, whose condensation is shallow; these pin
  * exactly the deep-chain regime the fixture cannot reach).
  */
class SccSpec extends SparkSpec {

  /** Chain of `cycles` directed 2-cycles: cycle k = {2k ↔ 2k+1}, linked
    * k → k+1 by an edge 2k+1 → 2k+2. The condensation is a k-deep PATH of
    * nontrivial SCCs, so every peel finalizes exactly one cycle (trim
    * never fires — every vertex keeps in- and out-degree ≥ 1 until its
    * cycle is peeled): k cycles REQUIRE k peels, which is precisely the
    * shape a fixed iteration budget truncates.
    */
  private def cycleChain(cycles: Int): GraphTables = {
    import spark.implicits._
    val es = (0 until cycles).flatMap { k =>
      val b = 2L * k
      Seq((b, b + 1), (b + 1, b)) ++
        (if (k < cycles - 1) Seq((b + 1, b + 2)) else Nil)
    }
    GraphTables(
      (0L until 2L * cycles)
        .map(i => NodeRow(i, "N", s"n$i", "", "", "b", Seq.empty)).toDS(),
      es.map { case (s, d) => EdgeRow(s, d, "HAS_X", "", "b") }.toDS())
  }

  private def compMap(g: GraphTables): Map[Long, Long] =
    GraphOps.stronglyConnected(spark, g).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a 12-deep chain of 2-cycles resolves EXACTLY — the regime the " +
      "old fixed-10-iteration kernel silently truncated") {
    // under the retired `GraphX.run(g, 10)` delegation, cycles 11 and 12
    // ran out of budget and came back as SINGLETONS (each vertex its own
    // component) with no error; the convergence-checked loop must peel
    // all 12 and merge every 2-cycle onto its min id
    val cycles = 12
    val (df, peels) = GraphOps.sccStats(spark, cycleChain(cycles))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0 until cycles).flatMap { k =>
      val b = 2L * k; Seq(b -> b, (b + 1) -> b)
    }.toMap
    assert(peels == cycles,
      s"condensation depth $cycles must take exactly $cycles peels, " +
        s"got $peels")
    assert(got == expected)
  }

  test("maxPeels exhaustion THROWS rather than silently truncating") {
    val ex = intercept[IllegalStateException] {
      GraphOps.stronglyConnected(spark, cycleChain(4), maxPeels = 2)
        .count()
    }
    assert(ex.getMessage.contains("maxPeels"))
  }

  test("trim dissolves a pure DAG without any color/mark peel work") {
    import spark.implicits._
    // a diamond DAG: every vertex is its own SCC, all resolved by the
    // trim fixpoint inside peel 1 (no-in roots and no-out sinks cascade)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    val g = GraphTables(
      (1L to 4L).map(i => NodeRow(i, "N", s"n$i", "", "", "b", Seq.empty))
        .toDS(),
      es.map { case (s, d) => EdgeRow(s, d, "HAS_X", "", "b") }.toDS())
    val (df, peels) = GraphOps.sccStats(spark, g)
    assert(peels == 1)
    assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("mixed graph: cycle + tail + isolated vertex") {
    import spark.implicits._
    // 3-cycle {1,2,3}, a tail 3→4→5, and isolated 9: the tail and the
    // isolate are trim-resolved singletons, the cycle one color peel
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val g = GraphTables(
      (Seq(1L, 2L, 3L, 4L, 5L, 9L))
        .map(i => NodeRow(i, "N", s"n$i", "", "", "b", Seq.empty)).toDS(),
      es.map { case (s, d) => EdgeRow(s, d, "HAS_X", "", "b") }.toDS())
    assert(compMap(g) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 9L -> 9L))
  }

  test("peel intermediates do not leak pinned storage blocks") {
    // O(1) superseded-graph discipline (the kCore checkpoint rule): a
    // 6-peel run must not accumulate one pinned graph per peel. The
    // gxCache base graph and the per-peel harvested localCheckpoints
    // (which BACK the returned DataFrame) legitimately stay; superseded
    // residual work graphs must not.
    val g = cycleChain(6)
    GraphOps.stronglyConnected(spark, g).count() // builds the gxCache entry
    val before = spark.sparkContext.getPersistentRDDs.keySet
    GraphOps.stronglyConnected(spark, g).count()
    val pinned =
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size
    // 6 peels harvest ≤ 2 RDDs each (trim + mark) that back the result;
    // anything far above that means residual graphs are leaking
    assert(pinned <= 24,
      s"$pinned RDDs left pinned by one SCC run — superseded peel " +
        "graphs are not being unpersisted")
  }
}
