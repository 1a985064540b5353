package graft.graph

import graft.SparkSpec

/** Unit-level check of [[GraphOps.betweenness]] (the oracle twin
  * `graphp_betweenness` covers the unique-path cycle fixture; this pins
  * the σ path-COUNTING and dependency-splitting semantics by hand on a
  * graph with branching shortest paths).
  */
class BetweennessSpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  // diamond with a tail: two equal-length paths 1→2→4 and 1→3→4, then 4→5
  private val diamond =
    mkGraph(Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L))

  private def bc(g: GraphTables, sources: Seq[Long]): Map[String, Double] =
    GraphOps.betweenness(spark, g, sources).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap

  test("dependency splits across equal shortest paths (σ = 2 through " +
      "the diamond)") {
    val c = bc(diamond, Seq(1L))
    // from 1: σ(4) = 2, so each of 2 and 3 carries half of 4's subtree
    // plus its own membership: δ = 1/2 · (1 + δ(4)) with δ(4) = 1 → 1.0
    assert(c("n2") == 1.0 && c("n3") == 1.0)
    // 4 lies on the unique continuation to 5
    assert(c("n4") == 1.0)
    // the source's own dependency is excluded; the sink carries none
    assert(c("n1") == 0.0 && c("n5") == 0.0)
  }

  test("multiple landmarks accumulate additively") {
    val c = bc(diamond, Seq(1L, 2L))
    // source 2 adds one unit through 4 (path 2→4→5); its own row excluded
    assert(c("n4") == 2.0)
    assert(c("n2") == 1.0 && c("n3") == 1.0 && c("n5") == 0.0)
  }

  test("empty landmark set yields all-zero centrality, not an error") {
    val c = bc(diamond, Seq.empty)
    assert(c.values.forall(_ == 0.0) && c.size == 5)
  }

  test("non-drained forward BFS throws instead of silently truncating") {
    // diamond+tail needs 3 levels from node 1; cap at 2 → frontier still
    // non-empty → must fail fast (same contract as kCore/kTruss), because
    // a truncated layering yields wrong σ/δ indistinguishable from right
    val e = intercept[IllegalStateException] {
      GraphOps.betweenness(spark, diamond, Seq(1L), maxIterations = 2)
        .collect()
    }
    assert(e.getMessage.contains("maxIterations"))
  }
}
