package graft.graph

import graft.SparkSpec

/** Unit-level checks of [[GraphOps.nodeSimilarity]] and
  * [[GraphOps.personalizedPageRank]] on hand-computed graphs (the oracle
  * twins `graphp_node_similarity`/`graphp_ppr` cover the nation fixtures;
  * this pins kernel semantics small enough to verify by hand).
  */
class NodeSimilaritySpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  // Directed input, undirected semantics: 1→2, 1→3, 2→3, 3→4.
  // N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}.
  private val g = mkGraph(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L))

  test("Jaccard = common / (deg_a + deg_b - common) over candidate pairs") {
    val rows = GraphOps.nodeSimilarity(spark, g)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3))))
      .toMap
    // pairs sharing ≥1 neighbor: (1,2) via 3; (1,3) via 2; (2,3) via 1;
    // (1,4),(2,4) via 3; (3,4) share none (4's only neighbor IS 3)
    assert(rows.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L)))
    assert(rows((1L, 2L)) == ((1L, 1.0 / 3.0))) // {3} / {1,2,3}
    assert(rows((1L, 3L)) == ((1L, 0.25)))      // {2} / {1,2,3,4}
    assert(rows((1L, 4L)) == ((1L, 0.5)))       // {3} / {2,3}
    assert(rows((2L, 4L)) == ((1L, 0.5)))       // {3} / {1,3}
  }

  test("the hub cap drops wide common-neighbor buckets, not endpoints") {
    // with maxDegree=2 the z=3 bucket (deg 3) is excluded: pairs that
    // ONLY met inside it disappear; (1,3)/(2,3) survive via z=2 / z=1
    val rows = GraphOps.nodeSimilarity(spark, g, maxDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 3L), (2L, 3L)))
  }

  test("personalized PageRank: unreachable vertices hold a hard 0.0, " +
    "reachable mass decays with hop distance") {
    // two directed 3-cycles; source in the first — the second is
    // teleport-unreachable
    val g2 = mkGraph(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L,
      10L -> 11L, 11L -> 12L, 12L -> 10L))
    val ranks = GraphOps.personalizedPageRank(spark, g2, src = 1L,
        iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ranks(10L) == 0.0 && ranks(11L) == 0.0 && ranks(12L) == 0.0)
    assert(ranks(1L) > ranks(2L) && ranks(2L) > ranks(3L))
    assert(ranks(3L) > 0.0)
  }
}
