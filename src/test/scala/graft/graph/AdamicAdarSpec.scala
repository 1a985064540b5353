package graft.graph

import graft.SparkSpec

/** Unit-level check of [[GraphOps.adamicAdar]] on a hand-computed graph
  * (the oracle twin `graphp_link_predict` covers the nation fixture; this
  * pins the kernel's semantics — undirected view, per-z terms, hub cap —
  * on a graph small enough to verify by hand).
  *
  * Graph (directed input, undirected semantics): 1→2, 1→3, 2→3, 3→4.
  * Undirected degrees: deg(1)=2, deg(2)=2, deg(3)=3, deg(4)=1.
  * Common-neighbor pairs: (2,3) via z=1; (1,3) via z=2;
  * (1,2),(1,4),(2,4) via z=3; z=4 has a single neighbor → contributes none.
  */
class AdamicAdarSpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  private val g = mkGraph(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L))

  // micro-unit-quantized 1/ln(deg) — the exact arithmetic the kernel uses
  private def term(deg: Int): Double =
    math.floor(1000000.0 / math.log(deg.toDouble) + 0.5) / 1000000.0

  test("scores are the per-common-neighbor 1/ln(deg) sums") {
    val rows = GraphOps.adamicAdar(spark, g)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L)))
    assert(rows((1L, 3L)) == ((1L, term(2))))  // via z=2, deg 2
    assert(rows((2L, 3L)) == ((1L, term(2))))  // via z=1, deg 2
    assert(rows((1L, 2L)) == ((1L, term(3))))  // via z=3, deg 3
    assert(rows((1L, 4L)) == ((1L, term(3))))
    assert(rows((2L, 4L)) == ((1L, term(3))))
  }

  test("a pair sharing several common neighbors sums their terms") {
    // square 1-2-3-4-1: (1,3) shares z=2 and z=4, both degree 2
    val sq = mkGraph(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L))
    val rows = GraphOps.adamicAdar(spark, sq)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(rows((1L, 3L)) == ((2L, 2 * term(2))))
    assert(rows((2L, 4L)) == ((2L, 2 * term(2))))
  }

  test("maxDegree drops hub-generated candidates, keeps the rest") {
    val rows = GraphOps.adamicAdar(spark, g, maxDegree = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // z=3 (deg 3) is capped away; only the deg-2 hubs contribute
    assert(rows == Set((1L, 3L), (2L, 3L)))
  }

  test("duplicate and reverse edges do not double-count") {
    val dup = mkGraph(Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 1L -> 3L))
    val rows = GraphOps.adamicAdar(spark, dup)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3))))
      .toMap
    // undirected dedup: only z=1 (deg 2) links (2,3)
    assert(rows == Map((2L, 3L) -> ((1L, term(2)))))
  }
}
