package graft.graph

import graft.SparkSpec

/** Relationship isomorphism ACROSS ranged chain segments (round-14
  * directive 1). On a cyclic graph a mixed chain like
  * `(a)-[:R]->(x)-[:R*1..k]->(y)` can walk back over the single-hop
  * segment's stored edge inside the ranged expansion — Cypher forbids
  * one relationship binding two pattern segments, so such witness paths
  * must not count. The pre-r14 engine enforced the rule only between
  * single-hop pairs; these cases are constructed so the old answer and
  * Neo4j's answer DIFFER (the excluded binding's only witness reuses
  * the bound edge).
  */
class ChainIsoSpec extends SparkSpec {

  // directed triangle A→B→C→A, all type R, plus one parallel edge
  // B→C of type S for the disjoint-type fast-path check
  private lazy val tri = {
    import spark.implicits._
    val names = Map(1L -> "A", 2L -> "B", 3L -> "C")
    GraphTables(
      names.toSeq.map { case (id, nm) =>
        NodeRow(id, "N", nm, "", "", "b1", Seq.empty)
      }.toDS(),
      Seq(
        EdgeRow(1L, 2L, "R", "", "b1"),
        EdgeRow(2L, 3L, "R", "", "b1"),
        EdgeRow(3L, 1L, "R", "", "b1"),
        EdgeRow(2L, 3L, "S", "", "b1")).toDS())
  }

  private def names(q: String, col: String): Seq[String] =
    CypherLite.run(tri, q).fold(e => fail(s"$q → $e"), identity)
      .collect().map(_.getAs[String](col)).toSeq

  test("single × ranged: a witness path reusing the single-hop edge " +
      "inside the ranged walk is excluded (cyclic graph)") {
    // a=A binds edge A→B; from x=B the walks of length 1..3 reach
    // C (1), A (2), and B only via C→A→B — which reuses A→B. Neo4j
    // answers {A, C}; the pre-r14 engine answered {A, B, C}.
    val r = names("MATCH (a:N {name: 'A'})-[:R]->(x)-[:R*1..3]->(y) " +
      "RETURN y.name ORDER BY y.name", "y_name")
    assert(r == Seq("A", "C"))
  }

  test("ranged × ranged: the two segments' witness paths must be " +
      "edge-disjoint") {
    // from A: seg1 length 1..2 reaches B ({AB}) and C ({AB,BC}).
    // From x=C, seg2 reaches A ({CA}) and B ({CA,AB}) — the latter
    // overlaps seg1's {AB,BC}, and (x=C, y=B) has no other witness, so
    // it is excluded. Surviving (y) set: via B → {C, A}; via C → {A}.
    val r = names(
      "MATCH (a:N {name: 'A'})-[:R*1..2]->(x)-[:R*1..2]->(y) " +
        "RETURN DISTINCT y.name ORDER BY y.name", "y_name")
    assert(r == Seq("A", "C"))
  }

  test("disjoint-type mixed chains keep the lean id-pair plan — no " +
      "edge-identity columns, the ranged step stays on the min-depth " +
      "kernel, same results") {
    val q = "MATCH (a:N {name: 'A'})-[:R]->(x)-[:S*1..2]->(y) " +
      "RETURN y.name ORDER BY y.name"
    val df = CypherLite.run(tri, q).fold(e => fail(s"$q → $e"), identity)
    assert(!df.queryExecution.analyzed.toString.contains("eids"),
      "disjoint types must not pay the per-path expansion")
    // the kernel's eager localCheckpoint materializes as an ExistingRDD
    // scan — its presence proves the disjoint ranged step kept the
    // kernel routing (colliding ranged steps switch to the isomorphism
    // expansion, which has no checkpoint at depth ≤ 2)
    assert(df.queryExecution.executedPlan.toString
      .contains("ExistingRDD"))
    assert(df.collect().map(_.getAs[String]("y_name")).toSeq == Seq("C"))
  }

  test("the expansion terminates on cycles at the *1..8 cap — " +
      "within-path edge uniqueness kills the frontier after one loop " +
      "and the answer is depth-stable") {
    // same chain as the first test, widened to the cap: every walk on
    // the 3-cycle repeats an edge after 3 steps, so depths 4..8 add no
    // paths (the frontier empties) and the answer cannot change
    val r = names("MATCH (a:N {name: 'A'})-[:R]->(x)-[:R*1..8]->(y) " +
      "RETURN y.name ORDER BY y.name", "y_name")
    assert(r == Seq("A", "C"))
  }

  test("a ranged chain segment past *1..8 rejects by name") {
    val r = CypherLite.run(tri,
      "MATCH (a:N)-[:R]->(x)-[:R*1..9]->(y) RETURN y.name")
    assert(r.isLeft && r.swap.toOption.get.contains("caps at *1..8"), r)
  }
}
