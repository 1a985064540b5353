package graft.graph

import graft.SparkSpec

/** Per-segment direction on chain patterns (round-13): `->` / `<-`
  * per segment (mixed chains are the co-occurrence staple
  * `(a)-[:R]->(x)<-[:R]-(b)`), with Cypher's relationship isomorphism
  * across segments — one stored edge binds at most one segment, so the
  * a = b bounce through a single edge is no binding, while distinct
  * parallel edges are. Round 14 adds the UNDIRECTED segment (`-[…]-`:
  * that segment's scan unions both orientations; identity stays the
  * stored triple, so isomorphism recognizes one relationship seen from
  * either side).
  */
class ChainDirSpec extends SparkSpec {

  private def node(id: Long, lbl: String): NodeRow =
    NodeRow(id, lbl, s"n$id", "", "", "b1", Seq.empty)

  // co-occurrence diamond: 1→3, 2→3 (R); a parallel 1→3 of type R2;
  // and 3→4 (R) for the incoming-incoming rollup
  private lazy val g = {
    import spark.implicits._
    GraphTables(
      Seq(node(1, "A"), node(2, "A"), node(3, "X"), node(4, "B")).toDS(),
      Seq(
        EdgeRow(1L, 3L, "R", "", "b1"),
        EdgeRow(2L, 3L, "R", "", "b1"),
        EdgeRow(1L, 3L, "R2", "", "b1"),
        EdgeRow(3L, 4L, "R", "", "b1")).toDS())
  }

  private def rows(q: String) =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity).collect()

  test("mixed-direction co-occurrence: same-type segments enforce " +
      "relationship isomorphism (no single-edge bounce)") {
    val r = rows("MATCH (a:A)-[:R]->(x:X)<-[:R]-(b:A) " +
      "RETURN a.name, b.name ORDER BY a.name")
    assert(r.map(x => (x.getAs[String]("a_name"),
      x.getAs[String]("b_name"))).toSeq ==
      Seq(("n1", "n2"), ("n2", "n1")))
  }

  test("distinct-type segments allow coinciding endpoint values — " +
      "the edges differ, so the binding stands") {
    val r = rows("MATCH (a:A)-[:R]->(x:X)<-[:R2]-(b:A) " +
      "RETURN a.name, b.name ORDER BY a.name")
    assert(r.map(x => (x.getAs[String]("a_name"),
      x.getAs[String]("b_name"))).toSeq ==
      Seq(("n1", "n1"), ("n2", "n1")))
  }

  test("all-incoming chains walk the reversed relation per segment; " +
      "3-segment mixed chains route through the N-step scanner") {
    val up = rows("MATCH (y:B)<-[:R]-(x:X)<-[:R]-(a:A) " +
      "RETURN y.name, a.name ORDER BY a.name")
    assert(up.map(x => (x.getAs[String]("y_name"),
      x.getAs[String]("a_name"))).toSeq ==
      Seq(("n4", "n1"), ("n4", "n2")))
    val three = rows("MATCH (a:A)-[:R]->(x:X)<-[:R]-(b:A)" +
      "-[:R2]->(z:X) RETURN a.name, z.name")
    assert(three.map(x => (x.getAs[String]("a_name"),
      x.getAs[String]("z_name"))).toSeq == Seq(("n2", "n3")))
  }

  test("undirected chain segments (r14): the segment's scan unions " +
      "both orientations") {
    val r = rows("MATCH (a:A {name: 'n1'})-[:R]-(x:X)-[:R]->(b:B) " +
      "RETURN a.name, b.name")
    assert(r.map(x => (x.getAs[String]("a_name"),
      x.getAs[String]("b_name"))).toSeq == Seq(("n1", "n4")))
  }

  test("undirected × undirected same-type segments: isomorphism on the " +
      "STORED identity — no single-edge bounce from either side") {
    val r = rows("MATCH (a:A {name: 'n1'})-[:R]-(x:X)-[:R]-(b) " +
      "RETURN b.name ORDER BY b.name")
    // x = n3 via the stored 1→3 edge; the second segment sees 1→3
    // (same stored edge — excluded), 2→3, and 3→4
    assert(r.map(_.getAs[String]("b_name")).toSeq == Seq("n2", "n4"))
  }

  test("3-segment chains with an undirected middle route through the " +
      "N-step scanner") {
    val r = rows("MATCH (y:B)<-[:R]-(x:X)-[:R]-(a:A)-[:R2]->(z:X) " +
      "RETURN y.name, a.name, z.name")
    assert(r.map(x => (x.getAs[String]("y_name"),
      x.getAs[String]("a_name"), x.getAs[String]("z_name"))).toSeq ==
      Seq(("n4", "n1", "n3")))
  }
}
