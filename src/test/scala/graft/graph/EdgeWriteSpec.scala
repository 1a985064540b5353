package graft.graph

import graft.SparkSpec

/** The direct relationship write forms (round 13):
  * `MATCH (a)-[r:T]->(b) [WHERE r.prop …] SET r.p = …[, …]` and
  * `MATCH (a)-[r:T]->(b) [WHERE r.prop …] DELETE r` — the edge
  * analogues of the A18 content update and the cascade delete, over
  * the schemaless EdgeRow.props map / the edge MERGE key.
  */
class EdgeWriteSpec extends SparkSpec {

  private def node(id: Long, label: String, name: String): NodeRow =
    NodeRow(id, label, name, "", "", "b1", Seq.empty)

  private def freshGraph: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(node(1, "City", "ithaca"), node(2, "City", "auburn"),
        node(3, "Town", "dryden")).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1",
          Map("grade" -> "a", "weight" -> "7")),
        EdgeRow(1L, 3L, "ROAD", "", "b1", Map("weight" -> "2")),
        EdgeRow(2L, 3L, "TOLL", "", "b1", Map("grade" -> "a"))).toDS())
  }

  private def props(g: GraphTables): Map[(Long, Long, String),
      Map[String, String]] =
    g.edges.collect().map(e => (e.src, e.dst, e.relType) -> e.props).toMap

  private def write(g: GraphTables, q: String,
      params: Map[String, String] = Map.empty): GraphTables =
    CypherLite.runWrite(g, q, params).fold(e => fail(s"$q → $e"), _._1)

  test("SET r.prop updates every matched edge; WHERE r.prop restricts; " +
      "untouched keys and other types survive") {
    val after = write(freshGraph,
      "MATCH (a:City)-[r:ROAD]->(b) WHERE r.weight > 5 " +
        "SET r.grade = 'z', r.toll = $t", Map("t" -> "1"))
    val p = props(after)
    assert(p((1L, 2L, "ROAD")) ==
      Map("grade" -> "z", "weight" -> "7", "toll" -> "1"))
    // below the WHERE threshold: untouched
    assert(p((1L, 3L, "ROAD")) == Map("weight" -> "2"))
    // other relationship type: untouched
    assert(p((2L, 3L, "TOLL")) == Map("grade" -> "a"))
  }

  test("endpoint label/property maps anchor the matched set") {
    val after = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'})-[r:ROAD]->(b:Town) " +
        "SET r.kind = 'rural'")
    val p = props(after)
    assert(p((1L, 3L, "ROAD"))("kind") == "rural")
    assert(!p((1L, 2L, "ROAD")).contains("kind"))
  }

  test("DELETE r removes exactly the matched relationships; nodes stay") {
    val g0 = freshGraph
    val after = write(g0,
      "MATCH (a:City)-[r:ROAD]->(b) WHERE r.weight > 5 DELETE r")
    assert(props(after).keySet ==
      Set((1L, 3L, "ROAD"), (2L, 3L, "TOLL")))
    assert(after.nodes.count() == g0.nodes.count())
    // unconditional form drops the whole type
    val all = write(g0, "MATCH (a)-[r:ROAD]->(b) DELETE r")
    assert(props(all).keySet == Set((2L, 3L, "TOLL")))
  }

  test("the write summaries count the matched set; read-after-write " +
      "sees the mutation") {
    val (g1, s1) = CypherLite.runWrite(freshGraph,
      "MATCH (a:City)-[r:ROAD]->(b) SET r.seen = '1'", Map.empty)
      .fold(e => fail(e), identity)
    assert(s1.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ROAD", 2L)))
    val rows = CypherLite.run(g1,
      "MATCH (a:City)-[r:ROAD]->(b) WHERE r.seen = '1' RETURN b.name")
      .fold(e => fail(e), identity).collect()
    assert(rows.length == 2)
    val (_, s2) = CypherLite.runWrite(g1,
      "MATCH (a:City)-[r:ROAD]->(b) DELETE r", Map.empty)
      .fold(e => fail(e), identity)
    assert(s2.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("ROAD", 2L)))
  }

  test("REMOVE r.prop drops exactly the named keys from matched edges; " +
      "absent keys are a no-op") {
    val after = write(freshGraph,
      "MATCH (a:City)-[r:ROAD]->(b) WHERE r.weight > 5 " +
        "REMOVE r.grade, r.nosuch")
    val p = props(after)
    assert(p((1L, 2L, "ROAD")) == Map("weight" -> "7"))
    // unmatched edges keep everything
    assert(p((1L, 3L, "ROAD")) == Map("weight" -> "2"))
    assert(p((2L, 3L, "TOLL")) == Map("grade" -> "a"))
    // rejections: wrong var, duplicates
    def leftMsg(q: String): String =
      CypherLite.runWrite(freshGraph, q, Map.empty)
        .swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) REMOVE x.grade")
      .contains("may only take the bound relationship"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) REMOVE r.g, r.g")
      .contains("duplicate property"))
  }

  test("fuzz: malformed edge-write shapes reject by name") {
    def leftMsg(q: String): String =
      CypherLite.runWrite(freshGraph, q, Map.empty)
        .swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) SET x.grade = 'z'")
      .contains("may only write the bound relationship"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) DELETE x")
      .contains("may only take the bound relationship"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) " +
      "SET r.grade = 'z', r.grade = 'y'").contains("duplicate property"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) WHERE a.name = 'x' " +
      "SET r.grade = 'z'").contains("endpoint filters"))
    assert(leftMsg("MATCH (a:City)-[r:ROAD]->(b) SET r.grade = $nope")
      .contains("missing parameter"))
    assert(leftMsg("MATCH (a:City)-[a:ROAD]->(b) DELETE a")
      .contains("distinct"))
    // read API refuses writes with the pointer message
    assert(CypherLite.run(freshGraph,
      "MATCH (a:City)-[r:ROAD]->(b) DELETE r")
      .swap.exists(_.contains("runWrite")))
  }
}
