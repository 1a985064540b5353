package graft.graph

import graft.SparkSpec

/** Relationship-side branch-aware MERGE (`MERGE (a)-[r:R]->(b)
  * ON CREATE SET r.prop = … ON MATCH SET r.prop = …`) — round-13
  * directive 5, completing the symmetry with the node-side
  * MergeNodeOnSet. Which branch happened is decided set-wise against
  * the pre-merge edge image; created edges carry inline + ON CREATE
  * props, matched edges keep their stored props with the ON MATCH key
  * overwritten.
  */
class MergeEdgeOnSetSpec extends SparkSpec {

  private def node(id: Long, label: String, name: String): NodeRow =
    NodeRow(id, label, name, "", "", "b1", Seq.empty)

  private def freshGraph: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(node(1, "City", "ithaca"), node(2, "City", "auburn"),
        node(3, "Town", "dryden")).toDS(),
      Seq(EdgeRow(1L, 2L, "ROAD", "", "b1",
        Map("grade" -> "a", "weight" -> "7"))).toDS())
  }

  private def props(g: GraphTables): Map[(Long, Long, String),
      Map[String, String]] =
    g.edges.collect().map(e => (e.src, e.dst, e.relType) -> e.props).toMap

  private def write(g: GraphTables, q: String,
      params: Map[String, String] = Map.empty): GraphTables =
    CypherLite.runWrite(g, q, params).fold(e => fail(s"$q → $e"), _._1)

  test("ON MATCH SET overwrites the stored key on an existing edge; " +
      "other keys survive") {
    val after = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:City {name: 'auburn'}) " +
        "MERGE (a)-[r:ROAD]->(b) " +
        "ON CREATE SET r.weight = '1' ON MATCH SET r.weight = '9'")
    val p = props(after)((1L, 2L, "ROAD"))
    assert(p("weight") == "9", s"matched branch must win: $p")
    assert(p("grade") == "a", s"untouched keys must survive: $p")
  }

  test("ON CREATE SET applies to a NEW edge (plus the inline map); " +
      "ON MATCH does not fire") {
    val after = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:Town {name: 'dryden'}) " +
        "MERGE (a)-[r:ROAD {grade: 'b'}]->(b) " +
        "ON CREATE SET r.weight = '3' ON MATCH SET r.weight = '9'")
    val p = props(after)((1L, 3L, "ROAD"))
    assert(p == Map("grade" -> "b", "weight" -> "3"), p.toString)
    // the pre-existing edge is untouched (different (src,dst) key)
    assert(props(after)((1L, 2L, "ROAD"))("weight") == "7")
  }

  test("re-running the same MERGE takes the ON MATCH branch the second " +
      "time — branch decision is against the PRE-merge image") {
    val q = "MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:Town {name: 'dryden'}) MERGE (a)-[r:LINK]->(b) " +
      "ON CREATE SET r.state = 'new' ON MATCH SET r.state = 'seen'"
    val once = write(freshGraph, q)
    assert(props(once)((1L, 3L, "LINK"))("state") == "new")
    val twice = write(once, q)
    assert(props(twice)((1L, 3L, "LINK"))("state") == "seen")
    // edge count is stable — MERGE, not CREATE
    assert(twice.edges.count() == once.edges.count())
  }

  test("single-branch forms work alone; values may be $params") {
    val created = write(freshGraph,
      "MATCH (a:City {name: 'auburn'}) MATCH (b:Town {name: 'dryden'}) " +
        "MERGE (a)-[r:ROAD]->(b) ON CREATE SET r.weight = $w",
      Map("w" -> "4"))
    assert(props(created)((2L, 3L, "ROAD")) == Map("weight" -> "4"))
    val matched = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:City {name: 'auburn'}) " +
        "MERGE (a)-[r:ROAD]->(b) ON MATCH SET r.grade = 'c'")
    assert(props(matched)((1L, 2L, "ROAD"))("grade") == "c")
  }

  test("unmatched sides merge nothing (MERGE inside MATCH never creates " +
      "endpoints)") {
    val after = write(freshGraph,
      "MATCH (a:City {name: 'nowhere'}) MATCH (b:Town {name: 'dryden'}) " +
        "MERGE (a)-[r:ROAD]->(b) ON CREATE SET r.weight = '1'")
    assert(after.edges.count() == freshGraph.edges.count())
  }

  test("fuzz: malformed relationship ON SET shapes reject by name") {
    def leftMsg(q: String): String =
      CypherLite.runWrite(freshGraph, q, Map.empty)
        .swap.getOrElse(fail(s"$q unexpectedly parsed")) match {
        case e: String => e
      }
    // SET must reference the bound rel variable
    assert(leftMsg("MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:City {name: 'auburn'}) MERGE (a)-[r:ROAD]->(b) " +
      "ON MATCH SET x.weight = '9'")
      .contains("may only write the merged relationship"))
    // duplicate branch
    assert(leftMsg("MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:City {name: 'auburn'}) MERGE (a)-[r:ROAD]->(b) " +
      "ON MATCH SET r.weight = '9' ON MATCH SET r.weight = '8'")
      .contains("at most one"))
    // no rel variable bound → the targeted shape error, not the generic
    assert(leftMsg("MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:City {name: 'auburn'}) MERGE (a)-[:ROAD]->(b) " +
      "ON MATCH SET r.weight = '9'")
      .contains("bound relationship variable"))
    // multi-clause MERGE block with ON branches: same targeted error
    assert(leftMsg("MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:City {name: 'auburn'}) MERGE (a)-[r:ROAD]->(b) " +
      "MERGE (b)-[s:ROAD]->(a) ON MATCH SET s.weight = '9'")
      .contains("ONE MERGE clause"))
    // self-loop
    assert(leftMsg("MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:City {name: 'auburn'}) MERGE (a)-[r:ROAD]->(a) " +
      "ON MATCH SET r.weight = '9'").contains("self-loop"))
    // missing parameter
    assert(leftMsg("MATCH (a:City {name: 'ithaca'}) " +
      "MATCH (b:City {name: 'auburn'}) MERGE (a)-[r:ROAD]->(b) " +
      "ON MATCH SET r.weight = $nope").contains("missing parameter"))
  }

  test("comma lists: several assignments per branch, each branch its " +
      "own map; duplicates within one branch reject") {
    val after = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:City {name: 'auburn'}) " +
        "MERGE (a)-[r:ROAD]->(b) " +
        "ON CREATE SET r.weight = '1', r.state = 'new' " +
        "ON MATCH SET r.weight = '9', r.state = 'seen', r.lanes = $n",
      Map("n" -> "4"))
    val p = props(after)((1L, 2L, "ROAD"))
    assert(p("weight") == "9" && p("state") == "seen" &&
      p("lanes") == "4", p.toString)
    assert(p("grade") == "a", s"untouched keys must survive: $p")
    // create branch takes ITS list
    val created = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:Town {name: 'dryden'}) " +
        "MERGE (a)-[r:ROAD]->(b) " +
        "ON CREATE SET r.weight = '1', r.state = 'new' " +
        "ON MATCH SET r.weight = '9'")
    assert(props(created)((1L, 3L, "ROAD")) ==
      Map("weight" -> "1", "state" -> "new"))
    // duplicate prop within one branch: named rejection
    val dup = CypherLite.runWrite(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:City {name: 'auburn'}) " +
        "MERGE (a)-[r:ROAD]->(b) " +
        "ON MATCH SET r.weight = '9', r.weight = '8'", Map.empty)
    assert(dup.swap.exists(_.contains("duplicate property")), dup.toString)
  }

  test("read-after-write: the set property is visible to the Cypher " +
      "read surface (WHERE r.prop / RETURN r.prop)") {
    val after = write(freshGraph,
      "MATCH (a:City {name: 'ithaca'}) MATCH (b:City {name: 'auburn'}) " +
        "MERGE (a)-[r:ROAD]->(b) ON MATCH SET r.weight = '9'")
    val rows = CypherLite.run(after,
      "MATCH (a:City)-[r:ROAD]->(b) WHERE r.weight > 8 RETURN b.name")
      .fold(e => fail(e), identity).collect()
    assert(rows.map(_.getAs[String]("c_name")).toSeq == Seq("auburn"))
  }
}
