package graft.graph

import graft.SparkSpec

/** The map-form relationship updates (round-13): `SET r += {…}` merges
  * the map into the stored props (written keys overwrite, others keep);
  * `SET r = {…}` REPLACES the whole map (unnamed stored keys drop —
  * Neo4j's replace semantics). Value forms are 'quoted' literals or
  * $params; anything else is a named error, never a silent drop.
  */
class SetRelMapSpec extends SparkSpec {

  private def node(id: Long): NodeRow =
    NodeRow(id, "N", s"n$id", "", "", "b1", Seq.empty)

  private def g = {
    import spark.implicits._
    GraphTables(
      (1L to 3L).map(node).toDS(),
      Seq(
        EdgeRow(1L, 2L, "T", "", "b1",
          Map("weight" -> "2", "grade" -> "a")),
        EdgeRow(2L, 3L, "T", "", "b1", Map("weight" -> "9"))).toDS())
  }

  private def props(gt: GraphTables): Map[String, Map[String, String]] =
    gt.edges.collect().map(e => s"n${e.src}->n${e.dst}" -> e.props).toMap

  test("SET r += {…} merges: written keys overwrite, unnamed stored " +
      "keys survive; WHERE scopes the update") {
    val (after, _) = CypherLite.runWrite(g,
      "MATCH (a:N)-[r:T]->(b:N) WHERE r.grade = 'a' " +
        "SET r += {toll: $t, grade: 'A'}", Map("t" -> "1"))
      .fold(e => fail(e), identity)
    val p = props(after)
    assert(p("n1->n2") ==
      Map("weight" -> "2", "grade" -> "A", "toll" -> "1"))
    assert(p("n2->n3") == Map("weight" -> "9")) // untouched
  }

  test("SET r = {…} replaces the whole map; = {} clears it") {
    val (after, _) = CypherLite.runWrite(g,
      "MATCH (a:N {name: 'n1'})-[r:T]->(b:N) SET r = {only: 'x'}",
      Map.empty).fold(e => fail(e), identity)
    assert(props(after)("n1->n2") == Map("only" -> "x"))
    val (cleared, _) = CypherLite.runWrite(g,
      "MATCH (a:N)-[r:T]->(b:N) SET r = {}", Map.empty)
      .fold(e => fail(e), identity)
    assert(props(cleared).values.forall(_.isEmpty))
  }

  test("rejections by name: unsupported value forms, duplicate keys, " +
      "foreign variables, empty merge map, missing params") {
    def leftMsg(q: String, ps: Map[String, String] = Map.empty): String =
      CypherLite.runWrite(g, q, ps).swap
        .getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH (a:N)-[r:T]->(b:N) SET r += {w: 2}")
      .contains("unsupported value form"))
    assert(leftMsg("MATCH (a:N)-[r:T]->(b:N) SET r += {w: '1', w: '2'}")
      .contains("duplicate"))
    assert(leftMsg("MATCH (a:N)-[r:T]->(b:N) SET q += {w: '1'}")
      .contains("bound relationship"))
    assert(leftMsg("MATCH (a:N)-[r:T]->(b:N) SET r += {}")
      .contains("no-op"))
    assert(leftMsg("MATCH (a:N)-[r:T]->(b:N) SET r += {w: $missing}")
      .contains("missing parameter"))
  }

  test("a quoted value containing a colon-suffixed word does not " +
      "inflate the completeness check (ADVICE r14: counted on the " +
      "quote-blanked body)") {
    val (after, _) = CypherLite.runWrite(g,
      "MATCH (a:N {name: 'n1'})-[r:T]->(b:N) " +
        "SET r += {note: 'see docs: here', ref: 'a:b: c:'}", Map.empty)
      .fold(e => fail(e), identity)
    val p = props(after)("n1->n2")
    assert(p("note") == "see docs: here" && p("ref") == "a:b: c:")
    // the genuinely-unsupported form still rejects by name
    assert(CypherLite.runWrite(g,
      "MATCH (a:N)-[r:T]->(b:N) SET r += {note: 'ok', w: 2}", Map.empty)
      .swap.exists(_.contains("unsupported value form")))
  }
}
