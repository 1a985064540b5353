package graft.graph

import graft.SparkSpec

/** `keys(n)` / `properties(n)` — the NODE-side property-map inspection
  * accessors (round-14 directive 4, the symmetry partner of round-13's
  * keys(r)/properties(r)). Contract pinned here: the user properties
  * are the fixed document columns {content, docnbr, name} serialized in
  * sorted-key order, the empty string means ABSENT (the ingest's
  * at-rest convention), label/batch/path never serialize, the matched
  * variable works hop-less, the connected variable works under a hop
  * pattern, and the unsupported placements reject by name.
  */
class NodeAccessorSpec extends SparkSpec {

  private lazy val g = {
    import spark.implicits._
    GraphTables(
      Seq(
        // full house: all three user properties present
        NodeRow(1L, "Doc", "alpha", "body text", "D-1", "b1", Seq.empty),
        // no content: keys must skip it
        NodeRow(2L, "Doc", "beta", "", "D-2", "b1", Seq.empty),
        // name only (the shared-dimension shape: docnbr = "")
        NodeRow(3L, "Dim", "gamma", "", "", "b1", Seq.empty)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "REF", "", "b1"),
        EdgeRow(1L, 3L, "REF", "", "b1")).toDS())
  }

  private def rows(q: String) =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity).collect()

  test("hop-less keys(n)/properties(n): sorted-key serialization, " +
      "empty-string columns are absent, label/batch/path never appear") {
    val r = rows("MATCH (n:Doc) RETURN n.name, keys(n), properties(n) " +
      "ORDER BY n.name")
    assert(r.map(x => (x.getAs[String]("m_name"),
      x.getAs[String]("m_keys"), x.getAs[String]("m_properties")))
      .toSeq == Seq(
        ("alpha", "content,docnbr,name",
          "{content: body text, docnbr: D-1, name: alpha}"),
        ("beta", "docnbr,name", "{docnbr: D-2, name: beta}")))
    val dim = rows("MATCH (n:Dim) RETURN keys(n), properties(n)")
    assert(dim.map(x => (x.getAs[String]("m_keys"),
      x.getAs[String]("m_properties"))).toSeq ==
      Seq(("name", "{name: gamma}")))
  }

  test("connected-side keys(c)/properties(c) under a hop pattern — " +
      "one extra node join, same serialization") {
    val r = rows("MATCH (a:Doc {name: 'alpha'})-[:REF]->(c) " +
      "RETURN c.name, keys(c) ORDER BY c.name")
    assert(r.map(x => (x.getAs[String]("c_name"),
      x.getAs[String]("c_keys"))).toSeq ==
      Seq(("beta", "docnbr,name"), ("gamma", "name")))
    // alias + ORDER BY on the serialized column
    val al = rows("MATCH (a:Doc {name: 'alpha'})-[:REF]->(c) " +
      "RETURN properties(c) AS pc ORDER BY pc")
    assert(al.map(_.getAs[String]("pc")).toSeq ==
      Seq("{docnbr: D-2, name: beta}", "{name: gamma}"))
  }

  test("keys(c) under OPTIONAL MATCH: unmatched roots answer null " +
      "(keys(null)) while keys(n) still answers the ROOT's own keys") {
    val r = rows("MATCH (n:Dim) OPTIONAL MATCH (n)-[:REF]->(c) " +
      "RETURN n.name, keys(n), keys(c)")
    assert(r.map(x => (x.getAs[String]("m_name"),
      x.getAs[String]("m_keys"), x.getAs[String]("c_keys")))
      .toSeq == Seq(("gamma", "name", null)))
  }

  test("matched-var keys(m)/properties(m) under a hop pattern ride " +
      "the root side — one row per binding, root map unchanged") {
    val r = rows("MATCH (a:Doc {name: 'alpha'})-[:REF]->(c) " +
      "RETURN keys(a), c.name ORDER BY c.name")
    assert(r.map(x => (x.getAs[String]("m_keys"),
      x.getAs[String]("c_name"))).toSeq ==
      Seq(("content,docnbr,name", "beta"),
        ("content,docnbr,name", "gamma")))
    // accessor-only RETURN under a hop: the pattern must still match
    // (beta has no outgoing REF, so only alpha's row comes back)
    val only = rows("MATCH (a:Doc)-[:REF]->(c:Doc) " +
      "RETURN properties(a)")
    assert(only.map(_.getAs[String]("m_properties")).toSeq ==
      Seq("{content: body text, docnbr: D-1, name: alpha}"))
  }

  test("unsupported placements reject by name: aggregates alongside, " +
      "unknown variable") {
    def leftMsg(q: String): String =
      CypherLite.run(g, q).swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH (a:Doc)-[:REF]->(c) RETURN keys(c), count(c)")
      .contains("cannot combine with an aggregate"))
    assert(leftMsg("MATCH (a:Doc)-[:REF]->(c) RETURN keys(z)")
      .contains("got 'z'"))
  }
}
