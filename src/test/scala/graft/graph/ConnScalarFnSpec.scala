package graft.graph

import graft.SparkSpec

/** Scalar string functions over the CONNECTED variable (round 14):
  * `RETURN toUpper(c.name)` and friends on hop patterns — computed on
  * the bindings BEFORE DISTINCT/ORDER BY, canonical `<fn>_c_<prop>`,
  * null-transparent under OPTIONAL, aggregate mixes rejected.
  */
class ConnScalarFnSpec extends SparkSpec {

  private lazy val g = {
    import spark.implicits._
    GraphTables(
      Seq(
        NodeRow(1L, "A", "root", "", "", "b1", Seq.empty),
        NodeRow(2L, "B", "Alpha", "alpha body", "", "b1", Seq.empty),
        NodeRow(3L, "B", "beta", "Beta Body", "", "b1", Seq.empty),
        NodeRow(4L, "A", "lone", "", "", "b1", Seq.empty)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "T", "", "b1"),
        EdgeRow(1L, 3L, "T", "", "b1")).toDS())
  }

  private def rows(q: String) =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity).collect()

  test("toUpper/left over the connected property, alias + ORDER BY on " +
      "the transformed value") {
    val r = rows("MATCH (a:A {name: 'root'})-[:T]->(c:B) " +
      "RETURN toUpper(c.name) AS un, left(c.content, 4) AS pfx " +
      "ORDER BY un")
    assert(r.map(x => (x.getAs[String]("un"), x.getAs[String]("pfx")))
      .toSeq == Seq(("ALPHA", "alph"), ("BETA", "Beta")))
  }

  test("DISTINCT sees the TRANSFORMED value: bindings whose transforms " +
      "coincide collapse to one row") {
    // non-collapsing control: 0-based substring (Cypher's rule) keeps
    // the two bindings apart ('body' from 'alpha body' at 6; only
    // 'ody' remains of the 9-char 'Beta Body')
    val sub = rows("MATCH (a:A {name: 'root'})-[:T]->(c:B) " +
      "RETURN DISTINCT substring(c.content, 6, 4)")
    assert(sub.map(_.getAs[String]("substring_c_content")).toSeq.sorted ==
      Seq("body", "ody"))
    // collapsing case: both contents end in 'ody', so DISTINCT over the
    // transformed value answers ONE row — proof it ran post-transform
    val one = rows("MATCH (a:A {name: 'root'})-[:T]->(c:B) " +
      "RETURN DISTINCT right(c.content, 3)")
    assert(one.map(_.getAs[String]("right_c_content")).toSeq ==
      Seq("ody"))
  }

  test("OPTIONAL: unmatched roots answer null through the transform") {
    val r = rows("MATCH (a:A {name: 'lone'}) OPTIONAL MATCH " +
      "(a)-[:T]->(c) RETURN a.name, toUpper(c.name)")
    assert(r.map(x => (x.getAs[String]("m_name"),
      x.getAs[String]("toupper_c_name"))).toSeq == Seq(("lone", null)))
  }

  test("m-side transforms under a hop ride the root select — " +
      "computed once per root, present on every binding, non-null " +
      "under OPTIONAL") {
    val r = rows("MATCH (a:A {name: 'root'})-[:T]->(c:B) " +
      "RETURN toUpper(a.name) AS ua, c.name ORDER BY c.name")
    assert(r.map(x => (x.getAs[String]("ua"), x.getAs[String]("c_name")))
      .toSeq == Seq(("ROOT", "Alpha"), ("ROOT", "beta")))
    val opt = rows("MATCH (a:A {name: 'lone'}) OPTIONAL MATCH " +
      "(a)-[:T]->(c) RETURN size(a.name), toUpper(c.name)")
    assert(opt.map(x => (x.getAs[Long]("size_name"),
      x.getAs[String]("toupper_c_name"))).toSeq == Seq((4L, null)))
  }

  test("WHERE size(v.prop): the numeric string-length lens on either " +
      "variable, composable with the boolean grammar") {
    val r = rows("MATCH (a:A)-[:T]->(c:B) WHERE size(c.content) > 9 " +
      "RETURN c.name")
    // 'alpha body' (10) passes, 'Beta Body' (9) drops
    assert(r.map(_.getAs[String]("c_name")).toSeq == Seq("Alpha"))
    val m = rows("MATCH (n:B) WHERE size(n.name) = 4 OR " +
      "size(n.content) > 100 RETURN n.name")
    assert(m.map(_.getAs[String]("m_name")).toSeq == Seq("beta"))
    val neg = rows("MATCH (n:B) WHERE NOT size(n.name) = 4 " +
      "RETURN n.name")
    assert(neg.map(_.getAs[String]("m_name")).toSeq == Seq("Alpha"))
    // a quoted literal against the numeric lens rejects by name
    val bad = CypherLite.run(g,
      "MATCH (n:B) WHERE size(n.name) = 'four' RETURN n.name")
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("numeric literals"), bad)
  }

  test("searched CASE under a hop pattern rides the root select " +
      "(r14) — categorizes the ROOT per binding") {
    val r = rows("MATCH (a:A)-[:T]->(c:B) " +
      "RETURN CASE WHEN a.name = 'root' THEN 'anchor' ELSE 'other' " +
      "END AS kind, c.name ORDER BY c.name")
    assert(r.map(x => (x.getAs[String]("kind"),
      x.getAs[String]("c_name"))).toSeq ==
      Seq(("anchor", "Alpha"), ("anchor", "beta")))
    // aggregate mixes still reject
    val bad = CypherLite.run(g, "MATCH (a:A)-[:T]->(c) RETURN " +
      "CASE WHEN a.name = 'root' THEN 'x' END, count(c)")
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("cannot combine"), bad)
  }

  test("rejections by name: aggregate mix, unknown variable, " +
      "unsupported connected property") {
    def leftMsg(q: String): String =
      CypherLite.run(g, q).swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH (a:A)-[:T]->(c) RETURN toUpper(c.name), " +
      "count(c)").contains("cannot combine with an aggregate"))
    assert(leftMsg("MATCH (a:A)-[:T]->(c) RETURN toUpper(z.name)")
      .contains("got 'z'"))
    assert(leftMsg("MATCH (a:A)-[:T]->(c) RETURN trim(c.docnbr)")
      .contains("unsupported connected-node property"))
    // coalesce writes the default into the canonical column a transform
    // over the same property would read — Neo4j transforms the raw null
    assert(leftMsg("MATCH (a:A) OPTIONAL MATCH (a)-[:T]->(c) " +
      "RETURN coalesce(c.name, 'x'), toUpper(c.name)")
      .contains("leak into the transform"))
  }
}
