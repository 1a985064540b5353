package graft.graph

import graft.SparkSpec

/** `keys(r)` / `properties(r)` — the relationship property-map
  * inspection accessors (round-13). Contract pinned here: sorted-by-key
  * deterministic serializations (`r_keys` comma-joined, `r_properties`
  * as `{k: v, …}`), empty map → ''/'{}', unmatched OPTIONAL binding →
  * null for both, grouping-key behavior under aggregates, node-side
  * rejections by name.
  */
class RelAccessorSpec extends SparkSpec {

  private def node(id: Long): NodeRow =
    NodeRow(id, "N", s"n$id", "", "", "b1", Seq.empty)

  private lazy val g = {
    import spark.implicits._
    GraphTables(
      (1L to 4L).map(node).toDS(),
      Seq(
        EdgeRow(1L, 2L, "T", "", "b1",
          Map("weight" -> "2", "grade" -> "even")),
        EdgeRow(1L, 3L, "T", "", "b1", Map.empty[String, String]),
        EdgeRow(2L, 4L, "U", "", "b1", Map("weight" -> "9"))).toDS())
  }

  private def rows(q: String) =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity).collect()

  test("keys(r)/properties(r): sorted-by-key serialization; empty map " +
      "answers ''/'{}'") {
    val r = rows("MATCH (a:N {name: 'n1'})-[r:T]->(b:N) " +
      "RETURN b.name AS b_name, keys(r), properties(r) ORDER BY b_name")
    assert(r.map(x => (x.getAs[String]("b_name"),
      x.getAs[String]("r_keys"), x.getAs[String]("r_properties")))
      .toSeq == Seq(
        ("n2", "grade,weight", "{grade: even, weight: 2}"),
        ("n3", "", "{}")))
  }

  test("unmatched OPTIONAL binding projects null for both accessors " +
      "(keys(null)/properties(null), Cypher's rule)") {
    val r = rows("MATCH (a:N {name: 'n4'}) OPTIONAL MATCH " +
      "(a)-[r:T]->(b) RETURN a.name, keys(r), properties(r)")
    assert(r.map(x => (x.getAs[String]("m_name"),
      x.getAs[String]("r_keys"), x.getAs[String]("r_properties")))
      .toSeq == Seq(("n4", null, null)))
  }

  test("accessors act as grouping keys under aggregates; an AS alias " +
      "keys the ORDER BY") {
    val r = rows("MATCH (a:N)-[r:T]->(b:N) " +
      "RETURN keys(r) AS kk, count(*) ORDER BY kk DESC")
    assert(r.map(x => (x.getAs[String]("kk"),
      x.getAs[Long]("n_connected"))).toSeq ==
      Seq(("grade,weight", 1L), ("", 1L)))
  }

  test("coalesce(r.prop, default): missing keys and unmatched OPTIONAL " +
      "bindings answer the default; aggregate collisions reject") {
    // n1-[T]->n2 carries weight; n1-[T]->n3 has an empty map
    val r = rows("MATCH (a:N {name: 'n1'})-[r:T]->(b:N) " +
      "RETURN b.name AS b_name, coalesce(r.weight, 'none') " +
      "ORDER BY b_name")
    assert(r.map(x => (x.getAs[String]("b_name"),
      x.getAs[String]("r_weight"))).toSeq ==
      Seq(("n2", "2"), ("n3", "none")))
    // unmatched OPTIONAL binding: r is null → default
    val opt = rows("MATCH (a:N {name: 'n4'}) OPTIONAL MATCH " +
      "(a)-[r:T]->(b) RETURN a.name, coalesce(r.weight, 'none')")
    assert(opt.map(_.getAs[String]("r_weight")).toSeq == Seq("none"))
    // sharing r_<p> with an aggregate over the same prop rejects
    val bad = CypherLite.run(g, "MATCH (a:N)-[r:T]->(b:N) " +
      "RETURN coalesce(r.weight, '7'), avg(r.weight)")
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("leak into the aggregate"), bad)
  }

  test("whole-node startNode(r)/endNode(r) serialize the STORED " +
      "endpoint through the properties(n) machinery (r15)") {
    // outgoing: serialized sorted-key maps (fixture nodes carry only a
    // name), canonical columns startnode_properties/endnode_properties
    val out = rows("MATCH (a:N {name: 'n1'})-[r:T]->(b:N) " +
      "RETURN b.name AS b_name, startNode(r), endNode(r) " +
      "ORDER BY b_name")
    assert(out.map(x => (x.getAs[String]("b_name"),
      x.getAs[String]("startnode_properties"),
      x.getAs[String]("endnode_properties"))).toSeq ==
      Seq(("n2", "{name: n1}", "{name: n2}"),
        ("n3", "{name: n1}", "{name: n3}")))
    // undirected: the stored orientation is revealed, not the
    // traversal's — and the dotted form rides the SAME endpoint join
    val both = rows("MATCH (m:N {name: 'n2'})-[r:T|U]-(c:N) " +
      "RETURN startNode(r) AS sn, endNode(r).name AS en ORDER BY sn")
    assert(both.map(x => (x.getAs[String]("sn"), x.getAs[String]("en")))
      .toSeq == Seq(("{name: n1}", "n2"), ("{name: n2}", "n4")))
    // unmatched OPTIONAL binding → null (Cypher's startNode(null))
    val opt = rows("MATCH (a:N {name: 'n4'}) OPTIONAL MATCH " +
      "(a)-[r:T]->(b) RETURN a.name, startNode(r) AS sn")
    assert(opt.map(_.getAs[String]("sn")).toSeq == Seq(null))
    // a serialized map is not a Cypher grouping key — reject by name
    val agg = CypherLite.run(g, "MATCH (a:N)-[r:T]->(b:N) " +
      "RETURN startNode(r), count(*)")
    assert(agg.isLeft &&
      agg.swap.toOption.get.contains("cannot combine with an aggregate"),
      agg)
    // an unbound relationship variable still rejects by name
    val nv = CypherLite.run(g,
      "MATCH (a:N)-[:T]->(b:N) RETURN startNode(r)")
    assert(nv.isLeft && nv.swap.toOption.get.contains("relationship"), nv)
  }

  test("node-side keys() under a hop answers the ROOT's map; an " +
      "unbound r rejects by name") {
    val r = rows("MATCH (a:N {name: 'n1'})-[r:T]->(b:N) " +
      "RETURN keys(a), b.name ORDER BY b.name")
    // the fixture's nodes carry only a name
    assert(r.map(x => (x.getAs[String]("m_keys"),
      x.getAs[String]("c_name"))).toSeq ==
      Seq(("name", "n2"), ("name", "n3")))
    val bad = CypherLite.run(g, "MATCH (a:N)-[:T]->(b:N) RETURN keys(r)")
    assert(bad.isLeft && bad.swap.toOption.get.contains("keys"), bad)
  }

  test("startNode(r).prop / endNode(r).prop answer the STORED " +
      "endpoints — orientation-independent on incoming and undirected " +
      "matches") {
    // outgoing: startNode = the matched side, endNode = connected
    val out = rows("MATCH (a:N {name: 'n1'})-[r:T]->(b:N) " +
      "RETURN b.name AS b_name, startNode(r).name AS sn, " +
      "endNode(r).name AS en ORDER BY b_name")
    assert(out.map(x => (x.getAs[String]("b_name"),
      x.getAs[String]("sn"), x.getAs[String]("en"))).toSeq ==
      Seq(("n2", "n1", "n2"), ("n3", "n1", "n3")))
    // incoming: traversal flips, the STORED endpoints do not
    val in = rows("MATCH (b:N {name: 'n4'})<-[r:U]-(a:N) " +
      "RETURN startNode(r).name AS sn, endNode(r).name AS en")
    assert(in.map(x => (x.getAs[String]("sn"), x.getAs[String]("en")))
      .toSeq == Seq(("n2", "n4")))
    // undirected: both bindings of n2 reveal the stored orientation
    // (typed alternation — an untyped hop follows HAS_* containment
    // edges only, the engine's downward convention)
    val both = rows("MATCH (m:N {name: 'n2'})-[r:T|U]-(c:N) " +
      "RETURN startNode(r).name AS sn, endNode(r).name AS en " +
      "ORDER BY sn")
    assert(both.map(x => (x.getAs[String]("sn"), x.getAs[String]("en")))
      .toSeq == Seq(("n1", "n2"), ("n2", "n4")))
    // unknown property and non-rel variable reject by name
    val bad = CypherLite.run(g,
      "MATCH (a:N)-[r:T]->(b:N) RETURN startNode(r).weight")
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("endpoint property"), bad)
    val nv = CypherLite.run(g,
      "MATCH (a:N)-[r:T]->(b:N) RETURN endNode(a).name")
    assert(nv.isLeft && nv.swap.toOption.get.contains("relationship"), nv)
  }

  test("endpoint projections group under aggregates and survive " +
      "OPTIONAL as nulls") {
    val g2 = rows("MATCH (a:N)-[r:T]->(b:N) " +
      "RETURN startNode(r).name AS sn, count(*) ORDER BY sn")
    assert(g2.map(x => (x.getAs[String]("sn"),
      x.getAs[Long]("n_connected"))).toSeq == Seq(("n1", 2L)))
    val opt = rows("MATCH (a:N {name: 'n4'}) OPTIONAL MATCH " +
      "(a)-[r:T]->(b) RETURN a.name, endNode(r).name AS en")
    assert(opt.map(_.getAs[String]("en")).toSeq == Seq(null))
  }
}
