package graft.graph

import graft.SparkSpec

/** Relationship-property predicates on single-hop patterns — the inline
  * map form (`-[r:ROAD {grade: 'a'}]->`) and the WHERE form
  * (`WHERE r.weight > 3`) — over the schemaless `EdgeRow.props` map the
  * Cypher write surface sets. Ranged patterns reject them (Cypher's own
  * restriction for per-edge talk on var-length bindings).
  */
class RelPropPredicateSpec extends SparkSpec {

  private def node(id: Long, label: String = "N"): NodeRow =
    NodeRow(id, label, s"n$id", "", "", "b1", Seq.empty)

  // a small road net: grades a/b, weights 1..5, one unweighted edge,
  // and a parallel edge of a different type between 1 and 2
  private lazy val g = {
    import spark.implicits._
    GraphTables(
      (1L to 5L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1",
          Map("grade" -> "a", "weight" -> "5")),
        EdgeRow(1L, 3L, "ROAD", "", "b1",
          Map("grade" -> "b", "weight" -> "2")),
        EdgeRow(1L, 4L, "ROAD", "", "b1", Map("grade" -> "a")),
        EdgeRow(2L, 5L, "ROAD", "", "b1", Map("weight" -> "3")),
        EdgeRow(1L, 2L, "TOLL", "", "b1", Map("grade" -> "a"))
      ).toDS())
  }

  private def names(q: String, colName: String = "c_name"): Seq[String] =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity)
      .collect().map(_.getAs[String](colName)).toSeq

  test("inline relationship map filters per edge, with or without a " +
      "bound variable") {
    assert(names("MATCH (a:N)-[r:ROAD {grade: 'a'}]->(b) " +
      "RETURN b.name ORDER BY b.name") == Seq("n2", "n4"))
    assert(names("MATCH (a:N)-[:ROAD {grade: 'a'}]->(b) " +
      "RETURN b.name ORDER BY b.name") == Seq("n2", "n4"))
    // two-key map conjoins
    assert(names("MATCH (a:N)-[r:ROAD {grade: 'a', weight: '5'}]->(b) " +
      "RETURN b.name") == Seq("n2"))
    // multi-type bracket with a map still filters per edge (an untyped
    // bracket follows the engine's HAS_* containment convention, so the
    // any-of-these form is the right spelling here)
    assert(names("MATCH (a:N)-[r:ROAD|TOLL {grade: 'a'}]->(b) " +
      "RETURN b.name ORDER BY b.name") == Seq("n2", "n2", "n4"))
  }

  test("WHERE r.prop compares numerically, by string ops, and by " +
      "null tests; a missing key is null and the binding drops") {
    assert(names("MATCH (a:N)-[r:ROAD]->(b) WHERE r.weight > 2 " +
      "RETURN b.name ORDER BY b.name") == Seq("n2", "n5"))
    assert(names("MATCH (a:N)-[r:ROAD]->(b) WHERE r.weight >= 2 " +
      "AND r.weight <= 3 RETURN b.name ORDER BY b.name") ==
      Seq("n3", "n5"))
    assert(names("MATCH (a:N)-[r:ROAD]->(b) WHERE r.grade = 'b' " +
      "RETURN b.name") == Seq("n3"))
    assert(names("MATCH (a:N)-[r:ROAD]->(b) WHERE toUpper(r.grade) = 'A' " +
      "RETURN b.name ORDER BY b.name") == Seq("n2", "n4"))
    // missing weight key: the numeric comparison is null → drops; the
    // explicit null test finds exactly that edge
    assert(names("MATCH (a:N)-[r:ROAD]->(b) WHERE r.weight IS NULL " +
      "RETURN b.name") == Seq("n4"))
    assert(names("MATCH (a:N)-[r:ROAD]->(b) WHERE r.weight IS NOT NULL " +
      "RETURN b.name ORDER BY b.name") == Seq("n2", "n3", "n5"))
    // rel conds compose with node conds and the inline map
    assert(names("MATCH (a:N)-[r:ROAD {grade: 'a'}]->(b) " +
      "WHERE r.weight IS NOT NULL AND b.name <> 'n9' " +
      "RETURN b.name") == Seq("n2"))
  }

  test("rel-prop predicates compose with type(r), count(r), direction, " +
      "and OPTIONAL MATCH") {
    // type(r) projection under an inline map on a multi-type bracket
    val t = CypherLite.run(g, "MATCH (a:N)-[r:ROAD|TOLL {grade: 'a'}]->(b) " +
      "RETURN type(r), count(r) ORDER BY type(r)")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(t == Seq(("ROAD", 2L), ("TOLL", 1L)))
    // incoming direction: props ride the reversed edge relation
    assert(names("MATCH (b:N)<-[r:ROAD {grade: 'a'}]-(a) " +
      "RETURN a.name ORDER BY a.name") == Seq("n1", "n1"))
    // OPTIONAL MATCH: a root with no binding surviving the rel filter
    // still returns, with null connected columns (Cypher's rule)
    val o = CypherLite.run(g, "MATCH (m:N {name: 'n2'}) " +
      "OPTIONAL MATCH (m)-[r:ROAD]->(c) WHERE r.weight > 9 " +
      "RETURN m.name, c.name").fold(e => fail(e), identity).collect()
    assert(o.length == 1 && o.head.getString(0) == "n2" &&
      o.head.isNullAt(1))
  }

  test("RETURN r.prop projects the edge property per binding; missing " +
      "keys project null; grouping and ORDER BY compose") {
    // projection alongside endpoint properties, one row per edge
    // (columns read by canonical name — the engine emits rel columns
    // before connected ones, whatever the RETURN order)
    val rows = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN b.name, r.weight ORDER BY b.name")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getAs[String]("c_name"), r.getAs[String]("r_weight")))
      .toSeq
    assert(rows == Seq(("n2", "5"), ("n3", "2"), ("n4", null), ("n5", "3")))
    // grouping key under an aggregate (the weighted census) + AS alias
    val census = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN r.grade AS grade, count(r) ORDER BY grade")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(census == Seq((null, 1L), ("a", 2L), ("b", 1L)))
    // ORDER BY r.prop sorts by the projected edge property
    val byW = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "WHERE r.weight IS NOT NULL RETURN b.name, r.weight " +
      "ORDER BY r.weight DESC, b.name")
      .fold(e => fail(e), identity).collect()
      .map(_.getAs[String]("c_name")).toSeq
    assert(byW == Seq("n2", "n5", "n3"))
    // composes with WHERE r.prop and the inline map
    val one = CypherLite.run(g, "MATCH (a:N)-[r:ROAD {grade: 'a'}]->(b) " +
      "WHERE r.weight IS NOT NULL RETURN b.name, r.weight")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getAs[String]("c_name"), r.getAs[String]("r_weight")))
      .toSeq
    assert(one == Seq(("n2", "5")))
    // rejections: unprojected ORDER BY key; whole-node mix
    val ob = CypherLite.parse("MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN b.name ORDER BY r.weight")
    assert(ob.isLeft && ob.swap.toOption.get.contains("relationship"),
      ob.toString)
    val mix = CypherLite.parse("MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN a, r.weight")
    assert(mix.isLeft && mix.swap.toOption.get.contains("whole matched"),
      mix.toString)
  }

  test("sum/avg/min/max(r.prop) aggregate edge properties — grouped " +
      "by r.prop keys, globally, and ORDER BY the alias") {
    // grouped: total weight per grade (missing weights drop from the
    // numeric lens; a grade group whose weights are all missing sums 0)
    val perGrade = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN r.grade AS grade, sum(r.weight) AS total " +
      "ORDER BY grade")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getAs[String]("grade"), r.getAs[Double]("total"))).toSeq
    assert(perGrade == Seq((null, 3.0), ("a", 5.0), ("b", 2.0)))
    // global form: every item an aggregate → one summary row
    val glob = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN sum(r.weight) AS s, min(r.weight) AS lo, " +
      "max(r.weight) AS hi, count(r) AS n")
      .fold(e => fail(e), identity).collect().head
    assert(glob.getAs[Double]("s") == 10.0)
    assert(glob.getAs[String]("lo") == "2") // min/max keep collation
    assert(glob.getAs[String]("hi") == "5")
    assert(glob.getAs[Long]("n") == 4L)
    // ORDER BY the aggregate alias (top weight groups first)
    val byTotal = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN r.grade AS grade, sum(r.weight) AS total " +
      "ORDER BY total DESC")
      .fold(e => fail(e), identity).collect()
      .map(_.getAs[Double]("total")).toSeq
    assert(byTotal == Seq(5.0, 3.0, 2.0))
    // hop-less form rejects it like the c-side aggregates
    val hopless = CypherLite.parse("MATCH (m:N) RETURN sum(r.weight)")
    assert(hopless.isLeft, hopless.toString)
    // collect([DISTINCT] r.prop): the sorted comma-joined list contract,
    // grouped and global; missing keys drop from the list
    val coll = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN a.name, collect(r.grade) ORDER BY a.name")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getAs[String]("m_name"), r.getAs[String]("collected")))
      .toSeq
    assert(coll == Seq(("n1", "a,a,b"), ("n2", "")))
    val cd = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "RETURN collect(DISTINCT r.grade)")
      .fold(e => fail(e), identity).collect().head.getString(0)
    assert(cd == "a,b")
  }

  test("WITH …, sum(r.prop) AS alias pipelines edge-property " +
      "aggregates through HAVING and top-k") {
    // per-root total weight, HAVING-filtered (n1's roads: 5+2 weighted
    // + one unweighted; only n1 clears 4)
    val hav = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "WITH a.name, sum(r.weight) AS total WHERE total > 4 " +
      "RETURN a.name, total")
      .fold(e => fail(e), identity).collect()
      .map(r => (r.getAs[String]("m_name"), r.getAs[Double]("total")))
      .toSeq
    assert(hav == Seq(("n1", 7.0)))
    // ORDER BY the alias (top roots by total weight)
    val topk = CypherLite.run(g, "MATCH (a:N)-[r:ROAD]->(b) " +
      "WITH a.name, sum(r.weight) AS total ORDER BY total DESC LIMIT 1 " +
      "RETURN a.name, total")
      .fold(e => fail(e), identity).collect()
      .map(_.getAs[String]("m_name")).toSeq
    assert(topk == Seq("n1"))
    // min/max aliases refuse the numeric HAVING, same as the c-side rule
    val mm = CypherLite.parse("MATCH (a:N)-[r:ROAD]->(b) " +
      "WITH a.name, max(r.weight) AS hi WHERE hi > 2 RETURN a.name, hi")
    assert(mm.isLeft && mm.swap.toOption.get.contains("count/sum/avg"),
      mm.toString)
  }

  test("ranged patterns and chains reject relationship property maps " +
      "and r-property WHERE with named errors") {
    def leftMsg(q: String): String =
      CypherLite.parse(q).swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH (a:N)-[r:ROAD*1..3 {grade: 'a'}]->(b) " +
      "RETURN b.name").contains("variable-length"))
    assert(leftMsg("MATCH (a:N)-[:ROAD*1..2 {grade: 'a'}]->(b) " +
      "RETURN b.name").contains("variable-length"))
    // chains now SUPPORT per-segment maps and conjunct r.prop WHERE
    // atoms on single-hop segments (r13, second wave) — filter-only,
    // compiled onto each segment's edge scan. 1→2 (grade a, w5) → 2→5
    // (w3): the first-segment map prunes 1→3/1→4 bindings.
    assert(names("MATCH (a:N)-[:ROAD {grade: 'a'}]->(b)-[:ROAD]->(c) " +
      "RETURN c.name") == Seq("n5"))
    assert(names("MATCH (a:N)-[r1:ROAD]->(b)-[r2:ROAD]->(c) " +
      "WHERE r1.weight >= 5 AND r2.weight >= 3 RETURN c.name")
      == Seq("n5"))
    // the per-edge filter stays conjunct-only — OR across it rejects
    assert(leftMsg("MATCH (a:N)-[r1:ROAD]->(b)-[r2:ROAD]->(c) " +
      "WHERE r1.weight >= 5 OR b.name = 'n2' RETURN c.name")
      .contains("conjuncts"))
    // var-length SEGMENTS keep rejecting per-edge talk by name
    assert(leftMsg("MATCH (a:N)-[:ROAD*1..2 {grade: 'a'}]->(b)" +
      "-[:ROAD]->(c)-[:ROAD]->(d) RETURN d.name")
      .contains("single-hop"))
    // projecting r.prop on a chain stays filter-only, by name
    assert(leftMsg("MATCH (a:N)-[r1:ROAD]->(b)-[:ROAD]->(c) " +
      "RETURN r1.weight").contains("FILTER-only"))
    // unsupported map value forms reject on chains too, never drop
    assert(leftMsg("MATCH (a:N)-[:ROAD {weight: 2}]->(b)-[:ROAD]->(c) " +
      "RETURN c.name").contains("unsupported value form"))
    // WHERE r.prop needs the bound variable
    assert(leftMsg("MATCH (a:N)-[:ROAD]->(b) WHERE r.weight > 2 " +
      "RETURN b.name").contains("WHERE may only reference"))
  }

  test("inline rel maps with unsupported VALUE forms are rejected by " +
      "name, never silently dropped (round-13 ADVICE)") {
    def leftMsg(q: String): String =
      CypherLite.parse(q).swap.getOrElse(fail(s"$q unexpectedly parsed"))
    // a numeric literal used to vanish (PropRe admits quoted strings
    // only) and the query returned UNFILTERED bindings
    assert(leftMsg("MATCH (a:N)-[r:ROAD {weight: 2}]->(b) RETURN b.name")
      .contains("quoted string values"))
    // $params are a write-surface feature; the read map must say so too
    assert(leftMsg("MATCH (a:N)-[r:ROAD {grade: $g}]->(b) RETURN b.name")
      .contains("quoted string values"))
    // a duplicate key collapses in the parsed map — reject, don't pick one
    assert(leftMsg("MATCH (a:N)-[r:ROAD {grade: 'a', grade: 'b'}]->(b) " +
      "RETURN b.name").contains("unique keys"))
    // mixed quoted + numeric: still rejected
    assert(leftMsg("MATCH (a:N)-[r:ROAD {grade: 'a', weight: 5}]->(b) " +
      "RETURN b.name").contains("quoted string values"))
    // the run() channel surfaces the same Left (no exception escapes)
    assert(CypherLite.run(g,
      "MATCH (a:N)-[r:ROAD {weight: 2}]->(b) RETURN b.name")
      .swap.exists(_.contains("quoted string values")))
  }

  test("count(DISTINCT r) is honored over the edge identity: equal to " +
      "count(r) under the store invariant, collapsed on a multigraph") {
    import spark.implicits._
    // store-invariant graph (unique (src,dst,relType)): the two forms
    // agree — the invariant that used to be silently assumed
    def one(q: String): Long =
      CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity)
        .collect().head.getLong(0)
    assert(one("MATCH (a:N)-[r:ROAD]->(b) RETURN count(r)") == 4L)
    assert(one("MATCH (a:N)-[r:ROAD]->(b) RETURN count(DISTINCT r)") == 4L)
    // hand-built multigraph: duplicate (1,2,ROAD) rows are the SAME
    // stored relationship bound twice — plain count sees both bindings,
    // DISTINCT collapses them
    val multi = GraphTables(
      (1L to 2L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1", Map("grade" -> "a")),
        EdgeRow(1L, 2L, "ROAD", "", "b1", Map("grade" -> "a"))).toDS())
    def oneOn(gx: GraphTables, q: String): Long =
      CypherLite.run(gx, q).fold(e => fail(s"$q → $e"), identity)
        .collect().head.getLong(0)
    assert(oneOn(multi, "MATCH (a:N)-[r:ROAD]->(b) RETURN count(r)") == 2L)
    assert(oneOn(multi,
      "MATCH (a:N)-[r:ROAD]->(b) RETURN count(DISTINCT r)") == 1L)
    // grouped (WITH) pipeline honors it the same way
    val grouped = CypherLite.run(multi, "MATCH (a:N)-[r:ROAD]->(b) " +
      "WITH a.name, count(DISTINCT r) AS n RETURN a.name, n")
      .fold(e => fail(e), identity).collect()
    assert(grouped.map(_.getAs[Long]("n")).toSeq == Seq(1L))
  }

  test("undirected count(DISTINCT r) collapses the two orientation " +
      "rows of each stored relationship to ONE (ADVICE r14: the " +
      "orientation-dependent tuple double-counted)") {
    import spark.implicits._
    def one(gx: GraphTables, q: String): Long =
      CypherLite.run(gx, q).fold(e => fail(s"$q → $e"), identity)
        .collect().head.getLong(0)
    // 4 stored ROAD edges: the undirected match binds each twice
    // (bag semantics — count(r) = 8), DISTINCT collapses to 4
    assert(one(g, "MATCH (a:N)-[r:ROAD]-(b) RETURN count(r)") == 8L)
    assert(one(g,
      "MATCH (a:N)-[r:ROAD]-(b) RETURN count(DISTINCT r)") == 4L)
    // reciprocal pair: a→b and b→a are TWO distinct stored
    // relationships — a (least, greatest, type) normalization would
    // wrongly collapse them; the stored-eid identity keeps both
    val recip = GraphTables(
      (1L to 2L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1", Map("grade" -> "a")),
        EdgeRow(2L, 1L, "ROAD", "", "b1", Map("grade" -> "b"))).toDS())
    assert(one(recip, "MATCH (a:N)-[r:ROAD]-(b) RETURN count(r)") == 4L)
    assert(one(recip,
      "MATCH (a:N)-[r:ROAD]-(b) RETURN count(DISTINCT r)") == 2L)
    // directed matches are unchanged by the identity swap
    assert(one(recip,
      "MATCH (a:N)-[r:ROAD]->(b) RETURN count(DISTINCT r)") == 2L)
    assert(one(recip,
      "MATCH (a:N)<-[r:ROAD]-(b) RETURN count(DISTINCT r)") == 2L)
  }
}
