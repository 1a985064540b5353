package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Cypher-subset surface must answer the reference's own flagship query
  * shapes (`first-graph.py:141,168`) against the ingested corpus.
  */
class CypherLiteSpec extends SparkSpec {

  lazy val g: GraphTables =
    XmlIngest.ingest(spark, GraphQueries.XmlGlob, "b1")

  test("match by label + property") {
    val df = CypherLite.run(g,
      "MATCH (m:Number {name: 'number'}) RETURN m").toOption.get
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("m_label") == "Number"))
  }

  test("3-hop expansion returns (m, connected) rows") {
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(connected) " +
        "RETURN m, connected").toOption.get
    // equals the library-level neighborhood op
    val direct = GraphOps.neighborhoodWhere(g,
      col("label") === "Boeing_Service_Bulletin", 3)
    assert(df.count() == direct.count())
    assert(df.columns.contains("c_name"))
  }

  test("LIMIT applies") {
    val df = CypherLite.run(g,
      "MATCH (m:Step) RETURN m LIMIT 2").toOption.get
    assert(df.count() == 2)
  }

  test("DETACH DELETE maps to batch drop") {
    val df = CypherLite.run(g,
      "MATCH (n) WHERE n.b1 = true DETACH DELETE n").toOption.get
    assert(df.count() == 0) // only batch was dropped -> empty graph summary
  }

  test("unsupported shapes are rejected, not misparsed") {
    assert(CypherLite.parse("CREATE (n:Foo)").isLeft)
    assert(CypherLite.parse(
      "MATCH (m:X)-[*1..3]->(c) RETURN").isLeft)
  }

  test("unknown property keys are rejected, not coerced to a name match") {
    val r = CypherLite.run(g, "MATCH (m:Subject {frobnitz: 'x'}) RETURN m")
    assert(r.isLeft, r.toString)
    assert(r.swap.toOption.get.contains("unsupported property: frobnitz"))
  }

  test("case-insensitive keywords and whitespace tolerance") {
    val df = CypherLite.run(g,
      "  match ( m :Subject )  return m  ").toOption.get
    assert(df.count() == 3)
  }

  test("relType-constrained hops prune the traversal, not just the output") {
    val typed = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY*1..2]->(connected) " +
        "RETURN m, connected").toOption.get.collect()
    assert(typed.nonEmpty)
    // depth 1 must be only SUMMARY children; depth 2 exists only if a
    // summary itself has a HAS_SUMMARY child (it doesn't in this corpus)
    assert(typed.filter(_.getAs[Int]("depth") == 1)
      .forall(_.getAs[String]("c_label") == "Summary"))
    assert(typed.forall(_.getAs[Int]("depth") == 1))
  }

  test("multi-type relationship alternation :A|B unions the typed traversals") {
    def rows(q: String): Set[(String, String, Int)] =
      CypherLite.run(g, q).fold(e => fail(e), identity)
        .select("m_name", "c_name", "depth").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val both = rows(
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY|HAS_HEADER*1..2]->(c)" +
        " RETURN m, c")
    val summary = rows(
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY*1..2]->(c) " +
        "RETURN m, c")
    val header = rows(
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_HEADER*1..2]->(c) " +
        "RETURN m, c")
    assert(summary.nonEmpty && header.nonEmpty)
    // depth 1 has no mixed-type paths, so the alternation IS the union
    // there; deeper, it may additionally reach mixed-type frontiers the
    // single-type runs cannot — superset, never less
    assert(both.filter(_._3 == 1) ==
      (summary ++ header).filter(_._3 == 1))
    assert((summary ++ header).subsetOf(both))
  }

  test("IS NULL / IS NOT NULL partition the nodes by content nullness") {
    val total = CypherLite.run(g, "MATCH (m) RETURN m").toOption.get.count()
    val isNull = CypherLite.run(g,
      "MATCH (m) WHERE m.content IS NULL RETURN m").toOption.get.count()
    val notNull = CypherLite.run(g,
      "MATCH (m) WHERE m.content IS NOT NULL RETURN m").toOption.get.count()
    assert(isNull + notNull == total)
    // and on the connected variable it filters bindings, parsing as onConn
    val conn = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "WHERE c.content IS NOT NULL RETURN m.docnbr, c.name")
    assert(conn.isRight, conn.toString)
  }

  test("AS aliases rename output columns without changing rows") {
    val aliased = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name AS step_name " +
        "ORDER BY step_name DESC LIMIT 3").fold(e => fail(e), identity)
    assert(aliased.columns.toSeq == Seq("step_name"))
    val canonical = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name ORDER BY m.name DESC LIMIT 3")
      .fold(e => fail(e), identity)
    assert(aliased.collect().map(_.getString(0)).toSeq ==
      canonical.collect().map(_.getString(0)).toSeq)
    // count alias + ORDER BY alias — the `ORDER BY cnt DESC` staple
    val counted = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr AS doc, count(c) AS cnt ORDER BY cnt DESC")
      .fold(e => fail(e), identity)
    assert(counted.columns.toSeq == Seq("doc", "cnt"))
    val counts = counted.collect().map(_.getAs[Long]("cnt")).toSeq
    assert(counts == counts.sorted.reverse && counts.nonEmpty)
  }

  test("alias misuse is rejected at parse time") {
    assert(CypherLite.run(g,
      "MATCH (m:Step) RETURN m AS whole").isLeft)
    assert(CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name AS a, m.docnbr AS a").isLeft)
    assert(CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name AS a, m.name AS b").isLeft)
    assert(CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name ORDER BY nope").isLeft)
  }

  test("property aggregates sum/avg/min/max over the connected bindings") {
    // names under a bulletin are tag names (non-numeric): sum is 0 by
    // Cypher's drop-non-numerics rule, min/max order by string collation
    val agg = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "RETURN m.docnbr, sum(c.name) AS total").fold(e => fail(e), identity)
    assert(agg.columns.toSeq == Seq("m_docnbr", "total"))
    assert(agg.collect().forall(_.getAs[Double]("total") == 0.0))
    val mx = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "RETURN m.docnbr, max(c.name)").fold(e => fail(e), identity)
    assert(mx.columns.toSeq == Seq("m_docnbr", "max_name"))
    val direct = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "RETURN m.docnbr, c.name").fold(e => fail(e), identity)
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).max }
    assert(mx.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap == direct)
    // aggregates of the matched variable stay rejected
    assert(CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, sum(m.name)").isLeft)
  }

  test("shortestPath returns min path lengths for every connected pair") {
    val sp = CypherLite.run(g,
      "MATCH p = shortestPath((a:Boeing_Service_Bulletin)-[*]->(b:Step)) " +
        "RETURN a.docnbr, b.name, length(p)").fold(e => fail(e), identity)
    assert(sp.columns.toSeq == Seq("a_docnbr", "b_name", "path_len"))
    // the unbounded form must agree with the bounded expansion's min
    // depths at a depth no path in this corpus exceeds
    val direct = GraphOps.neighborhoodWhere(g,
        col("label") === "Boeing_Service_Bulletin", 10)
      .filter(col("c_label") === "Step")
    assert(sp.count() == direct.count() && sp.count() > 0)
    assert(sp.agg(max("path_len")).collect().head.getInt(0) ==
      direct.agg(max("depth")).collect().head.getInt(0))
    // no range = single-hop paths only: steps are nested deeper, so none
    val oneHop = CypherLite.run(g,
      "MATCH p = shortestPath((a:Boeing_Service_Bulletin)-[]->(b:Step)) " +
        "RETURN a.docnbr, length(p)").fold(e => fail(e), identity)
    assert(oneHop.count() == 0)
  }

  test("shortestPath misuse is rejected at parse time") {
    assert(CypherLite.run(g, // shadowed path variable
      "MATCH a = shortestPath((a:X)-[*]->(b:Y)) RETURN length(a)").isLeft)
    assert(CypherLite.run(g, // length() of a non-path variable
      "MATCH p = shortestPath((a:X)-[*]->(b:Y)) RETURN length(a)").isLeft)
    assert(CypherLite.run(g, // ORDER BY length without projecting it
      "MATCH p = shortestPath((a:X)-[*]->(b:Y)) RETURN a.name " +
        "ORDER BY length(p)").isLeft)
  }

  test("incoming direction <-[]- binds exactly the transposed outgoing pairs") {
    val down = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "RETURN m.name, c.name").toOption.get
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // (child)<-[]-(parent:BSB): same bindings with the roles swapped
    val up = CypherLite.run(g,
      "MATCH (m)<-[*1..1]-(c:Boeing_Service_Bulletin) " +
        "RETURN m.name, c.name").toOption.get
      .collect().map(r => (r.getString(1), r.getString(0))).toSet
    assert(down.nonEmpty && down == up)
  }

  test("undirected -[]- unions both orientations; both arrows rejected") {
    def n(q: String): Long = CypherLite.run(g, q).toOption.get.count()
    val out = n("MATCH (m:Step)-[]->(c) RETURN m.name, c.name")
    val in = n("MATCH (m:Step)<-[]-(c) RETURN m.name, c.name")
    val both = n("MATCH (m:Step)-[]-(c) RETURN m.name, c.name")
    // the containment layer is a tree: no (m, c) pair is reachable in both
    // directions at one hop, so undirected = in + out exactly
    assert(in > 0 && out > 0 && both == in + out)
    assert(CypherLite.run(g, "MATCH (m:Step)<-[]->(c) RETURN m").isLeft)
  }

  test("type(r) census equals groupBy over the edge relation") {
    val df = CypherLite.run(g,
      "MATCH (m)-[r]->(c) RETURN type(r) AS t, count(*) AS cnt " +
        "ORDER BY count(*) DESC").toOption.get
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // an untyped hop follows the downward containment relation (HAS_*) —
    // the corpus ALSO materializes reverse/link edges (includes,
    // IS_PART_OF, …), which an untyped traversal deliberately skips
    val direct = g.edges.filter(col("relType").startsWith("HAS_"))
      .groupBy("relType").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(df.nonEmpty && df == direct)
  }

  test("count(r) equals count(c) on a single-hop pattern (no parallel edges)") {
    val viaR = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[r]->(c) " +
        "RETURN m.name, count(r) AS n ORDER BY m.name").toOption.get.collect()
    val viaC = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "RETURN m.name, count(c) AS n ORDER BY m.name").toOption.get.collect()
    assert(viaR.nonEmpty)
    assert(viaR.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      viaC.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("WHERE type(r) filters bindings like the typed pattern form") {
    val someType = g.edges.select("relType").distinct()
      .orderBy("relType").head().getString(0)
    val viaWhere = CypherLite.run(g,
      s"MATCH (m)-[r]->(c) WHERE type(r) = '$someType' " +
        "RETURN m.name, c.name").toOption.get
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val viaPattern = CypherLite.run(g,
      s"MATCH (m)-[:$someType]->(c) RETURN m.name, c.name").toOption.get
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaWhere.nonEmpty && viaWhere == viaPattern)
  }

  test("type(r) on an incoming pattern answers the TRUE edge type") {
    val in = CypherLite.run(g,
      "MATCH (m:Step)<-[r]-(c) RETURN DISTINCT type(r) AS t ORDER BY t")
      .toOption.get.collect().map(_.getString(0)).toSet
    // the reversed traversal must report the original relType values, not
    // invent reversed ones (untyped hops follow HAS_* containment only)
    val expected = g.edges.filter(col("relType").startsWith("HAS_"))
      .join(
        g.nodes.filter(col("label") === "Step").select(col("id").as("dst")),
        "dst")
      .select("relType").distinct().collect().map(_.getString(0)).toSet
    assert(in.nonEmpty && in == expected)
  }

  test("relationship-variable rejections are named errors") {
    // var-length + variable: type()/count() would silently misread a list
    val r1 = CypherLite.run(g, "MATCH (m)-[r*1..2]->(c) RETURN type(r)")
    assert(r1.isLeft && r1.swap.toOption.get.contains("variable-length"))
    // type() of a variable the pattern never bound
    assert(CypherLite.run(g,
      "MATCH (m)-[]->(c) RETURN type(r), count(*)").isLeft)
    // whole node + type(r) has nowhere to carry the binding column
    assert(CypherLite.run(g, "MATCH (m)-[r]->(c) RETURN m, type(r)").isLeft)
    // ORDER BY type(r) must be projected
    assert(CypherLite.run(g,
      "MATCH (m)-[r]->(c) RETURN m.name ORDER BY type(r)").isLeft)
  }

  test("an arrow-shaped string literal cannot flip the detected direction") {
    val df = CypherLite.run(g,
      "MATCH (m:Step)-[]->(c) WHERE c.name = '<-[x' RETURN m.name, c.name")
    assert(df.isRight, df.toString) // parsed as OUTGOING, not both-ways
    assert(df.toOption.get.count() == 0)
  }

  test("NOT prefix negates one comparison, with null-propagating semantics") {
    val all = CypherLite.run(g, "MATCH (m:Step) RETURN m")
      .toOption.get.count()
    val eq = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.docnbr = '737-00-1028' RETURN m")
      .toOption.get.count()
    val not = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT m.docnbr = '737-00-1028' RETURN m")
      .toOption.get.count()
    assert(eq > 0 && not > 0 && eq + not == all) // docnbr is never null here
    // double negation cancels
    val notNot = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT NOT m.docnbr = '737-00-1028' RETURN m")
      .toOption.get.count()
    assert(notNot == eq)
    // NOT over a numeric comparison of a NON-numeric property: the
    // comparison is null, NOT null stays null, the row still drops —
    // NOT must not resurrect null-comparison rows
    val numericNot = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT m.name > 5 RETURN m").toOption.get.count()
    assert(numericNot == 0)
  }

  test("WHERE comparisons filter the matched node") {
    val all = CypherLite.run(g, "MATCH (m:Step) RETURN m").toOption.get.count()
    val some = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.docnbr >= '737-00-1028' AND m.docnbr <> 'x' " +
        "RETURN m").toOption.get
    assert(some.count() > 0 && some.count() <= all)
    val none = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.docnbr < '0' RETURN m").toOption.get
    assert(none.count() == 0)
  }

  test("RETURN m, count(connected) aggregates the expansion per root") {
    val counted = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(connected) " +
        "RETURN m, count(connected)").toOption.get
    val rowTotal = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(connected) " +
        "RETURN m, connected").toOption.get.count()
    assert(counted.columns.toSeq == Seq("m_name", "n_connected"))
    val sums = counted.agg(sum("n_connected")).collect().head.getLong(0)
    assert(sums == rowTotal) // per-root counts partition the row form
  }

  test("count() of anything but the connected variable is rejected") {
    // count(m) mixed with a non-aggregate item: the global form demands
    // all-aggregate RETURN items
    val r = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN m, count(m)")
    assert(r.isLeft && r.swap.toOption.get.contains("global"), r.toString)
    val r2 = CypherLite.run(g, "MATCH (m:Step) RETURN m, count(c)")
    assert(r2.isLeft, r2.toString)
    // a variable bound nowhere in the pattern
    val r3 = CypherLite.run(g, "MATCH (m:Step) RETURN count(zzz)")
    assert(r3.isLeft && r3.swap.toOption.get.contains("count()"),
      r3.toString)
  }

  test("WHERE on an unknown property or foreign variable is rejected") {
    val r = CypherLite.run(g, "MATCH (m:Step) WHERE m.frob = 'x' RETURN m")
    assert(r.isLeft && r.swap.toOption.get.contains("unsupported property"))
    val r2 = CypherLite.run(g,
      "MATCH (m:Step) WHERE q.name = 'x' RETURN m")
    assert(r2.isLeft, r2.toString)
  }

  test("RETURN m.prop projects exactly the requested properties") {
    val df = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name, m.docnbr").toOption.get
    assert(df.columns.toSeq == Seq("m_name", "m_docnbr"))
    val full = CypherLite.run(g, "MATCH (m:Step) RETURN m").toOption.get
    assert(df.count() == full.count())
  }

  test("ORDER BY DESC with LIMIT picks the top of the requested order") {
    val top = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name ORDER BY m.name DESC LIMIT 3")
      .toOption.get.collect().map(_.getString(0)).toSeq
    val all = CypherLite.run(g, "MATCH (m:Step) RETURN m.name")
      .toOption.get.collect().map(_.getString(0)).toSeq
    assert(top == all.sorted.reverse.take(3))
  }

  test("ORDER BY on an unprojected property is rejected (not misapplied)") {
    val r = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name ORDER BY m.content LIMIT 2")
    assert(r.isLeft && r.swap.toOption.get.contains("ORDER BY"), r.toString)
  }

  test("OR in WHERE unions the branches; AND binds tighter than OR") {
    val both = CypherLite.run(g,
      "MATCH (m) WHERE m.name = 'number' OR m.name = 'title' RETURN m")
      .toOption.get
    val left = CypherLite.run(g,
      "MATCH (m) WHERE m.name = 'number' RETURN m").toOption.get.count()
    val right = CypherLite.run(g,
      "MATCH (m) WHERE m.name = 'title' RETURN m").toOption.get.count()
    assert(both.count() == left + right)
    // A OR B AND C must parse as A OR (B AND C): the AND-group is
    // self-contradictory, so the result is exactly branch A
    val prec = CypherLite.run(g,
      "MATCH (m) WHERE m.name = 'number' OR m.name = 'title' " +
        "AND m.name = 'nope' RETURN m").toOption.get
    assert(prec.count() == left)
  }

  test("RETURN m.prop with a hop pattern projects the prop AND requires " +
      "the pattern to match") {
    val projected = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) RETURN m.docnbr")
      .toOption.get
    assert(projected.columns.toSeq == Seq("m_docnbr"))
    // existence semantics: only roots with ≥1 reachable node are matches —
    // a Step with no outgoing HAS_ edges must NOT appear
    val roots = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.docnbr").toOption.get.count()
    val withChild = GraphOps.neighborhoodWhereKeyed(
        g, col("label") === "Step", 1)
      .select("root_id").distinct().count()
    val allSteps = CypherLite.run(g, "MATCH (m:Step) RETURN m")
      .toOption.get.count()
    assert(roots == withChild && roots < allSteps,
      s"roots=$roots withChild=$withChild allSteps=$allSteps")
  }

  test("RETURN m.prop, count(connected) groups by the requested property") {
    // grouping by the shared label collapses every root into one group
    // whose count is the total row-form expansion — Cypher's grouping rule
    val grouped = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(connected) " +
        "RETURN m.label, count(connected)").toOption.get.collect()
    val rowTotal = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(connected) " +
        "RETURN m, connected").toOption.get.count()
    assert(grouped.map(_.getAs[Long]("n_connected")).sum == rowTotal)
    assert(grouped.forall(_.getAs[String]("m_label")
      == "Boeing_Service_Bulletin"))
  }

  test("RETURN m.prop, connected carries the requested root property") {
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(connected) " +
        "RETURN m.docnbr, connected").toOption.get
    assert(df.columns.toSeq ==
      Seq("m_docnbr", "depth", "c_label", "c_name", "c_content"))
    assert(df.count() == CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(connected) " +
        "RETURN m, connected").toOption.get.count())
  }

  test("bare count(connected) is the global binding count") {
    val rows = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN count(c)")
      .fold(e => fail(e), identity).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_connected") ==
      GraphOps.neighborhoodWhereKeyed(g, col("label") === "Step", 1).count())
  }

  test("WHERE on the connected node filters bindings with existence " +
      "semantics for RETURN m") {
    // only bulletins with ≥1 Summary child within 2 hops survive
    val withSummary = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label = 'Summary' RETURN m.docnbr").toOption.get
    val direct = GraphOps.neighborhoodWhereKeyed(g,
        col("label") === "Boeing_Service_Bulletin", 2)
      .filter(col("c_label") === "Summary")
      .select("root_id").distinct().count()
    assert(withSummary.count() == direct && direct > 0)
    // an impossible connected filter prunes every root
    val none = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label = 'NoSuchLabel' RETURN m.docnbr").toOption.get
    assert(none.count() == 0)
  }

  test("RETURN m.prop, c.prop projects one row per surviving binding") {
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label = 'Summary' RETURN m.docnbr, c.content")
      .toOption.get
    assert(df.columns.toSeq == Seq("m_docnbr", "c_content"))
    val direct = GraphOps.neighborhoodWhereKeyed(g,
        col("label") === "Boeing_Service_Bulletin", 2)
      .filter(col("c_label") === "Summary").count()
    assert(df.count() == direct && direct > 0)
  }

  test("count(c) under a connected WHERE counts only matching bindings") {
    val counted = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(c) " +
        "WHERE c.label = 'Step' RETURN m.docnbr, count(c)").toOption.get
    val rowTotal = GraphOps.neighborhoodWhereKeyed(g,
        col("label") === "Boeing_Service_Bulletin", 3)
      .filter(col("c_label") === "Step").count()
    assert(counted.agg(sum("n_connected")).collect().head.getLong(0)
      == rowTotal && rowTotal > 0)
  }

  test("m-cond OR c-cond keeps roots where EITHER side matches") {
    // the m-branch alone matches every bulletin, so a root whose connected
    // filter fails must still survive via the m branch — the OR cannot be
    // split into a root filter AND a binding filter
    val either = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "WHERE m.docnbr >= '0' OR c.label = 'NoSuchLabel' RETURN m.docnbr")
      .toOption.get.count()
    val all = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) RETURN m.docnbr")
      .toOption.get.count()
    assert(either == all && all > 0)
  }

  test("connected references without a hop pattern are rejected") {
    val r = CypherLite.run(g,
      "MATCH (m:Step) WHERE c.name = 'x' RETURN m")
    assert(r.isLeft, r.toString)
    val r2 = CypherLite.parse("MATCH (m:Step) RETURN m.name, c.content")
    assert(r2.isLeft, r2.toString)
  }

  test("unsupported connected-node properties are rejected") {
    val r = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) WHERE c.docnbr = 'x' RETURN m")
    assert(r.isLeft &&
      r.swap.toOption.get.contains("connected-node property"), r.toString)
  }

  test("(c:Label) pattern sugar equals the c.label comparison") {
    val sugar = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c:Summary) " +
        "RETURN m.docnbr").toOption.get.collect().toSeq
    val spelled = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label = 'Summary' RETURN m.docnbr")
      .toOption.get.collect().toSeq
    assert(sugar == spelled && sugar.nonEmpty)
  }

  test("(c:Label) sugar AND-distributes into every WHERE OR-group") {
    // the c.name branch alone matches nothing, so only bindings satisfying
    // (name-cond AND label) OR (docnbr-cond AND label) survive — if the
    // sugar attached to just one OR-group, the unlabeled branch would leak
    // non-Summary bindings into the count
    val sugared = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c:Summary) " +
        "WHERE c.name = 'zzz_no_such' OR m.docnbr >= '0' " +
        "RETURN m.docnbr, count(c)").toOption.get.collect().toSeq
    // the same DNF spelled through the parser's AND/OR precedence
    // (AND binds tighter): (name AND label) OR (docnbr AND label)
    val spelled = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.name = 'zzz_no_such' AND c.label = 'Summary' " +
        "OR m.docnbr >= '0' AND c.label = 'Summary' " +
        "RETURN m.docnbr, count(c)").toOption.get.collect().toSeq
    assert(sugared == spelled && sugared.nonEmpty)
  }

  test("ORDER BY count(c) sorts groups by the aggregate") {
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(c) " +
        "RETURN m.docnbr, count(c) ORDER BY count(c) DESC LIMIT 2")
      .toOption.get
    val counts = df.collect().map(_.getAs[Long]("n_connected")).toSeq
    assert(counts.length == 2 && counts == counts.sorted.reverse)
    // the top group really is the max over ALL groups, not just the limit
    val all = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(c) " +
        "RETURN m.docnbr, count(c)").toOption.get
      .collect().map(_.getAs[Long]("n_connected")).max
    assert(counts.head == all)
  }

  test("ORDER BY count of the wrong variable or without RETURN count " +
      "is rejected") {
    val r = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, count(c) ORDER BY count(x)")
    assert(r.isLeft, r.toString)
    val r2 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name ORDER BY count(c)")
    assert(r2.isLeft &&
      r2.swap.toOption.get.contains("requires count(connected)"), r2.toString)
  }

  test("RETURN m alongside c.prop is rejected, not silently dropped") {
    val r = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN m, c.content")
    assert(r.isLeft &&
      r.swap.toOption.get.contains("whole matched node"), r.toString)
  }

  test("string predicates match case-insensitively on the keyword") {
    val a = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.name starts with 'ste' RETURN m.name")
      .fold(e => fail(e), identity).collect().toSeq
    val b = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.name STARTS WITH 'ste' RETURN m.name")
      .fold(e => fail(e), identity).collect().toSeq
    assert(a == b)
    // ENDS WITH compiles too (may be empty on this corpus — parse is the
    // point; the oracle twin covers value correctness)
    assert(CypherLite.parse(
      "MATCH (m:Step) WHERE m.name ENDS WITH 'x' RETURN m").isRight)
  }

  test("SKIP without ORDER BY is rejected (unordered pagination)") {
    val r = CypherLite.parse("MATCH (m:Step) RETURN m.name SKIP 5 LIMIT 10")
    assert(r.isLeft && r.swap.toOption.get.contains("SKIP"), r.toString)
    assert(CypherLite.parse(
      "MATCH (m:Step) RETURN m.name ORDER BY m.name SKIP 5 LIMIT 10").isRight)
  }

  test("OPTIONAL MATCH keeps every root, with null connected columns " +
      "when the pattern finds nothing") {
    // Steps mostly have no outgoing HAS_ edges — the inner form prunes
    // them, the optional form must keep them with nulls
    val optional = CypherLite.run(g,
      "MATCH (m:Step) OPTIONAL MATCH (m)-[*1..1]->(c) " +
        "RETURN m.name, c.name").fold(e => fail(e), identity)
    val allSteps = CypherLite.run(g, "MATCH (m:Step) RETURN m")
      .toOption.get.count()
    val inner = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, c.name")
      .toOption.get.count()
    val matchedRoots = GraphOps.neighborhoodWhereKeyed(
        g, col("label") === "Step", 1)
      .select("root_id").distinct().count()
    assert(optional.count() == inner + (allSteps - matchedRoots))
    val nullRows = optional.filter(col("c_name").isNull).count()
    assert(nullRows == allSteps - matchedRoots && nullRows > 0)
  }

  test("WHERE under OPTIONAL MATCH filters bindings, never roots") {
    // an impossible connected filter: the inner form returns 0 roots, the
    // optional form returns EVERY root, all with null connected columns
    val optional = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH (m)-[*1..2]->(c) " +
        "WHERE c.label = 'NoSuchLabel' RETURN m.docnbr, c.name")
      .fold(e => fail(e), identity)
    val allRoots = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) RETURN m").toOption.get.count()
    assert(optional.count() == allRoots && allRoots > 0)
    assert(optional.filter(col("c_name").isNotNull).count() == 0)
  }

  test("count(c) under OPTIONAL MATCH answers 0 for unmatched roots") {
    // impossible binding filter: every root still groups (left join), each
    // counting 0 surviving bindings — the inner form would return no rows
    val counted = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH (m)-[*1..2]->(c) " +
        "WHERE c.label = 'NoSuchLabel' RETURN m.docnbr, count(c)")
      .fold(e => fail(e), identity)
    val allRoots = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) RETURN m").toOption.get.count()
    assert(counted.count() == allRoots && allRoots > 0)
    assert(counted.filter(col("n_connected") =!= 0).count() == 0)
    // and with a satisfiable pattern the per-group counts match the inner
    // aggregate where it HAS bindings
    val opt = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH (m)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c)").fold(e => fail(e), identity)
    val inner = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c)").fold(e => fail(e), identity)
    val optRows = opt.collect().map(r =>
      r.getAs[String]("m_docnbr") -> r.getAs[Long]("n_connected")).toMap
    val innerRows = inner.collect().map(r =>
      r.getAs[String]("m_docnbr") -> r.getAs[Long]("n_connected")).toMap
    // groups with bindings agree exactly; optional adds only zero-groups
    assert(innerRows.forall { case (k, v) => optRows.get(k).contains(v) })
    assert((optRows.keySet -- innerRows.keySet)
      .forall(k => optRows(k) == 0L))
  }

  test("OPTIONAL MATCH re-anchoring a foreign variable is rejected") {
    val r = CypherLite.parse(
      "MATCH (m:Step) OPTIONAL MATCH (q)-[*1..1]->(c) RETURN m.name, c.name")
    assert(r.isLeft && r.swap.toOption.get.contains("re-anchor"), r.toString)
  }

  test("RETURN DISTINCT dedupes the projected rows") {
    val bag = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) RETURN c.label")
      .fold(e => fail(e), identity)
    val set = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN DISTINCT c.label").fold(e => fail(e), identity)
    assert(set.count() < bag.count() && set.count() > 0)
    assert(set.count() == bag.distinct().count())
  }

  test("count(DISTINCT c) counts nodes, not bindings") {
    // two bulletin roots share subtree labels but not nodes; grouping by
    // the shared label makes bindings exceed distinct nodes exactly when
    // two roots reach the same node — on this corpus roots are disjoint
    // subtrees, so distinct == plain count per root but the DISTINCT form
    // must still parse and aggregate by node identity
    val distinctCnt = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(DISTINCT c)").fold(e => fail(e), identity)
    val plainCnt = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c)").fold(e => fail(e), identity)
    assert(distinctCnt.collect().toSeq == plainCnt.collect().toSeq)
    // the node-identity semantics (bindings > distinct nodes) is proven
    // relationally by the graphp_cypher_count_distinct oracle twin (15
    // clique bindings, 10 distinct targets)
  }

  // three nodes whose names sort differently as strings and as numbers
  // ("10" < "9" lexicographically) plus one non-numeric name — the fixture
  // that tells a numeric comparison from a string comparison
  lazy val numG: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(NodeRow(1, "Doc", "10", "", "", "b", Nil),
        NodeRow(2, "Doc", "9", "", "", "b", Nil),
        NodeRow(3, "Doc", "ALPHA", "", "", "b", Nil)).toDS(),
      Seq.empty[EdgeRow].toDS())
  }

  test("an unquoted literal compares numerically, not lexicographically") {
    val above = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name > 9.5 RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSeq
    assert(above == Seq("10")) // string compare would answer "ALPHA", "9"
    val below = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name < 9.5 RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSeq
    // the non-numeric name casts to null and drops — Cypher's
    // string-vs-number comparison is null, same observable behavior
    assert(below == Seq("9"))
    val eq = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name = 10 RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSeq
    assert(eq == Seq("10"))
  }

  test("string predicates over a numeric literal are a type error") {
    val r = CypherLite.parse(
      "MATCH (m:Doc) WHERE m.name STARTS WITH 5 RETURN m")
    assert(r.isLeft &&
      r.swap.toOption.get.contains("quoted string literal"), r.toString)
  }

  test("a hop pattern without a range is the single-hop form *1..1") {
    val bare = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY]->(c) " +
        "RETURN m.docnbr, c.content").fold(e => fail(e), identity)
    val ranged = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY*1..1]->(c) " +
        "RETURN m.docnbr, c.content").fold(e => fail(e), identity)
    assert(bare.collect().toSeq == ranged.collect().toSeq)
    assert(bare.count() > 0)
  }

  test("WHERE NOT (m)-[...]->() keeps exactly the roots with no match") {
    // Steps mostly have no outgoing HAS_ edges: positive + negative
    // existence must partition the Step roots
    val without = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT (m)-[]->() RETURN m.name")
      .fold(e => fail(e), identity).count()
    val withEdge = CypherLite.run(g,
      "MATCH (m:Step) WHERE (m)-[]->() RETURN m.name")
      .fold(e => fail(e), identity).count()
    val allSteps = CypherLite.run(g, "MATCH (m:Step) RETURN m")
      .toOption.get.count()
    val matchedRoots = GraphOps.neighborhoodWhereKeyed(
        g, col("label") === "Step", 1)
      .select("root_id").distinct().count()
    assert(withEdge == matchedRoots && withEdge > 0)
    assert(without == allSteps - matchedRoots && without > 0)
  }

  test("existence predicate honors the target label and hop range") {
    val viaExists = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) WHERE (m)-[*1..2]->(:Summary) " +
        "RETURN m.docnbr").fold(e => fail(e), identity).collect().toSeq
    // must equal the bound-pattern existence form (hop + connected WHERE)
    val viaPattern = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label = 'Summary' RETURN m.docnbr")
      .fold(e => fail(e), identity).collect().toSeq
    assert(viaExists == viaPattern && viaExists.nonEmpty)
    // NOT form is the complement within the label's roots
    val not = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) WHERE NOT (m)-[*1..2]->(:Summary) " +
        "RETURN m.docnbr").fold(e => fail(e), identity).count()
    val all = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) RETURN m").toOption.get.count()
    assert(not == all - viaExists.size)
  }

  test("existence predicate with a MATCH hop pattern or foreign anchor " +
      "is rejected") {
    val r = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WHERE NOT (m)-[]->() RETURN m.name")
    assert(r.isLeft &&
      r.swap.toOption.get.contains("cannot be combined"), r.toString)
    val r2 = CypherLite.parse(
      "MATCH (m:Step) WHERE NOT (q)-[]->() RETURN m.name")
    assert(r2.isLeft && r2.swap.toOption.get.contains("anchor"), r2.toString)
  }

  test("collect(c.prop) gathers the bindings sorted per root group") {
    val collected = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, collect(c.label)").fold(e => fail(e), identity)
    assert(collected.columns.toSeq == Seq("m_docnbr", "collected"))
    val expected = GraphOps.neighborhoodWhereKeyed(g,
        col("label") === "Boeing_Service_Bulletin", 2)
      .join(g.nodes.toDF().select(col("id").as("root_id"),
        col("docnbr").as("m_docnbr")), "root_id")
      .groupBy("m_docnbr")
      .agg(array_join(array_sort(collect_list(col("c_label"))), ",")
        .as("collected"))
      .orderBy("m_docnbr")
    assert(collected.collect().toSeq == expected.collect().toSeq)
    assert(collected.count() > 0)
  }

  test("collect(DISTINCT c.prop) dedupes values; zero bindings collect " +
      "to the empty string under OPTIONAL MATCH") {
    val distinctLabels = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, collect(DISTINCT c.label)")
      .fold(e => fail(e), identity).collect()
    distinctLabels.foreach { r =>
      val parts = r.getAs[String]("collected").split(",").toSeq
      assert(parts == parts.distinct && parts == parts.sorted)
    }
    // impossible binding filter under OPTIONAL: every root collects []
    val empty = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH (m)-[*1..2]->(c) " +
        "WHERE c.label = 'NoSuchLabel' RETURN m.docnbr, collect(c.name)")
      .fold(e => fail(e), identity)
    val allRoots = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) RETURN m").toOption.get.count()
    assert(empty.count() == allRoots)
    assert(empty.filter(col("collected") =!= "").count() == 0)
  }

  test("collect of a whole node, without grouping, or alongside count " +
      "is rejected") {
    val r = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, collect(c)")
    assert(r.isLeft &&
      r.swap.toOption.get.contains("project a property"), r.toString)
    // bare collect(c.name) is now the GLOBAL list — one row, all bindings
    val r2 = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN collect(c.name)")
      .fold(e => fail(e), identity).collect()
    assert(r2.length == 1)
    val expected = GraphOps
      .neighborhoodWhereKeyed(g, col("label") === "Step", 1)
      .select("c_name").collect().map(_.getString(0)).sorted.mkString(",")
    assert(r2.head.getAs[String]("collected") == expected)
    // several aggregates now combine in one grouped query
    val multi = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, count(c), collect(c.name)")
      .fold(e => fail(e), identity)
    assert(multi.columns.toSeq == Seq("m_name", "n_connected", "collected"),
      multi.columns.toSeq.toString)
  }

  test("connected property-map sugar equals the WHERE equality form") {
    val viaMap = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c {label: 'Summary'}) " +
        "RETURN m.docnbr").fold(e => fail(e), identity).collect().toSeq
    val viaWhere = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label = 'Summary' RETURN m.docnbr")
      .fold(e => fail(e), identity).collect().toSeq
    assert(viaMap == viaWhere && viaMap.nonEmpty)
  }

  test("WITH … WHERE filters groups by the aggregate (HAVING)") {
    val plain = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c)").fold(e => fail(e), identity)
      .collect().map(r =>
        r.getAs[String]("m_docnbr") -> r.getAs[Long]("n_connected")).toMap
    // a threshold that genuinely splits the groups
    val counts = plain.values.toSeq.sorted
    val k = counts(counts.size / 2).max(counts.head + 1)
    assert(plain.values.exists(_ < k) && plain.values.exists(_ >= k))
    val having = CypherLite.run(g,
      s"MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        s"WITH m, count(c) AS n WHERE n >= $k RETURN m.docnbr, n")
      .fold(e => fail(e), identity)
    assert(having.columns.toSeq == Seq("m_docnbr", "n"))
    val got = having.collect().map(r =>
      r.getAs[String]("m_docnbr") -> r.getAs[Long]("n")).toMap
    assert(got == plain.filter(_._2 >= k))
    // property grouping (WITH m.docnbr) equals identity grouping here:
    // docnbr is unique per root on this corpus
    val viaProp = CypherLite.run(g,
      s"MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        s"WITH m.docnbr, count(c) AS n WHERE n >= $k RETURN m.docnbr, n")
      .fold(e => fail(e), identity).collect().map(r =>
        r.getAs[String]("m_docnbr") -> r.getAs[Long]("n")).toMap
    assert(viaProp == got)
  }

  test("WITH pipeline: ORDER BY the alias, LIMIT keeps the top group") {
    val plain = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c)").fold(e => fail(e), identity)
      .collect().map(r =>
        r.getAs[String]("m_docnbr") -> r.getAs[Long]("n_connected")).toMap
    val top = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WITH m, count(c) AS n WHERE n >= 0 RETURN m.docnbr, n " +
        "ORDER BY n DESC LIMIT 1").fold(e => fail(e), identity).collect()
    assert(top.length == 1)
    assert(top.head.getAs[Long]("n") == plain.values.max)
  }

  test("a STARTS WITH comparison inside a WITH query is not mistaken " +
      "for the clause keyword") {
    val viaWith = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label STARTS WITH 'S' " +
        "WITH m, count(c) AS n WHERE n >= 1 RETURN m.docnbr, n")
      .fold(e => fail(e), identity).collect().map(r =>
        r.getAs[String]("m_docnbr") -> r.getAs[Long]("n")).toMap
    val inner = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.label STARTS WITH 'S' RETURN m.docnbr, count(c)")
      .fold(e => fail(e), identity).collect().map(r =>
        r.getAs[String]("m_docnbr") -> r.getAs[Long]("n_connected")).toMap
    assert(viaWith == inner.filter(_._2 >= 1) && viaWith.nonEmpty)
  }

  test("malformed WITH pipelines are rejected with named errors") {
    // the HAVING filter may only reference the aggregate alias
    val r1 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n " +
        "WHERE x >= 2 RETURN m.name, n")
    assert(r1.isLeft && r1.swap.toOption.get.contains("alias"), r1.toString)
    // RETURN must carry the alias through
    val r2 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n " +
        "WHERE n >= 2 RETURN m.name")
    assert(r2.isLeft && r2.swap.toOption.get.contains("exactly once"),
      r2.toString)
    // non-identity grouping must project exactly the grouped properties
    val r3 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m.name, count(c) AS n " +
        "RETURN m.label, n")
    assert(r3.isLeft && r3.swap.toOption.get.contains("grouping"),
      r3.toString)
    // the count must aggregate the bound connected variable
    val r4 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(q) AS n RETURN m.name, n")
    assert(r4.isLeft && r4.swap.toOption.get.contains("connected"),
      r4.toString)
    // WITH without a hop pattern has nothing to aggregate
    val r5 = CypherLite.parse(
      "MATCH (m:Step) WITH m, count(c) AS n RETURN m.name, n")
    assert(r5.isLeft && r5.swap.toOption.get.contains("hop pattern"),
      r5.toString)
  }

  test("multi-aggregate WITH: several aggregates in one grouped pass, " +
      "RETURN order routes each alias to its own column") {
    // ground truth from the established multi-aggregate RETURN path
    val plain = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c), min(c.name), count(DISTINCT c.label)")
      .fold(e => fail(e), identity).collect().map(r =>
        r.getAs[String]("m_docnbr") ->
          ((r.getAs[Long]("n_connected"), r.getAs[String]("min_name"),
            r.getAs[Long]("n_label")))).toMap
    // same aggregates through the WITH pipeline, RETURN order ≠ WITH
    // order — each alias must still land on its own aggregate
    val viaWith = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WITH m, count(c) AS n, min(c.name) AS lo, " +
        "count(DISTINCT c.label) AS kinds WHERE n >= 0 " +
        "RETURN m.docnbr, kinds, n, lo").fold(e => fail(e), identity)
    assert(viaWith.columns.toSeq == Seq("m_docnbr", "kinds", "n", "lo"))
    val got = viaWith.collect().map(r =>
      r.getAs[String]("m_docnbr") ->
        ((r.getAs[Long]("n"), r.getAs[String]("lo"),
          r.getAs[Long]("kinds")))).toMap
    assert(got == plain && got.nonEmpty)
  }

  test("multi-aggregate WITH: HAVING filters the NAMED alias and " +
      "ORDER BY keys any alias, not the first aggregate by default") {
    val plain = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c), count(DISTINCT c.label)")
      .fold(e => fail(e), identity).collect().map(r =>
        r.getAs[String]("m_docnbr") ->
          ((r.getAs[Long]("n_connected"), r.getAs[Long]("n_label")))).toMap
    val counts = plain.values.map(_._1).toSeq.sorted
    val k = counts(counts.size / 2).max(counts.head + 1)
    assert(plain.values.exists(_._1 < k) && plain.values.exists(_._1 >= k))
    // HAVING on the SECOND declared alias; ORDER BY on it too
    val rows = CypherLite.run(g,
      s"MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        s"WITH m, count(DISTINCT c.label) AS kinds, count(c) AS n " +
        s"WHERE n >= $k RETURN m.docnbr, kinds, n " +
        s"ORDER BY n DESC, m.docnbr").fold(e => fail(e), identity)
      .collect()
    val got = rows.map(r => r.getAs[String]("m_docnbr") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("kinds")))).toMap
    assert(got == plain.filter(_._2._1 >= k) && got.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).toSeq ==
      rows.map(_.getAs[Long]("n")).toSeq.sortBy(-_))
  }

  test("WITH-stage ORDER BY + LIMIT ≡ the post-RETURN spelling; both at " +
      "once is rejected") {
    val post = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WITH m, count(c) AS n WHERE n >= 0 RETURN m.docnbr, n " +
        "ORDER BY n DESC LIMIT 2").fold(e => fail(e), identity).collect()
    val atWith = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WITH m, count(c) AS n WHERE n >= 0 ORDER BY n DESC LIMIT 2 " +
        "RETURN m.docnbr, n").fold(e => fail(e), identity).collect()
    assert(atWith.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      post.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(atWith.nonEmpty)
    val both = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n " +
        "ORDER BY n DESC RETURN m.name, n ORDER BY n")
    assert(both.isLeft && both.swap.toOption.get.contains("not both"),
      both.toString)
  }

  // degree staircase t1..t4 with 5/4/3/2 children — unique counts, so
  // every ORDER BY n is a total order and limit/skip/filter boundaries
  // are deterministic
  private lazy val stair: GraphTables = {
    import spark.implicits._
    val kids = (1 to 4).flatMap(i => (1 to (6 - i)).map(j =>
      NodeRow(100L * i + j, "Kid", s"k$i-$j", "", "", "base", Seq.empty)))
    GraphTables(
      ((1 to 4).map(i =>
        NodeRow(i.toLong, "T", s"t$i", "", "", "base", Seq.empty)) ++ kids)
        .toDS(),
      (1 to 4).flatMap(i => (1 to (6 - i)).map(j =>
        EdgeRow(i.toLong, 100L * i + j, "HAS_KID", "", "base"))).toDS())
  }

  test("WITH-stage LIMIT then RETURN SKIP is Cypher's limit-then-skip " +
      "(ranks S+1..L), not skip-then-limit") {
    // top-3 by count = t1(5), t2(4), t3(3); SKIP 2 of those → [(t3, 3)]
    val rows = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) " +
        "WITH m, count(c) AS n ORDER BY n DESC LIMIT 3 " +
        "RETURN m.name, n SKIP 2").fold(e => fail(e), identity).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t3", 3L)))
  }

  test("openCypher subclause order: WHERE after the WITH ORDER BY/LIMIT " +
      "parses, and filters AFTER the limit") {
    // no LIMIT → position is immaterial: both spellings agree
    val pre = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n WHERE n >= 3 " +
        "ORDER BY n DESC RETURN m.name, n")
      .fold(e => fail(e), identity).collect()
    val post = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n ORDER BY n DESC " +
        "WHERE n >= 3 RETURN m.name, n")
      .fold(e => fail(e), identity).collect()
    assert(post.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      pre.map(r => (r.getString(0), r.getLong(1))).toSeq)
    assert(post.map(_.getString(0)).toSeq == Seq("t1", "t2", "t3"))

    // WITH a LIMIT the positions diverge (Neo4j runs ORDER BY/LIMIT first,
    // WHERE on the limited rows): ASC LIMIT 2 keeps [(t4,2),(t3,3)], then
    // n >= 3 keeps only t3 — the pre-WHERE spelling would answer [t3, t2]
    val lim = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n ORDER BY n ASC " +
        "LIMIT 2 WHERE n >= 3 RETURN m.name, n")
      .fold(e => fail(e), identity).collect()
    assert(lim.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t3", 3L)))
    val preLim = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n WHERE n >= 3 " +
        "ORDER BY n ASC LIMIT 2 RETURN m.name, n")
      .fold(e => fail(e), identity).collect()
    assert(preLim.map(_.getString(0)).toSeq == Seq("t3", "t2"))

    // one WHERE per stage — both positions at once is ambiguous
    val both = CypherLite.parse(
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n WHERE n >= 1 " +
        "ORDER BY n DESC WHERE n >= 2 RETURN m.name, n")
    assert(both.isLeft && both.swap.toOption.get.contains("one WHERE"),
      both.toString)
    // SKIP after a post-LIMIT WHERE would interleave limit→filter→skip —
    // rejected, not silently reordered
    val skp = CypherLite.parse(
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n ORDER BY n DESC " +
        "LIMIT 3 WHERE n >= 3 RETURN m.name, n SKIP 1")
    assert(skp.isLeft && skp.swap.toOption.get.contains("SKIP"),
      skp.toString)
  }

  test("chained WITH stages: aggregate → re-aggregate (histogram), " +
      "re-filter between stages, three stages, global final aggregate") {
    // counts 5/4/3/2 are unique → histogram is four (n, 1) rows
    val hist = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH n, count(*) AS groups RETURN n, groups ORDER BY n")
      .fold(e => fail(e), identity).collect()
    assert(hist.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)))

    // filter in stage 1 (n >= 3 keeps 5,4,3), projection stage re-filters
    // (n <= 4 keeps 4,3), global aggregate sums
    val total = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n WHERE n >= 3 " +
        "WITH n WHERE n <= 4 WITH sum(n) AS total RETURN total")
      .fold(e => fail(e), identity).collect()
    assert(total.map(_.getLong(0)).toSeq == Seq(7L))

    // property grouping in stage 1, AS rename + ORDER BY the rename
    val top = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m.name, count(c) AS n " +
        "WITH n, count(*) AS groups WHERE groups >= 1 " +
        "RETURN n AS kid_count, groups ORDER BY kid_count DESC LIMIT 2")
      .fold(e => fail(e), identity).collect()
    assert(top.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((5L, 1L), (4L, 1L)))
    assert(top.headOption.map(_.schema.fieldNames.toSeq)
      .contains(Seq("kid_count", "groups")))

    // a mid-chain LIMIT caps what the next stage aggregates: the two
    // smallest counts (2, 3) survive into the sum
    val lim = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "ORDER BY n ASC LIMIT 2 WITH sum(n) AS total RETURN total")
      .fold(e => fail(e), identity).collect()
    assert(lim.map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("implicit aggregate in the RETURN after WITH = the explicit " +
      "second stage; WITH DISTINCT dedupes a projection stage") {
    // `RETURN n, count(*) AS groups` re-aggregates per Cypher's grouping
    // rule (non-aggregate items are the keys)
    val hist = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "RETURN n, count(*) AS groups ORDER BY n")
      .fold(e => fail(e), identity).collect()
    assert(hist.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L)))

    // global form: every RETURN item aggregates → one summary row
    val tot = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n WHERE n >= 3 " +
        "RETURN sum(n) AS total, count(*) AS grp")
      .fold(e => fail(e), identity).collect()
    assert(tot.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((12L, 3L)))

    // WITH DISTINCT on a projection stage (counts 5/4/3/2 are unique
    // here, so distinct keeps 4 rows and the closing count answers 4)
    val dc = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH DISTINCT n WITH count(*) AS dc RETURN dc")
      .fold(e => fail(e), identity).collect()
    assert(dc.map(_.getLong(0)).toSeq == Seq(4L))

    // rejections: un-aliased RETURN aggregate; DISTINCT + aggregate
    val noAs = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "RETURN n, count(*)")
    assert(noAs.isLeft && noAs.swap.toOption.get.contains("alias"),
      noAs.toString)
    val da = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH DISTINCT n, count(*) AS g RETURN n, g")
    assert(da.isLeft && da.swap.toOption.get.contains("DISTINCT"),
      da.toString)
  }

  test("WITH DISTINCT on the FIRST stage is the aggregate-free dedup " +
      "(r15): m-side, conn-side, alias plumbing, ORDER BY/LIMIT " +
      "passthrough, named rejections") {
    // the LLM dedup idiom: 14 bindings dedup to 4 distinct root names
    // before the closing count (without DISTINCT this answers 14)
    val n = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m.name AS t " +
        "RETURN count(*) AS n")
      .fold(e => fail(e), identity).collect()
    assert(n.map(_.getLong(0)).toSeq == Seq(4L))
    // value projection through the alias; final ORDER BY keys it
    val vals = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m.name AS t " +
        "RETURN t ORDER BY t")
      .fold(e => fail(e), identity).collect()
    assert(vals.map(_.getString(0)).toSeq == Seq("t1", "t2", "t3", "t4"))
    assert(vals.headOption.map(_.schema.fieldNames.toSeq)
      .contains(Seq("t")))
    // CONNECTED-side dedup: 14 kid bindings share one label
    val lab = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT c.label AS l " +
        "RETURN l")
      .fold(e => fail(e), identity).collect()
    assert(lab.map(_.getString(0)).toSeq == Seq("Kid"))
    // stage-level ORDER BY + LIMIT pass through (dedup, order, cap —
    // THEN the later stage sees only the capped rows)
    val capped = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m.name AS t " +
        "ORDER BY t DESC LIMIT 2 RETURN t ORDER BY t")
      .fold(e => fail(e), identity).collect()
    assert(capped.map(_.getString(0)).toSeq == Seq("t3", "t4"))
    // an unaliased item keeps its bare property name downstream
    val bare = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m.name " +
        "RETURN count(*) AS n")
      .fold(e => fail(e), identity).collect()
    assert(bare.map(_.getLong(0)).toSeq == Seq(4L))
    // rejections, each by name: DISTINCT + aggregate in one stage,
    // whole-variable dedup, numeric WHERE with nothing to filter
    val agg = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m.name AS t, " +
        "count(c) AS n RETURN t, n")
    assert(agg.isLeft && agg.swap.toOption.get.contains("WITH DISTINCT"),
      agg.toString)
    val whole = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m " +
        "RETURN count(*) AS n")
    assert(whole.isLeft &&
      whole.swap.toOption.get.contains("whole"), whole.toString)
    val hav = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH DISTINCT m.name AS t " +
        "WHERE t > 2 RETURN t")
    assert(hav.isLeft &&
      hav.swap.toOption.get.contains("no aggregate"), hav.toString)
  }

  test("r15 grammar tail: bare arrows, literal RETURN, m-side " +
      "coalesce ('' = absent), WITH collect") {
    // bracket-less shorthands desugar to the untyped single hop: on
    // the stair the HAS_* convention means -->/-- follow HAS_KID
    val out = CypherLite.run(stair,
      "MATCH (m:T {name: 't4'})-->(c) RETURN c.name ORDER BY c.name")
      .fold(e => fail(e), identity).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("k4-1", "k4-2"))
    val und = CypherLite.run(stair,
      "MATCH (m:Kid {name: 'k4-1'})--(c) RETURN c.name")
      .fold(e => fail(e), identity).collect()
    assert(und.map(_.getString(0)).toSeq == Seq("t4"))
    val in0 = CypherLite.run(stair,
      "MATCH (m:Kid {name: 'k4-2'})<--(c) RETURN c.name")
      .fold(e => fail(e), identity).collect()
    assert(in0.map(_.getString(0)).toSeq == Seq("t4"))
    // and inside a pattern-existence WHERE
    val pe = CypherLite.run(stair,
      "MATCH (m:T) WHERE (m)-->() RETURN count(*) AS n")
      .fold(e => fail(e), identity).collect()
    assert(pe.map(_.getLong(0)).toSeq == Seq(4L))
    // literal RETURN: one row, Neo4j's column naming, typed literals
    val one = CypherLite.run(stair, "RETURN 1")
      .fold(e => fail(e), identity)
    assert(one.columns.toSeq == Seq("1") &&
      one.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val greet = CypherLite.run(stair, "RETURN 'hi' AS greeting")
      .fold(e => fail(e), identity).collect()
    assert(greet.map(_.getString(0)).toSeq == Seq("hi"))
    // m-side coalesce: '' means ABSENT (the accessors' rule), so the
    // default fires on the stair's empty contents
    val co = CypherLite.run(stair,
      "MATCH (m:T {name: 't1'}) RETURN coalesce(m.content, 'none') AS c")
      .fold(e => fail(e), identity).collect()
    assert(co.map(_.getString(0)).toSeq == Seq("none"))
    // WITH collect: gathered list + count in one grouped pass, HAVING
    // on the count; a numeric HAVING on the collect alias rejects
    val wc = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, collect(c.name) AS names, " +
        "count(c) AS n WHERE n >= 4 RETURN m.name, names, n " +
        "ORDER BY m.name")
      .fold(e => fail(e), identity).collect()
    assert(wc.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq(
        ("t1", "k1-1,k1-2,k1-3,k1-4,k1-5", 5L),
        ("t2", "k2-1,k2-2,k2-3,k2-4", 4L)))
    val badHav = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, collect(c.name) AS names " +
        "WHERE names > 1 RETURN m.name")
    assert(badHav.isLeft &&
      badHav.swap.toOption.get.contains("not min/max/collect"), badHav)
  }

  test("id(v) projects the deterministic node id on both pattern " +
      "sides (r15); elementId stays a named rejection") {
    val ids = CypherLite.run(stair,
      "MATCH (m:T {name: 't1'})-[:HAS_KID]->(c) " +
        "RETURN id(m) AS mid, id(c) AS cid, c.name ORDER BY c.name " +
        "LIMIT 2")
      .fold(e => fail(e), identity).collect()
    assert(ids.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq == Seq((1L, 101L, "k1-1"), (1L, 102L, "k1-2")))
    // grouping key + DISTINCT-able (identity semantics)
    val grouped = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) RETURN id(m) AS mid, count(c) AS n " +
        "ORDER BY mid")
      .fold(e => fail(e), identity).collect()
    assert(grouped.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (2L, 4L), (3L, 3L), (4L, 2L)))
    val el = CypherLite.run(stair, "MATCH (m:T) RETURN elementId(m)")
    assert(el.isLeft, el.toString)
    // the lookup-by-id staple: WHERE id(n) = <num> (and the dotted
    // spelling) filter the root scan
    val byId = CypherLite.run(stair,
      "MATCH (m:T) WHERE id(m) = 2 RETURN m.name")
      .fold(e => fail(e), identity).collect()
    assert(byId.map(_.getString(0)).toSeq == Seq("t2"))
    val byIdDot = CypherLite.run(stair,
      "MATCH (m:T) WHERE m.id > 2 RETURN count(*) AS n")
      .fold(e => fail(e), identity).collect()
    assert(byIdDot.map(_.getLong(0)).toSeq == Seq(2L))
    // id in ORDER BY through count(DISTINCT id(c)) and the projection
    val cd = CypherLite.run(stair,
      "MATCH (m:T {name: 't3'})-[:HAS_KID]->(c) " +
        "RETURN count(DISTINCT id(c)) AS n")
      .fold(e => fail(e), identity).collect()
    assert(cd.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("chained WITH scoping violations are rejected with named errors") {
    // the hop variable died at the first WITH
    val r1 = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH c, count(*) AS g RETURN c, g")
    assert(r1.isLeft && r1.swap.toOption.get.contains("not in scope"),
      r1.toString)
    // numeric aggregate over a string-collation column
    val r2 = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH sum(name) AS s RETURN s")
    assert(r2.isLeft && r2.swap.toOption.get.contains("numeric"),
      r2.toString)
    // numeric WHERE over a min/max string alias, across a stage boundary
    val r3 = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH n, min(name) AS lo WHERE lo >= 2 RETURN n, lo")
    assert(r3.isLeft && r3.swap.toOption.get.contains("string collation"),
      r3.toString)
    // RETURN of a column the last stage dropped
    val r4 = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(c) AS n " +
        "WITH n, count(*) AS g RETURN n, g, name")
    assert(r4.isLeft && r4.swap.toOption.get.contains("not in scope"),
      r4.toString)
    // a stage-1 error surfaces with its stage label
    val r5 = CypherLite.run(stair,
      "MATCH (m:T)-[:HAS_KID]->(c) WITH m, count(q) AS n " +
        "WITH n, count(*) AS g RETURN n, g")
    assert(r5.isLeft && r5.swap.toOption.get.contains("WITH stage 1"),
      r5.toString)
  }

  test("malformed multi-aggregate WITH pipelines are rejected with " +
      "named errors") {
    // duplicate alias
    val r1 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n, " +
        "min(c.name) AS n RETURN m.name, n")
    assert(r1.isLeft && r1.swap.toOption.get.contains("duplicate"),
      r1.toString)
    // a grouping item may not follow an aggregate
    val r2 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n, m.name, " +
        "min(c.name) AS lo RETURN m.name, n, lo")
    assert(r2.isLeft, r2.toString)
    // every alias must come back out through RETURN
    val r3 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n, " +
        "min(c.name) AS lo RETURN m.name, n")
    assert(r3.isLeft && r3.swap.toOption.get.contains("every aggregate"),
      r3.toString)
    // HAVING must target a declared alias…
    val r4 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n, " +
        "min(c.name) AS lo WHERE zz >= 2 RETURN m.name, n, lo")
    assert(r4.isLeft && r4.swap.toOption.get.contains("alias"), r4.toString)
    // …and not a min/max one (string collation vs numeric compare)
    val r5 = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n, " +
        "min(c.name) AS lo WHERE lo >= 2 RETURN m.name, n, lo")
    assert(r5.isLeft && r5.swap.toOption.get.contains("min/max"),
      r5.toString)
  }

  test("count(*) counts rows: 1 for an unmatched OPTIONAL root where " +
      "count(c) answers 0") {
    val star = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH (m)-[*1..2]->(c) " +
        "WHERE c.label = 'NoSuchLabel' RETURN m.docnbr, count(*)")
      .fold(e => fail(e), identity)
    val allRoots = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) RETURN m").toOption.get.count()
    assert(star.count() == allRoots && allRoots > 0)
    assert(star.filter(col("n_connected") =!= 1).count() == 0)
    // with real bindings, count(*) equals count(c) (no null rows)
    val starInner = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(*)").fold(e => fail(e), identity).collect()
    val plainInner = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.docnbr, count(c)").fold(e => fail(e), identity).collect()
    assert(starInner.map(_.toSeq).toSeq == plainInner.map(_.toSeq).toSeq)
  }

  test("hop-less RETURN m.prop, count(*) groups the matched nodes") {
    val viaCypher = CypherLite.run(g,
      "MATCH (m) RETURN m.label, count(*)").fold(e => fail(e), identity)
      .collect().map(r =>
        r.getAs[String]("m_label") -> r.getAs[Long]("n_connected")).toMap
    val direct = g.nodes.groupBy("label").count().collect()
      .map(r => r.getAs[String]("label") -> r.getAs[Long]("count")).toMap
    assert(viaCypher == direct && viaCypher.nonEmpty)
    // grouping by the whole node is rejected (each group would count 1)
    val r = CypherLite.parse("MATCH (m:Step) RETURN m, count(*)")
    assert(r.isLeft && r.swap.toOption.get.contains("m.prop"), r.toString)
    // count(DISTINCT *) is not a thing
    val r2 = CypherLite.parse(
      "MATCH (m:Step) RETURN m.label, count(DISTINCT *)")
    assert(r2.isLeft, r2.toString)
  }

  test("IN lists: string membership, numeric membership, empty list") {
    val strIn = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name IN ['10', 'ALPHA', 'absent'] " +
        "RETURN m.name").fold(e => fail(e), identity)
      .collect().map(_.getString(0)).toSet
    assert(strIn == Set("10", "ALPHA"))
    // numeric list: compares through try_cast(double) — 'ALPHA' drops,
    // and '10' matches the numeric 10 (not a string compare)
    val numIn = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name IN [9, 10] RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSet
    assert(numIn == Set("9", "10"))
    // IN [] matches nothing (Cypher), not everything
    val empty = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name IN [] RETURN m.name")
      .fold(e => fail(e), identity)
    assert(empty.count() == 0)
    // IN composes with the DNF like any other condition
    val ored = CypherLite.run(numG,
      "MATCH (m:Doc) WHERE m.name IN ['9'] OR m.name = 'ALPHA' " +
        "RETURN m.name").fold(e => fail(e), identity)
      .collect().map(_.getString(0)).toSet
    assert(ored == Set("9", "ALPHA"))
  }

  test("chain pattern binds the middle variable: (a)->(b)->(c) equals " +
      "the depth-2 expansion on a containment tree") {
    val chain = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        "RETURN a.docnbr, c.name").fold(e => fail(e), identity)
    // on a tree, paths of exactly two HAS_ edges reach exactly the
    // depth-2 nodes of the 2-hop expansion
    val depth2 = GraphOps.neighborhoodWhereKeyed(g,
        col("label") === "Boeing_Service_Bulletin", 2)
      .filter(col("depth") === 2).count()
    assert(chain.count() == depth2 && depth2 > 0)
  }

  test("chain WHERE filters any variable; OR spans variables") {
    val all = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        "RETURN b.label, c.label").fold(e => fail(e), identity).collect()
    val mid = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        "WHERE b.label = 'Summary' RETURN b.label, c.label")
      .fold(e => fail(e), identity).collect()
    assert(mid.nonEmpty && mid.length < all.length)
    assert(mid.forall(_.getString(0) == "Summary"))
    // the OR's second branch must add rows the first alone misses: pick
    // a c-label that occurs under non-Summary middles too
    val cLabel = all.filter(_.getString(0) != "Summary")
      .map(_.getString(1)).headOption.getOrElse(fail("fixture too flat"))
    val ored = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        s"WHERE b.label = 'Summary' OR c.label = '$cLabel' " +
        "RETURN b.label, c.label").fold(e => fail(e), identity).collect()
    val expect = all.count(r =>
      r.getString(0) == "Summary" || r.getString(1) == cLabel)
    assert(ored.length == expect && ored.length > mid.length)
  }

  test("chain count() tallies bindings per group; DISTINCT tallies " +
      "distinct nodes of the counted variable") {
    val triples = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        "RETURN a.docnbr, b.label, c.label").fold(e => fail(e), identity)
      .collect()
    val plain = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        "RETURN a.docnbr, count(c)").fold(e => fail(e), identity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byRoot = triples.groupBy(_.getString(0))
    assert(plain == byRoot.view.mapValues(_.length.toLong).toMap)
    // count(DISTINCT b): middles with at least one child, per root
    val distinctMid = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[*1..1]->(b)-[*1..1]->(c) " +
        "RETURN a.docnbr, count(DISTINCT b)").fold(e => fail(e), identity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // on the corpus every root has more bindings than distinct middles
    assert(distinctMid.keySet == plain.keySet)
    assert(distinctMid.forall { case (k, v) => v <= plain(k) })
    assert(distinctMid.exists { case (k, v) => v < plain(k) },
      s"fixture too flat to distinguish DISTINCT: $distinctMid vs $plain")
  }

  test("chain rejections: duplicate variables, foreign WHERE/RETURN " +
      "vars, unordered SKIP") {
    val dup = CypherLite.parse(
      "MATCH (a:X)-[*1..1]->(a)-[*1..1]->(c) RETURN a.name")
    assert(dup.isLeft && dup.swap.toOption.get.contains("distinct"),
      dup.toString)
    val foreign = CypherLite.parse(
      "MATCH (a:X)-[*1..1]->(b)-[*1..1]->(c) WHERE q.name = 'x' " +
        "RETURN a.name")
    assert(foreign.isLeft &&
      foreign.swap.toOption.get.contains("chain variables"),
      foreign.toString)
    val skip = CypherLite.parse(
      "MATCH (a:X)-[*1..1]->(b)-[*1..1]->(c) RETURN a.name SKIP 2")
    assert(skip.isLeft && skip.swap.toOption.get.contains("ORDER BY"),
      skip.toString)
  }

  test("malformed IN lists are rejected with named errors") {
    val mixed = CypherLite.parse(
      "MATCH (m:Doc) WHERE m.name IN ['a', 2] RETURN m.name")
    assert(mixed.isLeft &&
      mixed.swap.toOption.get.contains("all-string or all-numeric"),
      mixed.toString)
    val notIn = CypherLite.parse(
      "MATCH (m:Doc) WHERE m.name = ['a'] RETURN m.name")
    assert(notIn.isLeft &&
      notIn.swap.toOption.get.contains("only valid with IN"),
      notIn.toString)
    val bare = CypherLite.parse(
      "MATCH (m:Doc) WHERE m.name IN 'a' RETURN m.name")
    assert(bare.isLeft &&
      bare.swap.toOption.get.contains("bracketed list"), bare.toString)
  }

  test("cross-variable WHERE filters bindings column-to-column") {
    // c.name > m.name keeps exactly the bindings whose connected node's
    // raw tag sorts after the root's — derive the expected set from the
    // unfiltered expansion; both outcomes occur, so the filter is
    // discriminating
    val got = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE c.name > m.name RETURN m.name, c")
      .fold(e => fail(e), identity)
      .select("m_name", "c_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val all = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) RETURN m.name, c")
      .fold(e => fail(e), identity)
      .select("m_name", "c_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = all.filter { case (mn, cn) => cn > mn }
    assert(got.nonEmpty && got != all && got == want,
      s"got=${got.size} all=${all.size} want=${want.size}")
  }

  test("cross-variable WHERE on the root fast path: m.prop vs m.prop") {
    val got = CypherLite.run(g,
      "MATCH (m) WHERE m.content < m.name RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSet
    val want = g.nodes.filter(col("content") < col("name"))
      .select("name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty, s"got=$got")
    // NOT negates after evaluation (both columns non-null in this corpus,
    // so the halves partition the distinct-name space observed per node)
    val not = CypherLite.run(g,
      "MATCH (m) WHERE NOT m.content < m.name RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSet
    val wantNot = g.nodes.filter(!(col("content") < col("name")))
      .select("name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(not == wantNot, "NOT complement drifted")
  }

  test("cross-variable WHERE with a foreign variable is rejected") {
    val r = CypherLite.parse(
      "MATCH (m:Doc)-[*1..1]->(c) WHERE c.name = x.name RETURN m.name")
    assert(r.isLeft &&
      r.swap.toOption.get.contains("cross-variable"), r.toString)
  }

  test("multi-key ORDER BY sorts by each key in query order") {
    val df = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, c.name " +
        "ORDER BY m.name ASC, c.name DESC").fold(e => fail(e), identity)
    val got = df.select("m_name", "c_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = got.sortBy { case (mn, cn) => (mn, Desc(cn)) }
    assert(got == want && got.nonEmpty, s"got=$got")
    // the aggregate pipeline: count as the primary key, property tiebreak
    val agg = CypherLite.run(g,
      "MATCH (m:Task)-[*1..1]->(c) WITH m.name, count(c) AS n " +
        "RETURN m.name, n ORDER BY n DESC, m.name ASC")
      .fold(e => fail(e), identity)
    val gotA = agg.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val wantA = gotA.sortBy { case (mn, n) => (-n, mn) }
    assert(gotA == wantA && gotA.nonEmpty, s"got=$gotA")
    // every key must still name a projected property
    val bad = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name ORDER BY m.name, m.label")
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("must be among"), bad.toString)
  }

  /** Inverted-ordering wrapper: sorts descending under sortBy. */
  private case class Desc(s: String) extends Ordered[Desc] {
    def compare(that: Desc): Int = that.s.compareTo(s)
  }

  test("=~ regex matches the whole string, not a substring") {
    val full = CypherLite.run(g,
      "MATCH (m) WHERE m.name =~ 's.*' RETURN m.name")
      .fold(e => fail(e), identity).collect().map(_.getString(0)).toSet
    val want = g.nodes.filter(col("name").rlike("^(?:s.*)$"))
      .select("name").distinct().collect().map(_.getString(0)).toSet
    assert(full == want && full.nonEmpty, s"got=$full")
    // 'ubject' is a substring of 'subject' but not a full match
    val sub = CypherLite.run(g,
      "MATCH (m) WHERE m.name =~ 'ubject' RETURN m.name")
      .fold(e => fail(e), identity)
    assert(sub.count() == 0, "=~ must anchor the whole string")
    // numeric literal with =~ is a type error, not a coercion
    val num = CypherLite.parse(
      "MATCH (m) WHERE m.name =~ 12 RETURN m.name")
    assert(num.isLeft &&
      num.swap.toOption.get.contains("quoted string"), num.toString)
  }

  test("UNION dedupes branch rows; UNION ALL keeps the bag") {
    val set = CypherLite.run(g,
      "MATCH (m:Subject) RETURN m.name UNION MATCH (m:Subject) " +
        "RETURN m.name").fold(e => fail(e), identity)
    val bag = CypherLite.run(g,
      "MATCH (m:Subject) RETURN m.name UNION ALL MATCH (m:Subject) " +
        "RETURN m.name").fold(e => fail(e), identity)
    val distinctSubjects =
      g.nodes.filter(col("label") === "Subject")
        .select("name").distinct().count()
    assert(set.count() == distinctSubjects, "UNION must dedupe")
    assert(bag.count() == 2 * 3, "UNION ALL must keep both branches' rows")
    // a literal containing the word keeps the query unsplit
    val literal = CypherLite.run(g,
      "MATCH (m:Subject {name: 'UNION ALL'}) RETURN m.name")
    assert(literal.isRight && literal.toOption.get.count() == 0)
  }

  test("UNION rejections: mixed forms, mismatched columns, paging, " +
      "DETACH DELETE") {
    def err(q: String): String =
      CypherLite.run(g, q).swap.toOption
        .getOrElse(fail(s"expected rejection: $q"))
    assert(err("MATCH (m:Subject) RETURN m.name UNION MATCH (m:Step) " +
      "RETURN m.name UNION ALL MATCH (m:Task) RETURN m.name")
      .contains("invalid combination"))
    assert(err("MATCH (m:Subject) RETURN m.name UNION MATCH (m:Step) " +
      "RETURN m.label").contains("same columns"))
    assert(err("MATCH (m:Subject) RETURN m.name UNION MATCH (m:Step) " +
      "RETURN m.name ORDER BY m.name LIMIT 3")
      .contains("ORDER BY / SKIP / LIMIT"))
    assert(err("MATCH (m:Subject) RETURN m.name UNION MATCH (n) " +
      "WHERE n.b1 = true DETACH DELETE n")
      .contains("DETACH DELETE"))
  }

  // four nodes whose names split differently under (a OR b) AND c versus
  // the unparenthesized a OR (b AND c) — B1 is the witness row
  lazy val parenG: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(NodeRow(1, "Doc", "A1", "", "", "b", Nil),
        NodeRow(2, "Doc", "A2", "", "", "b", Nil),
        NodeRow(3, "Doc", "B1", "", "", "b", Nil),
        NodeRow(4, "Doc", "C3", "", "", "b", Nil)).toDS(),
      Seq.empty[EdgeRow].toDS())
  }

  private def parenNames(q: String): Set[String] =
    CypherLite.run(parenG, q).fold(e => fail(e), identity)
      .collect().map(_.getString(0)).toSet

  test("parenthesized WHERE groups override AND/OR precedence") {
    // (ends 1 OR ends 2) AND starts A -> {A1, A2}; the unparenthesized
    // reading keeps B1 too — the fixture's witness that parens bind
    assert(parenNames("MATCH (m:Doc) WHERE (m.name ENDS WITH '1' OR " +
      "m.name ENDS WITH '2') AND m.name STARTS WITH 'A' RETURN m.name")
      == Set("A1", "A2"))
    assert(parenNames("MATCH (m:Doc) WHERE m.name ENDS WITH '1' OR " +
      "m.name ENDS WITH '2' AND m.name STARTS WITH 'A' RETURN m.name")
      == Set("A1", "B1", "A2"))
    // nesting and a NOT atom inside a group
    assert(parenNames("MATCH (m:Doc) WHERE ((NOT m.name = 'A1') AND " +
      "(m.name STARTS WITH 'A' OR m.name STARTS WITH 'B')) " +
      "RETURN m.name") == Set("A2", "B1"))
  }

  test("NOT over a parenthesized group applies De Morgan exactly") {
    assert(parenNames("MATCH (m:Doc) WHERE NOT (m.name ENDS WITH '1' " +
      "OR m.name ENDS WITH '2') RETURN m.name") == Set("C3"))
    // ¬(a AND b) = ¬a OR ¬b
    assert(parenNames("MATCH (m:Doc) WHERE NOT (m.name STARTS WITH 'A' " +
      "AND m.name ENDS WITH '1') RETURN m.name") == Set("A2", "B1", "C3"))
    // double negation cancels
    assert(parenNames("MATCH (m:Doc) WHERE NOT (NOT (m.name = 'A1')) " +
      "RETURN m.name") == Set("A1"))
  }

  // mixed-case names: the fixture where a case fold changes the row set
  lazy val caseG: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(NodeRow(1, "Doc", "Foo", "", "", "b", Nil),
        NodeRow(2, "Doc", "FOO", "", "", "b", Nil),
        NodeRow(3, "Doc", "foo", "", "", "b", Nil),
        NodeRow(4, "Doc", "bar", "", "", "b", Nil)).toDS(),
      Seq.empty[EdgeRow].toDS())
  }

  test("toLower/toUpper WHERE wrappers fold the property, not the literal") {
    def names(q: String): Set[String] =
      CypherLite.run(caseG, q).fold(e => fail(e), identity)
        .collect().map(_.getString(0)).toSet
    assert(names("MATCH (m:Doc) WHERE toLower(m.name) = 'foo' " +
      "RETURN m.name") == Set("Foo", "FOO", "foo"))
    assert(names("MATCH (m:Doc) WHERE toUpper(m.name) = 'FOO' " +
      "RETURN m.name") == Set("Foo", "FOO", "foo"))
    assert(names("MATCH (m:Doc) WHERE m.name = 'foo' RETURN m.name")
      == Set("foo"))
    // IN lists fold too; NOT composes after the fold
    assert(names("MATCH (m:Doc) WHERE toUpper(m.name) IN ['FOO'] " +
      "RETURN m.name") == Set("Foo", "FOO", "foo"))
    assert(names("MATCH (m:Doc) WHERE NOT toLower(m.name) = 'foo' " +
      "RETURN m.name") == Set("bar"))
  }

  test("case-fold wrapper rejections: numeric literal, unbalanced parens") {
    val num = CypherLite.parse(
      "MATCH (m:Doc) WHERE toLower(m.name) > 5 RETURN m.name")
    assert(num.isLeft &&
      num.swap.toOption.get.contains("numeric"), num.toString)
    val unb = CypherLite.parse(
      "MATCH (m:Doc) WHERE toLower(m.name = 'x' RETURN m.name")
    assert(unb.isLeft, unb.toString)
  }

  test("coalesce(c.prop, 'default') fills unmatched OPTIONAL roots") {
    // no SB node has a HAS_NOSUCH child: every root answers the default
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH " +
        "(m)-[:HAS_NOSUCH]->(c) RETURN m.name, " +
        "coalesce(c.name, 'missing') AS who").toOption.get
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("who") == "missing"))
    // matched bindings keep the real value
    val mixed = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) OPTIONAL MATCH " +
        "(m)-[:HAS_SUMMARY]->(c) RETURN m.name, " +
        "coalesce(c.name, 'missing') AS who").toOption.get.collect()
    assert(mixed.exists(_.getAs[String]("who") != "missing"))
    // guards: whole-node combination and aggregates are rejected loudly
    assert(CypherLite.run(g, "MATCH (m:Step) OPTIONAL MATCH (m)-[]->(c) " +
      "RETURN m.name, c, coalesce(c.name, 'x')").isLeft)
    assert(CypherLite.run(g, "MATCH (m:Step) OPTIONAL MATCH (m)-[]->(c) " +
      "RETURN m.name, coalesce(c.name, 'x'), count(c)").isLeft)
    // r15: the m-side coalesce is a supported transform now ('' =
    // absent) — the boundary moved to unknown variables
    assert(CypherLite.run(g, "MATCH (m:Step) " +
      "RETURN coalesce(m.name, 'x')").isRight)
    assert(CypherLite.run(g, "MATCH (m:Step) " +
      "RETURN coalesce(z.name, 'x')").isLeft)
  }

  test("labels() projects the label under Cypher's column name") {
    val dfm = CypherLite.run(g,
      "MATCH (m:Step) RETURN labels(m)").toOption.get
    assert(dfm.columns.toSeq == Seq("m_labels"))
    assert(dfm.collect().forall(_.getString(0) == "Step"))
    val dfc = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY]->(c) " +
        "RETURN m.name, labels(c) AS kind").toOption.get
    assert(dfc.columns.contains("kind"))
    assert(dfc.collect().forall(_.getAs[String]("kind") == "Summary"))
  }

  test("parens in a chain WHERE and malformed parens rejected") {
    // chain path shares the boolean parser
    val chain = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c) " +
        "WHERE (b.label = 'Summary' OR b.label = 'References') AND " +
        "NOT (c.label = 'Paragraph') RETURN a.name, b.label, c.label")
    assert(chain.isRight, chain.toString)
    val rows = chain.toOption.get.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      Set("Summary", "References").contains(r.getAs[String]("b_label")) &&
        r.getAs[String]("c_label") != "Paragraph"
    })
    val bad = CypherLite.parse(
      "MATCH (m:Doc) WHERE (m.name = 'A1' RETURN m.name")
    assert(bad.isLeft &&
      bad.swap.toOption.get.contains("parenthes"), bad.toString)
    val trailing = CypherLite.parse(
      "MATCH (m:Doc) WHERE m.name = 'A1') RETURN m.name")
    assert(trailing.isLeft, trailing.toString)
  }

  test("N-step chains: three hops equal the manual edge-join composition") {
    val df = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c)-[]->(d) " +
        "RETURN DISTINCT a.name, d.label")
      .fold(e => fail(e), identity)
    // independent derivation: three distinct single-hop edge joins
    val e = g.edges.toDF.filter(col("relType").startsWith("HAS_"))
    val s1 = e.select(col("src").as("a"), col("dst").as("b")).distinct()
    val s2 = e.select(col("src").as("b"), col("dst").as("c")).distinct()
    val s3 = e.select(col("src").as("c"), col("dst").as("d")).distinct()
    val roots = g.nodes.filter(col("label") === "Boeing_Service_Bulletin")
      .select(col("id").as("a"), col("name").as("a_name"))
    val manual = roots.join(s1, "a").join(s2, "b").join(s3, "c")
      .join(g.nodes.select(col("id").as("d"), col("label").as("d_label")),
        "d")
      .select("a_name", "d_label").distinct()
    assert(df.count() == manual.count())
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      manual.collect().map(r => (r.getString(0), r.getString(1))).toSet)
  }

  test("N-step chain WHERE on an inner variable prunes the frontier") {
    val all = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c)-[]->(d) " +
        "RETURN DISTINCT a.name, c.label, d.label")
      .fold(e => fail(e), identity)
    val pruned = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c)-[]->(d) " +
        "WHERE c.label = 'Section' RETURN DISTINCT a.name, c.label, d.label")
      .fold(e => fail(e), identity)
    assert(all.count() > 0)
    assert(pruned.count() > 0)
    assert(pruned.count() < all.count())
    assert(pruned.collect().forall(_.getAs[String]("c_label") == "Section"))
    // count over the chain grouped by the head variable
    val counted = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c)-[]->(d) " +
        "RETURN a.name, count(d)")
      .fold(e => fail(e), identity)
    assert(counted.columns.toSeq == Seq("a_name", "n_d"))
  }

  test("UNWIND list prefix rewrites = x comparisons to IN membership") {
    val names = g.nodes.filter(col("label") === "Step")
      .select("name").collect().map(_.getString(0)).distinct.take(2).toSeq
    val listTxt = names.map(n => s"'$n'").mkString(", ")
    val df = CypherLite.run(g,
      s"UNWIND [$listTxt] AS x " +
        "MATCH (m:Step) WHERE m.name = x RETURN m.name")
      .fold(e => fail(e), identity)
    assert(df.count() ==
      g.nodes.filter(col("label") === "Step")
        .filter(col("name").isin(names: _*)).count())
    // composes with other conds; <= x is NOT rewritten
    val mixed = CypherLite.run(g,
      s"UNWIND [$listTxt] AS x MATCH (m:Step) " +
        "WHERE m.name = x AND m.name <= 'zzzz' RETURN m.name")
    assert(mixed.isRight, mixed.toString)
    // an unused UNWIND variable errors rather than silently dropping
    val unused = CypherLite.run(g,
      "UNWIND ['a'] AS x MATCH (m:Step) RETURN m.name")
    assert(unused.isLeft &&
      unused.swap.toOption.get.contains("UNWIND"), unused.toString)
  }

  test("UNWIND variable rides the projection (r15): RETURN x maps to " +
      "the compared property under the alias x; duplicates and " +
      "unsupported positions reject by name") {
    // per-value aggregate over the stair fixture: x equated to m.name,
    // projected + grouped + ordered through the alias
    val agg = CypherLite.run(stair,
      "UNWIND ['t1', 't3'] AS x MATCH (m:T)-[:HAS_KID]->(c) " +
        "WHERE m.name = x RETURN x, count(c) AS n ORDER BY x")
      .fold(e => fail(e), identity).collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t1", 5L), ("t3", 3L)))
    assert(agg.headOption.map(_.schema.fieldNames.toSeq)
      .contains(Seq("x", "n")))
    // non-aggregate projection: one row per binding, x carried; an
    // explicit AS keeps the user's name
    val proj = CypherLite.run(stair,
      "UNWIND ['t4'] AS x MATCH (m:T)-[:HAS_KID]->(c) " +
        "WHERE m.name = x RETURN x AS t, c.name ORDER BY c.name")
      .fold(e => fail(e), identity).collect()
    assert(proj.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("t4", "k4-1"), ("t4", "k4-2")))
    // a list value matching nothing produces no row (MATCH semantics)
    val miss = CypherLite.run(stair,
      "UNWIND ['t2', 'zz'] AS x MATCH (m:T) WHERE m.name = x RETURN x")
      .fold(e => fail(e), identity).collect()
    assert(miss.map(_.getString(0)).toSeq == Seq("t2"))
    // duplicates carry Cypher's bag multiplicity since r16 — each
    // occurrence contributes its own binding (TopKWithSpec pins the
    // aggregate-doubling and rejection shapes)
    val dup = CypherLite.run(stair,
      "UNWIND ['t1', 't1'] AS x MATCH (m:T) WHERE m.name = x RETURN x")
      .fold(e => fail(e), identity).collect()
    assert(dup.map(_.getString(0)).toSeq == Seq("t1", "t1"), dup.toSeq)
    // x projected but never equated to a property
    val free = CypherLite.run(stair,
      "UNWIND ['t1'] AS x MATCH (m:T) WHERE m.name = 't1' RETURN x")
    assert(free.isLeft &&
      free.swap.toOption.get.contains("equated"), free.toString)
    // x inside a function call is not a whole RETURN item
    val fn = CypherLite.run(stair,
      "UNWIND ['t1'] AS x MATCH (m:T) WHERE m.name = x RETURN count(x)")
    assert(fn.isLeft &&
      fn.swap.toOption.get.contains("whole RETURN item"), fn.toString)
  }

  test("UNWIND sibling spellings (r15): reversed `x = v.prop` and the " +
      "inline map `(v:L {k: x})` both desugar to the IN rewrite") {
    // reversed comparison, with projection riding it
    val rev = CypherLite.run(stair,
      "UNWIND ['t1', 't3'] AS x MATCH (m:T)-[:HAS_KID]->(c) " +
        "WHERE x = m.name RETURN x, count(c) AS n ORDER BY x")
      .fold(e => fail(e), identity).collect()
    assert(rev.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t1", 5L), ("t3", 3L)))
    // the inline-map spelling — THE most common LLM form; the entry is
    // excised and the conjunct lands as the clause WHERE
    val map0 = CypherLite.run(stair,
      "UNWIND ['t2', 't4'] AS x MATCH (m:T {name: x})-[:HAS_KID]->(c) " +
        "RETURN x, count(c) AS n ORDER BY x")
      .fold(e => fail(e), identity).collect()
    assert(map0.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t2", 4L), ("t4", 2L)))
    // an existing WHERE keeps its semantics: the conjunct fronts it
    // and the body is parenthesized, so a top-level OR cannot leak
    val withWhere = CypherLite.run(stair,
      "UNWIND ['t1', 't2'] AS x MATCH (m:T {name: x})-[:HAS_KID]->(c) " +
        "WHERE c.name ENDS WITH '-1' OR c.name ENDS WITH '-2' " +
        "RETURN x, count(c) AS n ORDER BY x")
      .fold(e => fail(e), identity).collect()
    assert(withWhere.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("t1", 2L), ("t2", 2L)))
    // a map with other entries keeps them (the x entry alone is cut)
    val mixed = CypherLite.run(stair,
      "UNWIND ['t1'] AS x MATCH (m:T {content: '', name: x}) RETURN x")
      .fold(e => fail(e), identity).collect()
    assert(mixed.map(_.getString(0)).toSeq == Seq("t1"))
    // multi-MATCH bodies reject by name rather than guessing a clause
    val multi = CypherLite.run(stair,
      "UNWIND ['t1'] AS x MATCH (m:T {name: x}) " +
        "MATCH (k:Kid {name: x}) RETURN x")
    assert(multi.isLeft &&
      multi.swap.toOption.get.contains("single-MATCH"), multi.toString)
  }

  test("size((m)-[:R]->()) answers each root's degree, zeros included") {
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) " +
        "RETURN m.name, size((m)-[:HAS_SUMMARY]->()) AS n_summaries")
      .fold(e => fail(e), identity)
    // every SB answers exactly one row (identity semantics)
    assert(df.count() ==
      g.nodes.filter(col("label") === "Boeing_Service_Bulletin").count())
    assert(df.columns.toSeq == Seq("m_name", "n_summaries"))
    assert(df.collect().forall(_.getAs[Long]("n_summaries") >= 0))
    // a label no SB points at directly → all-zero degrees, rows kept
    val zeros = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) " +
        "RETURN m.name, size((m)-[]->(:Paragraph))")
      .fold(e => fail(e), identity)
    assert(zeros.count() > 0)
    assert(zeros.collect().forall(_.getAs[Long]("degree") == 0L))
    // the WHERE filters ROOTS (not bindings): non-matching roots drop
    val filtered = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.name CONTAINS 'step' " +
        "RETURN m.name, size((m)-[]->()) ORDER BY degree DESC")
      .fold(e => fail(e), identity)
    assert(filtered.count() ==
      g.nodes.filter(col("label") === "Step")
        .filter(col("name").contains("step")).count())
    // foreign anchor rejected
    val bad = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name, size((zzz)-[]->())")
    assert(bad.isLeft && bad.swap.toOption.get.contains("size()"),
      bad.toString)
  }

  test("WITH pipelines aggregate beyond count: sum/min and property counts") {
    // sum over the bindings with a numeric HAVING
    val sums = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WITH m, count(DISTINCT c.label) AS kinds WHERE kinds >= 2 " +
        "RETURN m.name, kinds").fold(e => fail(e), identity)
    // WITH m groups by node IDENTITY — several bulletins share a name,
    // so the direct derivation must group by root_id, not root_name
    val direct = GraphOps.neighborhoodWhereKeyed(g,
      col("label") === "Boeing_Service_Bulletin", 2)
      .groupBy("root_id").agg(countDistinct(col("c_label")).as("k"))
      .filter(col("k") >= 2).count()
    assert(sums.count() == direct)
    // min keeps string collation and is projectable via its alias
    val mins = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..1]->(c) " +
        "WITH m, min(c.name) AS lo RETURN m.name, lo")
    assert(mins.isRight, mins.toString)
    // …but a numeric HAVING over a min/max alias is rejected
    val badHaving = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) WITH m, min(c.name) AS lo " +
        "WHERE lo > 3 RETURN m.name, lo")
    assert(badHaving.isLeft &&
      badHaving.swap.toOption.get.contains("count/sum/avg"),
      badHaving.toString)
  }

  test("several aggregates evaluate in one grouped pass") {
    val df = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.name, count(c) AS n, count(DISTINCT c.label) AS kinds, " +
        "min(c.name) AS lo ORDER BY n DESC")
      .fold(e => fail(e), identity)
    assert(df.columns.toSeq == Seq("m_name", "n", "kinds", "lo"))
    val direct = GraphOps.neighborhoodWhereKeyed(g,
      col("label") === "Boeing_Service_Bulletin", 2)
      .groupBy("root_name")
      .agg(count(col("c_id")).as("n"),
        countDistinct(col("c_label")).as("kinds"),
        min(col("c_name")).as("lo"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3))).toMap
    val rows = df.collect()
    rows.foreach { r =>
      val (n, k, lo) = direct(r.getAs[String]("m_name"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("kinds") == k)
      assert(r.getAs[String]("lo") == lo)
    }
    // ORDER BY the aliased aggregate actually ordered the groups
    val ns = rows.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sortBy(-_))
  }

  test("count([DISTINCT] c.prop) counts property values, not bindings") {
    val kindsDf = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.name, count(DISTINCT c.label) AS kinds")
      .fold(e => fail(e), identity)
    val valsDf = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "RETURN m.name, count(c.label) AS vals")
      .fold(e => fail(e), identity)
    val direct = GraphOps.neighborhoodWhereKeyed(g,
      col("label") === "Boeing_Service_Bulletin", 2)
    val perRoot = direct.groupBy("root_name")
      .agg(countDistinct(col("c_label")).as("k"),
        count(col("c_label")).as("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    kindsDf.collect().foreach { r =>
      val (k, v) = perRoot(r.getAs[String]("m_name"))
      assert(r.getAs[Long]("kinds") == k)
      assert(k <= v)
    }
    valsDf.collect().foreach { r =>
      assert(r.getAs[Long]("vals") == perRoot(r.getAs[String]("m_name"))._2)
    }
    // global form, m-side: distinct labels across the whole graph
    val global = CypherLite.run(g,
      "MATCH (m) RETURN count(DISTINCT m.label) AS n_labels")
      .fold(e => fail(e), identity).collect().head
    assert(global.getAs[Long]("n_labels") ==
      g.nodes.select("label").distinct().count())
    // m-side property count under a hop pattern is rejected
    val bad = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN count(m.name)")
    assert(bad.isLeft && bad.swap.toOption.get.contains("connected"),
      bad.toString)
  }

  test("SET m.content updates exactly the matched nodes") {
    val (after, summary) = CypherLite.runWrite(g,
      "MATCH (m:Step) SET m.content = 'reviewed'")
      .fold(e => fail(e), identity)
    val nSteps = g.nodes.filter(col("label") === "Step").count()
    assert(summary.count() == nSteps)
    assert(summary.collect().forall(
      _.getAs[String]("m_content") == "reviewed"))
    // untouched labels keep their content; the input graph is immutable
    assert(after.nodes.filter(col("label") === "Step")
      .filter(col("content") =!= "reviewed").count() == 0)
    assert(after.nodes.filter(col("label") =!= "Step").count() ==
      g.nodes.filter(col("label") =!= "Step").count())
    assert(g.nodes.filter(col("label") === "Step")
      .filter(col("content") === "reviewed").count() == 0)
    // WHERE prunes the write set
    val (_, some) = CypherLite.runWrite(g,
      "MATCH (m:Step) WHERE m.name CONTAINS 'step' " +
        "SET m.content = 'partial'").fold(e => fail(e), identity)
    assert(some.count() <= nSteps)
  }

  test("SET m.name / m.docnbr write the other user properties (r15); " +
      "label/batch reject with a model pointer") {
    // a name write lands exactly on the matched set
    val (after, _) = CypherLite.runWrite(g,
      "MATCH (m:Step) SET m.name = 'redacted'")
      .fold(e => fail(e), identity)
    val nSteps = g.nodes.filter(col("label") === "Step").count()
    assert(after.nodes.filter(col("name") === "redacted").count() ==
      nSteps)
    assert(after.nodes.filter(col("label") =!= "Step")
      .filter(col("name") === "redacted").count() == 0)
    // a docnbr write: every other column untouched
    val (afterD, _) = CypherLite.runWrite(g,
      "MATCH (m:Step) SET m.docnbr = 'D-9'")
      .fold(e => fail(e), identity)
    assert(afterD.nodes.filter(col("docnbr") === "D-9").count() == nSteps)
    assert(afterD.nodes.filter(col("label") === "Step")
      .join(g.nodes.filter(col("label") === "Step")
        .select(col("id"), col("name").as("old_name")), "id")
      .filter(col("name") =!= col("old_name")).count() == 0)
    // label/batch are kind/lineage columns — the rejection points at
    // the property model; an unknown property names the writable set
    val lab = CypherLite.runWrite(g, "MATCH (m:Step) SET m.label = 'X'")
    assert(lab.isLeft &&
      lab.swap.toOption.get.contains("not a node property"), lab)
    val bat = CypherLite.runWrite(g, "MATCH (m:Step) SET m.batch = 'b2'")
    assert(bat.isLeft &&
      bat.swap.toOption.get.contains("not a node property"), bat)
    val unk = CypherLite.runWrite(g, "MATCH (m:Step) SET m.wat = 'v'")
    assert(unk.isLeft &&
      unk.swap.toOption.get.contains("writable"), unk)
  }

  test("CREATE mints a deterministic node; re-running is a no-op") {
    val q = "CREATE (n:Note {name: 'todo-1', content: 'check torque'})"
    val (after1, s1) = CypherLite.runWrite(g, q).fold(e => fail(e), identity)
    assert(s1.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2))).toSeq == Seq(("Note", "todo-1", "check torque")))
    assert(after1.nodes.count() == g.nodes.count() + 1)
    val (after2, _) = CypherLite.runWrite(after1, q)
      .fold(e => fail(e), identity)
    assert(after2.nodes.count() == after1.nodes.count())
    // the read API refuses writes rather than discarding the mutation
    val viaRun = CypherLite.run(g, q)
    assert(viaRun.isLeft &&
      viaRun.swap.toOption.get.contains("runWrite"), viaRun.toString)
  }

  test("cross-variable WHERE works in SET and size() paths") {
    // SET gated by a column-to-column comparison: name = content holds
    // for no Step (content differs), so nothing updates
    val (_, none) = CypherLite.runWrite(g,
      "MATCH (m:Step) WHERE m.name = m.content SET m.content = 'x'")
      .fold(e => fail(e), identity)
    val matching = g.nodes.filter(col("label") === "Step")
      .filter(col("name") === col("content")).count()
    assert(none.count() == matching)
    // size() with a cross-variable root WHERE filters the right roots
    val df = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.name <> m.content " +
        "RETURN m.name, size((m)-[]->())")
      .fold(e => fail(e), identity)
    assert(df.count() == g.nodes.filter(col("label") === "Step")
      .filter(col("name") =!= col("content")).count())
    // dual-match duplicate projection is rejected, not collapsed
    val dup = CypherLite.parse(
      "MATCH (a:Step) MATCH (b:Step) RETURN a.name, a.name, b.name")
    assert(dup.isLeft &&
      dup.swap.toOption.get.contains("twice"), dup.toString)
    // size(): AS on a whole-node lead item is rejected, not dropped
    val badAlias = CypherLite.parse(
      "MATCH (m:Step) RETURN m AS node, size((m)-[]->())")
    assert(badAlias.isLeft &&
      badAlias.swap.toOption.get.contains("alias"), badAlias.toString)
  }

  test("write-surface rejections keep their named errors") {
    // r15: SET m.name is a supported user-property write now — the
    // rejection boundary moved to the engine columns (label/batch)
    val nameOk = CypherLite.parse(
      "MATCH (m:Step) SET m.name = 'x'")
    assert(nameOk.isRight, nameOk.toString)
    val badProp = CypherLite.parse(
      "MATCH (m:Step) SET m.label = 'x'")
    assert(badProp.isLeft &&
      badProp.swap.toOption.get.contains("not a node property"),
      badProp.toString)
    val badVar = CypherLite.parse(
      "MATCH (m:Step) SET other.content = 'x'")
    assert(badVar.isLeft &&
      badVar.swap.toOption.get.contains("matched variable"), badVar.toString)
    val noName = CypherLite.parse("CREATE (n:Note {content: 'x'})")
    assert(noName.isLeft &&
      noName.swap.toOption.get.contains("name"), noName.toString)
    val badCreateProp = CypherLite.parse(
      "CREATE (n:Note {name: 'x', frob: 'y'})")
    assert(badCreateProp.isLeft &&
      badCreateProp.swap.toOption.get.contains("frob"), badCreateProp.toString)
    // runWrite refuses read statements
    val read = CypherLite.runWrite(g, "MATCH (m:Step) RETURN m")
    assert(read.isLeft &&
      read.swap.toOption.get.contains("write"), read.toString)
  }

  test("dual MATCH is the cartesian composition constrained by WHERE") {
    // pairs of Steps whose names differ — cross product minus diagonal
    val pairs = CypherLite.run(g,
      "MATCH (a:Step) MATCH (b:Step) WHERE a.name < b.name " +
        "RETURN a.name, b.name")
      .fold(e => fail(e), identity)
    val names = g.nodes.filter(col("label") === "Step")
      .select("name").collect().map(_.getString(0))
    val expected = (for {
      x <- names; y <- names if x < y
    } yield (x, y)).toSet
    assert(pairs.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet == expected)
    // a cross-variable EQUALITY becomes an equi-join, not a cartesian
    val eq = CypherLite.run(g,
      "MATCH (a:Step) MATCH (b:Subject) WHERE a.name = b.name " +
        "RETURN a.name, b.name").fold(e => fail(e), identity)
    val plan = eq.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("dual MATCH rejections keep their named errors") {
    val dup = CypherLite.parse(
      "MATCH (a:Step) MATCH (a:Step) RETURN a.name")
    assert(dup.isLeft && dup.swap.toOption.get.contains("distinct"),
      dup.toString)
    val foreign = CypherLite.run(g,
      "MATCH (a:Step) MATCH (b:Step) WHERE c.name = 'x' RETURN a.name")
    assert(foreign.isLeft, foreign.toString)
    val unprojected = CypherLite.parse(
      "MATCH (a:Step) MATCH (b:Step) RETURN a.name ORDER BY b.name")
    assert(unprojected.isLeft &&
      unprojected.swap.toOption.get.contains("ORDER BY"),
      unprojected.toString)
  }

  test("single-hop chain steps take the direct edge-join fast path") {
    // all-k=1 chain: no var-length kernel anywhere in the plan — the
    // kernel's eager localCheckpoint materializes as an ExistingRDD scan,
    // so its absence proves the fast path engaged
    val fast = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c)-[]->(d) " +
        "RETURN DISTINCT a.name, d.label").fold(e => fail(e), identity)
    val fastPlan = fast.queryExecution.executedPlan.toString
    assert(!fastPlan.contains("ExistingRDD"), fastPlan.take(400))
    // a ranged step whose types COLLIDE with another segment (here:
    // untyped × untyped) routes through the r14 isomorphism expansion —
    // pair-collapsed joins, no kernel checkpoint in the plan either
    // (ChainIsoSpec pins the kernel routing of DISJOINT-type ranged
    // segments and the correctness of the colliding form on a cycle)
    val ranged = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[*1..2]->(c) " +
        "RETURN DISTINCT a.name, c.label").fold(e => fail(e), identity)
    assert(!ranged.queryExecution.executedPlan.toString
      .contains("ExistingRDD"))
  }

  test("chain and dual-MATCH ORDER BY take key lists") {
    val chain = CypherLite.run(g,
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c) " +
        "RETURN DISTINCT a.name, b.label, c.label " +
        "ORDER BY b.label DESC, c.label ASC LIMIT 5")
      .fold(e => fail(e), identity).collect()
    assert(chain.nonEmpty)
    val pairs = chain.map(r => (r.getAs[String]("b_label"),
      r.getAs[String]("c_label"))).toSeq
    // most-significant key descending, second ascending within ties
    assert(pairs == pairs.sortBy { case (b, c) => (b, c) }(
      Ordering.Tuple2(Ordering.String.reverse, Ordering.String)))
    val dual = CypherLite.run(g,
      "MATCH (x:Step) MATCH (y:Step) WHERE x.name < y.name " +
        "RETURN x.name, y.name ORDER BY x.name DESC, y.name DESC LIMIT 3")
      .fold(e => fail(e), identity).collect()
    val dp = dual.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(dp == dp.sortBy(identity)(Ordering.Tuple2(
      Ordering.String.reverse, Ordering.String.reverse)))
    // an unprojected key is still rejected per-key
    val bad = CypherLite.parse(
      "MATCH (a:X)-[]->(b)-[]->(c) RETURN a.name " +
        "ORDER BY a.name, b.label")
    assert(bad.isLeft && bad.swap.toOption.get.contains("ORDER BY"),
      bad.toString)
  }

  test("N-step chain rejections keep their named errors") {
    // duplicate variable across four nodes
    val dup = CypherLite.parse(
      "MATCH (a:X)-[]->(b)-[]->(c)-[]->(b) RETURN a.name")
    assert(dup.isLeft && dup.swap.toOption.get.contains("distinct"),
      dup.toString)
    // malformed tail after a well-formed pattern
    val bad = CypherLite.parse(
      "MATCH (a:X)-[]->(b)-[]->(c)-[]->(d) FROBNICATE a.name")
    assert(bad.isLeft, bad.toString)
  }

  test("legacy exists(v.prop) desugars to IS NOT NULL") {
    val all = CypherLite.run(g,
      "MATCH (m:Step) WHERE exists(m.name) RETURN m.name")
      .fold(e => fail(e), identity).count()
    assert(all == g.nodes.filter(col("label") === "Step").count())
    val none = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT exists(m.name) RETURN m.name")
      .fold(e => fail(e), identity).count()
    assert(none == 0)
    // composes with other conditions and the connected variable
    val conn = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..2]->(c) " +
        "WHERE exists(c.name) RETURN m.name, c.name")
    assert(conn.isRight, conn.toString)
    // a foreign variable is rejected by name
    val bad = CypherLite.run(g,
      "MATCH (m:Step) WHERE exists(zzz.name) RETURN m.name")
    assert(bad.isLeft && bad.swap.toOption.get.contains("exists()"),
      bad.toString)
  }

  test("global count(m) answers the hop-less census in one row") {
    val n = CypherLite.run(g, "MATCH (m:Step) RETURN count(m)")
      .fold(e => fail(e), identity).collect()
    assert(n.length == 1)
    assert(n.head.getAs[Long]("n_matched") ==
      g.nodes.filter(col("label") === "Step").count())
    // count(*) and count(DISTINCT m) agree with count(m) on nodes (node
    // identity is already distinct)
    val trio = CypherLite.run(g,
      "MATCH (m:Step) RETURN count(m) AS a, count(DISTINCT m) AS b")
      .fold(e => fail(e), identity).collect().head
    assert(trio.getAs[Long]("a") == trio.getAs[Long]("b"))
    val star = CypherLite.run(g, "MATCH (m:Step) RETURN count(*) AS n")
      .fold(e => fail(e), identity).collect().head
    assert(star.getAs[Long]("n") == n.head.getAs[Long]("n_matched"))
  }

  test("global aggregates combine in one summary row") {
    val row = CypherLite.run(g,
      "MATCH (m:Step) RETURN count(m) AS n, min(m.name) AS lo, " +
        "max(m.name) AS hi, collect(m.name) AS all_names")
      .fold(e => fail(e), identity).collect().head
    val names = g.nodes.filter(col("label") === "Step")
      .select("name").collect().map(_.getString(0)).sorted
    assert(row.getAs[Long]("n") == names.length)
    assert(row.getAs[String]("lo") == names.head)
    assert(row.getAs[String]("hi") == names.last)
    assert(row.getAs[String]("all_names") == names.mkString(","))
  }

  test("global aggregates over a hop pattern count bindings and roots") {
    val row = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(c) " +
        "RETURN count(c) AS bindings, count(DISTINCT c) AS nodes, " +
        "count(DISTINCT m) AS roots")
      .fold(e => fail(e), identity).collect().head
    val direct = GraphOps.neighborhoodWhereKeyed(g,
      col("label") === "Boeing_Service_Bulletin", 3)
    assert(row.getAs[Long]("bindings") == direct.count())
    assert(row.getAs[Long]("nodes") ==
      direct.select("c_id").distinct().count())
    assert(row.getAs[Long]("roots") ==
      direct.select("root_id").distinct().count())
  }

  test("global count over an empty match still answers one zero row") {
    val row = CypherLite.run(g,
      "MATCH (m:Step {name: 'no-such-node'}) RETURN count(m)")
      .fold(e => fail(e), identity).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("n_matched") == 0L)
  }

  test("global WHERE filters before aggregating") {
    val all = CypherLite.run(g, "MATCH (m:Step) RETURN count(m)")
      .fold(e => fail(e), identity).collect().head.getAs[Long]("n_matched")
    val some = CypherLite.run(g,
      "MATCH (m:Step) WHERE m.name CONTAINS 'step' RETURN count(m)")
      .fold(e => fail(e), identity).collect().head.getAs[Long]("n_matched")
    assert(some <= all)
    val direct = g.nodes.filter(col("label") === "Step")
      .filter(col("name").contains("step")).count()
    assert(some == direct)
  }

  test("global-aggregate misuse is rejected with named errors") {
    // mixing a global aggregate with a non-aggregate item would silently
    // become a grouped query — rejected
    val mixed = CypherLite.parse("MATCH (m:Step) RETURN count(m), m.name")
    assert(mixed.isLeft &&
      mixed.swap.toOption.get.contains("global"), mixed.toString)
    // ORDER BY over the single global row
    val ob = CypherLite.parse(
      "MATCH (m:Step) RETURN count(m) ORDER BY count(m)")
    assert(ob.isLeft, ob.toString)
    // m-side property aggregate under a hop pattern
    val hopAgg = CypherLite.parse(
      "MATCH (m:Step)-[*1..2]->(c) RETURN min(m.name)")
    assert(hopAgg.isLeft &&
      hopAgg.swap.toOption.get.contains("connected"), hopAgg.toString)
    // duplicate aggregate kinds get positionally-suffixed columns
    val dup = CypherLite.run(g,
      "MATCH (m:Step)-[*1..2]->(c) RETURN count(c), count(DISTINCT c)")
      .fold(e => fail(e), identity)
    assert(dup.columns.toSeq == Seq("n_connected", "n_connected_2"),
      dup.columns.toSeq.toString)
  }

  test("MERGE is match-or-create: same node as CREATE, re-run is a no-op") {
    val q = "MERGE (n:Note {name: 'todo-m', content: 'merge me'})"
    val (after1, s1) = CypherLite.runWrite(g, q).fold(e => fail(e), identity)
    assert(s1.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2))).toSeq == Seq(("Note", "todo-m", "merge me")))
    assert(after1.nodes.count() == g.nodes.count() + 1)
    // MERGE again: matched, not re-created
    val (after2, _) = CypherLite.runWrite(after1, q)
      .fold(e => fail(e), identity)
    assert(after2.nodes.count() == after1.nodes.count())
    // CREATE of the same map hits the same deterministic id — still a no-op
    val (after3, _) = CypherLite.runWrite(after2,
      "CREATE (n:Note {name: 'todo-m', content: 'merge me'})")
      .fold(e => fail(e), identity)
    assert(after3.nodes.count() == after1.nodes.count())
    // the read API refuses MERGE the same way it refuses CREATE
    val viaRun = CypherLite.run(g, q)
    assert(viaRun.isLeft &&
      viaRun.swap.toOption.get.contains("runWrite"), viaRun.toString)
    // a MERGE without a name property is rejected
    assert(CypherLite.parse("MERGE (n:Note {content: 'x'})").isLeft)
  }

  test("MERGE … ON CREATE SET / ON MATCH SET applies the branch that " +
      "actually happened") {
    val q = "MERGE (n:Note {name: 'onset'}) " +
      "ON CREATE SET n.content = 'fresh' ON MATCH SET n.content = 'seen'"
    // run 1: node absent → CREATE branch
    val (a1, s1) = CypherLite.runWrite(g, q).fold(e => fail(e), identity)
    assert(a1.nodes.count() == g.nodes.count() + 1)
    assert(s1.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2))).toSeq == Seq(("Note", "onset", "fresh")))
    // run 2: matched → MATCH branch flips the content, no new node
    val (a2, s2) = CypherLite.runWrite(a1, q).fold(e => fail(e), identity)
    assert(a2.nodes.count() == a1.nodes.count())
    assert(s2.collect().map(_.getString(2)).toSeq == Seq("seen"))
    // run 3: still matched — the matched branch is idempotent
    val (a3, s3) = CypherLite.runWrite(a2, q).fold(e => fail(e), identity)
    assert(a3.nodes.count() == a2.nodes.count())
    assert(s3.collect().map(_.getString(2)).toSeq == Seq("seen"))
    // clause order is free (Neo4j allows either)
    val (_, t1) = CypherLite.runWrite(g,
      "MERGE (n:Note {name: 'onset2'}) ON MATCH SET n.content = 'm' " +
        "ON CREATE SET n.content = 'c'").fold(e => fail(e), identity)
    assert(t1.collect().map(_.getString(2)).toSeq == Seq("c"))
    // a lone ON CREATE clause leaves a MATCHED node untouched
    val (_, u2) = CypherLite.runWrite(a1,
      "MERGE (n:Note {name: 'onset'}) " +
        "ON CREATE SET n.content = 'only-create'")
      .fold(e => fail(e), identity)
    assert(u2.collect().map(_.getString(2)).toSeq == Seq("fresh"))
    // values resolve from $params like every other write value
    val (_, pv) = CypherLite.runWrite(g,
      "MERGE (n:Note {name: $nm}) ON CREATE SET n.content = $cv",
      Map("nm" -> "onset3", "cv" -> "param-made"))
      .fold(e => fail(e), identity)
    assert(pv.collect().map(_.getString(2)).toSeq == Seq("param-made"))
    // r15: comma lists write several user properties per branch, and
    // name is writable (the summary's m_name shows the updated value)
    val (a4, s4) = CypherLite.runWrite(g,
      "MERGE (n:Note {name: 'onset4'}) " +
        "ON CREATE SET n.content = 'c4', n.name = 'renamed4'")
      .fold(e => fail(e), identity)
    assert(s4.collect().map(r => (r.getString(1), r.getString(2)))
      .toSeq == Seq(("renamed4", "c4")))
    assert(a4.nodes.filter(col("name") === "renamed4").count() == 1)
  }

  test("MERGE … ON SET rejections: non-content writes, duplicate " +
      "clauses, foreign variables, scripts") {
    def bad(q: String, frag: String): Unit = {
      val r = CypherLite.parse(q)
      assert(r.isLeft && r.swap.toOption.get.contains(frag), s"$q → $r")
    }
    // r15: name/docnbr are writable user properties now — the boundary
    // moved to the engine columns and duplicate keys within one clause
    assert(CypherLite.parse(
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.name = 'y'").isRight)
    assert(CypherLite.parse("MERGE (n:Note {name: 'x'}) " +
      "ON CREATE SET n.content = 'a', n.docnbr = 'b'").isRight)
    bad("MERGE (n:Note {name: 'x'}) ON CREATE SET n.label = 'y'",
      "not a node property")
    bad("MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'a', " +
      "n.content = 'b'", "duplicate property")
    bad("MERGE (n:Note {name: 'x'}) ON CREATE SET m.content = 'y'",
      "merged variable")
    bad("MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'a' " +
      "ON CREATE SET n.content = 'b'", "at most one")
    val mp = CypherLite.parse(
      "MERGE (n:Note {name: 'x'}) ON MATCH SET n.content = $gone")
    assert(mp.isLeft &&
      mp.swap.toOption.get.contains("missing parameter"), mp.toString)
    // the read API refuses the write
    val viaRun = CypherLite.run(g,
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'y'")
    assert(viaRun.isLeft &&
      viaRun.swap.toOption.get.contains("runWrite"), viaRun.toString)
    // scripts refuse it — the branch decision needs sequential
    // read-your-writes ordering a two-phase script cannot honor
    val sc = CypherLite.runScript(g, Seq(
      ("MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'y'",
        Map.empty[String, String])))
    assert(sc.isLeft && sc.swap.toOption.get.contains("sequential"),
      sc.toString)
  }

  test("EXISTS { } subquery spelling equals the bare pattern-existence") {
    val brace = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) " +
        "WHERE EXISTS { (m)-[*1..2]->(:Summary) } " +
        "RETURN m.docnbr").fold(e => fail(e), identity).collect().toSeq
    val bare = CypherLite.run(g,
      "MATCH (m:Boeing_Service_Bulletin) WHERE (m)-[*1..2]->(:Summary) " +
        "RETURN m.docnbr").fold(e => fail(e), identity).collect().toSeq
    assert(brace == bare && brace.nonEmpty)
    // the MATCH-keyword and NOT variants
    val notBrace = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT EXISTS { MATCH (m)-[]->() } " +
        "RETURN m.name").fold(e => fail(e), identity).count()
    val notBare = CypherLite.run(g,
      "MATCH (m:Step) WHERE NOT (m)-[]->() RETURN m.name")
      .fold(e => fail(e), identity).count()
    assert(notBrace == notBare && notBrace > 0)
    // same whole-clause restriction as the bare form: a foreign anchor
    // inside the braces is still rejected
    assert(CypherLite.parse(
      "MATCH (m:Step) WHERE EXISTS { (q)-[]->() } RETURN m.name").isLeft)
  }

  test("scalar functions in RETURN transform before DISTINCT and ORDER BY") {
    // toLower + size on the hop-less projection form
    val df = CypherLite.run(g,
      "MATCH (m:Subject) RETURN toLower(m.name) AS lname, size(m.name)")
      .fold(e => fail(e), identity)
    assert(df.columns.toSeq == Seq("lname", "size_name"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lname = r.getAs[String]("lname")
      assert(lname == lname.toLowerCase)
      assert(r.getAs[Long]("size_name") == lname.length.toLong)
    }
    // DISTINCT dedupes TRANSFORMED values: project a constant transform
    // (replace everything via left(…, 1) over a shared first char would
    // be fixture-dependent — use substring(0, 0) = empty for all rows)
    val collapsed = CypherLite.run(g,
      "MATCH (m:Step) RETURN DISTINCT substring(m.name, 0, 0)")
      .fold(e => fail(e), identity).collect()
    assert(collapsed.length == 1 && collapsed.head.getString(0) == "")
    // ORDER BY an fn alias sorts by the transformed value
    val ordered = CypherLite.run(g,
      "MATCH (m:Step) RETURN toUpper(m.name) AS uname " +
        "ORDER BY uname DESC LIMIT 3")
      .fold(e => fail(e), identity).collect().map(_.getString(0))
    assert(ordered.toSeq == ordered.toSeq.sorted.reverse)
    // replace + left/right/trim parse and compute
    val rep = CypherLite.run(g,
      "MATCH (m:Subject) RETURN replace(m.name, 'e', '_') AS r, " +
        "left(m.name, 2) AS l, right(m.name, 2) AS rr, trim(m.name) AS t")
      .fold(e => fail(e), identity).collect()
    rep.foreach { r =>
      assert(!r.getAs[String]("r").contains('e'))
      assert(r.getAs[String]("l").length <= 2)
      assert(r.getAs[String]("rr").length <= 2)
    }
    // rejected shape: aggregate mixes (a transformed grouping key is a
    // different query)
    assert(CypherLite.parse(
      "MATCH (m:Step) RETURN toLower(m.name), count(m)").isLeft)
    // BOTH sides transform under a hop since r14 (ConnScalarFnSpec owns
    // the execution contracts): m-side rides the root select, conn-side
    // the bindings
    val rootFn = CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) RETURN toLower(m.name) AS lname " +
        "ORDER BY lname LIMIT 2").fold(e => fail(e), identity).collect()
    assert(rootFn.forall(r =>
      r.getAs[String]("lname") == r.getAs[String]("lname").toLowerCase))
    assert(rootFn.nonEmpty)
    val connFn = CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, toLower(c.name)")
    assert(connFn.isRight, connFn.toString)
  }

  test("CASE expression in RETURN categorizes before DISTINCT/ORDER BY") {
    val df = CypherLite.run(g,
      "MATCH (m:Step) RETURN m.name, " +
        "CASE WHEN m.name CONTAINS '1' THEN 'one' " +
        "WHEN m.name CONTAINS '2' THEN 'two' ELSE 'other' END AS bucket")
      .fold(e => fail(e), identity)
    assert(df.columns.toSeq == Seq("m_name", "bucket"))
    df.collect().foreach { r =>
      val n = r.getAs[String]("m_name")
      val b = r.getAs[String]("bucket")
      // first-true-wins: a name with both '1' and '2' buckets as 'one'
      val expect = if (n.contains('1')) "one"
        else if (n.contains('2')) "two" else "other"
      assert(b == expect, s"$n -> $b")
    }
    // no ELSE → null; DISTINCT sees the case output
    val noElse = CypherLite.run(g,
      "MATCH (m:Step) RETURN DISTINCT " +
        "CASE WHEN m.name STARTS WITH 'zzz' THEN 'x' END")
      .fold(e => fail(e), identity).collect()
    assert(noElse.length == 1 && noElse.head.isNullAt(0))
    // malformed chains and wrong variables are rejected, not misparsed
    assert(CypherLite.parse(
      "MATCH (m:Step) RETURN CASE WHEN THEN 'x' END").isLeft)
    assert(CypherLite.parse(
      "MATCH (m:Step)-[*1..1]->(c) RETURN m.name, " +
        "CASE WHEN c.name = 'x' THEN 'y' END").isLeft)
    // two CASE items collide on the canonical column — rejected
    assert(CypherLite.parse(
      "MATCH (m:Step) RETURN CASE WHEN m.name = 'a' THEN 'x' END AS a, " +
        "CASE WHEN m.name = 'b' THEN 'y' END AS b").isLeft)
  }

  test("consecutive MATCH sharing a variable ≡ the single chain pattern") {
    def rows(q: String) = CypherLite.run(g, q)
      .fold(e => fail(e), identity).collect().map(_.toSeq).toSet
    val merged = rows(
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b) MATCH (b)-[]->(c) " +
        "RETURN a.name, c.name")
    val chain = rows(
      "MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c) " +
        "RETURN a.name, c.name")
    assert(merged == chain && merged.nonEmpty)
    // hop-less first clause: MATCH (a:L) MATCH (a)-[]->(c) re-anchors the
    // same variable — merges into the plain single-hop form
    val rean = rows("MATCH (a:Subject) MATCH (a)-[]->(c) RETURN a.name")
    val plain = rows("MATCH (a:Subject)-[]->(c) RETURN a.name")
    assert(rean == plain)
    // label repeated on the shared variable merges; conflicting errors
    assert(rows("MATCH (a:Boeing_Service_Bulletin)-[]->(b:Subject) " +
      "MATCH (b:Subject)-[]->(c) RETURN a.name, c.name") ==
      rows("MATCH (a:Boeing_Service_Bulletin)-[]->(b:Subject)-[]->(c) " +
        "RETURN a.name, c.name"))
    val conflict = CypherLite.parse(
      "MATCH (a:X)-[]->(b:Step) MATCH (b:Subject)-[]->(c) RETURN a.name")
    assert(conflict.isLeft &&
      conflict.swap.toOption.get.contains("conflicting label"))
    // bare pass-through WITH between the clauses is pure plumbing
    assert(rows("MATCH (a:Subject) WITH a MATCH (a)-[]->(c) " +
      "RETURN a.name") == plain)
    // the AGGREGATE With pipeline is untouched by the rewrite
    assert(CypherLite.run(g,
      "MATCH (m:Step)-[*1..1]->(c) WITH m, count(c) AS n WHERE n > 0 " +
        "RETURN m.name, n").isRight)
    // a fresh-variable follow-up is NOT merged (cartesian form untouched)
    assert(CypherLite.run(g,
      "MATCH (a:Subject) MATCH (b:Number) " +
        "RETURN a.name, b.name").isRight)
    // an OPTIONAL MATCH junction is left to optional semantics: roots
    // without a binding survive with nulls (a chain merge would drop them)
    val opt = CypherLite.run(g,
      "MATCH (m:Step) OPTIONAL MATCH (m)-[*1..1]->(c) RETURN m, c")
      .fold(e => fail(e), identity)
    assert(opt.filter(col("c_name").isNull).count() > 0)
  }

  test("WHERE comparisons AND a pattern-existence term combine into one " +
    "filtered semi-join") {
    // distinct nodes can share a name in this corpus, so compare
    // MULTISETS of projected names (sorted seqs), never sets
    def names(q: String) = CypherLite.run(g, q)
      .fold(e => fail(e), identity)
      .collect().map(_.getAs[String]("m_name")).sorted.toSeq
    val combined = names(
      "MATCH (m:Step) WHERE m.name CONTAINS 'e' AND (m)-[]->() " +
        "RETURN m.name")
    val byFilter = names("MATCH (m:Step) WHERE m.name CONTAINS 'e' " +
      "RETURN m.name")
    val byPattern = names("MATCH (m:Step) WHERE (m)-[]->() RETURN m.name")
    assert(combined.forall(byFilter.contains) &&
      combined.forall(byPattern.contains) && combined.nonEmpty)
    // NOT pattern conjunct partitions the filtered roots exactly
    val notCombined = names(
      "MATCH (m:Step) WHERE m.name CONTAINS 'e' AND NOT (m)-[]->() " +
        "RETURN m.name")
    assert((combined ++ notCombined).sorted == byFilter)
    // the EXISTS{} spelling of the same conjunct
    assert(names("MATCH (m:Step) WHERE m.name CONTAINS 'e' " +
      "AND EXISTS { (m)-[]->() } RETURN m.name") == combined)
    // a pattern term under OR cannot ride the comparison filter —
    // rejected with a named error, never a silent drop
    val orErr = CypherLite.parse(
      "MATCH (m:Step) WHERE m.name CONTAINS 'e' OR (m)-[]->() " +
        "RETURN m.name")
    assert(orErr.isLeft && orErr.swap.toOption.get.contains("AND"))
    assert(CypherLite.parse(
      "MATCH (m:Step) WHERE (m)-[:A]->() AND (m)-[:B]->() " +
        "RETURN m.name").isLeft)
  }

  test("COUNT { pattern } subquery normalizes onto the size() degree path") {
    def rows(q: String) = CypherLite.run(g, q)
      .fold(e => fail(e), identity).collect().map(_.toSeq).toSet
    val sub = rows("MATCH (m:Step) RETURN m.name, " +
      "COUNT { (m)-[]->(x) } AS deg ORDER BY m.name")
    val size = rows("MATCH (m:Step) RETURN m.name, " +
      "size((m)-[]->()) AS deg ORDER BY m.name")
    assert(sub == size && sub.nonEmpty)
    // the MATCH-prefixed spelling and a typed target work too
    assert(rows("MATCH (m:Step) RETURN m.name, " +
      "COUNT { MATCH (m)-[]->(x) } AS deg ORDER BY m.name") == size)
    // a WHERE inside the subquery is rejected, not silently miscounted
    assert(CypherLite.parse("MATCH (m:Step) RETURN m.name, " +
      "COUNT { (m)-[]->(x) WHERE x.name = 'y' } AS deg").isLeft)
  }

  test("comma-separated MATCH patterns rewrite to clause boundaries") {
    def rows(q: String) = CypherLite.run(g, q)
      .fold(e => fail(e), identity).collect().map(_.toSeq).toSet
    // linear pattern list ≡ the chain
    assert(rows("MATCH (a:Boeing_Service_Bulletin)-[]->(b), (b)-[]->(c) " +
      "RETURN a.name, c.name") ==
      rows("MATCH (a:Boeing_Service_Bulletin)-[]->(b)-[]->(c) " +
        "RETURN a.name, c.name"))
    // comma-cartesian of two hopless patterns ≡ the dual-MATCH form
    assert(rows("MATCH (a:Subject), (b:Number) RETURN a.name, b.name") ==
      rows("MATCH (a:Subject) MATCH (b:Number) RETURN a.name, b.name"))
    // a BRANCHING pattern list (shared root) is rejected, not mis-joined
    assert(CypherLite.parse(
      "MATCH (a:Step)-[]->(b), (a)-[]->(c) RETURN a.name").isLeft)
    // commas inside property maps / IN lists never split
    assert(CypherLite.run(g,
      "MATCH (m:Number {name: 'number', docnbr: ''}) RETURN m").isRight)
    assert(CypherLite.run(g,
      "MATCH (m:Step) WHERE m.name IN ['a', 'b'] RETURN m.name").isRight)
  }

  test("GQL quantified paths {1,K} normalize to the *1..K range form") {
    def rows(q: String) = CypherLite.run(g, q)
      .fold(e => fail(e), identity).collect().map(_.toSeq).toSet
    val gql = rows("MATCH (m:Boeing_Service_Bulletin)-[]->{1,3}(c) " +
      "RETURN m.name, count(c)")
    val range = rows("MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(c) " +
      "RETURN m.name, count(c)")
    assert(gql == range && gql.nonEmpty)
    // typed form
    assert(rows("MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY]->{1,2}(c) " +
      "RETURN m.name, count(c)") ==
      rows("MATCH (m:Boeing_Service_Bulletin)-[:HAS_SUMMARY*1..2]->(c) " +
        "RETURN m.name, count(c)"))
    // a 0 or deeper lower bound cannot be expressed — rejected by name
    val deep = CypherLite.parse(
      "MATCH (m:Step)-[]->{2,3}(c) RETURN m.name, count(c)")
    assert(deep.isLeft && deep.swap.toOption.get.contains("lower"))
    val zero = CypherLite.parse(
      "MATCH (m:Step)-[]->{,3}(c) RETURN m.name, count(c)")
    assert(zero.isLeft && zero.swap.toOption.get.contains("lower"))
  }

  test("allShortestPaths accepts and equals shortestPath on endpoints") {
    // the engine projects endpoint properties and length only, so all
    // min-length paths collapse to the same (a, b, length) rows
    val all = CypherLite.run(g,
      "MATCH p = allShortestPaths((a:Boeing_Service_Bulletin)-[*]->(b:Step)) " +
        "RETURN a.docnbr, b.name, length(p)")
      .fold(e => fail(e), identity).collect().toSeq
    val one = CypherLite.run(g,
      "MATCH p = shortestPath((a:Boeing_Service_Bulletin)-[*]->(b:Step)) " +
        "RETURN a.docnbr, b.name, length(p)")
      .fold(e => fail(e), identity).collect().toSeq
    assert(all == one && all.nonEmpty)
  }

  // ——— write surface: edge MERGE, batch labels, params, scripts ————————

  private def tinyGraph(): GraphTables = {
    import spark.implicits._
    val nodes = Seq(
      NodeRow(1L, "Region", "ASIA", "", "", "base", Nil),
      NodeRow(2L, "Region", "AFRICA", "", "", "base", Nil),
      NodeRow(3L, "Nation", "CHINA", "", "", "base", Nil)).toDS()
    GraphTables(nodes, spark.emptyDataset[EdgeRow])
  }

  test("edge MERGE after dual MATCH creates one edge per clause, " +
      "idempotently") {
    val tg = tinyGraph()
    val q = "MATCH (a:Region {name: 'ASIA'}), (b:Region {name: 'AFRICA'}) " +
      "MERGE (a)-[:BORDERS]->(b) MERGE (b)-[:BORDERS]->(a)"
    val (after, summary) = CypherLite.runWrite(tg, q)
      .fold(e => fail(e), identity)
    assert(summary.collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("BORDERS", 2L)))
    val edges = after.edges.collect().map(e => (e.src, e.dst, e.relType))
    assert(edges.toSet == Set((1L, 2L, "BORDERS"), (2L, 1L, "BORDERS")))
    // MERGE is match-or-create on the edge key: rerun adds nothing
    val (again, _) = CypherLite.runWrite(after, q)
      .fold(e => fail(e), identity)
    assert(again.edges.count() == 2)
    // a side that matches nothing merges nothing (no endpoint creation)
    val (none, _) = CypherLite.runWrite(tg,
      "MATCH (a:Region {name: 'ASIA'}), (b:City {name: 'XI'}) " +
        "MERGE (a)-[:HAS_CITY]->(b)").fold(e => fail(e), identity)
    assert(none.edges.count() == 0 && none.nodes.count() == 3)
    // the read API refuses the write form
    val viaRun = CypherLite.run(tg, q)
    assert(viaRun.isLeft && viaRun.swap.toOption.get.contains("runWrite"),
      viaRun.toString)
  }

  test("multi-label MERGE carries the batch tag; DETACH DELETE by tag " +
      "removes the whole batch") {
    val tg = tinyGraph()
    val (tagged, _) = CypherLite.runWrite(tg,
      "MERGE (n:Note:Ingest42 {name: 'memo', content: 'c1'})")
      .fold(e => fail(e), identity)
    val note = tagged.nodes.filter(col("label") === "Note").collect()
    assert(note.length == 1 && note.head.batch == "Ingest42")
    // edge through the tagged node inherits the tag
    val (withEdge, _) = CypherLite.runWrite(tagged,
      "MATCH (a:Nation {name: 'CHINA'}), (b:Note:Ingest42 {name: 'memo'}) " +
        "MERGE (a)-[:HAS_NOTE]->(b)").fold(e => fail(e), identity)
    assert(withEdge.edges.collect().forall(_.batch == "Ingest42"))
    // the reference's batch delete (`deleteneo.py:10-12`) drops it all
    val (clean, _) = CypherLite.runWrite(withEdge,
      "MATCH (n) WHERE n.Ingest42 = true DETACH DELETE n")
      .fold(e => fail(e), identity)
    assert(clean.nodes.count() == tg.nodes.count() &&
      clean.edges.count() == 0)
  }

  test("write parameters resolve token-wise and report missing names") {
    val tg = tinyGraph()
    // a value with quotes round-trips — params are never text-spliced
    val (after, _) = CypherLite.runWrite(tg,
      "MERGE (n:Note:B7 {name: $name, content: $content})",
      Map("name" -> "x'y", "content" -> "it's quoted"))
      .fold(e => fail(e), identity)
    val row = after.nodes.filter(col("label") === "Note").collect().head
    assert(row.name == "x'y" && row.content == "it's quoted")
    val missing = CypherLite.runWrite(tg,
      "MERGE (n:Note {name: $nope})", Map("other" -> "x"))
    assert(missing.isLeft &&
      missing.swap.toOption.get.contains("$nope"), missing.toString)
    val badVar = CypherLite.parse(
      "MATCH (a:Region {name: 'ASIA'}), (b:Region {name: 'AFRICA'}) " +
        "MERGE (a)-[:R]->(c)")
    assert(badVar.isLeft &&
      badVar.swap.toOption.get.contains("'c'"), badVar.toString)
    val selfLoop = CypherLite.parse(
      "MATCH (a:Region {name: 'ASIA'}), (b:Region {name: 'AFRICA'}) " +
        "MERGE (a)-[:R]->(a)")
    assert(selfLoop.isLeft &&
      selfLoop.swap.toOption.get.contains("self-loop"), selfLoop.toString)
  }

  test("edge-property MERGE writes EdgeRow.props; the weighted kernel " +
      "reads them back") {
    val tg = tinyGraph()
    // weights written through the Cypher surface (set-on-create props);
    // r1 -> n1 costs 3, n1 -> r2 costs 4 via two statements
    val s1 = "MATCH (a:Region {name: 'ASIA'}), (b:Nation {name: 'CHINA'}) " +
      "MERGE (a)-[:ROAD {weight: $w, kind: 'paved'}]->(b)"
    val s2 = "MATCH (a:Nation {name: 'CHINA'}), " +
      "(b:Region {name: 'AFRICA'}) MERGE (a)-[:ROAD {weight: $w}]->(b)"
    val (g1, _) = CypherLite.runWrite(tg, s1, Map("w" -> "3"))
      .fold(e => fail(e), identity)
    val (g2, _) = CypherLite.runWrite(g1, s2, Map("w" -> "4"))
      .fold(e => fail(e), identity)
    val edges = g2.edges.collect()
    assert(edges.length == 2)
    assert(edges.find(_.src == 1L).get.props ==
      Map("weight" -> "3", "kind" -> "paved"))
    // props are SET-ON-CREATE: re-merging with a different weight is a
    // no-op on the existing (src, dst, relType) key
    val (g3, _) = CypherLite.runWrite(g2, s1, Map("w" -> "99"))
      .fold(e => fail(e), identity)
    assert(g3.edges.filter(col("src") === 1L).collect()
      .head.props("weight") == "3")
    // the weighted kernel reads the Cypher-written costs: ASIA reaches
    // AFRICA at 3 + 4 = 7
    val dist = GraphOps.shortestPathWeighted(spark, g2, Set(1L))
      .filter(col("id") === 2L).collect()
    assert(dist.length == 1 && dist.head.getAs[Double]("distance") == 7.0)
    // same props through the batched script path
    val (gs, _) = CypherLite.runScript(tg, Seq((s1, Map("w" -> "5"))))
      .fold(e => fail(e), identity)
    assert(gs.edges.collect().head.props ==
      Map("weight" -> "5", "kind" -> "paved"))
  }

  test("parameterized batch-tagged SET updates only the tagged match " +
      "(the reference's content-update statement)") {
    val tg = tinyGraph()
    // two Title nodes, same name, different batch tags — the reference's
    // `MATCH (n:Title:Batch {name: $name, docnbr: $docnbr}) SET
    // n.content = $content` (`new-converter.js:136-140`) must touch only
    // the tagged one
    val (seeded, _) = CypherLite.runScript(tg, Seq(
      ("MERGE (n:Title:B1 {name: $name, docnbr: $d})",
        Map("name" -> "Summary", "d" -> "100")),
      ("MERGE (n:Title:B2 {name: $name, docnbr: $d})",
        Map("name" -> "Summary", "d" -> "200"))))
      .fold(e => fail(e), identity)
    val (after, summary) = CypherLite.runWrite(seeded,
      "MATCH (n:Title:B1 {name: $name, docnbr: $docnbr}) " +
        "SET n.content = $content",
      Map("name" -> "Summary", "docnbr" -> "100",
        "content" -> "gathered 'text'"))
      .fold(e => fail(e), identity)
    assert(summary.count() == 1)
    val titles = after.nodes.filter(col("label") === "Title").collect()
    assert(titles.filter(_.batch == "B1").forall(
      _.content == "gathered 'text'"))
    assert(titles.filter(_.batch == "B2").forall(_.content == ""))
    val missing = CypherLite.runWrite(seeded,
      "MATCH (n:Title:B1 {name: 'Summary'}) SET n.content = $gone",
      Map.empty)
    assert(missing.isLeft &&
      missing.swap.toOption.get.contains("$gone"), missing.toString)
  }

  test("runScript two-phase batch equals the sequential runWrite fold") {
    val tg = tinyGraph()
    // the reference's ingest shape: node MERGE then the parent edge pair,
    // per entity (`new_final.js:15-47`), parameterized
    val script = Seq("Hebei", "Gansu", "Fujian").flatMap { prov =>
      Seq(
        ("MERGE (n:Province:B9 {name: $name})", Map("name" -> prov)),
        ("MATCH (p:Nation {name: $pn}), (c:Province:B9 {name: $cn}) " +
          "MERGE (p)-[:HAS_PROVINCE]->(c) MERGE (c)-[:PROVINCE_OF]->(p)",
          Map("pn" -> "CHINA", "cn" -> prov)))
    }
    val (batched, census) = CypherLite.runScript(tg, script)
      .fold(e => fail(e), identity)
    val sequential = script.foldLeft(tg) { case (acc, (q, p)) =>
      CypherLite.runWrite(acc, q, p).fold(e => fail(e), identity)._1
    }
    assert(batched.nodes.collect().toSet == sequential.nodes.collect().toSet)
    assert(batched.edges.collect().toSet == sequential.edges.collect().toSet)
    assert(census.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      .view.filterKeys(k => k.contains("PROVINCE") || k.contains("Province"))
      .toMap == Map("node:Province" -> 3L, "edge:HAS_PROVINCE" -> 3L,
        "edge:PROVINCE_OF" -> 3L))
    // replaying the whole script over the result is a no-op (MERGE keys)
    val (replayed, _) = CypherLite.runScript(batched, script)
      .fold(e => fail(e), identity)
    assert(replayed.nodes.count() == batched.nodes.count() &&
      replayed.edges.count() == batched.edges.count())
    // scripts are MERGE-only: sequential-semantics statements are named
    val set = CypherLite.runScript(tg,
      Seq(("MATCH (m:Nation) SET m.content = 'x'",
        Map.empty[String, String])))
    assert(set.isLeft && set.swap.toOption.get.contains("statement 1"),
      set.toString)
    val read = CypherLite.runScript(tg,
      Seq(("MATCH (m:Nation) RETURN m", Map.empty[String, String])))
    assert(read.isLeft, read.toString)
  }
}
