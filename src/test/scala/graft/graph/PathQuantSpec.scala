package graft.graph

import graft.SparkSpec

/** Path-quantified ranged patterns (round-13 directive 4):
  * `MATCH p = (a)-[r:T*lo..hi]->(b) WHERE ALL(x IN relationships(p)
  * WHERE x.prop …) RETURN …` and the along-the-path
  * `reduce(s = 0, x IN relationships(p) | s + x.prop)` sum. Semantics
  * pinned here: one row per PATH (bag), relationship-unique, directed,
  * ALL() as an edge-relation pre-filter.
  */
class PathQuantSpec extends SparkSpec {

  private def node(id: Long, label: String = "N"): NodeRow =
    NodeRow(id, label, s"n$id", "", "", "b1", Seq.empty)

  // weighted diamond + a heavy direct edge + a spur:
  //   1 →(w1)→ 2 →(w2)→ 4
  //   1 →(w9)→ 3 →(w1)→ 4
  //   1 →(w7)→ 4        (direct)
  //   4 →(w1)→ 5        (spur)
  private lazy val g = {
    import spark.implicits._
    GraphTables(
      (1L to 5L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1", Map("weight" -> "1")),
        EdgeRow(2L, 4L, "ROAD", "", "b1", Map("weight" -> "2")),
        EdgeRow(1L, 3L, "ROAD", "", "b1", Map("weight" -> "9")),
        EdgeRow(3L, 4L, "ROAD", "", "b1", Map("weight" -> "1")),
        EdgeRow(1L, 4L, "ROAD", "", "b1", Map("weight" -> "7")),
        EdgeRow(4L, 5L, "ROAD", "", "b1", Map("weight" -> "1"))
      ).toDS())
  }

  private def rows(q: String) =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity).collect()

  test("ALL(x IN relationships(p) WHERE …) keeps only paths whose EVERY " +
      "edge passes — one row per qualifying path") {
    // paths 1→…→4 of length 1..2: direct (w7), via 2 (w1,w2), via 3
    // (w9,w1). ALL weight < 5 keeps only the via-2 path.
    val r = rows("MATCH p = (a:N {name: 'n1'})-[r:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) WHERE ALL(x IN relationships(p) WHERE x.weight < 5) " +
      "RETURN b.name, length(p)")
    assert(r.map(x => (x.getAs[String]("b_name"),
      x.getAs[Int]("path_len"))).toSeq == Seq(("n4", 2)))
    // ALL weight < 8 admits the direct hop too → two paths, two rows
    val r2 = rows("MATCH p = (a:N {name: 'n1'})-[r:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) WHERE ALL(x IN relationships(p) WHERE x.weight < 8) " +
      "RETURN length(p) ORDER BY length(p)")
    assert(r2.map(_.getAs[Int]("path_len")).toSeq == Seq(1, 2))
  }

  test("reduce() sums the edge property along each path; bag semantics " +
      "answer one row per path") {
    val r = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) RETURN length(p), reduce(s = 0, x IN " +
      "relationships(p) | s + x.weight) AS cost ORDER BY cost")
    assert(r.map(x => (x.getAs[Int]("path_len"),
      x.getAs[Double]("cost"))).toSeq ==
      Seq((2, 3.0), (1, 7.0), (2, 10.0)))
  }

  test("ALL and reduce compose; the quantifier filters BEFORE the sum") {
    val r = rows("MATCH p = (a:N {name: 'n1'})-[r:ROAD*1..3]->(b:N " +
      "{name: 'n5'}) WHERE ALL(x IN relationships(p) WHERE x.weight < 5) " +
      "RETURN b.name, reduce(s = 0, x IN relationships(p) | s + " +
      "toFloat(x.weight)) AS total")
    // only 1→2→4→5 survives (via-3 has w9, direct has w7): total 4
    assert(r.map(x => (x.getAs[String]("b_name"),
      x.getAs[Double]("total"))).toSeq == Seq(("n5", 4.0)))
  }

  test("the range bounds clip path lengths; lo > 1 excludes shorter " +
      "paths even when they exist") {
    val r = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*2..2]->(b:N " +
      "{name: 'n4'}) RETURN length(p)")
    assert(r.map(_.getAs[Int]("path_len")).toSeq == Seq(2, 2))
  }

  test("relationship-uniqueness: a cycle cannot reuse an edge within " +
      "one path") {
    import spark.implicits._
    // 2-cycle a↔b: paths from a of length ≤3 are a→b (len 1) and
    // a→b→a (len 2); a→b→a→b would reuse the a→b edge — excluded
    val cyc = GraphTables(
      Seq(node(11), node(12)).toDS(),
      Seq(EdgeRow(11L, 12L, "ROAD", "", "b1", Map("weight" -> "1")),
        EdgeRow(12L, 11L, "ROAD", "", "b1", Map("weight" -> "1"))).toDS())
    val r = CypherLite.run(cyc, "MATCH p = (a:N {name: 'n11'})" +
      "-[:ROAD*1..3]->(b:N) RETURN b.name, length(p) ORDER BY path_len")
      .fold(e => fail(e), identity).collect()
    assert(r.map(x => (x.getAs[String]("b_name"),
      x.getAs[Int]("path_len"))).toSeq == Seq(("n12", 1), ("n11", 2)))
  }

  test("string comparisons, null tests, and boolean structure work " +
      "inside ALL(…)") {
    import spark.implicits._
    val g2 = GraphTables(
      (1L to 3L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1", Map("grade" -> "a")),
        EdgeRow(2L, 3L, "ROAD", "", "b1", Map("weight" -> "2"))).toDS())
    val r = CypherLite.run(g2, "MATCH p = (a:N {name: 'n1'})" +
      "-[:ROAD*2..2]->(b:N) WHERE ALL(x IN relationships(p) WHERE " +
      "x.grade = 'a' OR x.weight IS NOT NULL) RETURN b.name")
      .fold(e => fail(e), identity).collect()
    assert(r.map(_.getAs[String]("b_name")).toSeq == Seq("n3"))
    // flipping to AND kills every path (no edge carries both)
    val r2 = CypherLite.run(g2, "MATCH p = (a:N {name: 'n1'})" +
      "-[:ROAD*2..2]->(b:N) WHERE ALL(x IN relationships(p) WHERE " +
      "x.grade = 'a' AND x.weight IS NOT NULL) RETURN b.name")
      .fold(e => fail(e), identity).collect()
    assert(r2.isEmpty)
  }

  test("ANY / NONE / SINGLE quantifiers: counter semantics, exact in " +
      "Kleene logic (null predicates block NONE and SINGLE, not ANY)") {
    // paths 1→…→4 of length ≤2: direct (w7), via 2 (w1,w2), via 3
    // (w9,w1). ANY(weight > 8): only the via-3 path carries a w9 edge.
    val any = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) WHERE ANY(x IN relationships(p) WHERE x.weight > 8) " +
      "RETURN length(p)")
    assert(any.map(_.getAs[Int]("path_len")).toSeq == Seq(2))
    // NONE(weight > 6): direct (w7) fails; via-3 (w9) fails; via-2 stays
    val none = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) WHERE NONE(x IN relationships(p) WHERE x.weight > 6) " +
      "RETURN length(p)")
    assert(none.map(_.getAs[Int]("path_len")).toSeq == Seq(2))
    // SINGLE(weight > 1): via-2 has exactly one (w2); direct one (w7);
    // via-3 has exactly one (w9) → all three qualify except… via-2:
    // w1 (no), w2 (yes) = 1 ✓; via-3: w9 (yes), w1 (no) = 1 ✓;
    // direct: w7 = 1 ✓ — so tighten: SINGLE(weight > 2) → direct (w7)
    // ✓, via-3 (w9) ✓, via-2 (w2? no — w2 > 2 is false, 0 hits) ✗
    val single = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) WHERE SINGLE(x IN relationships(p) WHERE " +
      "x.weight > 2) RETURN length(p) ORDER BY length(p)")
    assert(single.map(_.getAs[Int]("path_len")).toSeq == Seq(1, 2))
    // Kleene: a path through the weightless 1→(w?)→… — build a graph
    // with a missing weight on one edge: NONE must DROP the path whose
    // predicate is null on that edge (null is not false), ANY must keep
    // the path if another edge is true
    import spark.implicits._
    val g2 = GraphTables(
      (1L to 3L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "ROAD", "", "b1"), // no weight → null pred
        EdgeRow(2L, 3L, "ROAD", "", "b1", Map("weight" -> "9"))).toDS())
    def lens(q: String) = CypherLite.run(g2, q)
      .fold(e => fail(e), identity).collect()
      .map(_.getAs[Int]("path_len")).toSeq
    // NONE(w > 10): the len-1 path (null pred) drops — null, not false;
    // the len-2 path also carries the null edge → drops too
    assert(lens("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N) " +
      "WHERE NONE(x IN relationships(p) WHERE x.weight > 10) " +
      "RETURN length(p)") == Seq.empty)
    // ANY(w > 8): the len-2 path has a TRUE edge — the null edge is
    // irrelevant once one is true
    assert(lens("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N) " +
      "WHERE ANY(x IN relationships(p) WHERE x.weight > 8) " +
      "RETURN length(p)") == Seq(2))
    // SINGLE with a null sibling: one true + one null → null → drops
    assert(lens("MATCH p = (a:N {name: 'n1'})-[:ROAD*2..2]->(b:N) " +
      "WHERE SINGLE(x IN relationships(p) WHERE x.weight > 8) " +
      "RETURN length(p)") == Seq.empty)
  }

  test("fuzz: malformed path-quantified shapes reject by name") {
    def leftMsg(q: String): String =
      CypherLite.run(g, q).swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..20]->(b:N) RETURN b.name")
      .contains("path-enumeration cap"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*3..2]->(b:N) RETURN b.name")
      .contains("empty range"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) WHERE " +
      "ALL(x IN relationships(q) WHERE x.w > 1) RETURN b.name")
      .contains("path variable"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) WHERE " +
      "ALL(x IN relationships(p) WHERE a.name = 'n1') RETURN b.name")
      .contains("quantified"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
      "reduce(s = 0, x IN relationships(p) | s + y.weight)")
      .contains("must match"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN b.name " +
      "ORDER BY cost").contains("not a projected item"))
    // two reduce items
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
      "reduce(s = 0, x IN relationships(p) | s + x.weight) AS c1, " +
      "reduce(s = 0, x IN relationships(p) | s + x.weight) AS c2")
      .contains("at most one reduce"))
    // a reduce alias shadowing an internal frontier column would have
    // made the executor's rename manufacture a duplicate column and
    // die with an ambiguous-reference AnalysisException — named parse
    // error instead (ADVICE r14); case-insensitive like Spark's
    // resolution, and a NON-reserved alias still works
    for (bad <- Seq("visited", "cur", "hits", "Unks", "nds", "rels",
        "w", "eid", "ROOT_ID"))
      assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
        s"reduce(s = 0, x IN relationships(p) | s + x.weight) AS $bad")
        .contains("reserved"), s"alias $bad")
    assert(CypherLite.run(g, "MATCH p = (a:N)-[:ROAD*1..2]->(b:N) " +
      "RETURN reduce(s = 0, x IN relationships(p) | s + x.weight) " +
      "AS cost").isRight)
  }

  test("quantified shortestPath: WHERE ALL(…) pre-filters the edge " +
      "relation — the shortest path IN THE SUBGRAPH of passing edges") {
    // unfiltered: 1→4 direct (len 1). ALL weight < 5 removes the direct
    // (w7) and the via-3 (w9) edges: the shortest surviving path is
    // 1→2→4 (len 2). ALL weight < 2 leaves only 1→2 and 3→4: no path.
    val r = rows("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*1..4]->(b:N {name: 'n4'})) WHERE ALL(x IN " +
      "relationships(p) WHERE x.weight < 5) RETURN length(p)")
    assert(r.map(_.getAs[Int]("path_len")).toSeq == Seq(2))
    val none = rows("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*1..4]->(b:N {name: 'n4'})) WHERE ALL(x IN " +
      "relationships(p) WHERE x.weight < 2) RETURN length(p)")
    assert(none.isEmpty)
    // unbounded `*` composes too
    val unb = rows("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*]->(b:N {name: 'n5'})) WHERE ALL(x IN relationships(p) " +
      "WHERE x.weight < 5) RETURN b.name, length(p)")
    assert(unb.map(x => (x.getAs[String]("b_name"),
      x.getAs[Int]("path_len"))).toSeq == Seq(("n5", 3)))
    // NONE keeps only edges whose predicate is FALSE (null drops too):
    // NONE(weight >= 2) leaves only the w1 edges 1→3? no — 1→2 is w1
    // and 3→4 is w1: from n1 the passing subgraph is 1→2 only → no
    // path to n4; from n3 → 4 at len 1
    val sp = CypherLite.run(g, "MATCH p = shortestPath((a:N " +
      "{name: 'n3'})-[:ROAD*]->(b:N {name: 'n4'})) WHERE NONE(x IN " +
      "relationships(p) WHERE x.weight >= 2) RETURN length(p)")
      .fold(e => fail(e), identity).collect()
    assert(sp.map(_.getAs[Int]("path_len")).toSeq == Seq(1))
    assert(rows("MATCH p = shortestPath((a:N {name: 'n1'})-[:ROAD*]->" +
      "(b:N {name: 'n4'})) WHERE NONE(x IN relationships(p) WHERE " +
      "x.weight >= 2) RETURN length(p)").isEmpty)
    // an everywhere-false predicate under NONE keeps the whole graph:
    // n2 → n4 → n5 at len 2
    assert(rows("MATCH p = shortestPath((a:N {name: 'n2'})-[:ROAD*]->" +
      "(b:N {name: 'n5'})) WHERE NONE(x IN relationships(p) WHERE " +
      "x.weight > 9) RETURN length(p)")
      .map(_.getAs[Int]("path_len")).toSeq == Seq(2))
    // quantifier variable collisions and wrong path refs reject by name
    def leftMsg(q: String): String =
      CypherLite.run(g, q).swap.getOrElse(fail(s"$q unexpectedly parsed"))
    assert(leftMsg("MATCH p = shortestPath((a:N)-[:ROAD*]->(b:N)) " +
      "WHERE ALL(a IN relationships(p) WHERE a.weight < 5) " +
      "RETURN length(p)").contains("distinct"))
    assert(leftMsg("MATCH p = shortestPath((a:N)-[:ROAD*]->(b:N)) " +
      "WHERE ALL(x IN relationships(q) WHERE x.weight < 5) " +
      "RETURN length(p)").contains("path variable"))
  }

  test("ORDER BY a projected key + LIMIT page the path bag " +
      "deterministically") {
    val r = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) RETURN length(p), reduce(s = 0, x IN " +
      "relationships(p) | s + x.weight) AS cost ORDER BY cost DESC " +
      "LIMIT 2")
    assert(r.map(_.getAs[Double]("cost")).toSeq == Seq(10.0, 7.0))
  }

  test("nodes(p) / relationships(p) serialize the path contents IN " +
      "PATH ORDER; they compose with quantifiers and each other") {
    // the three 1→…→4 paths, each with a distinct node trail
    val r = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) RETURN nodes(p), length(p) ORDER BY nodes(p)")
    assert(r.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[Int]("path_len"))).toSeq ==
      Seq(("n1,n2,n4", 2), ("n1,n3,n4", 2), ("n1,n4", 1)))
    // relationships(p) over a MIXED-type chain answers the types in
    // path order (the single-type form would repeat one type)
    import spark.implicits._
    val g3 = GraphTables(
      (1L to 3L).map(node(_)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "RAIL", "", "b1", Map("weight" -> "1")),
        EdgeRow(2L, 3L, "ROAD", "", "b1", Map("weight" -> "2"))).toDS())
    val mixed = CypherLite.run(g3, "MATCH p = (a:N {name: 'n1'})" +
      "-[:RAIL|ROAD*1..2]->(b:N) RETURN nodes(p), relationships(p) " +
      "ORDER BY nodes(p)").fold(e => fail(e), identity).collect()
    assert(mixed.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[String]("path_rels"))).toSeq ==
      Seq(("n1,n2", "RAIL"), ("n1,n2,n3", "RAIL,ROAD")))
    // quantifier composition: the accessor projects the SURVIVING bag
    val q = rows("MATCH p = (a:N {name: 'n1'})-[:ROAD*1..2]->(b:N " +
      "{name: 'n4'}) WHERE ALL(x IN relationships(p) WHERE " +
      "x.weight < 5) RETURN nodes(p), relationships(p)")
    assert(q.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[String]("path_rels"))).toSeq ==
      Seq(("n1,n2,n4", "ROAD,ROAD")))
    // rejections: foreign variables and aliases, by name
    def leftMsg(qs: String): String =
      CypherLite.run(g, qs).swap.getOrElse(fail(s"$qs unexpectedly " +
        "parsed"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
      "nodes(q)").contains("path variable"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
      "relationships(q)").contains("path variable"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
      "nodes(p) AS trail").contains("path_nodes"))
    assert(leftMsg("MATCH p = (a:N)-[:ROAD*1..2]->(b:N) RETURN " +
      "relationships(p) AS kinds").contains("path_rels"))
  }

  test("shortestPath reconstruction: nodes(p)/relationships(p) answer " +
      "the actual route; equal-length ties break to the smallest " +
      "serialization; allShortestPaths answers every min-length path") {
    // the diamond: severing ONLY the direct w7 edge (weight <> 7)
    // leaves 1→2→4 and 1→3→4 BOTH at length 2 — shortestPath must
    // answer exactly one, the lexicographically smallest node trail
    val r = rows("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*1..4]->(b:N {name: 'n4'})) WHERE ALL(x IN " +
      "relationships(p) WHERE x.weight <> 7) " +
      "RETURN nodes(p), relationships(p), length(p)")
    assert(r.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[String]("path_rels"), x.getAs[Int]("path_len"))).toSeq ==
      Seq(("n1,n2,n4", "ROAD,ROAD", 2)))
    // a filter that also kills the heavy 1→3 edge leaves ONE route
    val one = rows("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*1..4]->(b:N {name: 'n4'})) WHERE ALL(x IN " +
      "relationships(p) WHERE x.weight < 5) " +
      "RETURN nodes(p), length(p)")
    assert(one.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[Int]("path_len"))).toSeq == Seq(("n1,n2,n4", 2)))
    // unfiltered: the direct w7 edge wins at length 1
    val direct = rows("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*1..4]->(b:N {name: 'n4'})) RETURN nodes(p), length(p)")
    assert(direct.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[Int]("path_len"))).toSeq == Seq(("n1,n4", 1)))
    // allShortestPaths under the tie: BOTH length-2 routes, one row each
    val all = rows("MATCH p = allShortestPaths((a:N {name: 'n1'})" +
      "-[:ROAD*1..4]->(b:N {name: 'n4'})) WHERE ALL(x IN " +
      "relationships(p) WHERE x.weight <> 7) " +
      "RETURN nodes(p), length(p) ORDER BY length(p)")
    assert(all.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[Int]("path_len"))).toSet ==
      Set(("n1,n2,n4", 2), ("n1,n3,n4", 2)))
    // unbounded `*` cannot reconstruct — named rejection
    def leftMsg(qs: String): String =
      CypherLite.run(g, qs).swap.getOrElse(fail(s"$qs unexpectedly " +
        "parsed"))
    assert(leftMsg("MATCH p = shortestPath((a:N {name: 'n1'})" +
      "-[:ROAD*]->(b:N {name: 'n4'})) RETURN nodes(p)")
      .contains("bounded"))
  }

  test("direction on path forms: <- walks the reversed relation, " +
      "-[]- is undirected with orientation-blind edge uniqueness") {
    // incoming: start at n4, stored edges INTO it — the reversed
    // diamond; nodes(p) serializes from the pattern's left endpoint
    val in = rows("MATCH p = (x:N {name: 'n4'})<-[r:ROAD*1..2]-(y:N " +
      "{name: 'n1'}) RETURN nodes(p), length(p) ORDER BY nodes(p)")
    assert(in.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[Int]("path_len"))).toSeq ==
      Seq(("n4,n1", 1), ("n4,n2,n1", 2), ("n4,n3,n1", 2)))
    // undirected single step from n4: neighbors in EITHER direction
    val und = rows("MATCH p = (x:N {name: 'n4'})-[r:ROAD*1..1]-(y:N) " +
      "RETURN y.name ORDER BY y_name")
    assert(und.map(_.getAs[String]("y_name")).toSeq ==
      Seq("n1", "n2", "n3", "n5"))
    // orientation-blind uniqueness: ONE stored edge cannot make the
    // 2-step bounce x-y-x (rows through n5, which only connects via
    // 4→5, must not answer a length-2 path back to n4)
    val bounce = rows("MATCH p = (x:N {name: 'n5'})-[r:ROAD*2..2]-" +
      "(y:N {name: 'n5'}) RETURN length(p)")
    assert(bounce.isEmpty)
    // quantifier composes with direction: incoming ALL over the
    // reversed diamond — only the via-2 trail has every weight < 5
    val inAll = rows("MATCH p = (x:N {name: 'n4'})<-[r:ROAD*2..2]-" +
      "(y:N {name: 'n1'}) WHERE ALL(z IN relationships(p) WHERE " +
      "z.weight < 5) RETURN nodes(p)")
    assert(inAll.map(_.getAs[String]("path_nodes")).toSeq ==
      Seq("n4,n2,n1"))
    // shortestPath undirected with reconstruction: n5 reaches n3 only
    // through n4 (against 3→4) — the actual route comes back
    val spu = rows("MATCH p = shortestPath((a:N {name: 'n5'})" +
      "-[:ROAD*1..4]-(b:N {name: 'n3'})) RETURN nodes(p), length(p)")
    assert(spu.map(x => (x.getAs[String]("path_nodes"),
      x.getAs[Int]("path_len"))).toSeq == Seq(("n5,n4,n3", 2)))
    // both-ended arrows reject by name
    def leftMsg(qs: String): String =
      CypherLite.run(g, qs).swap.getOrElse(fail(s"$qs unexpectedly " +
        "parsed"))
    assert(leftMsg("MATCH p = (a:N)<-[r:ROAD*1..2]->(b:N) " +
      "RETURN length(p)").contains("point both ways"))
    assert(leftMsg("MATCH p = shortestPath((a:N)<-[:ROAD*1..2]->(b:N))" +
      " RETURN length(p)").contains("point both ways"))
  }
}
