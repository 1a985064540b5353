package graft.graph

import graft.SparkSpec

/** Robustness of the Cypher front end as a TOTAL function: the callers it
  * serves feed it LLM-generated text, so for ANY input — well-formed,
  * near-grammar, or garbage — `run()` must answer `Left(error)` or a
  * `Right(df)` that collects, and never throw from the parser or the
  * plan builder (a MatchError on query text is a denial-of-service shape
  * for a serving layer). Inputs are deterministic recombinations of
  * grammar fragments (seeded PRNG — reproducible, no wall-clock or
  * global randomness), plus mutation: truncation at every prefix length
  * and single-token deletion.
  */
class CypherFuzzSpec extends SparkSpec {

  private lazy val g: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(NodeRow(1L, "Region", "r1", "", "", "base", Seq.empty),
        NodeRow(2L, "Nation", "n1", "c", "", "base", Seq.empty),
        NodeRow(3L, "Nation", "n2", "", "", "base", Seq.empty)).toDS(),
      Seq(EdgeRow(1L, 2L, "HAS_NATION", "", "base"),
        EdgeRow(2L, 3L, "HAS_NEXT", "", "base")).toDS())
  }

  private val heads = Seq("MATCH (m:Region)", "MATCH (m)",
    "MATCH (m:Nation {name: 'n1'})", "OPTIONAL MATCH", "MATCH (m:Region),",
    "MATCH (m:Region) WITH m MATCH (m)", "MATCH p = shortestPath((a:Region)",
    "UNWIND ['n1'] AS x MATCH (m)", "MATCH",
    "UNWIND ['n1'] AS x MATCH (m {name: x})",
    "UNWIND ['n1'] AS x MATCH (m:Nation {name: x})",
    "UNWIND ['n1', 'n1'] AS x MATCH (m {name: x})",
    "UNWIND ['n1'] AS x MATCH (m {name: x",
    // top-k WITH … LIMIT heads (round 16) + near-misses
    "MATCH (m:Nation) WITH m LIMIT 2 MATCH (m)",
    "MATCH (m:Nation) WITH m ORDER BY m.name DESC LIMIT 2 MATCH (m)",
    "MATCH (m:Nation) WITH m ORDER BY toLower(m.name) LIMIT 2 MATCH (m)",
    "MATCH (m:Nation) WITH m ORDER BY c.name LIMIT 2 MATCH (m)",
    "MATCH (m:Nation) WITH m LIMIT 99999 MATCH (m)",
    "MATCH (m:Nation) WITH m LIMIT MATCH (m)",
    "MATCH (m)-[]->(z) WITH m LIMIT 2 MATCH (m)",
    "MATCH (m:Nation) WITH m ORDER BY size((m)-[]->()) DESC LIMIT 2 " +
      "MATCH (m)",
    "MATCH (m:Nation) WITH m SKIP 1 LIMIT 2 MATCH (m)",
    "MATCH (m:Nation) WITH m LIMIT 2 OPTIONAL MATCH (m)",
    "MATCH (m:Nation)-[]->(c) WITH m.name AS mn, count(c) AS n " +
      "ORDER BY n DESC LIMIT 2 MATCH (m)",
    "MATCH (m:Nation)-[]->(c) WITH m.name AS mn, count(c) AS n " +
      "ORDER BY n LIMIT MATCH (m)",
    "MATCH (m:Nation)-[]->(c) WITH count(c) AS n ORDER BY n LIMIT 2 " +
      "MATCH (m)",
    // whole-variable rename heads (round 17) + near-misses
    "MATCH (m:Nation) WITH m AS x MATCH (x)",
    "MATCH (m:Nation) WITH m AS x WHERE x.name = 'n1' MATCH (x)",
    "MATCH (m:Nation) WITH m AS x ORDER BY x.name LIMIT 2 MATCH (x)",
    "MATCH (m:Nation) WITH m AS x, m AS y MATCH (x)",
    "MATCH (m:Nation) WITH m AS MATCH (m)",
    "MATCH (m:Nation), (c:Nation) WITH m AS c MATCH (c)",
    "MATCH (m:Nation) WITH m AS x WITH x MATCH (x)",
    // path-quantified ranged heads (round 13) + near-misses
    "MATCH p = (m:Region)", "MATCH p = (m)", "MATCH p =")
  private val hops = Seq("", "-[]->(c)", "-[:HAS_NATION]->(c)",
    // bracket-less shorthands (round 15) + near-misses
    "-->(c)", "<--(c)", "--(c)", "-->", "--",
    "-[*1..2]->(c)", "-[r]->(c)", "<-[]-(c)", "-[]-(c)", "-[]->{1,2}(c)",
    "-[]->{0,2}(c)", "-[:A|B]->(c)", "-[]->(c:Nation)", "-[]->(c)-[]->(d)",
    ", (c)-[]->(d)", "-[]->", "-[",
    // quantified ranged brackets (round 13) + near-misses
    "-[r:HAS_NATION*1..3]->(c)", "-[:HAS_NATION*2..9]->(c)",
    "-[:HAS_NATION*1..20]->(c)", "-[:HAS_NATION*3..2]->(c)",
    "-[x:HAS_NATION*1..2]->(c)",
    // relationship-property forms (round 12): inline maps, with/without
    // the variable, on typed/untyped/ranged brackets + near-misses
    "-[r:HAS_NATION {grade: 'a'}]->(c)", "-[:HAS_NATION {grade: 'a'}]->(c)",
    "-[r {w: '1'}]->(c)", "-[r:HAS_NATION*1..2 {w: '1'}]->(c)",
    "-[r:HAS_NATION {grade: 'a'",
    // direction on path/chain forms (round 13, third wave) + near-misses
    "<-[r:HAS_NATION*1..2]-(c)", "-[r:HAS_NATION*1..2]-(c)",
    "<-[r:HAS_NATION*1..2]->(c)",
    "-[:HAS_NATION]->(c)<-[:HAS_NEXT]-(d)",
    "<-[:HAS_NATION]-(c)<-[:HAS_NEXT]-(d)",
    "-[:HAS_NATION]-(c)-[:HAS_NEXT]->(d)",
    "-[r1:HAS_NATION]->(c)-[r2:HAS_NEXT {w: '1'}]->(d)",
    "-[r1:HAS_NATION {w: 2}]->(c)-[:HAS_NEXT]->(d)",
    "<-[:HAS_NATION]-(c)-[")
  private val wheres = Seq("", " WHERE m.name = 'n1'",
    // UNWIND comparison spellings (round 15) + near-misses
    " WHERE m.name = x", " WHERE x = m.name", " WHERE x = m.",
    " WHERE id(m) = 2", " WHERE id(m) >", " WHERE id(", " WHERE m.id = 2",
    // path-quantifier forms (round 13) + near-misses
    " WHERE ALL(x IN relationships(p) WHERE x.w > 1)",
    " WHERE ANY(x IN relationships(p) WHERE x.g = 'a')",
    " WHERE NONE(x IN relationships(p) WHERE x.w > 1)",
    " WHERE SINGLE(x IN relationships(p) WHERE x.w > 1)",
    " WHERE ALL(x IN relationships(q) WHERE x.w > 1)",
    " WHERE ALL(x IN relationships(p) WHERE m.name = 'a')",
    " WHERE ALL(x IN relationships(p) WHERE x.w >",
    " WHERE m.name CONTAINS", " WHERE (m)-[]->()",
    " WHERE m.name = 'a' AND NOT (m)-[]->()", " WHERE toLower(m.name)",
    " WHERE m.name IN ['a', 'b']", " WHERE c.name < m.name",
    " WHERE type(r) = 'HAS_NATION'", " WHERE exists(m.name)",
    " WHERE NOT EXISTS { (m)-[]->() }", " WHERE m.name =",
    " WHERE m.name = 'a' OR (m)-[]->()",
    " WHERE r.weight > 1", " WHERE r.weight IS NULL",
    " WHERE toLower(r.grade) = 'a'", " WHERE r.weight >",
    " WHERE r.weight > 1 AND c.name = 'n1'",
    // chain rel-filter conjuncts (round 13, third wave) + near-misses
    " WHERE r1.w > 1 AND r2.g = 'a'", " WHERE r1.w > 1 OR c.name = 'a'",
    " WHERE r1.w IS NOT NULL", " WHERE r1.w > 1 AND",
    // size() WHERE lens (round 14) + near-misses
    " WHERE size(m.name) > 2", " WHERE size(c.content) <= 4",
    // degree-threshold conjuncts (round 16) + near-misses
    " WHERE size((m)-[]->()) >= 1", " WHERE size((m)-[:HAS_NATION]->(:Nation)) < 2",
    " WHERE NOT size((m)-[]->()) = 0", " WHERE size((m)-[]->()) >=",
    " WHERE size((z)-[]->()) > 1", " WHERE m.name = 'n1' AND size((m)-[]->()) > 0",
    " WHERE size(m.name) = 'a'", " WHERE size(r.weight) > 1",
    " WHERE NOT size(m.name) > 2 OR m.name = 'n1'",
    " WHERE size(m.name", " WHERE size(m.name) >")
  // WITH pipeline fragments, incl. MULTI-aggregate forms and near-miss
  // shapes (duplicate alias, grouping item after an aggregate, dangling
  // comma/HAVING) — the round-10 multi-aggregate WITH surface must stay
  // total under recombination like everything else
  private val withs = Seq("",
    // first-stage WITH DISTINCT (round 15) + near-misses
    " WITH DISTINCT m.name AS t",
    " WITH DISTINCT c.name AS t ORDER BY t LIMIT 2",
    " WITH DISTINCT m", " WITH DISTINCT m.name AS t WHERE t > 1",
    " WITH DISTINCT m.name AS t, count(c) AS n", " WITH DISTINCT",
    " WITH m, count(c) AS n",
    " WITH m, collect(c.name) AS names",
    " WITH m, collect(DISTINCT c.name) AS names, count(c) AS n",
    " WITH m, collect(c.name) AS names WHERE names > 1",
    " WITH m, count(c) AS n WHERE n >= 1",
    " WITH m, count(c) AS n, sum(c.name) AS s",
    " WITH m, count(c) AS n, min(c.name) AS lo WHERE n > 0",
    " WITH m.name, count(DISTINCT c.name) AS n, avg(c.name) AS a",
    " WITH m, count(c) AS n, count(c) AS n",
    " WITH m, count(c) AS n, m.name, sum(c.name) AS s",
    " WITH m, count(c) AS n, min(c.name) AS lo WHERE lo >= 2",
    " WITH m, count(c) AS n, sum(c.name) AS",
    " WITH m, count(c) AS n,",
    // openCypher subclause order (WHERE after ORDER BY/LIMIT) + near-misses
    " WITH m, count(c) AS n ORDER BY n DESC LIMIT 2 WHERE n >= 1",
    " WITH m, count(c) AS n ORDER BY n WHERE n >= 1",
    " WITH m, count(c) AS n WHERE n >= 1 ORDER BY n WHERE n >= 2",
    " WITH m, count(c) AS n ORDER BY n WHERE",
    // chained stages (multi-WITH pipeline) + scope/shape near-misses
    " WITH m, count(c) AS n WITH n, count(*) AS g",
    " WITH m, count(c) AS n WHERE n >= 1 WITH n WHERE n <= 3",
    " WITH m, count(c) AS n WITH sum(n) AS total",
    " WITH m, count(c) AS n WITH c, count(*) AS g",
    " WITH m, count(c) AS n WITH n, sum(name) AS s",
    " WITH m, count(c) AS n WITH n, count(*) AS",
    " WITH m, count(c) AS n WITH",
    // implicit RETURN re-aggregation + DISTINCT stages + near-misses
    " WITH m, count(c) AS n WITH DISTINCT n",
    " WITH m, count(c) AS n WITH DISTINCT n, count(*) AS g",
    " WITH m, count(c) AS n WITH DISTINCT",
    " WITH m, sum(r.weight) AS t WHERE t > 1",
    " WITH m, sum(r.weight) AS")
  private val rets = Seq(" RETURN m", " RETURN m.name", " RETURN DISTINCT c",
    // path items (round 13) + near-misses
    " RETURN length(p)",
    " RETURN c.name, reduce(s = 0, x IN relationships(p) | s + x.w)",
    " RETURN reduce(s = 0, x IN relationships(p) | t + x.w)",
    " RETURN reduce(s = 0, x IN relationships(p) | s + x.w) AS t, " +
      "reduce(s = 0, x IN relationships(p) | s + x.w) AS u",
    " RETURN m, count(c)", " RETURN count(*)", " RETURN collect(c.name)",
    " RETURN m.name, COUNT { (m)-[]->(x) }", " RETURN type(r), count(r)",
    " RETURN size((m)-[]->())", " RETURN toUpper(m.name)",
    " RETURN CASE WHEN m.name = 'a' THEN 'x' END", " RETURN", "",
    " RETURN m.name AS", " DETACH DELETE m", " SET m.content = 'v'",
    " RETURN r.grade, count(r)", " RETURN sum(r.weight)",
    // accessors + reconstruction (round 13, third wave) + near-misses
    " RETURN nodes(p)", " RETURN relationships(p)",
    " RETURN nodes(p), relationships(p), length(p)",
    " RETURN nodes(q)", " RETURN nodes(p) AS t",
    " RETURN keys(r)", " RETURN properties(r)", " RETURN keys(m)",
    " RETURN coalesce(r.w, 'd')", " RETURN startNode(r)",
    " RETURN keys(r), count(*)", " RETURN properties(",
    // endpoint + node-accessor grammar (round 14) + near-misses
    " RETURN startNode(r).name", " RETURN endNode(r).label",
    " RETURN startNode(r).name AS sn ORDER BY sn",
    " RETURN startNode(r).nope", " RETURN endNode(m).name",
    " RETURN startNode(r).name, count(*)",
    " RETURN keys(c)", " RETURN properties(c)", " RETURN properties(m)",
    " RETURN keys(c), count(c)", " RETURN keys(z)",
    " RETURN m.name, keys(m)", " RETURN startNode(",
    // connected-side scalar transforms (round 14) + near-misses
    " RETURN toUpper(c.name)", " RETURN left(c.content, 3)",
    " RETURN substring(c.content, 0, 4) AS pfx ORDER BY pfx",
    " RETURN toUpper(c.name), count(c)", " RETURN trim(c.docnbr)",
    " RETURN replace(c.name, 'a', 'b')", " RETURN toUpper(c.",
    " RETURN m.name, r.weight ORDER BY r.weight", " RETURN r.",
    " RETURN c.name, r.weight",
    // UNWIND projection + whole-node endpoints (round 15) + near-misses
    " RETURN x", " RETURN x AS v", " RETURN x, count(*)",
    " RETURN coalesce(m.name, 'd')", " RETURN 1", " RETURN 'v' AS l",
    " RETURN id(m)", " RETURN id(c) AS cid", " RETURN id(m), count(c)",
    " RETURN id(z)", " RETURN elementId(m)",
    " RETURN count(x)", " RETURN endNode(r)",
    " RETURN startNode(r) AS sn ORDER BY sn",
    " RETURN startNode(r), count(*)")
  private val tails = Seq("", " ORDER BY m.name", " ORDER BY count(c) DESC",
    " LIMIT 2", " ORDER BY m.name SKIP 1 LIMIT 1", " UNION MATCH (m) RETURN m",
    " LIMIT", " ORDER BY",
    // scalar-fn sort keys (round 16) + near-misses
    " ORDER BY toLower(m.name)", " ORDER BY size(m.name) DESC, m.name",
    " ORDER BY toUpper(c.name)", " ORDER BY toLower(m.name",
    " ORDER BY toLower(z.name)", " ORDER BY toInteger(m.name) LIMIT 2")

  private def exercise(q: String): Unit =
    try CypherLite.run(g, q) match {
      case Right(df) => df.collect() // a Right must also EXECUTE cleanly
      case Left(e) => assert(e.nonEmpty, s"empty error for: $q")
    } catch {
      case ex: Throwable =>
        fail(s"run() threw ${ex.getClass.getSimpleName} on: $q\n$ex")
    }

  test("every fragment recombination answers Left or a collectable Right") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val q = heads(rnd.nextInt(heads.size)) + hops(rnd.nextInt(hops.size)) +
        wheres(rnd.nextInt(wheres.size)) + withs(rnd.nextInt(withs.size)) +
        rets(rnd.nextInt(rets.size)) + tails(rnd.nextInt(tails.size))
      exercise(q)
    }
  }

  test("prefix truncations and token deletions never escape Either") {
    val base = "MATCH (m:Region)-[:HAS_NATION*1..2]->(c:Nation) " +
      "WHERE m.name = 'r1' AND NOT (c)-[]->() " +
      "RETURN m.name, count(c) AS n ORDER BY n DESC LIMIT 2"
    (1 to base.length).foreach(k => exercise(base.take(k)))
    val toks = base.split(" ")
    toks.indices.foreach { i =>
      exercise((toks.take(i) ++ toks.drop(i + 1)).mkString(" "))
    }
  }

  test("multi-aggregate WITH truncations and token deletions never " +
      "escape Either") {
    val base = "MATCH (m:Region)-[:HAS_NATION]->(c) " +
      "WITH m, count(c) AS n, sum(c.name) AS s, min(c.name) AS lo " +
      "WHERE n >= 1 RETURN m.name, n, s, lo ORDER BY s DESC LIMIT 2"
    (1 to base.length).foreach(k => exercise(base.take(k)))
    val toks = base.split(" ")
    toks.indices.foreach { i =>
      exercise((toks.take(i) ++ toks.drop(i + 1)).mkString(" "))
    }
  }

  private def exerciseWrite(q: String,
      params: Map[String, String] = Map.empty): Unit =
    try CypherLite.runWrite(g, q, params) match {
      case Right((after, s)) => s.collect(); after.nodes.count()
      case Left(e) => assert(e.nonEmpty, s"empty error for: $q")
    } catch {
      case ex: Throwable =>
        fail(s"runWrite() threw ${ex.getClass.getSimpleName} on: $q\n$ex")
    }

  test("write-surface recombinations answer Left or an executable Right") {
    val nodePats = Seq("(a:Region {name: 'r1'})", "(a:Region)",
      "(a:Region:B1 {name: $p})", "(a:Region {name: $missing})",
      "(a:Region {name: 'r1'")
    val second = Seq(", (b:Nation {name: 'n1'})", ", (b:Nation)",
      ", (b:Nation:B1 {name: $p})", "", ", (b:")
    val merges = Seq(" MERGE (a)-[:R]->(b)",
      " MERGE (a)-[:R]->(b) MERGE (b)-[:R2]->(a)",
      " MERGE (a)-[:R]->(c)", " MERGE (a)-[:R]->(a)", " MERGE (a)-[:R]->",
      " MERGE (a)-[]->(b)", " MERGE (a)-[:R {weight: '2'}]->(b)",
      " MERGE (a)-[:R {weight: $p}]->(b)",
      " MERGE (a)-[:R {weight: $absent}]->(b)",
      " MERGE (a)-[:R {weight: '2']->(b)", "")
    val rnd = new scala.util.Random(97)
    (1 to 200).foreach { _ =>
      val q = "MATCH " + nodePats(rnd.nextInt(nodePats.size)) +
        second(rnd.nextInt(second.size)) + merges(rnd.nextInt(merges.size))
      exerciseWrite(q, Map("p" -> "r1"))
    }
    // node MERGE forms, incl. the batch-tag second label + param misses
    Seq("MERGE (n:Note {name: 'x'})", "MERGE (n:Note:B2 {name: $v})",
      "MERGE (n:Note:B2 {name: $gone})", "MERGE (n:Note:B2 {frob: 'x'})",
      "MERGE (n:Note:B2)", "MERGE (n:Note:B2 {name: 'x'",
      "CREATE (n:Note:B2 {name: 'x'})",
      // branch-aware MERGE (round 12) + near-misses: both orders,
      // params, duplicate clauses, foreign vars, non-content writes,
      // comma lists, truncations
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'a'",
      "MERGE (n:Note {name: 'x'}) ON MATCH SET n.content = $v",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'a' " +
        "ON MATCH SET n.content = 'b'",
      "MERGE (n:Note {name: 'x'}) ON MATCH SET n.content = 'b' " +
        "ON CREATE SET n.content = 'a'",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = $gone",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET m.content = 'a'",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.name = 'a'",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'a' " +
        "ON CREATE SET n.content = 'b'",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content = 'a', " +
        "n.docnbr = 'd'",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET n.content =",
      "MERGE (n:Note {name: 'x'}) ON CREATE SET",
      "MERGE (n:Note {name: 'x'}) ON CREATE",
      "MERGE (n:Note {name: 'x'}) ON")
      .foreach(exerciseWrite(_, Map("v" -> "ok")))
    // the full edge-merge statement survives truncation + token deletion
    val base = "MATCH (a:Region {name: 'r1'}), (b:Nation {name: 'n1'}) " +
      "MERGE (a)-[:HAS_N]->(b) MERGE (b)-[:PART_OF]->(a)"
    (1 to base.length).foreach(k => exerciseWrite(base.take(k)))
    val toks = base.split(" ")
    toks.indices.foreach { i =>
      exerciseWrite((toks.take(i) ++ toks.drop(i + 1)).mkString(" "))
    }
    // runScript totality on malformed scripts
    Seq(
      Seq(("MERGE (n:Note {name: 'x'})", Map.empty[String, String]),
        ("garbage", Map.empty[String, String])),
      Seq(("MATCH (m:Nation) RETURN m", Map.empty[String, String])),
      Seq.empty[(String, Map[String, String])]).foreach { script =>
      try CypherLite.runScript(g, script) match {
        case Right((after, s)) => s.collect(); after.nodes.count()
        case Left(e) => assert(e.nonEmpty)
      } catch {
        case ex: Throwable =>
          fail(s"runScript threw ${ex.getClass.getSimpleName} on: $script")
      }
    }
  }

  test("pathological inputs stay inside Either") {
    Seq("", "   ", "garbage", "MATCH MATCH MATCH", "RETURN m",
      "MATCH (m RETURN m", "MATCH (m:')-[", "MATCH (m) RETURN m; DROP x",
      "MATCH (m) WHERE m.name = 'unterminated RETURN m",
      "MATCH (m)" + "-[]->(c)" * 40 + " RETURN m",
      "MATCH (m) WHERE " + Seq.fill(30)("m.name = 'a'").mkString(" OR ") +
        " RETURN m",
      "MATCH (a)-[]->(b) MATCH (b)-[]->(a) RETURN a.name, b.name",
      "COUNT { MATCH (m) }", "MATCH (m) RETURN COUNT { }").foreach(exercise)
  }
}
