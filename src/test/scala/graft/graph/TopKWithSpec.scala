package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Semantic pins for the round-16 grammar wave: the top-k `WITH v
  * [ORDER BY …] LIMIT k` stage (fold + two-phase), ORDER BY over an
  * unprojected scalar fn, bag-multiplicity UNWIND, id-filtered writes,
  * and the exact-long id comparison lens. The oracle twins
  * (`graphp_cypher_topk_*`, `graphp_cypher_order_fn`,
  * `graphp_cypher_unwind_bag`, `graphp_cypher_set_by_id`) grade the
  * parquet fixtures; these pin the semantics and the named rejections
  * by hand, including shapes the fixtures cannot reach (60-bit ids,
  * scope violations).
  */
class TopKWithSpec extends SparkSpec {

  private lazy val g: GraphTables = {
    import spark.implicits._
    GraphTables(
      Seq(NodeRow(1L, "N", "Alpha", "", "", "b", Seq.empty),
        NodeRow(2L, "N", "beta", "", "", "b", Seq.empty),
        NodeRow(3L, "N", "Gamma", "", "", "b", Seq.empty),
        NodeRow(4L, "N", "delta", "", "", "b", Seq.empty),
        NodeRow(11L, "M", "x1", "", "", "b", Seq.empty),
        NodeRow(12L, "M", "x2", "", "", "b", Seq.empty)).toDS(),
      Seq(EdgeRow(1L, 11L, "HAS_X", "", "b"),
        EdgeRow(2L, 12L, "HAS_X", "", "b"),
        EdgeRow(3L, 11L, "HAS_X", "", "b"),
        EdgeRow(4L, 12L, "HAS_X", "", "b")).toDS())
  }

  private def rows(q: String): Seq[Seq[Any]] =
    CypherLite.run(g, q).fold(e => fail(s"$q → $e"), identity)
      .collect().map(_.toSeq.toSeq).toSeq

  private def left(q: String): String =
    CypherLite.run(g, q).fold(identity, df =>
      fail(s"expected a rejection, got ${df.collect().length} rows"))

  test("two-phase top-k: ORDER BY DESC LIMIT then expand") {
    // top-2 by name desc (byte order) = delta, beta — wait: byte order
    // puts lowercase AFTER uppercase, so DESC = delta, beta, Gamma,
    // Alpha → top-2 = delta, beta → their children x2, x2
    assert(rows("MATCH (n:N) WITH n ORDER BY n.name DESC LIMIT 2 " +
      "MATCH (n)-[:HAS_X]->(m) RETURN n.name, m.name ORDER BY n.name")
      == Seq(Seq("beta", "x2"), Seq("delta", "x2")))
  }

  test("limit-then-aggregate (the r15 named rejection, retired)") {
    assert(rows("MATCH (n:N) WITH n LIMIT 2 RETURN count(n) AS c")
      == Seq(Seq(2L)))
  }

  test("limit-then-DISTINCT dedups AFTER the limit (the r15 fold " +
      "would have dedup-then-limited)") {
    // no ORDER BY → deterministic min-id pick (documented pin): ids
    // 1,2,3 → labels N,N,N → one distinct row
    assert(rows("MATCH (n:N) WITH n LIMIT 3 RETURN DISTINCT n.label")
      == Seq(Seq("N")))
  }

  test("fold path keeps the stage ordering and strips a trailing " +
      "semicolon") {
    assert(rows("MATCH (n:N) WITH n ORDER BY n.name LIMIT 2 " +
      "RETURN n.name;") == Seq(Seq("Alpha"), Seq("Gamma")))
  }

  test("fn sort key in the WITH stage routes through stage 1") {
    // toLower order: alpha, beta, delta, gamma → top-2 = Alpha, beta
    assert(rows("MATCH (n:N) WITH n ORDER BY toLower(n.name) LIMIT 2 " +
      "MATCH (n)-[:HAS_X]->(m) RETURN m.name ORDER BY m.name")
      == Seq(Seq("x1"), Seq("x2")))
  }

  test("scope narrowing: the tail may only reference the carried " +
      "variable") {
    assert(left("MATCH (m:N)-[r:HAS_X]->(c) WITH m LIMIT 5 " +
      "RETURN c.name").contains("out of scope"))
  }

  test("two-phase needs a single-node first MATCH (binding " +
      "multiplicity rejection)") {
    assert(left("MATCH (a:N)-[:HAS_X]->(v) WITH v LIMIT 2 " +
      "RETURN count(v) AS c").contains("single-node"))
  }

  test("the follow-up MATCH must re-bind the carried variable") {
    assert(left("MATCH (n:N) WITH n LIMIT 2 MATCH (x:M)-[:HAS_X]->(y) " +
      "RETURN x.name").contains("re-bind"))
  }

  test("LIMIT above TopKMaxK rejects by name on the two-phase path") {
    assert(left("MATCH (n:N) WITH n LIMIT 99999 RETURN count(n) AS c")
      .contains("top-k expansion bound"))
  }

  test("a WITH-LIMIT deeper in a chained pipeline stays with the " +
      "chain machinery") {
    assert(rows("MATCH (m:N)-[:HAS_X]->(c) WITH m, count(c) AS cnt " +
      "WITH cnt LIMIT 1 RETURN cnt") == Seq(Seq(1L)))
  }

  test("ORDER BY over an unprojected scalar fn: case-insensitive " +
      "order diverges from byte order") {
    assert(rows("MATCH (n:N) RETURN n.name ORDER BY toLower(n.name)")
      == Seq(Seq("Alpha"), Seq("beta"), Seq("delta"), Seq("Gamma")))
    // byte order control: uppercase first
    assert(rows("MATCH (n:N) RETURN n.name ORDER BY n.name")
      == Seq(Seq("Alpha"), Seq("Gamma"), Seq("beta"), Seq("delta")))
  }

  test("fn sort key demands its base property among the projections") {
    assert(left("MATCH (n:N) RETURN n.label ORDER BY toLower(n.name)")
      .contains("must be among the returned"))
  }

  test("conn-side fn sort key over the projected base column") {
    assert(rows("MATCH (n:N)-[:HAS_X]->(m) RETURN n.name, m.name " +
      "ORDER BY toUpper(m.name) DESC, n.name")
      == Seq(Seq("beta", "x2"), Seq("delta", "x2"),
        Seq("Alpha", "x1"), Seq("Gamma", "x1")))
  }

  test("bag UNWIND: a duplicated element multiplies rows and doubles " +
      "its count") {
    assert(rows("UNWIND ['Alpha', 'beta', 'Alpha'] AS x MATCH (n:N) " +
      "WHERE n.name = x RETURN count(*) AS c") == Seq(Seq(3L)))
    val bag = rows("UNWIND ['Alpha', 'beta', 'Alpha'] AS x " +
      "MATCH (n:N) WHERE n.name = x RETURN n.name")
    assert(bag.sortBy(_.head.toString) ==
      Seq(Seq("Alpha"), Seq("Alpha"), Seq("beta")))
  }

  test("bag UNWIND: RETURN DISTINCT collapses onto the deduplicated " +
      "fast path") {
    assert(rows("UNWIND ['Alpha', 'beta', 'Alpha'] AS x MATCH (n:N) " +
      "WHERE n.name = x RETURN DISTINCT n.name")
      .sortBy(_.head.toString) == Seq(Seq("Alpha"), Seq("beta")))
  }

  test("bag UNWIND named rejections: avg/collect, DISTINCT-in-agg, " +
      "ordering, unaliased aggregates") {
    assert(left("UNWIND ['a', 'a'] AS x MATCH (n:N) WHERE n.name = x " +
      "RETURN avg(n.name) AS a").contains("re-aggregate"))
    assert(left("UNWIND ['a', 'a'] AS x MATCH (n:N) WHERE n.name = x " +
      "RETURN count(DISTINCT n.name) AS c").contains("dedups across"))
    assert(left("UNWIND ['a', 'a'] AS x MATCH (n:N) WHERE n.name = x " +
      "RETURN n.name ORDER BY n.name").contains("order-dependent"))
    assert(left("UNWIND ['a', 'a'] AS x MATCH (n:N) WHERE n.name = x " +
      "RETURN count(*)").contains("alias every aggregate"))
  }

  test("id comparisons stay exact past 2^52 (the double lens rounds " +
      "60-bit ingest ids onto their neighbors)") {
    import spark.implicits._
    val big = 1L << 60
    val g2 = GraphTables(
      Seq(NodeRow(big, "N", "a", "", "", "b", Seq.empty),
        NodeRow(big + 1, "N", "b", "", "", "b", Seq.empty)).toDS(),
      spark.emptyDataset[EdgeRow])
    def names(q: String): Seq[String] =
      CypherLite.run(g2, q).fold(e => fail(s"$q → $e"), identity)
        .collect().map(_.getString(0)).toSeq
    // (big: Double) == (big+1: Double) — the generic lens would match
    // BOTH rows; the exact-long lens must match exactly one
    assert(names(s"MATCH (n) WHERE id(n) = $big RETURN n.name")
      == Seq("a"))
    assert(names(s"MATCH (n) WHERE id(n) = ${big + 1} RETURN n.name")
      == Seq("b"))
    assert(names(s"MATCH (n) WHERE id(n) IN [$big] RETURN n.name")
      == Seq("a"))
  }

  test("id-filtered write: MATCH WHERE id(m) = … SET") {
    val (after, _) = CypherLite.runWrite(g,
      "MATCH (m) WHERE id(m) = 2 SET m.name = 'renamed'")
      .fold(e => fail(s"write → $e"), identity)
    assert(after.nodes.filter(_.id == 2L).collect().map(_.name).toSeq
      == Seq("renamed"))
    // everything else untouched
    assert(after.nodes.filter(_.id != 2L).count() == 5L)
  }

  test("elementId rejects by name with the id(v) pointer") {
    assert(left("MATCH (n:N) RETURN elementId(n)").contains("id(v)"))
  }

  test("ENDS WITH inside the tail's WHERE is not a clause boundary " +
      "(the r16 battery's splice bug)") {
    assert(rows("MATCH (n:N) WITH n ORDER BY n.name LIMIT 4 " +
      "MATCH (n)-[:HAS_X]->(m) WHERE m.name ENDS WITH '1' " +
      "RETURN m.name ORDER BY m.name") == Seq(Seq("x1"), Seq("x1")))
  }

  test("stage SKIP: two-phase without ORDER BY (id order), fold with") {
    // id order 1,2,3,4 → SKIP 2 LIMIT 2 = ids 3,4 → Gamma, delta
    assert(rows("MATCH (n:N) WITH n SKIP 2 LIMIT 2 RETURN count(n) " +
      "AS c") == Seq(Seq(2L)))
    assert(rows("MATCH (n:N) WITH n ORDER BY n.name SKIP 1 LIMIT 2 " +
      "RETURN n.name") == Seq(Seq("Gamma"), Seq("beta")))
  }

  test("degree sort key: the k most connected nodes, then expand") {
    import spark.implicits._
    // N1 has 3 children, N2 has 1 → top-1 by degree = N1
    val g3 = GraphTables(
      Seq(NodeRow(1L, "N", "N1", "", "", "b", Seq.empty),
        NodeRow(2L, "N", "N2", "", "", "b", Seq.empty),
        NodeRow(11L, "M", "a", "", "", "b", Seq.empty),
        NodeRow(12L, "M", "b", "", "", "b", Seq.empty),
        NodeRow(13L, "M", "c", "", "", "b", Seq.empty)).toDS(),
      Seq(EdgeRow(1L, 11L, "HAS_X", "", "b"),
        EdgeRow(1L, 12L, "HAS_X", "", "b"),
        EdgeRow(1L, 13L, "HAS_X", "", "b"),
        EdgeRow(2L, 11L, "HAS_X", "", "b")).toDS())
    val got = CypherLite.run(g3,
      "MATCH (n:N) WITH n ORDER BY size((n)-[:HAS_X]->()) DESC " +
        "LIMIT 1 MATCH (n)-[:HAS_X]->(m) RETURN n.name, count(m) AS d")
      .fold(e => fail(e), identity).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("N1", 3L)))
  }

  test("top-k into OPTIONAL MATCH rejects by name") {
    assert(left("MATCH (n:N) WITH n ORDER BY n.name LIMIT 2 " +
      "OPTIONAL MATCH (n)-[:HAS_X]->(m) RETURN n.name, m.name")
      .contains("OPTIONAL"))
  }

  test("degree-threshold WHERE: boundary ops, zero-degree kept, NOT") {
    // degrees in g: node1→1, node2→1, node3→1, node4→1 (HAS_X each);
    // the M nodes have out-degree 0 — `< 1` must KEEP them
    assert(rows("MATCH (m:M) WHERE size((m)-[:HAS_X]->()) < 1 " +
      "RETURN m.name ORDER BY m.name") == Seq(Seq("x1"), Seq("x2")))
    assert(rows("MATCH (n:N) WHERE size((n)-[:HAS_X]->()) >= 1 " +
      "RETURN count(*) AS c") == Seq(Seq(4L)))
    assert(rows("MATCH (n:N) WHERE NOT size((n)-[:HAS_X]->()) >= 2 " +
      "RETURN count(*) AS c") == Seq(Seq(4L)))
    // AND-combined with a comparison; label-constrained target
    assert(rows("MATCH (n:N) WHERE n.name STARTS WITH 'A' AND " +
      "size((n)-[:HAS_X]->(:M)) = 1 RETURN n.name")
      == Seq(Seq("Alpha")))
    // foreign anchor and hop-pattern combination reject by name
    assert(left("MATCH (n:N) WHERE size((z)-[:HAS_X]->()) > 1 " +
      "RETURN n.name").contains("anchor"))
    assert(left("MATCH (n:N)-[:HAS_X]->(m) WHERE " +
      "size((n)-[:HAS_X]->()) >= 1 RETURN m.name")
      .contains("hop pattern"))
  }

  test("aggregate-then-re-expand: top keys by count feed the " +
      "follow-up MATCH") {
    // every N has exactly one child, so counts tie at 1 and the KEY
    // tiebreak (byte order: Alpha < Gamma < beta < delta) decides the
    // top-2 — a missing or wrong tiebreak answers different rows
    assert(rows("MATCH (n:N)-[:HAS_X]->(m) WITH n.name AS nn, " +
      "count(m) AS cnt ORDER BY cnt DESC LIMIT 2 " +
      "MATCH (p:N {name: nn})-[:HAS_X]->(q) " +
      "RETURN p.name, q.name ORDER BY p.name")
      == Seq(Seq("Alpha", "x1"), Seq("Gamma", "x1")))
    // HAVING composes; WHERE-equality spelling; tail re-aggregation
    // over the alias projection
    assert(rows("MATCH (n:N)-[:HAS_X]->(m) WITH n.name AS nn, " +
      "count(m) AS cnt WHERE cnt >= 1 ORDER BY cnt DESC, nn LIMIT 2 " +
      "MATCH (p:N) WHERE p.name = nn RETURN count(p) AS k")
      == Seq(Seq(2L)))
    assert(rows("MATCH (n:N)-[:HAS_X]->(m) WITH n.name AS nn, " +
      "count(m) AS cnt ORDER BY cnt DESC LIMIT 2 " +
      "MATCH (p:N {name: nn})-[:HAS_X]->(q) " +
      "RETURN nn, count(q) AS kids ORDER BY nn")
      == Seq(Seq("Alpha", 1L), Seq("Gamma", 1L)))
  }

  test("aggregate-then-re-expand rejections: bare key, key-less " +
      "stage, unreferenced alias") {
    assert(left("MATCH (n:N)-[:HAS_X]->(m) WITH n.name, count(m) AS " +
      "cnt ORDER BY cnt DESC LIMIT 1 MATCH (q:N {name: nn}) " +
      "RETURN q.name").contains("alias the grouping key"))
    assert(left("MATCH (n:N)-[:HAS_X]->(m) WITH count(m) AS cnt " +
      "ORDER BY cnt DESC LIMIT 1 MATCH (q:N) RETURN q.name")
      .contains("grouping key"))
    assert(left("MATCH (n:N)-[:HAS_X]->(m) WITH n.name AS nn, " +
      "count(m) AS cnt ORDER BY cnt DESC LIMIT 1 MATCH (q:N) " +
      "RETURN q.name").contains("never compared"))
  }

  test("whole-variable rename: WITH n AS x substitutes through " +
      "ORDER BY, WHERE, re-entry MATCH, and RETURN") {
    // top-k composition (battery b27's exact shape)
    assert(rows("MATCH (n:N) WITH n AS x ORDER BY x.name LIMIT 2 " +
      "RETURN x.name") == Seq(Seq("Alpha"), Seq("Gamma")))
    // the alias feeds a re-entry MATCH and the RETURN
    assert(rows("MATCH (n:N) WITH n AS x MATCH (x)-[:HAS_X]->(m) " +
      "RETURN x.name, m.name ORDER BY x.name")
      == Seq(Seq("Alpha", "x1"), Seq("Gamma", "x1"),
        Seq("beta", "x2"), Seq("delta", "x2")))
    // WHERE after the rename merges into the MATCH's own WHERE
    assert(rows("MATCH (n:N) WHERE n.name CONTAINS 'a' WITH n AS x " +
      "WHERE x.name STARTS WITH 'b' RETURN x.name")
      == Seq(Seq("beta")))
    // plain WHERE attachment when the MATCH has none
    assert(rows("MATCH (n:N) WITH n AS x WHERE x.name = 'delta' " +
      "RETURN x.name") == Seq(Seq("delta")))
    // bare pass-through before RETURN drops (row-preserving)
    assert(rows("MATCH (n:N)-[:HAS_X]->(m) WITH m " +
      "RETURN count(m) AS k") == Seq(Seq(4L)))
  }

  test("rename rejections: shadowing an already-bound variable, " +
      "alias colliding with a carried variable") {
    assert(left("MATCH (n:N), (m:M) WITH n AS m RETURN m.name")
      .contains("shadow"))
    assert(left("MATCH (n:N) WITH n AS x, x RETURN x.name")
      .contains("collide"))
  }

  test("rename substitution is quote- and label-safe") {
    // a literal containing the alias text survives; label positions
    // (:x) are never rewritten
    assert(rows("MATCH (n:N) WITH n AS x WHERE x.name = 'beta' " +
      "RETURN x.name AS x") == Seq(Seq("beta")))
  }

  test("scalar-fn WITH projection folds into RETURN and the " +
      "transformed alias groups downstream (b36)") {
    // toLower collapses nothing here but the VALUES transform —
    // grouping on the raw column would answer uppercase keys
    assert(rows("MATCH (n:N) WITH toLower(n.name) AS lo " +
      "RETURN lo, count(*) AS c ORDER BY lo")
      == Seq(Seq("alpha", 1L), Seq("beta", 1L), Seq("delta", 1L),
        Seq("gamma", 1L)))
    // size() genuinely merges groups: Alpha/Gamma/delta = 5, beta = 4
    assert(rows("MATCH (n:N) WITH size(n.name) AS len " +
      "RETURN len, count(*) AS c ORDER BY len")
      == Seq(Seq(4L, 1L), Seq(5L, 3L)))
    // the alias feeds the WHERE (expression substitution) and an
    // aggregate-free tail keeps 1:1 rows
    assert(rows("MATCH (n:N) WITH toUpper(n.name) AS up WHERE up " +
      "STARTS WITH 'B' RETURN up") == Seq(Seq("BETA")))
    // mixed whole-var + projection items
    assert(rows("MATCH (n:N) WITH n AS x, toLower(n.name) AS lo " +
      "RETURN lo ORDER BY lo LIMIT 2")
      == Seq(Seq("alpha"), Seq("beta")))
  }

  test("global-aggregate re-entry: the key-less stage splices as a " +
      "1-row scalar (b32)") {
    assert(rows("MATCH (n:N) WITH count(n) AS total MATCH (m:M) " +
      "RETURN total, count(m) AS ms") == Seq(Seq(4L, 2L)))
    // scalar position and rename both honored; min pins a string type
    assert(rows("MATCH (n:N) WITH count(n) AS total, min(n.name) AS " +
      "first MATCH (m:M) RETURN count(m) AS ms, total AS t, first")
      == Seq(Seq(2L, 4L, "Alpha")))
    // an empty stage match still answers one row (count 0)
    assert(rows("MATCH (n:Nowhere) WITH count(n) AS total MATCH (m:M) " +
      "RETURN total, count(m) AS ms") == Seq(Seq(0L, 2L)))
    // non-aggregate tail: the constant re-emits per row
    assert(rows("MATCH (n:N) WITH count(n) AS total MATCH (m:M) " +
      "RETURN m.name, total ORDER BY m.name LIMIT 1")
      == Seq(Seq("x1", 4L)))
  }

  test("global-aggregate re-entry rejections: scalar-only RETURN, " +
      "alias as a WHERE key") {
    assert(left("MATCH (n:N) WITH count(n) AS total MATCH (m:M) " +
      "RETURN total").contains("compute something of its own"))
    assert(left("MATCH (n:N) WITH count(n) AS total MATCH (m:M) " +
      "WHERE size(m.name) > total RETURN count(m) AS k")
      .contains("only appear as a RETURN item"))
  }

  test("degree projection through the stage (b44): the computed " +
      "column rides ORDER BY, WHERE, and the RETURN") {
    // out-degrees: every N node has exactly 1 HAS_X edge; M nodes 0
    assert(rows("MATCH (n:N) WITH n, size((n)-[:HAS_X]->()) AS deg " +
      "ORDER BY deg DESC, n.name LIMIT 2 RETURN n.name, deg " +
      "ORDER BY n.name") == Seq(Seq("Alpha", 1L), Seq("Gamma", 1L)))
    // WHERE over the projected degree (merges into the MATCH)
    assert(rows("MATCH (n:N) WITH n, size((n)-[:HAS_X]->()) AS deg " +
      "WHERE deg >= 1 RETURN count(*) AS c") == Seq(Seq(4L)))
    // re-entry MATCH after the degree stage
    assert(rows("MATCH (n:N) WITH n, size((n)-[:HAS_X]->()) AS deg " +
      "ORDER BY deg DESC, n.name LIMIT 1 MATCH (n)-[:HAS_X]->(m) " +
      "RETURN n.name, m.name") == Seq(Seq("Alpha", "x1")))
  }

  test("top-k stage secondary tiebreak key (r17): ties on the " +
      "primary key fall to the user's key, not just id") {
    // all content values are '' → the name tiebreak decides; DESC on
    // the secondary: byte order puts lowercase last
    assert(rows("MATCH (n:N) WITH n ORDER BY n.content, n.name DESC " +
      "LIMIT 2 MATCH (n)-[:HAS_X]->(m) RETURN n.name, m.name " +
      "ORDER BY n.name") == Seq(Seq("beta", "x2"), Seq("delta", "x2")))
    // a foreign tiebreak variable rejects by name
    assert(left("MATCH (n:N) WITH n ORDER BY n.content, z.name LIMIT " +
      "2 MATCH (n)-[:HAS_X]->(m) RETURN m.name").contains("tiebreak"))
  }

  test("per-node DETACH DELETE cascades incident edges (b37)") {
    val (after, sum) = CypherLite.runWrite(g,
      "MATCH (n:N {name: 'Alpha'}) DETACH DELETE n")
      .fold(e => fail(e), identity)
    assert(sum.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 1L))) // 1 node, its 1 HAS_X edge
    assert(after.nodes.count() == 5 && after.edges.count() == 3)
    // the neighbor x1 SURVIVES (DETACH DELETE removes the node and
    // its relationships, never the neighbors)
    assert(after.nodes.filter(col("name") === "x1").count() == 1)
  }

  test("top-k feeding SET / DETACH DELETE (b38/b37): stage-1 " +
      "selection, id-conjunct write") {
    val (a1, s1) = CypherLite.runWrite(g,
      "MATCH (n:N) WITH n ORDER BY n.name LIMIT 2 " +
        "SET n.content = 'top'")
      .fold(e => fail(e), identity)
    assert(s1.collect().map(_.getString(1)).sorted.toSeq
      == Seq("Alpha", "Gamma")) // byte order: Alpha < Gamma < beta
    assert(a1.nodes.filter(col("content") === "top").count() == 2)
    val (a2, _) = CypherLite.runWrite(g,
      "MATCH (n:N) WITH n ORDER BY n.name DESC LIMIT 1 " +
        "DETACH DELETE n") // delta (byte-desc first)
      .fold(e => fail(e), identity)
    assert(a2.nodes.filter(col("name") === "delta").count() == 0)
    assert(a2.edges.count() == 3)
    // an empty stage-1 selection writes nothing
    val (a3, s3) = CypherLite.runWrite(g,
      "MATCH (n:Nowhere) WITH n ORDER BY n.name LIMIT 2 " +
        "SET n.content = 'x'").fold(e => fail(e), identity)
    assert(a3.nodes.count() == 6 && s3.collect().isEmpty)
    // the read API rejects the write with the phantom-write pointer
    assert(left("MATCH (n:N) WITH n ORDER BY n.name LIMIT 2 " +
      "SET n.content = 'top'").contains("runWrite"))
    // unsupported write tails reject by name at parse time
    assert(CypherLite.runWrite(g, "MATCH (n:N) WITH n LIMIT 2 " +
      "REMOVE n.content").left.exists(_.contains("top-k write tail")))
  }

  test("duplicated UNWIND list + a chained WITH stage rejects by " +
      "name (per-element partials cannot cross a HAVING or a " +
      "DISTINCT-after-aggregation)") {
    // the r16 hole: the per-element union filtered HAVING against
    // PARTIAL counts (c=1 died before re-aggregation → silently empty
    // where Cypher answers the bag totals)
    assert(left("UNWIND ['Alpha','Alpha'] AS x MATCH (n:N) WHERE " +
      "n.name = x WITH n.name AS nm, count(*) AS c WHERE c > 1 " +
      "RETURN nm, c").contains("WITH stage after a duplicated"))
    // RETURN DISTINCT after an aggregating WITH would dedup the list
    // UNDER the aggregation and halve counts — same guard
    assert(left("UNWIND ['Alpha','Alpha'] AS x MATCH (n:N) WHERE " +
      "n.name = x WITH n.name AS nm, count(*) AS c " +
      "RETURN DISTINCT nm, c").contains("WITH stage after a duplicated"))
    // STARTS/ENDS WITH are comparison operators, not stages — the
    // guard must not trigger on them (ClauseWithRe convention): the
    // bag still answers, with both occurrences counted
    assert(rows("UNWIND ['Alpha','Alpha'] AS x MATCH (n:N) WHERE " +
      "n.name = x AND n.name ENDS WITH 'a' RETURN count(*) AS c")
      == Seq(Seq(2L)))
  }

  test("agg-expand key values containing a quote or comma reject " +
      "(unsplicable IN-list literal)") {
    import spark.implicits._
    val g2 = GraphTables(
      Seq(NodeRow(1L, "N", "a, b", "", "", "b", Seq.empty),
        NodeRow(11L, "M", "x1", "", "", "b", Seq.empty)).toDS(),
      Seq(EdgeRow(1L, 11L, "HAS_X", "", "b")).toDS())
    val got = CypherLite.run(g2, "MATCH (n:N)-[:HAS_X]->(m) WITH " +
      "n.name AS nn, count(m) AS c ORDER BY c DESC LIMIT 1 " +
      "MATCH (p:N {name: nn}) RETURN p.name")
    assert(got.left.exists(_.contains("quote or comma")))
  }

  test("agg-expand stage-1 column contract breaks FAIL loudly, " +
      "never guess a column") {
    // a malformed stage (refactor drift) whose stage 1 lacks both
    // m_<prop> and c_<prop> must name the break, not splice whatever
    // column happens to be first
    val ae = CypherLite.AggTopKExpand(
      "MATCH (n:N) RETURN count(n) AS c", "m_name", "nn",
      "MATCH (p:N {name: nn}) RETURN p.name")
    val got = CypherLite.execAggTopK(g, ae)
    assert(got.left.exists(e => e.contains("internal") &&
      e.contains("m_name")))
  }

  test("fold requires the sort key projected; an unprojected key " +
      "routes two-phase instead of erroring") {
    // ORDER BY n.content but the tail projects only name → two-phase
    // (stage 1 owns the ordering; '' content ties break by id)
    assert(rows("MATCH (n:N) WITH n ORDER BY n.content LIMIT 2 " +
      "RETURN n.name").map(_.head).toSet == Set("Alpha", "beta"))
  }
}
