package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, typedLit}

/** Unit-level check of [[GraphOps.clusteringCoefficient]] (the oracle twin
  * `graphp_clustering` covers the clique∪star parquet fixture; this pins
  * the canonicalization semantics by hand on adversarial inputs).
  */
class ClusteringCoefficientSpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  private def coeffs(g: GraphTables): Map[String, (Int, Long, Double)] =
    GraphOps.clusteringCoefficient(spark, g).collect()
      .map(r => r.getString(1) ->
        ((r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap

  test("multigraph noise — duplicate edges, reversed duplicates, and " +
      "self-loops — scores as the simple undirected projection") {
    // simple projection: triangle {1,2,3} plus pendant 3-4; the raw input
    // carries 1→2 twice, the reverse 2→1, a self-loop 3→3
    val g = mkGraph(Seq(1L -> 2L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 1L -> 3L,
      3L -> 3L, 3L -> 4L))
    val c = coeffs(g)
    assert(c("n1") == ((2, 1L, 1.0)))
    assert(c("n2") == ((2, 1L, 1.0)))
    // node 3: neighbors {1,2,4}, one closed pair → 2·1/(3·2)
    assert(c("n3") == ((3, 1L, 0.333333)))
    // degree-1 leaf: coefficient defined as 0, not NaN
    assert(c("n4") == ((1, 0L, 0.0)))
  }

  test("triangle-free star scores 0 everywhere") {
    val g = mkGraph(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L))
    val c = coeffs(g)
    assert(c("n1") == ((3, 0L, 0.0)))
    assert(c("n2") == ((1, 0L, 0.0)))
  }

  test("degree-ordered orientation makes a 100k-leaf hub wedge-free " +
      "(id-ordering would enumerate 5e9 wedges)") {
    // the hub (id 0) is the LOWEST id but the HIGHEST degree: id-ordered
    // wedges would fan out C(100000, 2) ≈ 5·10⁹ pairs from it; the
    // degree-ordered kernel directs every edge leaf→hub, so the hub has
    // zero out-edges and the whole run is a handful of linear shuffles.
    // One triangle (0, 1, 2) is planted to prove counting still works
    // when the hub IS a corner — found at its lowest-degree corner.
    import spark.implicits._
    val leaves = spark.range(1L, 100001L)
      .select(lit(0L).as("src"), col("id").as("dst"),
        lit("E").as("relType"), lit("").as("docnbr"), lit("base").as("batch"),
        typedLit(Map.empty[String, String]).as("props"))
      .as[EdgeRow]
    val closing = Seq(EdgeRow(1L, 2L, "E", "", "base")).toDS()
    val g = GraphTables(
      Seq(0L, 1L, 2L).map(i =>
        NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      leaves.unionByName(closing))
    val c = coeffs(g)
    // hub: deg 100000, exactly the planted triangle → 2/(d(d−1))
    assert(c("n0")._1 == 100000 && c("n0")._2 == 1L)
    // leaves 1 and 2: neighbors {hub, each other}, closed → 1.0
    assert(c("n1") == ((2, 1L, 1.0)) && c("n2") == ((2, 1L, 1.0)))
  }

  test("4-clique scores 1.0 everywhere (every wedge closed)") {
    val g = mkGraph(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L))
    val c = coeffs(g)
    // each node: deg 3, C(3,2)=3 neighbor pairs, all closed → 3 triangles
    c.values.foreach(v => assert(v == ((3, 3L, 1.0))))
  }
}
