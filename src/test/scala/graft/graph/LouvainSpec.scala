package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GraphOps.louvain]] invariants (the oracle twin `graphp_louvain`
  * grades the full assignment on the clique fixture; this pins the
  * modularity arithmetic, determinism, and the accept-guard's
  * non-decreasing contract on hand-built graphs too).
  */
class LouvainSpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  test("disjoint cliques: one community per clique at the closed-form " +
      "modularity optimum Q = 1 - 1/R; isolated vertices stay singleton") {
    val g = ParquetGraph.cliques(spark, sf("sf0.001"))
    val out = GraphOps.louvain(spark, g)
    // region layout straight from the fixture's source table
    val nation = graft.Tables.nation(spark, sf("sf0.001"))
      .select(col("n_nationkey").cast("long"),
        col("n_regionkey").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byRegion = nation.groupBy(_._2).map { case (rk, ns) =>
      rk -> ns.keys.toSeq.sorted }
    val regions = byRegion.size
    val expected = nation.map { case (nk, rk) =>
      val top3 = byRegion(rk).take(3)
      val comm = if (top3.contains(nk)) top3.min else nk
      (ParquetGraph.NationBase + nk) -> (ParquetGraph.NationBase + comm)
    }
    val got = out.select("id", "community").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // modularity of R disjoint K3 communities is exactly 1 - 1/R
    val q = GraphOps.modularity(spark, g, out.select("id", "community"))
    assert(math.abs(q - (1.0 - 1.0 / regions)) < 1e-9, q.toString)
  }

  test("louvain modularity dominates both trivial partitions " +
      "(all-singleton and one-lump) — the non-decreasing guard did work") {
    val g = ParquetGraph.cliques(spark, sf("sf0.001"))
    val out = GraphOps.louvain(spark, g)
    val q = GraphOps.modularity(spark, g, out.select("id", "community"))
    val singletons = g.nodes.toDF()
      .select(col("id"), col("id").as("community"))
    val lump = g.nodes.toDF()
      .select(col("id"), lit(0L).as("community"))
    assert(q > GraphOps.modularity(spark, g, singletons))
    assert(q > GraphOps.modularity(spark, g, lump))
  }

  test("deterministic: two independent runs produce identical assignments") {
    val g = ParquetGraph.cliqueStar(spark, sf("sf0.001"))
    def run() = GraphOps.louvain(spark, g).select("id", "community")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("communities never span disconnected components (labels travel " +
      "only along edges)") {
    // two disjoint triangles + an isolated edge
    val g = mkGraph(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L,
      10L -> 11L, 11L -> 12L, 12L -> 10L, 20L -> 21L))
    val got = GraphOps.louvain(spark, g).select("id", "community")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("coarsening merges what local moves alone cannot: a barbell's two " +
      "cliques stay separate communities across the bridge") {
    // K4 — bridge — K4: the modularity optimum keeps the two cliques as
    // two communities; the bridge edge must not lump them
    val k4a = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val k4b = Seq(5L -> 6L, 5L -> 7L, 5L -> 8L, 6L -> 7L, 6L -> 8L, 7L -> 8L)
    val g = mkGraph(k4a ++ k4b :+ (4L -> 5L))
    val got = GraphOps.louvain(spark, g).select("id", "community")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L), got.toString)
  }

  test("empty edge set: every node is its own community, no error") {
    import spark.implicits._
    val g = GraphTables(
      Seq(1L, 2L).map(i =>
        NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      Seq.empty[EdgeRow].toDS())
    val got = GraphOps.louvain(spark, g).select("id", "community")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }
}
