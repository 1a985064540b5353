package graft.graph

import graft.SparkSpec

/** Unit-level check of [[GraphOps.closenessCentrality]] (the oracle twin
  * `graphp_closeness` grades the cyclic-chain closed form; this pins the
  * reachable-count/distance-sum ratio, unreachable-landmark exclusion,
  * and the d=0 self-exclusion).
  */
class ClosenessSpec extends SparkSpec {

  private def mkGraph(ids: Seq[Long], edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  test("path graph: C = reachable landmarks / sum of distances") {
    // 1 -> 2 -> 3 -> 4, landmarks {3, 4}
    val g = mkGraph(Seq(1L, 2L, 3L, 4L), Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    val got = GraphOps.closenessCentrality(spark, g, Seq(3L, 4L))
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[Double]("closeness")).toMap
    // n1: d = 2 and 3 -> 2/5; n2: d = 1 and 2 -> 2/3
    assert(got("n1") == 2.0 / 5.0, got.toString)
    assert(got("n2") == 2.0 / 3.0)
    // n3: its own landmark excluded (d = 0), reaches 4 at d = 1 -> 1/1
    assert(got("n3") == 1.0)
    // n4: reaches neither (its own d = 0 excluded) -> 0, not an error
    assert(got("n4") == 0.0)
  }

  test("direction is respected: upstream landmarks contribute nothing") {
    val g = mkGraph(Seq(1L, 2L), Seq(1L -> 2L))
    val got = GraphOps.closenessCentrality(spark, g, Seq(1L))
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[Double]("closeness")).toMap
    assert(got("n2") == 0.0 && got("n1") == 0.0)
  }
}
