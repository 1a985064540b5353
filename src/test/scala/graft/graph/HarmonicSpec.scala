package graft.graph

import graft.SparkSpec

/** Unit-level check of [[GraphOps.harmonicCentrality]] (the oracle twin
  * `graphp_harmonic` grades the cyclic-chain closed form; this pins the
  * multi-landmark sum, unreachable-landmark zero, and d=0 exclusion).
  */
class HarmonicSpec extends SparkSpec {

  private def mkGraph(ids: Seq[Long], edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  test("path graph: per-node sum of 1/d over reachable landmarks only") {
    // 1 -> 2 -> 3 -> 4, landmarks {3, 4}
    val g = mkGraph(Seq(1L, 2L, 3L, 4L), Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    val got = GraphOps.harmonicCentrality(spark, g, Seq(3L, 4L))
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[Double]("harmonic")).toMap
    // n1: d=2 to 3, d=3 to 4 -> 1/2 + 1/3 (micro-quantized per term)
    assert(math.abs(got("n1") - 0.833333) < 1e-9, got.toString)
    // n2: 1 + 1/2; n3: landmark itself (0) + 1 to 4; n4: both 0
    assert(math.abs(got("n2") - 1.5) < 1e-9)
    assert(math.abs(got("n3") - 1.0) < 1e-9)
    assert(got("n4") == 0.0)
  }

  test("direction is respected: upstream landmarks are unreachable") {
    val g = mkGraph(Seq(1L, 2L), Seq(1L -> 2L))
    val got = GraphOps.harmonicCentrality(spark, g, Seq(1L))
      .collect().map(r => r.getAs[String]("name") ->
        r.getAs[Double]("harmonic")).toMap
    assert(got("n2") == 0.0) // cannot walk 2 -> 1
    assert(got("n1") == 0.0) // own landmark, d = 0 excluded
  }
}
