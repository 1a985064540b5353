package graft.graph

import graft.SparkSpec

/** Unit-level check of [[GraphOps.hits]] (the oracle twin `graphp_hits`
  * grades the golden-ratio closed form on the clique fixture; this pins
  * the direction and normalization semantics by hand).
  */
class HitsSpec extends SparkSpec {

  private def mkGraph(ids: Seq[Long], edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  private def scores(g: GraphTables): Map[String, (Double, Double)] =
    GraphOps.hits(spark, g).collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[Double]("hub"), r.getAs[Double]("auth"))).toMap

  test("star: the center is the only hub, leaves split authority evenly") {
    val g = mkGraph(Seq(1L, 2L, 3L, 4L, 5L),
      Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L))
    val s = scores(g)
    assert(math.abs(s("n1")._1 - 1.0) < 1e-9 && s("n1")._2 == 0.0)
    Seq("n2", "n3", "n4", "n5").foreach { n =>
      assert(s(n)._1 == 0.0)
      assert(math.abs(s(n)._2 - 0.25) < 1e-9)
    }
  }

  test("isolated nodes answer zero scores; edgeless graph never divides " +
      "by zero") {
    val g = mkGraph(Seq(1L, 2L, 3L), Seq(1L -> 2L))
    val s = scores(g)
    assert(s("n3") == ((0.0, 0.0)))
    assert(math.abs(s("n1")._1 - 1.0) < 1e-9)
    assert(math.abs(s("n2")._2 - 1.0) < 1e-9)
    val edgeless = mkGraph(Seq(1L, 2L), Seq.empty)
    assert(scores(edgeless).values.toSet == Set((0.0, 0.0)))
  }

  test("direction matters: reversing edges swaps hub and authority") {
    val g = mkGraph(Seq(1L, 2L, 3L), Seq(1L -> 2L, 1L -> 3L, 2L -> 3L))
    val rev = mkGraph(Seq(1L, 2L, 3L), Seq(2L -> 1L, 3L -> 1L, 3L -> 2L))
    val s = scores(g)
    val r = scores(rev)
    Seq("n1", "n2", "n3").foreach { n =>
      assert(math.abs(s(n)._1 - r(n)._2) < 1e-9, s"$n hub-vs-auth")
      assert(math.abs(s(n)._2 - r(n)._1) < 1e-9, s"$n auth-vs-hub")
    }
    // the transitive-tournament golden-ratio fixpoint (same as the twin)
    val phiInv = 2.0 / (1.0 + math.sqrt(5.0))
    assert(math.abs(s("n1")._1 - phiInv) < 1e-6)
    assert(math.abs(s("n2")._1 - (1.0 - phiInv)) < 1e-6)
    assert(s("n3")._1 == 0.0)
  }
}
