package graft.graph

import graft.SparkSpec

/** Unit-level check of [[GraphOps.kCore]] (the oracle twin `graphp_kcore`
  * covers the parquet fixture; this pins the peeling semantics by hand).
  */
class KCoreSpec extends SparkSpec {

  private def mkGraph(edges: Seq[(Long, Long)]): GraphTables = {
    import spark.implicits._
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", "base", Seq.empty)).toDS(),
      edges.map { case (s, d) => EdgeRow(s, d, "E", "", "base") }.toDS())
  }

  private def core(g: GraphTables, k: Int): Set[Long] =
    GraphOps.kCore(spark, g, k).collect().map(_.getLong(0)).toSet

  // triangle {1,2,3} with a tail 3-4-5
  private val triTail =
    mkGraph(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L))

  test("2-core peels the tail via a cascade, keeps the triangle") {
    // round 1 removes only node 5; node 4 drops to degree 1 and is
    // removed in round 2 — simultaneous-removal peeling, not one-shot
    assert(core(triTail, 2) == Set(1L, 2L, 3L))
  }

  test("3-core of a triangle-with-tail is empty") {
    assert(core(triTail, 3) == Set.empty[Long])
  }

  test("4-clique with a pendant: 3-core is exactly the clique") {
    val g = mkGraph(Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L))
    assert(core(g, 3) == Set(1L, 2L, 3L, 4L))
    assert(core(g, 1) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("duplicate/reverse edges count once toward degree") {
    // 1-2 doubled both ways: degrees stay 1, so the 2-core is empty
    val g = mkGraph(Seq(1L -> 2L, 2L -> 1L, 1L -> 2L))
    assert(core(g, 2) == Set.empty[Long])
  }

  test("peeling frees superseded rounds' checkpoint blocks — storage " +
      "pins O(1) edge-set copies, not O(rounds)") {
    // an 11-edge path peels one layer from each end per round: 6 rounds
    // to an empty 2-core, so a leak would pin ~6 superseded checkpoints.
    // Dataset.unpersist would NOT catch that (it only clears CacheManager
    // entries, and localCheckpoint blocks live on the internal RDD) —
    // this asserts on the SparkContext's persistent-RDD registry, which
    // is where those blocks are actually tracked.
    val path = mkGraph((1L to 11L).map(i => i -> (i + 1)))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(core(path, 2) == Set.empty[Long])
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    // at most the FINAL round's checkpoint may stay pinned (it backs the
    // returned relation); every superseded round must have been freed
    assert(pinned.size <= 1,
      s"peeling left ${pinned.size} checkpointed rounds pinned: $pinned")
  }

  test("exhausting maxIterations before the fixpoint throws, never " +
      "returns a truncated superset") {
    // triTail's 2-core needs two peeling rounds; with the bound at 1 the
    // remainder still holds sub-k node 4 — the caller must get an error,
    // not a plausible-but-wrong \"core\"
    val e = intercept[IllegalStateException] {
      GraphOps.kCore(spark, triTail, 2, maxIterations = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
