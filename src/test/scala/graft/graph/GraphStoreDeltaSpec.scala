package graft.graph

import graft.SparkSpec

/** Incremental (delta) commits: [[GraphStore.saveDelta]] writes O(batch)
  * per version, content resolves through the commit-log chain, gc never
  * orphans a chain, and compaction folds the chain back into one full
  * snapshot — the continuous-ingest commit shape at 100 TB.
  */
class GraphStoreDeltaSpec extends SparkSpec {

  private def node(id: Long, batch: String): NodeRow =
    NodeRow(id, "N", s"n$id", "", "", batch, Seq.empty)

  private def graph(ids: Seq[Long], pairs: Seq[(Long, Long)],
      batch: String): GraphTables = {
    import spark.implicits._
    GraphTables(ids.map(node(_, batch)).toDS(),
      pairs.map { case (a, b) => EdgeRow(a, b, "R", "", batch) }.toDS())
  }

  private def ids(g: GraphTables): Set[Long] =
    g.nodes.collect().map(_.id).toSet

  test("base + deltas read as their union; each chain point time-travels " +
      "to its own prefix") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_delta").toString
    GraphStore.save(graph(Seq(1L, 2L), Seq((1L, 2L)), "b1"), store)
    GraphStore.saveDelta(graph(Seq(3L), Seq((2L, 3L)), "b2"), store)
    GraphStore.saveDelta(graph(Seq(4L), Seq((3L, 4L)), "b3"), store)

    val head = GraphStore.load(spark, store)
    assert(ids(head) == Set(1L, 2L, 3L, 4L))
    assert(head.edges.count() == 3)

    // every chain member is a readable AS-OF point over its own prefix
    val versions = GraphStore.versionList(store)
    assert(versions.length == 3, versions.toString)
    val mid = GraphStore.loadVersion(spark, store, versions(1))
    assert(ids(mid) == Set(1L, 2L, 3L))
    val base = GraphStore.loadVersion(spark, store, versions(2))
    assert(ids(base) == Set(1L, 2L))
  }

  test("gc never sweeps the live chain even at keepVersions = 0; a new " +
      "FULL snapshot releases it") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_delta_gc").toString
    GraphStore.save(graph(Seq(1L), Seq.empty, "b1"), store)
    GraphStore.saveDelta(graph(Seq(2L), Seq((1L, 2L)), "b2"), store)
    // default keepVersions = 0 ran inside both commits — the chain
    // (base + delta) must still be fully readable
    assert(ids(GraphStore.load(spark, store)) == Set(1L, 2L))
    assert(GraphStore.versionList(store).length == 2)

    // a full snapshot makes the old chain sweepable history
    val full = GraphStore.load(spark, store)
    GraphStore.save(GraphTables(full.nodes.localCheckpoint(),
      full.edges.localCheckpoint()), store)
    assert(GraphStore.versionList(store).length == 1)
    assert(ids(GraphStore.load(spark, store)) == Set(1L, 2L))
  }

  test("an empty delta (replayed micro-batch) commits cleanly and reads " +
      "back as unchanged content") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_delta_empty").toString
    GraphStore.save(graph(Seq(1L, 2L), Seq((1L, 2L)), "b1"), store)
    GraphStore.saveDelta(GraphTables(
      spark.emptyDataset[NodeRow], spark.emptyDataset[EdgeRow]), store)
    val g = GraphStore.load(spark, store)
    assert(ids(g) == Set(1L, 2L) && g.edges.count() == 1)
    assert(GraphStore.versionList(store).length == 2)
  }

  test("compact folds the chain into one full snapshot with identical " +
      "content") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_delta_compact").toString
    GraphStore.save(graph(Seq(1L, 2L), Seq((1L, 2L)), "b1"), store)
    GraphStore.saveDelta(graph(Seq(3L), Seq((2L, 3L)), "b2"), store)
    GraphStore.compact(spark, store)
    assert(GraphStore.versionList(store).length == 1)
    val g = GraphStore.load(spark, store)
    assert(ids(g) == Set(1L, 2L, 3L) && g.edges.count() == 2)
  }

  test("dropBatchAtRest reaches batch partitions in every chain member") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_delta_drop").toString
    GraphStore.save(graph(Seq(1L), Seq.empty, "b1"), store)
    GraphStore.saveDelta(graph(Seq(2L), Seq.empty, "b2"), store)
    GraphStore.dropBatchAtRest(store, "b1") // lives in the BASE, not head
    assert(ids(GraphStore.load(spark, store)) == Set(2L))
  }

  test("saveDelta without a committed base is refused by name") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft_delta_nobase").toString
    val e = intercept[IllegalArgumentException] {
      GraphStore.saveDelta(GraphTables(
        spark.emptyDataset[NodeRow], spark.emptyDataset[EdgeRow]), store)
    }
    assert(e.getMessage.contains("existing committed base"))
  }
}
