package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraphStore time travel: `save(keepVersions = N)` retains superseded
  * version directories, `versionList`/`loadVersion` give pinned AS-OF
  * reads isolated from later commits, and the default save sweeps the
  * history back to crash-cleanup behavior.
  */
class TimeTravelSpec extends SparkSpec {

  test("retained versions stay readable; default save sweeps them") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_timetravel").toString
    val g1 = ParquetGraph.chain(spark, sf("sf0.001"))
    GraphStore.save(GraphTables(
      g1.nodes.localCheckpoint(), g1.edges.localCheckpoint()), store)
    val n1 = GraphStore.load(spark, store).nodes.count()

    // second commit: drop one batch's worth of edges (any visible change)
    val g2 = GraphStore.load(spark, store)
    val shrunk = GraphTables(
      g2.nodes.filter(col("id") % 2 === 0).localCheckpoint(),
      g2.edges.filter(col("src") % 2 === 0).localCheckpoint())
    GraphStore.save(shrunk, store, keepVersions = 2)

    val versions = GraphStore.versionList(store)
    assert(versions.length == 2, s"expected history of 2: $versions")
    // HEAD reads the new graph…
    assert(GraphStore.load(spark, store).nodes.count() < n1)
    // …the retained version still reads the ORIGINAL — pinned readers are
    // isolated from the commit that superseded them
    val old = GraphStore.loadVersion(spark, store, versions(1))
    assert(old.nodes.count() == n1)
    assert(old.edges.count() == g1.edges.count())

    // a default save (keepVersions = 0) sweeps the history
    GraphStore.save(GraphTables(
      shrunk.nodes.localCheckpoint(), shrunk.edges.localCheckpoint()),
      store)
    assert(GraphStore.versionList(store).length == 1)
  }
}
