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

  test("torn snapshot (crashed writer, pointer never flipped) is never " +
      "listed, never loadable, and is swept even as the newest dir") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_torn").toString
    val g = ParquetGraph.chain(spark, sf("sf0.001"))
    val mat = GraphTables(
      g.nodes.localCheckpoint(), g.edges.localCheckpoint())
    GraphStore.save(mat, store)
    GraphStore.save(mat, store, keepVersions = 2)
    assert(GraphStore.versionList(store).length == 2)

    // simulate a writer that crashed mid-save: a v-* dir with partial
    // data and NO commit (pointer never flipped, log never appended) —
    // and make it the NEWEST thing on disk, the exact case where
    // mtime-ordered retention would prefer it
    val torn = java.nio.file.Paths.get(store,
      "v-9999999999999-999999-deadbeef")
    java.nio.file.Files.createDirectories(torn.resolve("nodes"))
    java.nio.file.Files.write(torn.resolve("nodes").resolve("part-torn"),
      "partial".getBytes("UTF-8"))

    // not committed → invisible to the time-travel index
    assert(!GraphStore.versionList(store).exists(_.contains("deadbeef")))
    // …and not readable as a snapshot
    val e = intercept[IllegalArgumentException] {
      GraphStore.loadVersion(spark, store, torn.getFileName.toString)
    }
    assert(e.getMessage.contains("never committed"))
    // while the dir is YOUNG it could still be another writer's
    // in-flight snapshot (defense in depth on the single-writer
    // contract) — gc leaves it alone…
    GraphStore.gc(store, keepVersions = 2)
    assert(java.nio.file.Files.exists(torn),
      "fresh uncommitted dir must survive gc (in-flight grace)")
    // …but it stays invisible to readers throughout the grace window
    assert(!GraphStore.versionList(store).exists(_.contains("deadbeef")))

    // once it outlives any writer that could commit it, gc sweeps it;
    // the keepVersions budget is NOT spent on the torn dir
    backdate(torn)
    GraphStore.gc(store, keepVersions = 2)
    assert(!java.nio.file.Files.exists(torn))
    assert(GraphStore.versionList(store).length == 2)
  }

  /** Age a path past the uncommitted-dir grace window (recursively — gc
    * checks the top-level dir's mtime, but keep the tree consistent).
    */
  private def backdate(p: java.nio.file.Path): Unit = {
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - GraphStore.UncommittedGraceMillis - 60000)
    val s = java.nio.file.Files.walk(p)
    try s.forEach(java.nio.file.Files.setLastModifiedTime(_, old))
    finally s.close()
  }
}
