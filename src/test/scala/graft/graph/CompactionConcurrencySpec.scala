package graft.graph

import graft.SparkSpec

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

/** Reader-vs-compactor interleaving for [[GraphStore]]: the store's
  * single-WRITER contract says nothing about readers, which must be able
  * to resolve the live pointer and any retained version WHILE a
  * compaction rewrites the chain. The commit protocol promises this
  * (fresh version dir → atomic pointer flip → log rewrite by atomic
  * move), so a reader sees either the pre- or the post-compaction store,
  * never a torn mixture. This spec hammers both read paths from a
  * separate thread while `compact` lands and asserts every observed read
  * is one of the two legal states.
  */
class CompactionConcurrencySpec extends SparkSpec {

  test("load and loadVersion observe no torn read while a compaction " +
      "lands; every retained version stays readable throughout") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_compact_race")
      .resolve("store").toString

    def commitDelta(ids: Seq[Long]): Unit = {
      val g = GraphTables(
        ids.map(i => NodeRow(i, "N", s"n$i", "", "", s"b$i", Seq.empty))
          .toDS().localCheckpoint(),
        spark.emptyDataset[EdgeRow])
      if (GraphStore.hasCurrent(store))
        GraphStore.saveDelta(g, store, keepVersions = 3)
      else GraphStore.save(g, store, keepVersions = 3)
    }
    commitDelta(Seq(1L)); commitDelta(Seq(2L)); commitDelta(Seq(3L))

    // each retained version's AS-OF content, pinned before the race
    val byVersion = GraphStore.versionList(store).map { v =>
      v -> GraphStore.loadVersion(spark, store, v)
        .nodes.collect().map(_.id).toSet
    }.toMap
    assert(byVersion.values.toSet ==
      Set(Set(1L), Set(1L, 2L), Set(1L, 2L, 3L)))

    @volatile var failure: Option[Throwable] = None
    val stop = new AtomicBoolean(false)
    var reads = 0
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          // live read resolves through the pointer — either chain (pre)
          // or compacted snapshot (post), identical content both ways
          val live = GraphStore.load(spark, store)
            .nodes.collect().map(_.id).toSet
          assert(live == Set(1L, 2L, 3L), s"torn live read: $live")
          // every version the index lists must read ITS point in time
          for (v <- GraphStore.versionList(store)) {
            val got = GraphStore.loadVersion(spark, store, v)
              .nodes.collect().map(_.id).toSet
            byVersion.get(v).foreach(want =>
              assert(got == want, s"torn AS-OF read of $v: $got != $want"))
          }
          reads += 1
        }
      } catch { case t: Throwable => failure = Some(t) }
    }, "graft-compaction-reader")
    reader.start()
    try {
      // the compaction rewrites the chain while the reader loops;
      // keepVersions = 3 keeps the whole history readable through it
      GraphStore.compact(spark, store, keepVersions = 3)
      // let the reader observe the post-compaction store as well
      Thread.sleep(300)
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    failure.foreach(t => fail(s"reader observed a torn state", t))
    assert(reads > 0, "the reader never completed a read during the race")

    // post-conditions: compacted to one snapshot, history intact
    assert(GraphStore.chainLength(store) == 1)
    assert(GraphStore.load(spark, store)
      .nodes.collect().map(_.id).toSet == Set(1L, 2L, 3L))
    for ((v, want) <- byVersion)
      assert(GraphStore.loadVersion(spark, store, v)
        .nodes.collect().map(_.id).toSet == want)
  }
}
