package graft.graph

import graft.SparkSpec
import graft.streaming.StreamingOps

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end lakehouse-lite proof (SURVEY.md §4.3/§4.4): a growing corpus
  * drained incrementally with AvailableNow, committed through the versioned
  * CURRENT-pointer store, surviving a simulated writer crash between the
  * version-dir write and the pointer move, then compacted — with the live
  * graph consistent at every step. This is the durability story the 100-TB
  * posture rests on.
  */
class StoreEndToEndSpec extends SparkSpec {

  private def nodes(ids: Seq[Long], batch: String): Seq[NodeRow] =
    ids.map(i => NodeRow(i, "Doc", s"doc$i", "", s"d$i", batch, Seq.empty))

  private def edges(pairs: Seq[(Long, Long)], batch: String): Seq[EdgeRow] =
    pairs.map { case (a, b) => EdgeRow(a, b, "HAS_CHILD", "", batch) }

  test("drain → versioned save → crash → resume drain → upsert → compact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("store_e2e").toString
    val store = s"$dir/store"

    // 1. first corpus slice arrives; AvailableNow drains it exactly once
    val b1 = nodes(Seq(1L, 2L), "b1")
    b1.toDF().write.parquet(s"$dir/corpus/slice1")
    val schema = b1.toDF().schema
    def stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(s"$dir/corpus")
    val drained1 = StreamingOps.drainAvailable(spark, stream,
      s"$dir/staged", s"$dir/ckpt")
    assert(drained1.count() == 2)
    val g1 = GraphTables(drained1.as[NodeRow],
      edges(Seq((1L, 2L)), "b1").toDS())
    GraphStore.save(g1, store)
    assert(GraphStore.load(spark, store).nodes.count() == 2)
    val committedPtr = new String(
      Files.readAllBytes(Paths.get(store, "CURRENT")), "UTF-8").trim

    // 2. a writer crashes mid-save: version dir and pointer temp written,
    //    the atomic pointer move never happened
    val crashDir = Paths.get(store, "v-crashed-writer")
    Files.createDirectories(crashDir.resolve("nodes"))
    Files.write(crashDir.resolve("nodes").resolve("partial.parquet"),
      Array[Byte](0, 1, 2))
    Files.write(Paths.get(store, "CURRENT.tmp-v-crashed-writer"),
      "v-crashed-writer".getBytes("UTF-8"))
    // the writer is long dead: age its leftovers past the in-flight grace
    // window (a YOUNG uncommitted dir is protected — TimeTravelSpec)
    val dead = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - GraphStore.UncommittedGraceMillis - 60000)
    Seq(crashDir, Paths.get(store, "CURRENT.tmp-v-crashed-writer"))
      .foreach { p =>
        val w = Files.walk(p)
        try w.forEach(Files.setLastModifiedTime(_, dead)) finally w.close()
      }
    // readers resolve the committed version — old data, never a mix or none
    assert(new String(Files.readAllBytes(Paths.get(store, "CURRENT")),
      "UTF-8").trim == committedPtr)
    assert(GraphStore.load(spark, store).nodes.count() == 2)

    // 3. second slice arrives; the SAME checkpoint drains only new files
    nodes(Seq(3L), "b2").toDF().write.parquet(s"$dir/corpus/slice2")
    val drained2 = StreamingOps.drainAvailable(spark, stream,
      s"$dir/staged", s"$dir/ckpt")
    assert(drained2.count() == 3, "cumulative sink must hold each row once")
    val incoming = GraphTables(
      drained2.as[NodeRow].filter(_.batch == "b2"),
      edges(Seq((2L, 3L)), "b2").toDS())
    val g2 = GraphOps.upsert(GraphStore.load(spark, store), incoming)
    GraphStore.save(g2, store)

    // the successful save swept the crashed writer's leftovers
    val leftover = Files.list(Paths.get(store)).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n == "v-crashed-writer" ||
        n.startsWith("CURRENT.tmp-")).toSeq
    assert(leftover.isEmpty, s"gc must sweep crash leftovers: $leftover")
    val loaded2 = GraphStore.load(spark, store)
    assert(loaded2.nodes.count() == 3 && loaded2.edges.count() == 2)

    // 4. compaction rewrites through the same atomic swap: same rows after,
    //    one file per batch partition
    GraphStore.compact(spark, store, filesPerPartition = 1)
    val loaded3 = GraphStore.load(spark, store)
    assert(loaded3.nodes.count() == 3 && loaded3.edges.count() == 2)
    assert(loaded3.nodes.map(_.id).collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val nodeDir = Paths.get(GraphStore.currentDir(store), "nodes")
    Seq("b1", "b2").foreach { b =>
      val files = Files.list(nodeDir.resolve(s"batch=$b")).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(files == 1, s"batch=$b should compact to one file, got $files")
    }
  }
}
