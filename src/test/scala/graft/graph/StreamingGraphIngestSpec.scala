package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The reference's only write path (C2 MERGE, `new_final.js:22-40`) under
  * CONTINUOUS arrival: a file-source envelope stream → foreachBatch →
  * upsert → versioned store commit. The contract proven here:
  *
  *  1. stream-ingested graph ≡ batch-ingested graph on the same data,
  *     whatever the slicing into micro-batches,
  *  2. replaying a batch (foreachBatch's at-least-once contract) is a
  *     content no-op,
  *  3. each drain resumes from the checkpoint — only NEW files process.
  */
class StreamingGraphIngestSpec extends SparkSpec {

  private def graphColumns(g: GraphTables) = (
    g.nodes.toDF().select("id", "label", "name", "content", "docnbr",
      "batch", "path"),
    g.edges.toDF().select("src", "dst", "relType", "docnbr", "batch"))

  private def assertSameGraph(a: GraphTables, b: GraphTables): Unit = {
    val (an, ae) = graphColumns(a)
    val (bn, be) = graphColumns(b)
    assert(an.exceptAll(bn).isEmpty && bn.exceptAll(an).isEmpty,
      "node relations differ")
    assert(ae.exceptAll(be).isEmpty && be.exceptAll(ae).isEmpty,
      "edge relations differ")
  }

  test("sliced stream ingest converges to the batch graph; replay and " +
      "re-drain are no-ops") {
    val dir = Files.createTempDirectory("graft_stream_ingest").toString
    val env = s"$dir/env"
    val store = s"$dir/store"
    val ckpt = s"$dir/ckpt"
    val g = ParquetGraph.hierarchy(spark, sf("sf0.001"))
    val full = StreamingGraphIngest.toEnvelope(g).localCheckpoint()

    // three deterministic slices on the MERGE keys — nodes and edges
    // interleave across slices (an edge may arrive before its endpoints;
    // final-state equivalence must not depend on arrival order)
    val sliceKey = pmod(coalesce(col("id"), col("src") + col("dst")), lit(3))
    (0 to 2).foreach { i =>
      full.filter(sliceKey === i).write.parquet(s"$env/slice$i")
      StreamingGraphIngest.drainIngest(spark, env, store, ckpt)
      // the store is live and readable after every incremental commit
      assert(GraphStore.load(spark, store).nodes.count() > 0)
    }

    val streamed = GraphStore.load(spark, store)
    assertSameGraph(streamed, g)

    // replay of an already-applied batch (at-least-once delivery):
    // commits a new version, content identical
    val before = GraphStore.versionList(store)
    StreamingGraphIngest.ingestBatch(spark,
      full.filter(sliceKey === 1), store)
    assertSameGraph(GraphStore.load(spark, store), g)
    assert(GraphStore.versionList(store) != before,
      "replay must commit through the same versioned protocol")

    // a drain with nothing new processes nothing (checkpointed offsets)
    StreamingGraphIngest.drainIngest(spark, env, store, ckpt)
    assertSameGraph(GraphStore.load(spark, store), g)

    // downstream seam: the content-addressed samplers produce a
    // BIT-IDENTICAL corpus over the stream-ingested store and the batch
    // graph — training-data generation is invariant to how the graph
    // arrived (equal edge sets + no RNG state ⇒ equal draws, not merely
    // equivalent distributions)
    def corpus(gt: GraphTables): Seq[(Long, Long, Int, Long)] = {
      val roots = gt.nodes.filter(col("label") === "Region")
        .select(col("id").as("root_id"))
      GraphOps.randomWalks(spark, gt, roots, 3, 3)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        .sorted.toSeq
    }
    assert(corpus(GraphStore.load(spark, store)) == corpus(g),
      "walk corpus must be identical over the streamed store")
  }

  private def nodeSlice(ids: Seq[Long]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    StreamingGraphIngest.toEnvelope(GraphTables(
      ids.map(i => NodeRow(i, "N", s"n$i", "", "", s"b$i", Seq.empty))
        .toDS(),
      spark.emptyDataset[EdgeRow])).localCheckpoint()
  }

  test("ingestBatch auto-compacts once the delta chain passes its " +
      "budget — content unchanged, reads back to one snapshot") {
    val dir = Files.createTempDirectory("graft_autocompact").toString
    // budget 2: batch1 = full, batch2 = delta (chain 2), batch3's delta
    // pushes the chain to 3 > 2 → compaction folds it back to 1
    (1 to 3).foreach(i =>
      StreamingGraphIngest.ingestBatch(spark, nodeSlice(Seq(i.toLong)),
        s"$dir/store", maxChain = 2))
    assert(GraphStore.chainLength(s"$dir/store") == 1,
      "the chain must have compacted back to one full snapshot")
    assert(GraphStore.load(spark, s"$dir/store")
      .nodes.collect().map(_.id).toSet == Set(1L, 2L, 3L))
  }

  test("auto-compaction honors the writer's keepVersions — retained " +
      "time-travel history survives the MaxChain fold") {
    val store = Files.createTempDirectory("graft_compact_keep")
      .resolve("store").toString
    // keepVersions = 2 with chain budget 2: batch 3's delta pushes the
    // chain past budget, so the SAME ingestBatch call both commits and
    // compacts — the fold must keep the history the per-batch commits
    // kept, or loadVersion's pin contract breaks every MaxChain batches
    (1 to 3).foreach(i =>
      StreamingGraphIngest.ingestBatch(spark, nodeSlice(Seq(i.toLong)),
        store, keepVersions = 2, maxChain = 2))
    assert(GraphStore.chainLength(store) == 1,
      "the chain must have compacted back to one full snapshot")
    val versions = GraphStore.versionList(store)
    // current (compacted) + the 2 retained heads + the chain member the
    // newest retained delta resolves through
    assert(versions.length == 4,
      s"compaction swept retained history: $versions")
    // each retained version still reads ITS point in time
    assert(GraphStore.loadVersion(spark, store, versions(1))
      .nodes.collect().map(_.id).toSet == Set(1L, 2L, 3L))
    assert(GraphStore.loadVersion(spark, store, versions(2))
      .nodes.collect().map(_.id).toSet == Set(1L, 2L))
    assert(GraphStore.loadVersion(spark, store, versions(3))
      .nodes.collect().map(_.id).toSet == Set(1L))
  }

  test("envelope round-trip is lossless and batch-deduping") {
    import spark.implicits._
    val g = GraphTables(
      Seq(NodeRow(1L, "A", "a", "", "", "b1", Seq(1, 2)),
        NodeRow(2L, "B", "b", "c", "d9", "b1", Seq.empty)).toDS(),
      Seq(EdgeRow(1L, 2L, "R", "", "b1")).toDS())
    val env = StreamingGraphIngest.toEnvelope(g)
    // an at-least-once feed repeats rows WITHIN a batch: dedup on MERGE keys
    val doubled = env.unionByName(env)
    // materialize: the comparison's exceptAll against the SAME toDS
    // lineage otherwise trips attribute-binding conflicts in the
    // replication Generate (both sides would share attribute ids)
    val raw = StreamingGraphIngest.fromEnvelope(spark, doubled)
    val back = GraphTables(
      raw.nodes.localCheckpoint(), raw.edges.localCheckpoint())
    assertSameGraph(back, g)
    assert(back.nodes.count() == 2 && back.edges.count() == 1)
  }
}
