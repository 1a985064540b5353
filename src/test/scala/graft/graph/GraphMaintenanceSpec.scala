package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Maintenance surface: graph-at-rest store (S5), cross-table link (A17),
  * content update (A18).
  */
class GraphMaintenanceSpec extends SparkSpec {

  lazy val g: GraphTables =
    XmlIngest.ingest(spark, GraphQueries.XmlGlob, "b1")

  test("save/load roundtrip preserves the graph (S5)") {
    val dir = java.nio.file.Files.createTempDirectory("gstore")
      .resolve("graph").toString
    GraphStore.save(g, dir)
    val back = GraphStore.load(spark, dir)
    assert(back.nodes.count() == g.nodes.count())
    assert(back.edges.count() == g.edges.count())
    assert(back.nodes.select("id").except(g.nodes.select("id")).count() == 0)
    // batch filters prune partitions at the scan
    val plan = back.nodes.filter(col("batch") === "b1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(batch"), plan.take(600))
  }

  test("atomic swap: second save replaces, partition drop deletes a batch") {
    val dir = java.nio.file.Files.createTempDirectory("gstore2")
      .resolve("graph").toString
    GraphStore.save(g, dir)
    // a second batch with distinct ids (id-shifted clone)
    val g2 = GraphTables(
      g.nodes.withColumn("id", col("id") + 1)
        .withColumn("batch", lit("b9")).as(g.nodes.encoder),
      g.edges.withColumn("src", col("src") + 1)
        .withColumn("dst", col("dst") + 1)
        .withColumn("batch", lit("b9")).as(g.edges.encoder))
    GraphStore.save(GraphOps.upsert(g, g2), dir)
    val both = GraphStore.load(spark, dir)
    assert(both.nodes.select("batch").distinct().count() == 2)
    GraphStore.dropBatchAtRest(dir, "b9")
    val after = GraphStore.load(spark, dir)
    assert(after.nodes.select("batch").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("b1"))
  }

  test("compaction reduces file count, preserves data") {
    val dir = java.nio.file.Files.createTempDirectory("gstore3")
      .resolve("graph").toString
    // fragment: write with many partitions
    val fragmented = GraphTables(
      g.nodes.repartition(16).as(g.nodes.encoder),
      g.edges.repartition(16).as(g.edges.encoder))
    GraphStore.save(fragmented, dir)
    def parquetFiles(rel: String) = {
      val p = java.nio.file.Paths.get(GraphStore.currentDir(dir), rel)
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet"))
        .count()
    }
    val before = parquetFiles("nodes")
    GraphStore.compact(spark, dir)
    val after = parquetFiles("nodes")
    assert(after < before, s"$before -> $after")
    val back = GraphStore.load(spark, dir)
    assert(back.nodes.count() == g.nodes.count())
    assert(back.edges.count() == g.edges.count())
  }

  test("crashed writer leaves previous version live; gc sweeps orphans") {
    val dir = java.nio.file.Files.createTempDirectory("gstore4")
      .resolve("graph").toString
    GraphStore.save(g, dir)
    val live = GraphStore.currentDir(dir)
    // simulate a writer that crashed AFTER writing data but BEFORE the
    // pointer rename: an orphan version dir + a stale pointer temp
    val orphan = java.nio.file.Paths.get(dir, "v-orphan-crashed")
    java.nio.file.Files.createDirectories(orphan.resolve("nodes"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "CURRENT.tmp-v-orphan-crashed"),
      "v-orphan-crashed".getBytes("UTF-8"))
    // the committed version is untouched and still resolves
    assert(GraphStore.currentDir(dir) == live)
    assert(GraphStore.load(spark, dir).nodes.count() == g.nodes.count())
    // the writer is long dead: age its leftovers past the in-flight
    // grace window (a fresh uncommitted dir survives gc by design)
    val dead = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - GraphStore.UncommittedGraceMillis - 60000)
    Seq(orphan,
      java.nio.file.Paths.get(dir, "CURRENT.tmp-v-orphan-crashed"))
      .foreach { pth =>
        val w = java.nio.file.Files.walk(pth)
        try w.forEach(java.nio.file.Files.setLastModifiedTime(_, dead))
        finally w.close()
      }
    GraphStore.gc(dir)
    assert(!java.nio.file.Files.exists(orphan))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "CURRENT.tmp-v-orphan-crashed")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(live)))
  }

  test("linkDocsTo connects roots to shared dimension nodes (A17)") {
    import spark.implicits._
    val mapping = Seq(
      ("737-00-1028", "N737BA"), ("737-00-1029", "N737BA"),
      ("737-00-1030", "N737BB"))
      .toDF("docnbr", "target_name")
    val linked = GraphOps.linkDocsTo(g, mapping, "Aircraft", "APPLIES_TO", "b1")
    val aircraft = linked.nodes.filter(col("label") === "Aircraft")
    assert(aircraft.count() == 2) // shared across docs
    val applies = linked.edges.filter(col("relType") === "APPLIES_TO")
    assert(applies.count() == 3)
    // idempotent under repeat
    val again = GraphOps.linkDocsTo(linked, mapping, "Aircraft",
      "APPLIES_TO", "b1")
    assert(again.nodes.count() == linked.nodes.count())
    assert(again.edges.count() == linked.edges.count())
  }

  test("linkDocsTo drops null target keys and survives quoted labels") {
    import spark.implicits._
    // a null target identifies no dimension node — the row is dropped
    // explicitly rather than null-propagating into null node/edge ids
    val mapping = Seq(
      ("737-00-1028", Some("N737BA")), ("737-00-1029", None))
      .toDF("docnbr", "target_name")
    // label with a quote and a backslash: the id expression is built via
    // the Column API, so no SQL-text escaping is involved
    val label = """Op'er\ator"""
    val linked = GraphOps.linkDocsTo(g, mapping, label, "APPLIES_TO", "b1")
    val dims = linked.nodes.filter(col("label") === label)
    assert(dims.count() == 1)
    assert(dims.collect().head.name == "N737BA")
    assert(linked.edges.filter(col("relType") === "APPLIES_TO").count() == 1)
    assert(linked.nodes.filter(col("id").isNull).isEmpty)
    assert(linked.edges.filter(col("dst").isNull).isEmpty)
  }

  test("streaming incremental ingest converges to the batch graph") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // stream node rows in two micro-batches; foreachBatch MERGEs each into
    // the accumulating graph — the streaming write path of Q7
    val all = g.nodes.collect().toSeq
    val (first, second) = all.splitAt(all.size / 2)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[NodeRow]
    var acc = GraphTables(spark.emptyDataset[NodeRow],
      spark.emptyDataset[EdgeRow])
    val q = mem.toDS().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[NodeRow], _: Long) =>
        acc = GraphOps.upsert(acc,
          GraphTables(batch, spark.emptyDataset[EdgeRow]))
        acc = GraphTables(acc.nodes.localCheckpoint(), acc.edges)
    }.start()
    mem.addData(first: _*)
    q.processAllAvailable()
    mem.addData(second: _*)
    mem.addData(first: _*) // replayed rows must not duplicate (MERGE)
    q.processAllAvailable()
    q.stop()
    assert(acc.nodes.count() == g.nodes.count())
  }

  test("updateContent sets matched nodes, keeps the rest (A18)") {
    import spark.implicits._
    val someId = g.nodes.filter(col("label") === "Subject")
      .select("id").collect().head.getLong(0)
    val updated = GraphOps.updateContent(g,
      Seq((someId, "NEW SUBJECT")).toDF("id", "new_content"))
    assert(updated.nodes.filter(col("id") === someId)
      .select("content").collect().head.getString(0) == "NEW SUBJECT")
    assert(updated.nodes.filter(col("content") === "NEW SUBJECT").count() == 1)
    assert(updated.nodes.count() == g.nodes.count())
  }
}
