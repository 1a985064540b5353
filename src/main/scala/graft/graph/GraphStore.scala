package graft.graph

import org.apache.spark.sql.{SaveMode, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Graph-at-rest layout (SURVEY.md §4.4, S5): nodes/edges parquet
  * partitioned by `batch`, so
  *  - batch lineage queries prune partitions at the scan,
  *  - tag-predicate cascade delete (A19) of the node side is a partition
  *    drop — a metadata operation, no data rewrite at any scale,
  *  - MERGE upsert commits via write-temp-then-swap, the atomicity protocol
  *    that replaces a lakehouse format's transaction log (§4.3) on a
  *    filesystem with atomic rename.
  */
object GraphStore {

  def save(g: GraphTables, dir: String): Unit = {
    val target = Paths.get(dir)
    val tmp = Paths.get(dir + ".tmp-" + java.util.UUID.randomUUID())
    g.nodes.write.mode(SaveMode.Overwrite).partitionBy("batch")
      .parquet(tmp.resolve("nodes").toString)
    g.edges.write.mode(SaveMode.Overwrite).partitionBy("batch")
      .parquet(tmp.resolve("edges").toString)
    // atomic swap: readers see either the old or the new graph, never a mix
    val old = Paths.get(dir + ".old-" + java.util.UUID.randomUUID())
    if (Files.exists(target)) Files.move(target, old,
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) deleteRecursively(old)
  }

  def load(spark: SparkSession, dir: String): GraphTables = {
    import spark.implicits._
    GraphTables(
      spark.read.parquet(s"$dir/nodes").as[NodeRow],
      spark.read.parquet(s"$dir/edges").as[EdgeRow])
  }

  /** A19 at rest: drop the batch's node/edge partitions — pure metadata.
    * NB: edges *into* the dropped batch from other batches still need the
    * semi-join pass of [[GraphOps.dropBatch]] if cross-batch edges exist;
    * ingest writes edges under their own batch, so same-batch drops are
    * complete.
    */
  def dropBatchAtRest(dir: String, batch: String): Unit =
    Seq("nodes", "edges").foreach { rel =>
      val p = Paths.get(dir, rel, s"batch=$batch")
      if (Files.exists(p)) deleteRecursively(p)
    }

  /** Small-files compaction: incremental batch upserts accumulate many
    * small parquet files per partition; rewrite each relation to
    * `filesPerPartition` files, preserving the batch partitioning. At
    * 100 TB this runs per-partition as routine maintenance — here it is
    * a full rewrite through the same atomic-swap commit.
    */
  def compact(spark: SparkSession, dir: String,
      filesPerPartition: Int = 1): Unit = {
    val g = load(spark, dir)
    val compacted = GraphTables(
      g.nodes.repartition(filesPerPartition,
        org.apache.spark.sql.functions.col("batch"))
        .as(g.nodes.encoder),
      g.edges.repartition(filesPerPartition,
        org.apache.spark.sql.functions.col("batch"))
        .as(g.edges.encoder))
    // save() writes to a temp dir first, so reading `dir` while compacting
    // stays consistent; localCheckpoint breaks the read-own-input cycle
    val materialized = GraphTables(
      compacted.nodes.localCheckpoint(),
      compacted.edges.localCheckpoint())
    save(materialized, dir)
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))
}
