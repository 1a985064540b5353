package graft.graph

import org.apache.spark.sql.{SaveMode, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Graph-at-rest layout (SURVEY.md §4.4, S5): nodes/edges parquet
  * partitioned by `batch`, so
  *  - batch lineage queries prune partitions at the scan,
  *  - tag-predicate cascade delete (A19) of the node side is a partition
  *    drop — a metadata operation, no data rewrite at any scale,
  *  - MERGE upsert commits by writing a fresh VERSION DIRECTORY and then
  *    atomically repointing a one-file `CURRENT` pointer — the minimal
  *    form of a lakehouse transaction log (§4.3). The commit is a single
  *    rename, so a crash at ANY step leaves the previous version fully
  *    live; there is no window with no readable graph. Orphaned versions
  *    from crashed writers are swept by the next successful save (or an
  *    explicit [[gc]]).
  */
object GraphStore {

  private val Pointer = "CURRENT"

  private def currentVersion(dir: String): Option[String] = {
    val p = Paths.get(dir, Pointer)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** The live data directory readers and maintenance resolve through. */
  def currentDir(dir: String): String =
    currentVersion(dir)
      .map(v => Paths.get(dir, v).toString)
      .getOrElse(dir) // pre-pointer layout: data directly under dir

  /** `keepVersions` retains that many superseded version dirs after the
    * commit (time travel via [[loadVersion]]); the default keeps none —
    * the original crash-sweep behavior.
    */
  def save(g: GraphTables, dir: String, keepVersions: Int = 0): Unit = {
    val version = "v-" + java.util.UUID.randomUUID()
    val vdir = Paths.get(dir, version)
    g.nodes.write.mode(SaveMode.Overwrite).partitionBy("batch")
      .parquet(vdir.resolve("nodes").toString)
    g.edges.write.mode(SaveMode.Overwrite).partitionBy("batch")
      .parquet(vdir.resolve("edges").toString)
    // commit = one atomic rename of the pointer file; readers resolving
    // CURRENT see the old or the new version, never a mix, never neither
    val tmpPtr = Paths.get(dir, Pointer + ".tmp-" + version)
    Files.write(tmpPtr, version.getBytes("UTF-8"))
    Files.move(tmpPtr, Paths.get(dir, Pointer),
      StandardCopyOption.ATOMIC_MOVE)
    gc(dir, keepVersions)
  }

  /** Sweep stale pointer temps and all but the newest `keepVersions`
    * non-current version dirs (leftovers of crashed writers, plus the
    * retained time-travel history). Safe to run any time; never touches
    * the live version. `keepVersions = 0` is the crash-sweep default:
    * only the live version survives.
    */
  def gc(dir: String, keepVersions: Int = 0): Unit =
    currentVersion(dir).foreach { cur =>
      val old = scala.collection.mutable.ArrayBuffer.empty[Path]
      val stream = Files.list(Paths.get(dir))
      try stream.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(Pointer + ".tmp-")) deleteRecursively(p)
        else if (n.startsWith("v-") && n != cur) old += p
      } finally stream.close()
      // retained versions: newest first by mtime (version names are
      // UUIDs — creation order lives in the filesystem, not the name)
      old.sortBy(p => -Files.getLastModifiedTime(p).toMillis)
        .drop(keepVersions).foreach(deleteRecursively)
    }

  /** All readable versions, current first, then retained history newest
    * first — the time-travel index.
    */
  def versionList(dir: String): Seq[String] =
    currentVersion(dir).toSeq.flatMap { cur =>
      val old = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val stream = Files.list(Paths.get(dir))
      try stream.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v-") && n != cur)
          old += ((n, Files.getLastModifiedTime(p).toMillis))
      } finally stream.close()
      cur +: old.sortBy(-_._2).map(_._1).toSeq
    }

  /** Time-travel read of a retained version (any name from
    * [[versionList]]) — the lakehouse "AS OF" primitive: readers pin a
    * version and are isolated from every later commit and compaction.
    */
  def loadVersion(spark: SparkSession, dir: String, version: String)
      : GraphTables = {
    import spark.implicits._
    val vd = Paths.get(dir, version)
    require(Files.exists(vd), s"version $version not retained in $dir")
    GraphTables(
      spark.read.parquet(s"$vd/nodes").as[NodeRow],
      spark.read.parquet(s"$vd/edges").as[EdgeRow])
  }

  def load(spark: SparkSession, dir: String): GraphTables = {
    import spark.implicits._
    val cd = currentDir(dir)
    GraphTables(
      spark.read.parquet(s"$cd/nodes").as[NodeRow],
      spark.read.parquet(s"$cd/edges").as[EdgeRow])
  }

  /** A19 at rest: drop the batch's node/edge partitions — pure metadata.
    * Edits the live version in place (a partition drop is idempotent and
    * self-consistent, so it doesn't need the version-swap protocol).
    * NB: edges *into* the dropped batch from other batches still need the
    * semi-join pass of [[GraphOps.dropBatch]] if cross-batch edges exist;
    * ingest writes edges under their own batch, so same-batch drops are
    * complete.
    */
  def dropBatchAtRest(dir: String, batch: String): Unit =
    Seq("nodes", "edges").foreach { rel =>
      val p = Paths.get(currentDir(dir), rel, s"batch=$batch")
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
