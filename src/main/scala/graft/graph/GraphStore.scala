package graft.graph

import org.apache.spark.sql.{Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, typedLit}

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.Comparator
import java.util.concurrent.atomic.AtomicLong

/** Graph-at-rest layout (SURVEY.md §4.4, S5): nodes/edges parquet
  * partitioned by `batch`, so
  *  - batch lineage queries prune partitions at the scan,
  *  - tag-predicate cascade delete (A19) of the node side is a partition
  *    drop — a metadata operation, no data rewrite at any scale,
  *  - MERGE upsert commits by writing a fresh VERSION DIRECTORY and then
  *    atomically repointing a one-file `CURRENT` pointer — the minimal
  *    form of a lakehouse transaction log (§4.3). The commit is a single
  *    rename, so a crash at ANY step leaves the previous version fully
  *    live; there is no window with no readable graph.
  *
  * Two commit shapes share one protocol: [[save]] writes a FULL
  * snapshot; [[saveDelta]] writes only a micro-batch's new rows and
  * marks the version `DELTA` — its logical content is the union of its
  * CHAIN (predecessors in the commit log down to the youngest full
  * snapshot), resolved at read time. Incremental commits cost O(batch);
  * [[compact]] folds a chain back into one snapshot as maintenance.
  *
  * Commit protocol: after the pointer flip, the version name is appended
  * to a `COMMITS` log. Only versions that appear in the log (or are the
  * current pointer target) are COMMITTED; gc, [[versionList]] and
  * [[loadVersion]] consider committed versions only, and any `v-*`
  * directory outside that set is a crashed writer's torn snapshot and is
  * swept once it ages past [[UncommittedGraceMillis]] — a partial dir can
  * never be preferentially retained as "newest history" or read back as a
  * snapshot. History order is the log's append order (a total order
  * independent of filesystem mtime, which copy/backup tooling can
  * perturb); version names also embed a zero-padded epoch-millis +
  * sequence prefix so the names themselves sort in creation order for
  * humans and tools.
  *
  * CONCURRENCY CONTRACT: the store assumes a SINGLE WRITER per directory
  * — [[save]]/[[gc]]/[[compact]] serialize through the caller, as in any
  * non-locking lakehouse layout (concurrent writers would race the
  * pointer flip itself, not just gc). Readers are unrestricted. As
  * defense in depth against a gc racing another process's in-flight
  * save, an UNCOMMITTED `v-*` dir younger than the grace window is left
  * alone: a torn snapshot is by definition older than its crashed
  * writer, so the grace delays its sweep by minutes without ever
  * resurrecting it as readable history.
  */
object GraphStore {

  private val Pointer = "CURRENT"
  private val CommitLog = "COMMITS"
  private val seq = new AtomicLong(0L)

  /** How long an UNCOMMITTED `v-*` dir (absent from the COMMITS log) is
    * protected from the gc sweep, by mtime. Long enough that a live
    * writer's snapshot-in-progress is never destroyed under it; short
    * enough that crashed-writer debris doesn't accumulate across runs.
    */
  val UncommittedGraceMillis: Long = 10L * 60 * 1000

  /** Marker file distinguishing an INCREMENTAL version (its logical
    * content = predecessor + this dir's rows) from a full snapshot.
    */
  private val DeltaMarker = "DELTA"

  private def isDelta(dir: String, v: String): Boolean =
    Files.exists(Paths.get(dir, v, DeltaMarker))

  /** The contiguous commit-log suffix `v`'s data depends on: `v` itself
    * plus, while a version is a delta, its log predecessor — ending at
    * the youngest FULL snapshot at or below `v`. A full version's chain
    * is just itself.
    */
  private def chainOf(dir: String, v: String): Seq[String] = {
    val log = committedVersions(dir)
    val idx = log.indexOf(v)
    if (idx < 0) Seq(v)
    else {
      var i = idx
      while (i > 0 && isDelta(dir, log(i))) i -= 1
      log.slice(i, idx + 1)
    }
  }

  private def currentVersion(dir: String): Option[String] = {
    val p = Paths.get(dir, Pointer)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** Committed versions in commit order (oldest first). The current
    * pointer target is always committed even if the post-flip log append
    * was lost to a crash.
    */
  private def committedVersions(dir: String): Seq[String] = {
    val p = Paths.get(dir, CommitLog)
    val logged =
      if (Files.exists(p))
        new String(Files.readAllBytes(p), "UTF-8")
          .split('\n').iterator.map(_.trim).filter(_.nonEmpty).toSeq.distinct
      else Seq.empty
    currentVersion(dir) match {
      case Some(cur) if !logged.contains(cur) => logged :+ cur
      case _                                  => logged
    }
  }

  private def appendCommit(dir: String, version: String): Unit =
    Files.write(Paths.get(dir, CommitLog), (version + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** Rewrite the commit log to exactly `versions` (commit order), via the
    * same tmp-file + atomic-rename discipline as the pointer.
    */
  private def rewriteLog(dir: String, versions: Seq[String]): Unit = {
    val tmp = Paths.get(dir, CommitLog + ".tmp")
    Files.write(tmp, versions.mkString("", "\n", "\n").getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, CommitLog),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Length of the LIVE version's delta chain (1 = a full snapshot with
    * no deltas on top; 0 = no committed version yet). Read cost grows
    * with the chain, so a continuous writer compacts when this passes
    * its budget — see [[StreamingGraphIngest.ingestBatch]].
    */
  def chainLength(dir: String): Int =
    currentVersion(dir).map(chainOf(dir, _).length).getOrElse(0)

  /** Whether `dir` holds a committed version (the pointer exists). The
    * public form of the "has this store been initialized" probe, so
    * callers never hardcode the pointer filename or layout.
    */
  def hasCurrent(dir: String): Boolean = currentVersion(dir).isDefined

  /** The live data directory readers and maintenance resolve through. */
  def currentDir(dir: String): String =
    currentVersion(dir)
      .map(v => Paths.get(dir, v).toString)
      .getOrElse(dir) // pre-pointer layout: data directly under dir

  /** `keepVersions` retains that many superseded COMMITTED version dirs
    * after the commit (time travel via [[loadVersion]]); the default
    * keeps none — the original crash-sweep behavior.
    */
  def save(g: GraphTables, dir: String, keepVersions: Int = 0): Unit =
    commitVersion(g, dir, keepVersions, delta = false)

  /** Commit an INCREMENTAL version: only `delta`'s rows are written; the
    * version's logical content = predecessor + delta, resolved through
    * the commit log at read time ([[loadVersion]] unions the chain). The
    * commit costs O(delta), not O(graph) — the micro-batch MERGE shape a
    * continuous ingest needs at 100 TB (a full rewrite per micro-batch
    * would be quadratic in arrived data). The delta MUST be disjoint
    * from the current content on the MERGE keys (the caller computes it
    * with [[GraphOps.upsertDelta]]); [[compact]] folds a long chain back
    * into one full snapshot as routine maintenance. An empty delta is a
    * legal commit (a replayed micro-batch re-commits identical content
    * through the same protocol).
    */
  def saveDelta(delta: GraphTables, dir: String,
      keepVersions: Int = 0): Unit = {
    require(currentVersion(dir).isDefined,
      "saveDelta needs an existing committed base — use save() for the " +
        "first commit")
    commitVersion(delta, dir, keepVersions, delta = true)
  }

  private def commitVersion(g: GraphTables, dir: String, keepVersions: Int,
      delta: Boolean): Unit = {
    // name embeds creation order (epoch millis + per-JVM sequence) so
    // lexicographic sort ≡ creation order even within one millisecond;
    // the UUID tail keeps cross-JVM uniqueness
    val version = f"v-${System.currentTimeMillis()}%013d-${seq.incrementAndGet()}%06d-" +
      java.util.UUID.randomUUID().toString.take(8)
    val vdir = Paths.get(dir, version)
    // the two relations are independent — submit both write jobs at once
    // (Spark schedules concurrent jobs from separate threads in one
    // session) so the commit's wall time is max(nodes, edges), not the
    // sum; at a micro-batch cadence the difference is paid every commit
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val writes = Seq(
      Future(g.nodes.write.mode(SaveMode.Overwrite).partitionBy("batch")
        .parquet(vdir.resolve("nodes").toString)),
      Future(g.edges.write.mode(SaveMode.Overwrite).partitionBy("batch")
        .parquet(vdir.resolve("edges").toString)))
    writes.foreach(Await.result(_, Duration.Inf))
    // the marker precedes the pointer flip: a reader resolving the new
    // version must already see it as a delta
    if (delta) Files.write(vdir.resolve(DeltaMarker), Array.empty[Byte])
    // commit = one atomic rename of the pointer file; readers resolving
    // CURRENT see the old or the new version, never a mix, never neither
    val tmpPtr = Paths.get(dir, Pointer + ".tmp-" + version)
    Files.write(tmpPtr, version.getBytes("UTF-8"))
    Files.move(tmpPtr, Paths.get(dir, Pointer),
      StandardCopyOption.ATOMIC_MOVE)
    appendCommit(dir, version)
    gc(dir, keepVersions)
  }

  /** Sweep stale pointer temps, NON-COMMITTED `v-*` dirs (torn snapshots
    * from crashed writers) older than [[UncommittedGraceMillis]], and all
    * but the newest `keepVersions` committed non-current versions. Safe
    * to run any time under the single-writer contract; never touches the
    * live version NOR its delta chain (the predecessors a delta head's
    * content resolves through are infrastructure of the live version,
    * not time-travel budget), and a RETAINED history head keeps its own
    * chain readable too. `keepVersions = 0` is the crash-sweep default:
    * only the live version ( + its chain) survives.
    */
  def gc(dir: String, keepVersions: Int = 0): Unit =
    currentVersion(dir).foreach { cur =>
      val log = committedVersions(dir)
      val committed = log.toSet
      val now = System.currentTimeMillis()
      def aged(p: Path): Boolean =
        try now - Files.getLastModifiedTime(p).toMillis >
          UncommittedGraceMillis
        catch { case _: java.io.IOException => false } // raced: skip
      val stream = Files.list(Paths.get(dir))
      try stream.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(Pointer + ".tmp-") && aged(p)) deleteRecursively(p)
        // a v-* dir the log never saw was never pointed to: torn snapshot
        // — swept once it outlives any writer that could still commit it
        else if (n.startsWith("v-") && !committed.contains(n) && aged(p))
          deleteRecursively(p)
      } finally stream.close()
      val liveChain = chainOf(dir, cur).toSet
      // retained history HEADS: committed, existing, outside the live
      // chain — newest first by LOG ORDER (not mtime)
      val history = log.reverse
        .filter(v => !liveChain.contains(v) &&
          Files.exists(Paths.get(dir, v)))
      val kept = liveChain ++
        history.take(keepVersions).flatMap(chainOf(dir, _))
      history.filterNot(kept.contains).foreach(v =>
        deleteRecursively(Paths.get(dir, v)))
      rewriteLog(dir, log.filter(kept.contains))
    }

  /** All readable versions, current first, then retained committed
    * history newest first (log order) — the time-travel index. Torn
    * snapshots never appear here.
    */
  def versionList(dir: String): Seq[String] =
    currentVersion(dir).toSeq.flatMap { cur =>
      cur +: committedVersions(dir).reverse
        .filter(v => v != cur && Files.exists(Paths.get(dir, v)))
    }

  /** Time-travel read of a retained version (any name from
    * [[versionList]]) — the lakehouse "AS OF" primitive: readers pin a
    * version and are isolated from every later commit and compaction.
    * A DELTA version reads as the union of its chain (its predecessors
    * down to the youngest full snapshot). Refuses names outside the
    * commit log: a torn snapshot is not readable history. Relations are
    * read with EXPLICIT schemas, so an empty delta (a replayed
    * micro-batch) and a pre-`props` store both load cleanly.
    */
  def loadVersion(spark: SparkSession, dir: String, version: String)
      : GraphTables = {
    require(Files.exists(Paths.get(dir, version)),
      s"version $version not retained in $dir")
    require(committedVersions(dir).contains(version),
      s"version $version was never committed in $dir (torn snapshot)")
    val chain = chainOf(dir, version)
    chain.foreach(v => require(Files.exists(Paths.get(dir, v)),
      s"delta chain member $v of $version missing in $dir"))
    val nodes = chain
      .map(v => spark.read.schema(Encoders.product[NodeRow].schema)
        .parquet(s"$dir/$v/nodes"))
      .reduce(_ unionByName _)
    val edges = chain
      .map(v => spark.read.schema(Encoders.product[EdgeRow].schema)
        .parquet(s"$dir/$v/edges"))
      .reduce(_ unionByName _)
      // a pre-props file reads the missing column as null, not empty map
      .withColumn("props",
        coalesce(col("props"), typedLit(Map.empty[String, String])))
    GraphTables(nodes.as(Encoders.product[NodeRow]),
      edges.as(Encoders.product[EdgeRow]))
  }

  def load(spark: SparkSession, dir: String): GraphTables =
    currentVersion(dir) match {
      case Some(cur) => loadVersion(spark, dir, cur)
      case None => // pre-pointer layout: data directly under dir
        GraphTables(
          spark.read.schema(Encoders.product[NodeRow].schema)
            .parquet(s"$dir/nodes").as(Encoders.product[NodeRow]),
          EdgeRow.normalize(spark.read.parquet(s"$dir/edges"))
            .as(Encoders.product[EdgeRow]))
    }

  /** A19 at rest: drop the batch's node/edge partitions — pure metadata.
    * Edits the live version in place (a partition drop is idempotent and
    * self-consistent, so it doesn't need the version-swap protocol).
    * NB: edges *into* the dropped batch from other batches still need the
    * semi-join pass of [[GraphOps.dropBatch]] if cross-batch edges exist;
    * ingest writes edges under their own batch, so same-batch drops are
    * complete.
    */
  def dropBatchAtRest(dir: String, batch: String): Unit = {
    // a delta head's batch rows may live in ANY chain member
    val roots = currentVersion(dir) match {
      case Some(cur) => chainOf(dir, cur).map(v => Paths.get(dir, v))
      case None => Seq(Paths.get(dir))
    }
    for (r <- roots; rel <- Seq("nodes", "edges")) {
      val p = r.resolve(rel).resolve(s"batch=$batch")
      if (Files.exists(p)) deleteRecursively(p)
    }
  }

  /** Small-files compaction: incremental batch upserts accumulate many
    * small parquet files per partition; rewrite each relation to
    * `filesPerPartition` files, preserving the batch partitioning. At
    * 100 TB this runs per-partition as routine maintenance — here it is
    * a full rewrite through the same atomic-swap commit.
    */
  def compact(spark: SparkSession, dir: String,
      filesPerPartition: Int = 1, keepVersions: Int = 0): Unit = {
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
    // the compaction commit honors the caller's retention: a default
    // save() here would gc every retained time-travel version, breaking
    // loadVersion's pin contract for any keepVersions>0 writer
    save(materialized, dir, keepVersions)
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]())
      .forEach(f => Files.delete(f))
}
