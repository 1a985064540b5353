package graft.graph

/** Labeled-property-graph data model (SURVEY.md §1.4).
  *
  * One fixed schema for all node types: the dynamic Neo4j label of the
  * reference (`xml2neo.py:100-103`) becomes a `label` column, keeping the
  * graph schemaless-in-data but fixed-in-schema — the only layout that holds
  * up at 100 TB (per-label schemas would explode small files and break
  * column pruning).
  *
  * `path` is the position-in-parent chain from the document root, carried at
  * ingest so subtree text aggregation (reference `gatherContent`,
  * `new-converter.js:57-85`) can re-assemble document order
  * deterministically after any shuffle (SURVEY.md §4.3).
  */
final case class NodeRow(
    id: Long,
    label: String,
    name: String,
    content: String,
    docnbr: String,
    batch: String,
    path: Seq[Int])

/** Directed typed edge; endpoints reference [[NodeRow.id]].
  *
  * `props` carries OPTIONAL edge properties (string-keyed, string-valued
  * — the same schemaless-in-data discipline as node content). The
  * reference's edges are property-less (SURVEY §1.1, `xml2neo.py:104`),
  * so ingest leaves the map empty; weighted kernels
  * ([[GraphOps.shortestPathWeighted]]) read a numeric property out of it
  * (e.g. `props("weight")`). One map column, not per-property columns:
  * at 100 TB a fixed schema with a pruned-away map beats per-relType
  * schemas that explode small files.
  */
final case class EdgeRow(
    src: Long,
    dst: Long,
    relType: String,
    docnbr: String,
    batch: String,
    props: Map[String, String] = Map.empty)

object EdgeRow {
  /** Widen a props-less edge relation (pre-props at-rest layout, or a
    * hand-built fixture) to the full schema — the backward-compat seam:
    * stores written before the column existed load as empty-props edges.
    */
  def normalize(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (df.columns.contains("props")) df
    else df.withColumn("props",
      org.apache.spark.sql.functions.typedLit(Map.empty[String, String]))
}

object GraphModel {

  /** Deterministic node identity (SURVEY.md §1.4): a pure 64-bit hash of the
    * logical key `(label, name, content, docnbr)` instead of Neo4j's
    * session-assigned `id(n)` (`xml2neo.py:19-21`). Determinism is what
    * turns MERGE upsert (`new_final.js:22-31`) into a plain anti-join and
    * makes re-ingest idempotent with no lookup round-trips.
    *
    * Shared dimension nodes (airplane line numbers, `xml2neo.py:93-96`) set
    * `docnbr = ""` so identical values collapse to one node across
    * documents, reproducing the reference's match-or-create dedup.
    *
    * FNV-1a 64-bit: stable across JVMs/runs, dependency-free, executor-side.
    */
  def nodeId(label: String, name: String, content: String,
      docnbr: String, path: Seq[Int] = Nil): Long =
    // fields joined on \u0001 (rendered invisibly below), a character XML
    // 1.0 forbids in text, so field boundaries are unambiguous: without a
    // delimiter, (docnbr="100", path=[23]) and (docnbr="1002", path=[3])
    // would hash identically and MERGE would silently fuse distinct nodes
    fnv64(label + "" + name + "" + content + "" + docnbr +
      "" + path.mkString("."))

  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Label sanitization, same contract as the reference's
    * `sanitizeLabel`/`formatNodeLabel` (`latest.js:16-18,23`,
    * `new-converter.js:44-55`): non-alphanumerics to `_`, `Tag_` prefix for
    * digit-leading names, snake_case parts capitalized.
    */
  def sanitizeLabel(raw: String): String = {
    val cleaned = raw.replaceAll("[^a-zA-Z0-9_]", "_")
    val joined = cleaned.split("_").filter(_.nonEmpty)
      .map(p => s"${p.head.toUpper}${p.tail.toLowerCase}").mkString("_")
    // digit-prefix guard AFTER joining: part-splitting can surface a
    // digit-leading name (e.g. "_2" → "2")
    if (joined.nonEmpty && joined.head.isDigit) "Tag_" + joined else joined
  }

  /** Relationship-type sanitization (`latest.js:17`): uppercase snake. */
  def sanitizeRelType(raw: String): String =
    raw.replaceAll("[^a-zA-Z0-9_]", "_").toUpperCase
}
