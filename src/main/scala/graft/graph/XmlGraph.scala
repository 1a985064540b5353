package graft.graph

import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer
import scala.xml.{Elem, Node, XML}

/** The two graph relations at rest. */
final case class GraphTables(nodes: Dataset[NodeRow], edges: Dataset[EdgeRow])

/** XML-document → property-graph ingestion (SURVEY.md §2.A A1-A16, §3.2).
  *
  * Where the reference issues one Neo4j round-trip per element
  * (`new-converter.js:27-141`, sequential awaited chain), this flattens each
  * document with a pure recursive function inside `flatMap` — embarrassingly
  * parallel per document, no external store, one shuffle for dedup. At
  * 100 TB the unit of parallelism is the document, so ingest scales with
  * executor count; node/edge dedup is a hash shuffle on the deterministic id.
  */
object XmlIngest {

  /** Marker string splitting airplane types from line numbers
    * (`xml2neo.py:56-65`).
    */
  private val AirplaneMarker = "Airplane(s), line number(s)"

  /** Parse one document into node/edge rows. Pure; runs executor-side.
    *
    * Per element (reference `create_nodes_and_relationships`,
    * `xml2neo.py:68-111`): a node whose label is the sanitized tag, `name`
    * the raw tag, `content` the element's own trimmed text; a containment
    * edge `parent -[HAS_<TAG>]-> child` plus the reverse `IS_PART_OF` edge
    * (`xml2neo.py:105,110`, `new_final.js:36-37`). The `airplanes`
    * effectivity text additionally fans out shared Airplane / LineNumber
    * dimension nodes (`xml2neo.py:76-97`).
    */
  def parseDocument(xmlText: String, batch: String)
      : (Seq[NodeRow], Seq[EdgeRow]) = {
    val root = XML.loadString(xmlText)
    val docnbr = {
      val attr = root.attribute("docnbr").map(_.text.trim)
      val numberEl = (root \ "header" \ "number").headOption
        .orElse((root \ "number").headOption).map(_.text.trim)
      attr.orElse(numberEl).getOrElse(root.label)
    }
    val nodes = ArrayBuffer.empty[NodeRow]
    val edges = ArrayBuffer.empty[EdgeRow]

    def ownText(e: Node): String =
      e.child.collect { case t if t.isAtom => t.text }.mkString.trim

    def addEdgePair(src: Long, dst: Long, fwd: String, rev: String): Unit = {
      edges += EdgeRow(src, dst, fwd, docnbr, batch)
      edges += EdgeRow(dst, src, rev, docnbr, batch)
    }

    def walk(e: Node, parentId: Option[Long], path: Vector[Int]): Long = {
      val label = GraphModel.sanitizeLabel(e.label)
      val content = ownText(e)
      val id = GraphModel.nodeId(label, e.label, content, docnbr, path)
      nodes += NodeRow(id, label, e.label, content, docnbr, batch, path)
      parentId.foreach { pid =>
        addEdgePair(pid, id,
          "HAS_" + GraphModel.sanitizeRelType(e.label), "IS_PART_OF")
      }
      if (e.label == "airplanes" && content.contains(AirplaneMarker))
        fanOutAirplanes(content, id)
      val elems = e.child.collect { case c: Elem => c }
      elems.zipWithIndex.foreach { case (c, i) => walk(c, Some(id), path :+ i) }
      id
    }

    /** `extract_airplanes_and_lines` (`xml2neo.py:56-65`) + the nested
      * create loops (`xml2neo.py:86-96`): each airplane type crosses every
      * line number; both are shared dimension nodes (`docnbr = ""`) so
      * repeats across documents dedup to a single node (A12/A16).
      */
    def fanOutAirplanes(text: String, airplanesId: Long): Unit = {
      val Array(typesPart, linesPart) = text.split(java.util.regex.Pattern
        .quote(AirplaneMarker)) match {
        case Array(a, b) => Array(a, b)
        case other       => Array(other.headOption.getOrElse(""), "")
      }
      val types = typesPart.trim.split("\\s+").filter(_.nonEmpty)
      val lineNumbers = linesPart.split(",").map(_.trim).filter(_.nonEmpty)
      types.foreach { t =>
        val tId = GraphModel.nodeId("Airplane", t, "", "")
        nodes += NodeRow(tId, "Airplane", t, "", "", batch, Vector.empty)
        addEdgePair(airplanesId, tId, "effects", "affected_by")
        lineNumbers.foreach { ln =>
          val lnId = GraphModel.nodeId("LineNumber", ln, "", "")
          nodes += NodeRow(lnId, "LineNumber", ln, "", "", batch, Vector.empty)
          addEdgePair(tId, lnId, "includes", "included_in")
        }
      }
    }

    walk(root, None, Vector.empty)
    (nodes.toSeq, edges.toSeq)
  }

  /** TITLE-driven section extraction (A5/A6; the reference's most advanced
    * generation, `new-converter.js:87-152`): every element owning a
    * `title`/`TITLE` child becomes a section node whose label is the
    * formatted title text and whose content is the *aggregated subtree
    * text* in document order (`gatherContent`, `new-converter.js:57-85`) —
    * `TABLE` subtrees re-serialized as markup, `ColSpec` dropped. Root-level
    * sections link to the document node, nested sections to their nearest
    * titled ancestor; dedup key is `(name, content)`
    * (`new-converter.js:99-105`), reproduced here by the deterministic id.
    */
  def parseTitleMode(xmlText: String, batch: String)
      : (Seq[NodeRow], Seq[EdgeRow]) = {
    val root = XML.loadString(xmlText)
    val docnbr = root.attribute("docnbr").map(_.text.trim)
      .orElse((root \ "header" \ "number").headOption.map(_.text.trim))
      .getOrElse("ServiceBulletin")
    val nodes = ArrayBuffer.empty[NodeRow]
    val edges = ArrayBuffer.empty[EdgeRow]
    val seen = scala.collection.mutable.Set.empty[(String, String)]

    val docId = GraphModel.nodeId("ServiceBulletin", docnbr, "000", docnbr)
    nodes += NodeRow(docId, "ServiceBulletin", docnbr, "000", docnbr, batch,
      Vector.empty)

    def isTitle(e: Node): Boolean = e.label.equalsIgnoreCase("title")

    /** `gatherContent`: all descendant text in document order; TABLE
      * subtrees serialized as markup; ColSpec skipped; the element's own
      * title text excluded from its gathered body? — the reference keeps
      * it, so we keep it too.
      */
    def gatherContent(e: Node): String = {
      def walk(n: Node): Seq[String] = n match {
        case el: Elem if el.label == "ColSpec" => Seq.empty
        case el: Elem if el.label == "TABLE" =>
          // serialize table markup, then strip ColSpec metadata
          // (`new-converter.js:60-70,133`)
          Seq(el.toString
            .replaceAll("<ColSpec[^>]*/>", "")
            .replaceAll("<ColSpec[^>]*>.*?</ColSpec>", ""))
        case el: Elem => el.child.flatMap(walk)
        case t if t.isAtom =>
          val s = t.text.trim
          if (s.nonEmpty) Seq(s) else Seq.empty
        case _ => Seq.empty
      }
      walk(e).mkString(" ")
    }

    def walk(e: Node, parentTitled: Long, path: Vector[Int]): Unit = {
      val elems = e.child.collect { case c: Elem => c }
      val titleChild = elems.find(isTitle)
      val selfId = titleChild match {
        case Some(t) if t.text.trim.nonEmpty =>
          val titleText = t.text.trim
          val label = GraphModel.sanitizeLabel(titleText)
          val content = gatherContent(e)
          val key = (titleText, content)
          val id = GraphModel.nodeId(label, titleText, content, docnbr)
          if (!seen.contains(key)) {
            seen += key
            nodes += NodeRow(id, label, titleText, content, docnbr, batch,
              path)
            // edge typed by the CHILD's label (`new-converter.js:118,123`)
            edges += EdgeRow(parentTitled, id,
              "HAS_" + GraphModel.sanitizeRelType(label), docnbr, batch)
            edges += EdgeRow(id, parentTitled, "IS_PART_OF", docnbr, batch)
          }
          id
        case _ => parentTitled
      }
      elems.zipWithIndex.foreach { case (c, i) =>
        walk(c, selfId, path :+ i)
      }
    }

    walk(root, docId, Vector.empty)
    (nodes.toSeq, edges.toSeq)
  }

  /** Distributed ingest: documents in parallel, then one dedup shuffle per
    * relation (MERGE semantics C2/A11 — deterministic ids make "merge" just
    * `dropDuplicates`).
    */
  def ingest(spark: SparkSession, pathGlob: String, batch: String,
      titleMode: Boolean = false): GraphTables = {
    import spark.implicits._
    val docs = spark.sparkContext.wholeTextFiles(pathGlob)
    val parsed = docs.flatMap { case (_, xmlText) =>
      val (n, e) =
        if (titleMode) parseTitleMode(xmlText, batch)
        else parseDocument(xmlText, batch)
      Iterator.single((n, e))
    }
    val nodes = parsed.flatMap(_._1).toDS()
      .dropDuplicates("id")
    val edges = parsed.flatMap(_._2).toDS()
      .dropDuplicates("src", "dst", "relType")
    GraphTables(nodes, edges)
  }
}
