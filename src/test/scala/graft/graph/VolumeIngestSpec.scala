package graft.graph

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** Ingest at document volume: the unit of parallelism is the document
  * (SURVEY.md §3.2), so node/edge counts must scale linearly with the
  * corpus and dedup must keep shared dimension nodes single.
  */
class VolumeIngestSpec extends SparkSpec {

  private def makeCorpus(n: Int, steps: Int = 2): String = {
    val dir = Files.createTempDirectory("xmlcorpus")
    (0 until n).foreach { i =>
      val stepXml = (1 to steps).map(k =>
        s"    <step><number>$k</number><text>do the thing $i step $k:" +
          " lorem ipsum dolor sit amet consectetur adipiscing elit sed do" +
          s" eiusmod tempor incididunt ut labore $k</text></step>")
        .mkString("\n")
      val xml =
        s"""<bulletin>
           |  <header><number>SB-$i</number><subject>unit $i</subject></header>
           |  <body>
           |    <airplanes>737-${i % 4} Airplane(s), line number(s) ${i % 7}, ${(i % 7) + 1}</airplanes>
           |$stepXml
           |  </body>
           |</bulletin>""".stripMargin
      Files.writeString(dir.resolve(f"doc_$i%04d.xml"), xml)
    }
    dir.toString
  }

  test("200-document ingest: linear structure, shared dims stay deduped") {
    val dir = makeCorpus(200)
    val g = XmlIngest.ingest(spark, dir + "/*.xml", "vol")
    // 9 elements per doc + shared Airplane/LineNumber dims
    val perDoc = g.nodes.filter(org.apache.spark.sql.functions
      .col("docnbr") === "SB-0").count()
    assert(g.nodes.filter(org.apache.spark.sql.functions
      .col("docnbr") =!= "").count() == 200 * perDoc)
    val airplanes = g.nodes.filter(org.apache.spark.sql.functions
      .col("label") === "Airplane").count()
    assert(airplanes == 4) // shared across all 200 docs
    val lineNumbers = g.nodes.filter(org.apache.spark.sql.functions
      .col("label") === "LineNumber").count()
    assert(lineNumbers == 8) // values 0..7
    // MERGE: re-ingest is a no-op at volume too
    val merged = GraphOps.upsert(g, XmlIngest.ingest(spark, dir + "/*.xml", "vol"))
    assert(merged.nodes.count() == g.nodes.count())
  }

  test("multi-MB corpus: one dedup shuffle per relation, linear structure") {
    // ~6 MB across 400 docs: parse is map-side (no shuffle), so ingest cost
    // is O(corpus bytes) by construction — the only shuffle in the whole
    // pipeline is the MERGE dedup, and this pins that plan shape so a
    // regression (e.g. an accidental join or repartition in the ingest
    // path) fails loudly rather than surfacing as a 100-TB cliff
    val nDocs = 400
    val dir = makeCorpus(nDocs, steps = 80)
    val bytes = Files.list(Paths.get(dir)).mapToLong(Files.size).sum()
    assert(bytes > 4L * 1024 * 1024, s"corpus only $bytes bytes")

    val t0 = System.nanoTime()
    val g = XmlIngest.ingest(spark, dir + "/*.xml", "big")
    val nNodes = g.nodes.count()
    val nEdges = g.edges.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"ingested ${bytes / 1e6}%.1f MB in $secs%.2f s" +
      f" (${bytes / 1e6 / secs}%.1f MB/s, $nNodes nodes, $nEdges edges)")

    // structure exactly linear in document count (plus the shared dims):
    // per doc: bulletin, header, number, subject, body, airplanes,
    // 80 × (step, number, text) = 246 doc-scoped nodes
    val perDoc = g.nodes.filter(org.apache.spark.sql.functions
      .col("docnbr") === "SB-0").count()
    assert(perDoc == 246, s"perDoc=$perDoc")
    assert(g.nodes.filter(org.apache.spark.sql.functions
      .col("docnbr") =!= "").count() == nDocs.toLong * perDoc)

    // exactly ONE exchange per relation: the dedup shuffle and nothing else
    def exchanges(plan: String): Int =
      "Exchange".r.findAllIn(plan).size
    val nodePlan = g.nodes.queryExecution.executedPlan.toString
    val edgePlan = g.edges.queryExecution.executedPlan.toString
    assert(exchanges(nodePlan) == 1, nodePlan.take(800))
    assert(exchanges(edgePlan) == 1, edgePlan.take(800))
    // and the dedup aggregates map-side first (partial), so shuffle volume
    // is bounded by per-partition distinct rows, not raw parse output
    assert(nodePlan.contains("HashAggregate") ||
      nodePlan.contains("SortAggregate"), nodePlan.take(800))
  }
}
