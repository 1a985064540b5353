package graft.graph

import graft.SparkSpec

import java.nio.file.{Files, Paths}

/** Ingest at document volume: the unit of parallelism is the document
  * (SURVEY.md §3.2), so node/edge counts must scale linearly with the
  * corpus and dedup must keep shared dimension nodes single.
  */
class VolumeIngestSpec extends SparkSpec {

  private def makeCorpus(n: Int): String = {
    val dir = Files.createTempDirectory("xmlcorpus")
    (0 until n).foreach { i =>
      val xml =
        s"""<bulletin>
           |  <header><number>SB-$i</number><subject>unit $i</subject></header>
           |  <body>
           |    <airplanes>737-${i % 4} Airplane(s), line number(s) ${i % 7}, ${(i % 7) + 1}</airplanes>
           |    <step><number>1</number><text>do the thing $i</text></step>
           |    <step><number>2</number><text>check the thing $i</text></step>
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
}
