package graft

import graft.graph.GraphQueries
import org.apache.spark.sql.functions._

/** The facade must carry a user through the reference's whole workflow:
  * ingest → query (Cypher + SQL + neighborhood) → maintain → store.
  */
class GraftFacadeSpec extends SparkSpec {

  test("end-to-end workflow through the facade") {
    val g = Graft.ingestXml(spark, GraphQueries.XmlGlob, "w1")
    // query three ways
    val viaCypher = Graft.cypher(g,
      "MATCH (m:Boeing_Service_Bulletin)-[*1..3]->(connected) " +
        "RETURN m, connected").toOption.get
    assert(viaCypher.count() > 0)
    val viaSql = Graft.sql(spark, g,
      "SELECT count(*) AS n FROM nodes WHERE label = 'Step'")
    assert(viaSql.collect().head.getLong(0) > 0)
    val nested = Graft.neighborhood(g, "Boeing_Service_Bulletin",
      "boeing_service_bulletin")
    assert(nested.count() == 1)
    // maintain: second batch in, then out again
    val g2 = Graft.upsert(g,
      Graft.ingestXml(spark, GraphQueries.XmlGlob, "w2", titleMode = true))
    assert(g2.nodes.count() > g.nodes.count())
    val g3 = Graft.dropBatch(g2, "w2")
    assert(g3.nodes.count() == g.nodes.count())
    // store roundtrip
    val dir = java.nio.file.Files.createTempDirectory("facade")
      .resolve("graph").toString
    Graft.save(g3, dir)
    assert(Graft.load(spark, dir).nodes.count() == g.nodes.count())
    // analytics
    assert(Graft.pageRank(spark, g, 3).count() == g.nodes.count())
    assert(Graft.hits(spark, g, 3).count() == g.nodes.count())
    val root = g.nodes.filter(col("label") === "Boeing_Service_Bulletin")
      .select("id").collect().head.getLong(0) // 1 flagship root
    assert(Graft.personalizedPageRank(spark, g, root, 5)
      .filter(col("rank") > 0).count() > 0)
    assert(Graft.harmonicCentrality(spark, g, Seq(root))
      .count() == g.nodes.count())
    assert(Graft.nodeSimilarity(spark, g).count() > 0)
    assert(Graft.stronglyConnected(spark, g).count() == g.nodes.count())
    assert(Graft.kCore(spark, g, 1).count() > 0)
    assert(Graft.linkPredict(spark, g).count() > 0)
    // corpus ops
    assert(Graft.dupClusters(spark, sf("sf0.001")).count() == 500)
  }
}
