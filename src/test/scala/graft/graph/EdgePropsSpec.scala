package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge properties: the optional `EdgeRow.props` map — ingest round-trip
  * through the versioned store, backward compatibility with props-less
  * at-rest data, and the weighted-shortest-path kernel reading a REAL
  * cost property (with default fallback for unweighted edges).
  */
class EdgePropsSpec extends SparkSpec {

  private def node(id: Long): NodeRow =
    NodeRow(id, "N", s"n$id", "", "", "b1", Seq.empty)

  test("props survive the store round-trip byte-for-byte") {
    import spark.implicits._
    val g = GraphTables(
      Seq(node(1), node(2)).toDS(),
      Seq(EdgeRow(1L, 2L, "R", "", "b1",
        Map("weight" -> "2.5", "kind" -> "road"))).toDS())
    val dir = java.nio.file.Files
      .createTempDirectory("graft_eprops").toString
    GraphStore.save(g, dir)
    val back = GraphStore.load(spark, dir).edges.collect()
    assert(back.length == 1)
    assert(back.head.props == Map("weight" -> "2.5", "kind" -> "road"))
  }

  test("a props-less edge relation (legacy layout) normalizes to empty " +
      "maps") {
    import spark.implicits._
    val legacy = Seq((1L, 2L, "R", "", "b1"))
      .toDF("src", "dst", "relType", "docnbr", "batch")
    val rows = EdgeRow.normalize(legacy).as[EdgeRow].collect()
    assert(rows.head.props == Map.empty[String, String])
    // normalize is idempotent on the full schema
    val full = EdgeRow.normalize(EdgeRow.normalize(legacy))
    assert(full.columns.count(_ == "props") == 1)
  }

  test("shortestPathWeighted: cost from props('weight'), default for " +
      "unweighted edges, relaxation beats the direct hop") {
    import spark.implicits._
    val g = GraphTables(
      Seq(node(1), node(2), node(3), node(4)).toDS(),
      Seq(
        EdgeRow(1L, 2L, "R", "", "b1", Map("weight" -> "5")),
        EdgeRow(1L, 3L, "R", "", "b1", Map("weight" -> "1")),
        EdgeRow(3L, 2L, "R", "", "b1", Map("weight" -> "1")),
        EdgeRow(2L, 4L, "R", "", "b1") // no weight → default 1.0
      ).toDS())
    val d = GraphOps.shortestPathWeighted(spark, g, Set(1L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(1L) == 0.0)
    assert(d(3L) == 1.0)
    assert(d(2L) == 2.0, s"relaxation must beat the direct w=5 hop: $d")
    assert(d(4L) == 3.0, s"missing weight must fall back to 1.0: $d")
  }

  test("a garbage weight value falls back to the default, not an error") {
    import spark.implicits._
    val g = GraphTables(
      Seq(node(1), node(2)).toDS(),
      Seq(EdgeRow(1L, 2L, "R", "", "b1",
        Map("weight" -> "not-a-number"))).toDS())
    val d = GraphOps.shortestPathWeighted(spark, g, Set(1L), default = 7.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(2L) == 7.0)
  }
}
