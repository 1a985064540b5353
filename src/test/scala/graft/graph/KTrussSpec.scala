package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** kTruss semantics the oracle twin's single-round fixture can't show:
  * the peeling CASCADE. Two triangles sharing edge B–C (A–B–C and
  * B–C–D): at k = 4 every edge except B–C has support 1 and peels in
  * round 1 — which drops B–C's own support from 2 to 0, so it peels in
  * round 2. A single-pass "support ≥ k−2" filter would wrongly keep B–C;
  * the fixpoint answer is empty. At k = 3 the whole bowtie survives.
  */
class KTrussSpec extends SparkSpec {

  private def bowtie: GraphTables = {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // triangle A-B-C
      (2L, 4L), (3L, 4L)            // triangle B-C-D (shares B-C)
    ).map { case (s, d) => (s, d, "HAS_CHILD", "", "b0") }
      .toDF("src", "dst", "relType", "docnbr", "batch")
    val withProps = EdgeRow.normalize(edges).as[EdgeRow]
    GraphTables(spark.emptyDataset[NodeRow], withProps)
  }

  test("k=4 cascades to empty across two peeling rounds") {
    assert(GraphOps.kTruss(spark, bowtie, 4).count() == 0L)
  }

  test("k=3 keeps the whole bowtie") {
    val got = GraphOps.kTruss(spark, bowtie, 3).collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("k below 3 is rejected") {
    intercept[IllegalArgumentException] {
      GraphOps.kTruss(spark, bowtie, 2)
    }
  }
}
