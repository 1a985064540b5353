package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed checks of the g15 histogram-median kernel's edge
  * semantics (the oracle grades the orders fixture; this pins odd/even
  * row counts and duplicate middle values on inputs small enough to
  * verify by eye). The kernel under test is the registered query itself,
  * run against a temp parquet dir shaped like the orders table.
  */
class ExactMedianSpec extends SparkSpec {

  private def medianOf(prices: Seq[Double]): Double = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("med").toString
    prices.zipWithIndex
      .map { case (p, i) => (i.toLong, 0L, "F", p,
        java.sql.Timestamp.valueOf("1996-01-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    graft.SparkEntry.queries("g15_exact_median")(spark, dir)
      .collect().head.getAs[Double]("med")
  }

  test("odd count: the single middle value, exactly") {
    assert(medianOf(Seq(3.5, 1.25, 2.75)) == 2.75)
  }

  test("even count: the average of the two middles, exact in cents") {
    assert(medianOf(Seq(1.0, 2.0, 3.0, 10.0)) == 2.5)
    // the two middles land on a half-cent average
    assert(medianOf(Seq(1.0, 2.01, 2.02, 10.0)) == 2.015)
  }

  test("duplicate middle values collapse into one histogram row") {
    // both middle positions fall inside the single (v=2.0, c=3) row
    assert(medianOf(Seq(1.0, 2.0, 2.0, 2.0, 9.0, 9.5)) == 2.0)
  }
}
