package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  test("KMV estimate is exact below k and within 10% above k") {
    KmvSketch.register(spark)
    import spark.implicits._
    // below k: exact
    val small = (1 to 100).map(i => s"v$i").toDF("v")
    small.createOrReplaceTempView("small_vals")
    val got = spark.sql(
      "SELECT graft_kmv_distinct(v) AS e FROM small_vals")
      .collect().head.getLong(0)
    assert(got == 100L)
    // above k (1024): approximate within 10% (~3σ)
    val big = (1 to 20000).map(i => s"item${i % 5000}").toDF("v")
    big.createOrReplaceTempView("big_vals")
    val est = spark.sql(
      "SELECT graft_kmv_distinct(v) AS e FROM big_vals")
      .collect().head.getLong(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est")
  }

  test("KMV merges across partitions consistently") {
    KmvSketch.register(spark)
    val li = Tables.lineitem(spark, sf("sf0.001"))
    li.createOrReplaceTempView("li_kmv")
    val onePart = li.coalesce(1)
    onePart.createOrReplaceTempView("li_kmv_1p")
    val manyP = spark.sql(
      "SELECT graft_kmv_distinct(l_partkey) AS e FROM li_kmv")
      .collect().head.getLong(0)
    val oneP = spark.sql(
      "SELECT graft_kmv_distinct(l_partkey) AS e FROM li_kmv_1p")
      .collect().head.getLong(0)
    // the sketch state is a pure set of min-hashes → partitioning-invariant
    assert(manyP == oneP)
    val exact = li.select("l_partkey").distinct().count()
    assert(math.abs(manyP - exact.toDouble) / exact < 0.15,
      s"estimate $manyP vs exact $exact")
  }
}
