package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val events = Tables.events(spark, sf("sf0.001"))
    val dim = Tables.customer(spark, sf("sf0.001"))
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = events.join(dim, Seq("user_id"))
      .select("event_id", "c_mktsegment")
    val salted = SkewJoin
      .saltedEquiJoin(events, dim, "user_id", "event_id", 8)
      .select("event_id", "c_mktsegment")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("AQE splits a skewed join partition (skew=true in plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key dominating the left side
      val big = (1L to 200000L)
        .map(i => (if (i % 10 == 0) 42L else i % 997, i)).toDF("k", "payload")
      val dim = (0L to 996L).map(k => (k, s"v$k")).toDF("k", "v")
      val joined = big.join(dim, Seq("k"))
      joined.collect() // execute THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkew=true"),
        plan.take(1200))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = (1L to 1000L).map(i => (42L, i)).toDF("k", "row_id")
    val dim = Seq((42L, "x")).toDF("k", "v")
    val joined = SkewJoin.saltedEquiJoin(hot, dim, "k", "row_id", 8)
    assert(joined.count() == 1000)
    // the salt column really took >1 distinct value pre-join
    val salts = hot.withColumn("_salt",
      pmod(xxhash64(col("row_id")), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts > 4)
  }
}
