package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketing demo (SURVEY.md §4.4 / scale posture): pre-bucketing both
  * fact tables on the join key lets the join consume the bucketed
  * distribution directly — NO exchange on either side. At 100 TB this is
  * the difference between a full-network shuffle per join and none.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join over co-bucketed tables runs without a shuffle exchange") {
    // warehouse dir is set (static conf) in SparkSpec's session builder
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.lineitem(spark, sf("sf0.001"))
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_b")
      Tables.orders(spark, sf("sf0.001"))
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_b")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(600))
      // and it is correct
      val expected = Tables.lineitem(spark, sf("sf0.001"))
        .join(Tables.orders(spark, sf("sf0.001")),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
