package graft.relational

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** g19's DDSketch guarantee, measured: every sketch estimate must sit
  * within the configured relative error of the EXACT quantile (γ = 101/99
  * → α = 1%; the assertion allows 2% for the discrete rank convention —
  * DDSketch's bound is on the value at the chosen rank, and exact
  * percentile() interpolates between ranks).
  */
class QuantileSketchSpec extends SparkSpec {

  test("g19 estimates stay within the DDSketch relative-error bound") {
    val dir = sf("sf0.01")
    val est = SparkEntry.queries("g19_ddsketch_quantiles")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[Double]("q")) ->
        r.getAs[Double]("est")).toMap
    assert(est.size == 9)
    val exact = graft.Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 0)
      .groupBy(col("l_returnflag").as("flag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("q50"),
        expr("percentile(l_extendedprice, 0.9)").as("q90"),
        expr("percentile(l_extendedprice, 0.99)").as("q99"))
      .collect()
      .flatMap(r => Seq(
        (r.getAs[String]("flag"), 0.5) -> r.getAs[Double]("q50"),
        (r.getAs[String]("flag"), 0.9) -> r.getAs[Double]("q90"),
        (r.getAs[String]("flag"), 0.99) -> r.getAs[Double]("q99")))
      .toMap
    exact.foreach { case (key, x) =>
      val e = est(key)
      val rel = math.abs(e - x) / x
      assert(rel <= 0.02,
        f"$key: sketch=$e%.2f exact=$x%.2f rel-err=${rel * 100}%.2f%% " +
          "> 2% bound")
    }
  }
}
