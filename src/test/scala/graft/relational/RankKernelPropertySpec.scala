package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed two-pass rank kernel must reproduce the exact
  * single-partition window semantics on ARBITRARY data, not just the
  * corpus the DuckDB oracle grades — ties in the sort value, skew, tiny
  * and non-divisible-by-4 sizes, including the single-row edge where
  * percent_rank is defined as 0.0.
  */
class RankKernelPropertySpec extends SparkSpec {

  test("two-pass global ntile/percent_rank ≡ exact window form (randomized)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // sizes hit: 1 (degenerate), < 4 (fewer rows than buckets), exact
    // multiples of 4, and tie-heavy larger sets
    for (n <- Seq(1, 2, 3, 4, 5, 7, 8, 16, 33, 60)) {
      // duplicate-heavy value space to force ties on the sort value
      val rows = (0 until n).map(i => (i.toLong, rng.nextInt(6) * 1.5))
      val base = rows.toDF("c_custkey", "c_acctbal")
      val twoPass = RelationalQueries
        .globalNtilePctRank(spark, base, n.toLong)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .toSeq.sortBy(_._1)
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      val exact = base.select(col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          graft.Det.portableRound(percent_rank().over(w), 6).as("pr"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .toSeq.sortBy(_._1)
      assert(twoPass == exact,
        s"two-pass diverged on n=$n:\n$twoPass\nvs\n$exact")
    }
  }
}
