package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ANN scale path at volume — the embedding analogue of
  * DedupScaleSpec. 20k synthetic embeddings in 20 well-separated clusters
  * (every center component |c_i| ≥ 0.2, intra-cluster noise ≤ 0.05, so no
  * sign bit ever flips within a cluster): each probe's exact top-3 are
  * same-cluster points, the sign-LSH bucket contains the whole cluster,
  * and the bucketed search must therefore reproduce the brute-force top-3
  * EXACTLY (recall 1.0, not a tolerance) — while only ever comparing
  * within a bucket (~1/20th of the collection).
  */
class AnnScaleSpec extends SparkSpec {

  test("l31 on 20k clustered embeddings: bucketed ANN matches exact top-3") {
    val n = 20000
    val dims = 16
    // center component for (cluster, dim): sign and magnitude both
    // md5-derived; |c| in [0.2, 1.0] keeps the sign stable under noise
    val center = (0 until dims).map(i =>
      expr(s"(CASE WHEN conv(substring(md5(concat('c', CAST(id % 20 AS " +
        s"STRING), ':', $i)), 1, 4), 16, 10) % 2 = 0 THEN 1 ELSE -1 END) *" +
        s" (0.2 + 0.8 * (conv(substring(md5(concat('m', CAST(id % 20 AS " +
        s"STRING), ':', $i)), 1, 4), 16, 10) % 1000) / 1000.0)"))
    val noise = (0 until dims).map(i =>
      expr(s"((conv(substring(md5(concat('n', CAST(id AS STRING), ':', " +
        s"$i)), 1, 4), 16, 10) % 100) - 50) / 1000.0"))
    val emb = array((0 until dims).map(i =>
      (center(i) + noise(i)).cast("float")): _*)
    val docs = spark.range(n).select(
      col("id").as("vec_id"), emb.as("embedding"),
      (col("id") % 20).cast("int").as("label"))
    val dir = java.nio.file.Files.createTempDirectory("annscale").toString
    docs.coalesce(4).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val recall = graft.SparkEntry.queries("l31_ann_recall")(spark, dir)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Double]("recall")))
    assert(recall.length == 20)
    val imperfect = recall.filter(_._2 < 1.0)
    assert(imperfect.isEmpty,
      s"bucketed ANN lost exact neighbors: ${imperfect.toSeq}")
  }
}
