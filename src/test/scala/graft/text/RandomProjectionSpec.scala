package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** l54's PURPOSE, not just its values (those are oracle-checked): a
  * Johnson–Lindenstrauss ±1 sign projection from 64 to 8 dims must
  * approximately preserve the pairwise distance STRUCTURE of a corpus
  * that has one. The driver's embeddings are isotropic noise — all
  * pairwise distances concentrate at the same value, so there is no
  * structure to preserve and per-pair JL noise (relative std √(2/k) ≈
  * 0.5 at k = 8) swamps any correlation. The fixture here is 10
  * well-separated clusters instead: same-cluster pairs are close,
  * cross-cluster pairs are far, and the projection must keep those two
  * populations apart — measured as (a) Pearson correlation between
  * original and projected squared distances over a mixed pair sample and
  * (b) complete separation of the two populations' medians. Everything
  * is deterministic (hash-derived fixture and matrix), and the bounds
  * encode the theorem, not the fixture.
  */
class RandomProjectionSpec extends SparkSpec {

  test("l54 projection preserves pairwise distance structure (JL)") {
    val k = 8
    val nVec = 500
    // 10 clusters: center component ±1 by hash sign, noise in [0, 0.1)
    val center = (0 until 64).map(i =>
      expr(s"CASE WHEN conv(substring(md5(concat('c', CAST(id % 10 AS " +
        s"STRING), ':', $i)), 1, 4), 16, 10) % 2 = 0 THEN 1.0 ELSE -1.0 " +
        "END"))
    val noise = (0 until 64).map(i =>
      expr(s"(conv(substring(md5(concat('n', CAST(id AS STRING), ':', " +
        s"$i)), 1, 4), 16, 10) % 100) / 1000.0"))
    val emb = array((0 until 64).map(i =>
      (center(i) + noise(i)).cast("float")): _*)
    val docs = spark.range(nVec).select(col("id").as("vec_id"),
      emb.as("embedding"), (col("id") % 10).cast("int").as("label"))
    val dir = java.nio.file.Files.createTempDirectory("jlproj").toString
    docs.coalesce(2).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val proj = graft.SparkEntry.queries("l54_random_projection")(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .view.mapValues(rs =>
        rs.sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("v")))
      .toMap
    val orig = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
      .toMap
    def sq(a: Array[Long], b: Array[Long]): Double =
      a.zip(b).map { case (x, y) => val d = (x - y).toDouble; d * d }.sum
    // mixed pair sample: (i, i+7) is always cross-cluster (7 % 10 ≠ 0),
    // (i, i+70) is always same-cluster (70 % 10 == 0)
    val cross = (0 until nVec).map(i => (i.toLong, ((i + 7) % nVec).toLong))
    val same = (0 until nVec).map(i => (i.toLong, ((i + 70) % nVec).toLong))
    def dists(ps: Seq[(Long, Long)]) = ps.map { case (a, b) =>
      (sq(orig(a), orig(b)), sq(proj(a), proj(b)) / k)
    }
    val all = dists(cross) ++ dists(same)
    val (dOrig, dProj) = all.unzip
    val n = dOrig.size.toDouble
    val (mo, mp) = (dOrig.sum / n, dProj.sum / n)
    val cov = dOrig.zip(dProj).map { case (o, p) => (o - mo) * (p - mp) }
      .sum / n
    val (so, sp) = (
      math.sqrt(dOrig.map(o => (o - mo) * (o - mo)).sum / n),
      math.sqrt(dProj.map(p => (p - mp) * (p - mp)).sum / n))
    val corr = cov / (so * sp)
    assert(corr > 0.8, f"distance correlation too weak: $corr%.3f")
    // the two populations stay separated in projected space
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val medSame = median(dists(same).map(_._2))
    val medCross = median(dists(cross).map(_._2))
    assert(medCross > 4 * medSame,
      f"projected same/cross separation lost: same=$medSame%.0f " +
        f"cross=$medCross%.0f")
    // unbiasedness: projected distances (divided by k) track originals
    val medRatio = median(all.collect { case (o, p) if o > 0 => p / o })
    assert(medRatio > 0.4 && medRatio < 2.5,
      f"median projected/original distance ratio off: $medRatio%.3f")
  }
}
