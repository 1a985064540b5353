package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The near-dup pipeline at volume, at PRODUCTION knobs — the dedup
  * analogue of HubSkewSpec's traversal proof. 20k synthetic docs, half of
  * them planted near-duplicates of the other half (identical + one
  * appended token ⇒ shingle Jaccard 58/59 ≈ 0.983; at 32 seeds / 8 bands
  * the per-pair miss probability is (1 − J⁴)⁸ ≈ 6e-10, so recovery must
  * be EXACT). Texts draw from a 500-word vocabulary via md5, so unrelated
  * docs share essentially no shingles and any spurious candidate would be
  * a real band-collision bug, not noise — the assertion is equality, not
  * a bound: every planted pair found, nothing else. Candidate volume
  * n/2 = 10k on a corpus whose all-pairs space is 2×10⁸ is the
  * sub-quadratic evidence.
  */
class DedupScaleSpec extends SparkSpec {

  test("l2 prod knobs on 20k docs: exact planted-pair recovery, " +
      "zero spurious candidates") {
    val n = 20000
    // pair (2k, 2k+1): same 60-token body seeded by k; the odd twin
    // appends one token. Generated distributed — no driver-side corpus.
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat(
        expr("concat_ws(' ', transform(sequence(0, 59), i -> concat('w'," +
          " conv(substring(md5(concat(CAST(id div 2 AS STRING), ':', i))," +
          " 1, 4), 16, 10) % 500)))"),
        when(col("id") % 2 === 1, lit(" extradup")).otherwise(lit("")))
        .as("text"),
      lit("en").as("lang"),
      concat(lit("src"), col("id") % 4).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("dedupscale").toString
    docs.coalesce(4).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = graft.SparkEntry.queries("l2_prod_knobs")(spark, dir)
    val got = pairs.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until n / 2).map(k => (2L * k, 2L * k + 1)).toSet
    val missed = planted -- got
    val spurious = got -- planted
    assert(missed.isEmpty, s"missed ${missed.size} planted pairs, " +
      s"e.g. ${missed.take(3)}")
    assert(spurious.isEmpty, s"${spurious.size} spurious candidates, " +
      s"e.g. ${spurious.take(3)}")
    info(s"${got.size} pairs recovered exactly from ${n} docs " +
      s"(all-pairs space ${n.toLong * (n - 1) / 2})")
  }
}
