package graft.text

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Hand-computed proof of l48's claim: a short document fully quoted
  * inside a long one has containment 1.0 while its Jaccard stays far
  * below any near-dup threshold — the asymmetric relationship l2c's
  * |∩|/|∪| kernel structurally cannot flag.
  */
class ContainmentSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("l48_fix").toString
    val df = spark.createDataFrame(rows.map { case (id, t) =>
      (id, t, "en", "fixture", t.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a quoted subset scores containment 1.0 while Jaccard stays small") {
    // doc 1 = 6 tokens → 4 distinct 3-shingles, every one present in
    // doc 2's 40-token text (doc 1 quoted verbatim at the front).
    val short = "alpha beta gamma delta epsilon zeta"
    val tail = (1 to 34).map(i => s"w$i").mkString(" ")
    val long = s"$short $tail"
    val dir = writeDocs(Seq((1L, short), (2L, long)))

    val out = SparkEntry.queries("l48_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3)))
    assert(out.length == 1)
    val (a, b, cont, contained) = out.head
    assert((a, b) == (1L, 2L))
    // all 4 of doc 1's shingles are shared; min-size side is doc 1
    assert(cont == 1.0, s"containment $cont")
    assert(contained == 1L, "the SMALLER shingle set is the contained doc")

    // the same pair under the symmetric Jaccard kernel: 4 shared of
    // (4 + 38 - 4) union shingles ≈ 0.105 — under any near-dup threshold
    val jac = SparkEntry.queries("l2c_ngram_jaccard")(spark, dir)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .collect()
    assert(jac.isEmpty || jac.head.getDouble(2) < 0.2,
      s"Jaccard should stay below near-dup territory: ${jac.toSeq}")
  }

  test("disjoint documents produce no containment pair") {
    val dir = writeDocs(Seq(
      (1L, "one two three four five"),
      (2L, "six seven eight nine ten")))
    assert(SparkEntry.queries("l48_containment")(spark, dir).count() == 0)
  }
}
