package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production ingestion is never clean: a 100 TB drop always carries some
  * malformed rows, and the engine's posture must be QUARANTINE, not crash
  * and not silent loss. These tests pin Spark's three JSON parse modes on
  * a fixture with known-good and known-corrupt lines so the choice each
  * pipeline stage makes (strict landing vs permissive exploration) is a
  * documented, asserted behavior — including the Spark 4 subtleties that
  * a type-clash line yields a PARTIAL row (parseable fields kept, clashing
  * field null) while still being quarantined, and that DROPMALFORMED's
  * row set depends on which fields the query parses.
  */
class IngestRobustnessSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("badjson").toString
    val good = (0 until 40).map(i =>
      s"""{"id": $i, "name": "row_$i", "score": ${i * 10}}""")
    val corrupt = Seq(
      """{"id": 90, "name": "trunc""",                        // truncated
      """{"id": "not_a_number", "name": "x", "score": 1}""",  // type clash
      """not json at all""")                                  // garbage
    // deterministic interleave: corrupt lines at positions 7, 19, 31
    val lines = good.take(7) ++ corrupt.take(1) ++
      good.slice(7, 18) ++ corrupt.slice(1, 2) ++
      good.slice(18, 29) ++ corrupt.drop(2) ++ good.drop(29)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "part-0.json"),
      lines.mkString("\n").getBytes)
    d
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", LongType),
    StructField("_corrupt_record", StringType)))

  private val dataSchema =
    StructType(schema.filterNot(_.name == "_corrupt_record"))

  test("PERMISSIVE mode quarantines corrupt rows, loses nothing") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 40)
    assert(bad.count() == 3, "every malformed line must be quarantined " +
      "with its raw text, not dropped")
    // quarantined rows carry the original line for forensics/replay
    assert(bad.select("_corrupt_record").collect()
      .forall(_.getString(0) != null))
    // the type-clash line is quarantined AND keeps its parseable fields
    // (Spark 4 partial results) — replay tooling can use either
    val clash = bad.filter(col("name") === "x").collect()
    assert(clash.length == 1 && clash.head.isNullAt(0) &&
      clash.head.getAs[Long]("score") == 1L)
    // and the clean rows parsed exactly
    assert(good.agg(sum("score")).head.getLong(0) == (0 until 40)
      .map(_ * 10L).sum)
    df.unpersist()
  }

  test("DROPMALFORMED's row set is projection-dependent (count != collect)") {
    val df = spark.read.schema(dataSchema)
      .option("mode", "DROPMALFORMED").json(dir)
    // The trap this test pins: DROPMALFORMED's verdict depends on which
    // fields the query actually PARSES. count() parses none, so only the
    // token-level garbage lines (truncated doc, non-JSON) are dropped and
    // the type-clash line still counts — but any scan that materializes
    // the clashing field drops that row too. The same relation answers
    // count() = 41 and collect().length = 40: an internally inconsistent,
    // projection-dependent row set, which is exactly why the PERMISSIVE +
    // quarantine-column posture above is the one a pipeline lands with.
    assert(df.count() == 41, "count() parses no fields: token-garbage " +
      "lines only are dropped")
    assert(df.collect().length == 40, "a full parse also drops the " +
      "type-clash row")
  }

  test("parquet schema evolution: mergeSchema unions generations, " +
    "old rows null-fill") {
    // a long-lived 100 TB table gains columns across drops; readers must
    // see the union schema with nulls for pre-evolution rows — and the
    // default (no mergeSchema) silently serves whichever file's schema
    // wins, which is why evolved tables are ALWAYS read with mergeSchema
    // (or an explicit schema)
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    spark.range(10).selectExpr("id", "id * 2 AS a")
      .write.parquet(s"$dir/gen=1")
    spark.range(10, 15).selectExpr("id", "id * 2 AS a", "id * 3 AS b")
      .write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "gen"))
    assert(merged.count() == 15)
    assert(merged.filter(col("b").isNull).count() == 10,
      "pre-evolution rows must null-fill the new column")
    assert(merged.filter(col("b") === col("id") * 3).count() == 5)
  }

  test("FAILFAST refuses the drop outright (strict landing gate)") {
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(dataSchema)
        .option("mode", "FAILFAST").json(dir).collect()
    }
    assert(ex.getMessage.contains("Malformed") ||
      ex.getCause != null, ex.getMessage)
  }
}
