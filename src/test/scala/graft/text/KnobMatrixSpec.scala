package graft.text

import java.nio.file.Files

import org.scalatest.Tag

import graft.{SparkEntry, SparkSpec}

/** Tag for the production-knob oracle matrix (round-7 directive 3). */
object KnobMatrix extends Tag("graft.KnobMatrix")

/** Proves oracle parity is knob-independent: the near-dup family and the
  * KMV sketch run at [[DedupKnobs.Production]] sizing (SEEDS/BANDS 32/8,
  * SIMBITS 64 in 4×16-bit bands, JaccardDfCap 1000, KMV k=4096) through
  * the SAME DuckDB comparison the driver applies to the test-knob entries.
  *
  * The `*_prod_knobs` registry entries give the driver's sf0.01 harness
  * the same coverage every round; this spec closes the loop locally at
  * sf0.001 so a knob regression is caught before a snapshot ships. DuckDB
  * lives driver-side only (never a Scala dependency) — the comparison
  * shells out to `tools/check_oracle.py`, and the spec cancels (not
  * fails) if that environment is absent.
  */
class KnobMatrixSpec extends SparkSpec {

  private val ProdQueries = Seq(
    "l2_prod_knobs", "l2b2_prod_knobs", "l2c_prod_knobs", "g4b_prod_knobs")

  test("production knobs hash-match the DuckDB oracle at sf0.001",
      KnobMatrix) {
    import scala.sys.process._
    val duckOk = (Seq("python3", "-c", "import duckdb") ! ProcessLogger(
      _ => (), _ => ())) == 0
    assume(duckOk, "python3+duckdb not available (driver-side tooling)")

    val sfDir = sf("sf0.001")
    val out = Files.createTempDirectory("graft-knobs").toString
    ProdQueries.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$out/$name")
    }
    val json = ProdQueries.map { n =>
      val sql = SparkEntry.oracleSql(n)
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n")
      s""""$n": "$sql""""
    }.mkString("{", ",", "}")
    Files.write(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      json.getBytes("UTF-8"))

    val buf = new StringBuilder
    val code = Seq("python3", "tools/check_oracle.py", sfDir, out)
      .!(ProcessLogger(l => buf.append(l).append('\n'), _ => ()))
    info(buf.toString.trim)
    assert(code == 0, "check_oracle.py did not run")
    assert(buf.toString.contains(s"== ${ProdQueries.size} ok, 0 fail"),
      s"production-knob oracle mismatch:\n$buf")
  }
}
