package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `graft_nfc` must fold combining sequences to their precomposed NFC form
  * identically in the interpreted and codegen paths, pass already-normal
  * strings through untouched, and propagate nulls.
  */
class NfcNormalizeSpec extends SparkSpec {

  private val decomposed = "café" // 'e' + combining acute: 5 cps
  private val precomposed = "café" // NFC: 4 cps

  test("folds a combining sequence to precomposed NFC") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val out = Seq(decomposed).toDF("s")
      .select(expr("graft_nfc(s)").as("n"), length(expr("graft_nfc(s)")).as("l"))
      .collect().head
    assert(out.getString(0) == precomposed)
    assert(out.getInt(1) == 4)
  }

  test("already-NFC input passes through unchanged (fast path)") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val rows = Seq(precomposed, "plain ascii", "").toDF("s")
      .select(expr("graft_nfc(s)").as("n")).collect().map(_.getString(0))
    assert(rows.toSeq == Seq(precomposed, "plain ascii", ""))
  }

  test("null propagates; interpreted eval matches codegen") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val n = Seq(Option.empty[String]).toDF("s")
      .select(expr("graft_nfc(s)")).collect().head
    assert(n.isNullAt(0))
    // interpreted path (no codegen): eval the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ev = NfcNormalize(Literal(decomposed)).eval(null)
    assert(ev.toString == precomposed)
  }

  test("rejects non-string input at analysis") {
    NfcNormalize.register(spark)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(expr("graft_nfc(x)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
