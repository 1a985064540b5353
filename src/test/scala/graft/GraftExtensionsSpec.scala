package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension class must wire graft_dot into a session built with
  * `spark.sql.extensions` — verified on a real child session sharing the
  * test SparkContext.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension wiring applies and graft_dot resolves in SQL") {
    // the extension hook itself (a cold-start session would pick this up
    // via spark.sql.extensions=graft.GraftExtensions)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // and the registered function end-to-end on the shared session
    val s = SparkSpec.session
    graft.functions.DotProduct.register(s)
    val got = s.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(got == 11.0)
  }

  test("expression evaluates identically interpreted and via codegen") {
    val s = SparkSpec.session
    graft.functions.DotProduct.register(s)
    import s.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val withCodegen = df.selectExpr("graft_dot(a, b) AS d")
      .collect().head.getDouble(0)
    assert(withCodegen == 32.0)
    // interpreted path (eval) — exercised directly
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 5.0, 6.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == 32.0)
  }

  test("graft_dot throws on dimension mismatch in both paths — never a " +
      "silent truncate-to-min score") {
    val s = SparkSpec.session
    graft.functions.DotProduct.register(s)
    import s.implicits._
    val codegenErr = intercept[Exception] {
      Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
        .toDF("a", "b").selectExpr("graft_dot(a, b) AS d").collect()
    }
    assert(codegenErr.getMessage.contains("dimension mismatch") ||
      Option(codegenErr.getCause)
        .exists(_.getMessage.contains("dimension mismatch")))
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    intercept[IllegalArgumentException] { e.eval(null) }
  }

  test("graft_hamming evaluates identically interpreted and via codegen") {
    val s = SparkSpec.session
    graft.functions.HammingDistance.register(s)
    // 0b1011 vs 0b0110 → xor 0b1101 → 3 bits
    val got = s.sql("SELECT graft_hamming(11L, 6L) AS h")
      .collect().head.getInt(0)
    assert(got == 3)
    val e = graft.functions.HammingDistance(
      org.apache.spark.sql.catalyst.expressions.Literal(11L),
      org.apache.spark.sql.catalyst.expressions.Literal(6L))
    assert(e.eval(null) == 3)
    // type rejection, not coercion surprises
    assert(graft.functions.HammingDistance(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(2L))
      .checkInputDataTypes() !=
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess)
  }
}
