package graft.functions

import graft.SparkSpec
import graft.graph.GraphModel
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** `graft_node_id` must be bit-identical to `GraphModel.nodeId` (the ingest
  * path's JVM-side identity) in BOTH the codegen and interpreted paths —
  * a single differing id would silently fork a node under MERGE.
  */
class NodeIdSpec extends SparkSpec {

  test("codegen path matches GraphModel.nodeId on corpus-like rows") {
    NodeId.register(spark)
    import spark.implicits._
    val rows = Seq(
      ("Airplane", "1001", "", "", Seq.empty[Int]),
      ("Subject", "subject", "text body", "737-00-1028", Seq(0, 2, 1)),
      ("Tag_2", "ünïcødé", "日本語", "",
        Seq(5)),
      ("", "", "", "", Seq.empty[Int]))
    val got = rows
      .map { case (l, n, c, d, p) => (l, n, c, d, p.mkString(".")) }
      .toDF("l", "n", "c", "d", "p")
      .select(expr("graft_node_id(l, n, c, d, p)")).collect()
      .map(_.getLong(0))
    val want = rows.map { case (l, n, c, d, p) =>
      GraphModel.nodeId(l, n, c, d, p)
    }
    assert(got.toSeq == want)
  }

  test("interpreted eval matches the JVM hash") {
    val ev = NodeId(Literal("Airplane"), Literal("1001"), Literal(""),
      Literal(""), Literal("")).eval(null)
    assert(ev == GraphModel.nodeId("Airplane", "1001", "", "", Nil))
  }

  test("distinct field boundaries produce distinct ids (separator works)") {
    // without the  separator these two keys would collide
    val a = NodeId(Literal("L"), Literal("ab"), Literal("c"), Literal(""),
      Literal("")).eval(null)
    val b = NodeId(Literal("L"), Literal("a"), Literal("bc"), Literal(""),
      Literal("")).eval(null)
    assert(a != b)
  }

  test("null propagates") {
    NodeId.register(spark)
    import spark.implicits._
    val r = Seq((Option.empty[String], "x")).toDF("l", "n")
      .select(expr("graft_node_id(l, n, '', '', '')")).collect().head
    assert(r.isNullAt(0))
  }

  test("rejects non-string input at analysis") {
    NodeId.register(spark)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(expr("graft_node_id(x, 'a', '', '', '')"))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}

/** Property form: interpreted expression ≡ `GraphModel.nodeId` for
  * arbitrary (incl. non-ASCII) field values and paths.
  */
object NodeIdProps extends Properties("NodeId") {

  private val field: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('a', 'Z', '7', 'é', 'ß', '中', ' '))
      .map(_.mkString))

  property("expression equals GraphModel.nodeId") =
    forAll(field, field, field, field, Gen.listOf(Gen.choose(0, 40))) {
      (l, n, c, d, p) =>
        NodeId(Literal(l), Literal(n), Literal(c), Literal(d),
          Literal(p.mkString("."))).eval(null) ==
          GraphModel.nodeId(l, n, c, d, p)
    }
}
