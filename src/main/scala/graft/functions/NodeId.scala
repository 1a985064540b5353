package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the deterministic node identity
  * (`graft.graph.GraphModel.nodeId`): FNV-1a 64 over the logical key
  * `(label, name, content, docnbr, pathStr)` with `` field
  * separators, where `pathStr` is the path joined on `.`
  * (`path.mkString(".")` — pass `''` for an empty path).
  *
  * The id is what turns MERGE into a plain anti-join, so ingest and
  * cross-table linking compute it for EVERY incoming row — a closure UDF
  * there would box five strings per row and fall out of whole-stage
  * codegen on the one expression that touches every ingested node. This
  * stays in codegen and hashes the UTF8String bytes directly (UTF-8 of a
  * concatenation equals the concatenation of UTF-8 encodings, and
  * `` encodes as the single byte 0x01, so hashing field bytes with
  * a 0x01 mixed in between is bit-identical to
  * `fnv64(label + "" + … + pathStr)` — `GraftNodeIdSpec` pins it).
  */
case class NodeId(label: Expression, name: Expression, content: Expression,
    docnbr: Expression, pathStr: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] =
    Seq(label, name, content, docnbr, pathStr)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_node_id"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires five string arguments, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override protected def nullSafeEval(l: Any, n: Any, c: Any, d: Any,
      p: Any): Any =
    NodeId.hash(l.asInstanceOf[UTF8String], n.asInstanceOf[UTF8String],
      c.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (l, n, c, d, p) =>
      s"${ev.value} = graft.functions.NodeId.hash($l, $n, $c, $d, $p);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NodeId =
    copy(label = newChildren(0), name = newChildren(1),
      content = newChildren(2), docnbr = newChildren(3),
      pathStr = newChildren(4))
}

object NodeId {
  private final val Seed = 0xcbf29ce484222325L
  private final val Prime = 0x100000001b3L

  /** Shared by interpreted eval and generated code. Must stay bit-identical
    * to `GraphModel.nodeId` — `GraftNodeIdSpec` pins the equivalence.
    */
  def hash(label: UTF8String, name: UTF8String, content: UTF8String,
      docnbr: UTF8String, pathStr: UTF8String): Long = {
    var h = Seed
    var f = 0
    val fields = Array(label, name, content, docnbr, pathStr)
    while (f < fields.length) {
      if (f > 0) { // the  field separator, a single UTF-8 byte
        h ^= 0x01L
        h *= Prime
      }
      val bytes = fields(f).getBytes
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= Prime
        i += 1
      }
      f += 1
    }
    h
  }

  /** Register `graft_node_id` for SQL/expr use on this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_node_id",
      exprs => NodeId(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4)),
      "internal")
}
