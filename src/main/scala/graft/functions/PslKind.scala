package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the public-suffix rule lookup:
  * `graft_psl_kind(suffix)` answers the rule kind (1 normal /
  * 2 wildcard base / 3 exception) of [[graft.text.PslTable]]'s ~9.5k
  * rules, or NULL when the suffix is not a rule.
  *
  * Why an expression and not data: the registrable-domain kernel
  * probes up to maxLabels+1 candidate suffixes PER ROW. A literal-map
  * `element_at` is an O(rules) linear scan per probe (ArrayBasedMapData
  * has no index), a 19k-child CreateMap breaks codegen outright, and a
  * broadcast lookup JOIN per probe depth would put 6 joins into what is
  * otherwise a pure projection. Here the table rides the plan as ONE
  * reference object (serialized once per plan, shared by every task in
  * the JVM) and each probe is an O(1) hash get inside whole-stage
  * codegen — the l57 plan stays a scan → project → aggregate with no
  * join and no UDF at 100 TB.
  */
case class PslKind(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          other.simpleString)
    }

  override def dataType: DataType = IntegerType
  // a non-rule suffix answers NULL even for a non-null input
  override def nullable: Boolean = true
  override def prettyName: String = "graft_psl_kind"

  override def nullSafeEval(v: Any): Any =
    graft.text.PslTable.javaMap.get(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val map = ctx.addReferenceObj("pslRules",
        graft.text.PslTable.javaMap, "java.util.HashMap")
      val r = ctx.freshName("kind")
      s"""
         |Integer $r = (Integer) $map.get($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PslKind = copy(child = newChild)
}

object PslKind {
  /** Register `graft_psl_kind` for SQL/expr use on this session
    * (idempotent — the same per-query pattern as `graft_dot`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_psl_kind", exprs => PslKind(exprs.head), "internal")
}
