package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension wiring (the (c)-tier integration point): installs the
  * engine's native expressions at session build time via
  * `spark.sql.extensions=graft.GraftExtensions`, so SQL users get
  * `graft_dot` without any per-session registration call.
  *
  * No custom optimizer rules or planner strategies are injected: every
  * operator in SURVEY.md §2 compiles to existing physical operators
  * (§4.3 — revisit only if BENCH shows re-analysis overhead in the k-hop
  * loop).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        functions.DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[functions.HammingDistance].getName,
        "graft_hamming"),
      (children: Seq[Expression]) =>
        functions.HammingDistance(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[functions.NfcNormalize].getName,
        "graft_nfc"),
      (children: Seq[Expression]) =>
        functions.NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_psl_kind"),
      new ExpressionInfo(classOf[functions.PslKind].getName,
        "graft_psl_kind"),
      (children: Seq[Expression]) =>
        functions.PslKind(children.head)))
  }
}
