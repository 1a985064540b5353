package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Cypher-subset front end covering the query class the reference's LLM
  * actually emits against its schema prompt (`first-graph.py:63-144`):
  * match a node by label and/or property equality, optionally expand a
  * bounded number of hops downward (optionally constrained to one
  * relationship type, as the schema prompt's typed relationships invite),
  * filter the matched node with simple WHERE comparisons, return the matched
  * node and its connected nodes. The serving shell can hand queries of this
  * shape straight to the engine — no Neo4j.
  *
  * Grammar (case-insensitive keywords):
  * {{{
  *   MATCH (m[:Label] [{prop: 'value'[, ...]}]) [-[[:REL_TYPE]*1..K]->(connected)]
  *   [WHERE m.prop <op> 'value' [AND ...]]        op ∈ {=, <>, <, <=, >, >=}
  *   RETURN m[, connected | , count(connected)] [LIMIT n]
  * }}}
  * Plus the maintenance form `MATCH (n) WHERE n.<tag> = true DETACH DELETE n`
  * (the reference's `deleteneo.py:10-12`), which maps to [[GraphOps.dropBatch]].
  */
object CypherLite {

  sealed trait Statement
  final case class Cond(prop: String, op: String, value: String)
  final case class MatchReturn(
      label: Option[String],
      props: Map[String, String],
      relType: Option[String],
      hops: Int,
      conds: Seq[Cond],
      returnConnected: Boolean,
      returnCount: Boolean,
      limit: Option[Int]) extends Statement
  final case class DetachDelete(tag: String) extends Statement

  private val MatchRe =
    ("""(?is)\s*MATCH\s*\(\s*(\w+)\s*(?::\s*(\w+))?\s*""" +
      """(?:\{\s*([^}]*)\s*\})?\s*\)\s*""" +
      """(?:-\s*\[\s*(?::\s*(\w+)\s*)?\*\s*1\s*\.\.\s*(\d+)\s*\]\s*->\s*\(\s*(\w+)\s*\)\s*)?""" +
      """(?:WHERE\s+(.*?)\s*)?""" +
      """RETURN\s+(\w+)(?:\s*,\s*(?:count\s*\(\s*(\w+)\s*\)|(\w+)))?\s*(?:LIMIT\s+(\d+))?\s*;?\s*""").r

  private val DeleteRe =
    """(?is)\s*MATCH\s*\(\s*(\w+)\s*\)\s*WHERE\s+\1\.(\w+)\s*=\s*true\s+DETACH\s+DELETE\s+\1\s*;?\s*""".r

  private val PropRe = """(\w+)\s*:\s*'([^']*)'""".r

  // one `var.prop <op> 'value'` comparison; conjunctions split on AND first
  private val CondRe =
    """(?is)\s*(\w+)\s*\.\s*(\w+)\s*(<>|<=|>=|=|<|>)\s*'([^']*)'\s*""".r

  def parse(query: String): Either[String, Statement] = query match {
    case DeleteRe(_, tag) => Right(DetachDelete(tag))
    case MatchRe(m, label, propsStr, relType, hopsStr, connVar, whereStr,
        ret1, countVar, ret2, limitStr) =>
      val props = Option(propsStr).toSeq
        .flatMap(s => PropRe.findAllMatchIn(s)
          .map(p => p.group(1) -> p.group(2))).toMap
      val hops = Option(hopsStr).map(_.toInt).getOrElse(0)
      val condsE: Either[String, Seq[Cond]] =
        Option(whereStr).map(_.trim).filter(_.nonEmpty) match {
          case None => Right(Seq.empty)
          case Some(w) =>
            val parts = w.split("(?i)\\s+AND\\s+").toSeq
            val parsed = parts.map {
              case CondRe(v, prop, op, value) if v == m =>
                Right(Cond(prop, op, value))
              case CondRe(v, _, _, _) =>
                Left(s"WHERE may only reference the matched variable '$m', got '$v'")
              case other => Left(s"unsupported WHERE condition: ${other.take(80)}")
            }
            parsed.collectFirst { case Left(e) => Left(e) }
              .getOrElse(Right(parsed.collect { case Right(c) => c }))
        }
      if (hops > 0 && Option(connVar).isEmpty)
        Left("hop pattern requires a connected variable")
      else if (Option(ret1).isEmpty)
        Left("RETURN clause required")
      else if (Option(countVar).isDefined &&
          !Option(connVar).contains(countVar))
        Left(s"count() may only aggregate the connected variable" +
          s"${Option(connVar).fold("")(v => s" '$v'")}, got '$countVar'")
      else condsE.map { conds =>
        val wantsConnected = Option(ret2).isDefined ||
          (Option(connVar).isDefined && Option(ret1).contains(connVar))
        MatchReturn(Option(label), props, Option(relType),
          if (Option(connVar).isDefined) math.max(hops, 1) else 0,
          conds, wantsConnected, Option(countVar).isDefined,
          Option(limitStr).map(_.toInt))
      }
    case _ => Left(s"unsupported query shape: ${query.take(120)}")
  }

  /** Node properties a MATCH pattern or WHERE clause may filter on. */
  private val SupportedProps = Set("name", "content", "docnbr")

  private def condCol(c: Cond): Column = c.op match {
    case "=" => col(c.prop) === c.value
    case "<>" => col(c.prop) =!= c.value
    case "<" => col(c.prop) < c.value
    case "<=" => col(c.prop) <= c.value
    case ">" => col(c.prop) > c.value
    case ">=" => col(c.prop) >= c.value
  }

  /** Execute against the graph; returns (m_label, m_name[, depth, c_label,
    * c_name, c_content]) rows, mirroring the reference's (m, connected)
    * contract (`first-graph.py:168`).
    */
  def run(g: GraphTables, query: String): Either[String, DataFrame] =
    parse(query).flatMap {
      case DetachDelete(tag) =>
        // the reference's boolean tag ≙ our batch lineage column
        val after = GraphOps.dropBatch(g, tag)
        Right(after.nodes.groupBy("batch")
          .agg(count(lit(1)).as("n_nodes")).orderBy("batch").toDF())
      case MatchReturn(label, props, relType, hops, conds, wantsConnected,
          wantsCount, limit) =>
        // unknown keys are rejected, not silently coerced to a name match —
        // a plausible-but-wrong answer is worse than an error to the
        // LLM-emitted-query caller this front end serves
        (props.keys ++ conds.map(_.prop)).find(!SupportedProps(_)) match {
          case Some(k) => Left(s"unsupported property: $k " +
            s"(supported: ${SupportedProps.toSeq.sorted.mkString(", ")})")
          case None => Right(runMatch(g, label, props, relType, hops, conds,
            wantsConnected, wantsCount, limit))
        }
    }

  private def runMatch(g: GraphTables, label: Option[String],
      props: Map[String, String], relType: Option[String], hops: Int,
      conds: Seq[Cond], wantsConnected: Boolean, wantsCount: Boolean,
      limit: Option[Int]): DataFrame = {
        val pred = (label.map(col("label") === _).toSeq ++
          props.map { case (k, v) => col(k) === v } ++
          conds.map(condCol))
          .reduceOption(_ && _).getOrElse(lit(true))
        // untyped hops follow all downward containment edges; a typed hop
        // pattern restricts the expansion to exactly that relationship
        val relFilter = relType.map(col("relType") === _)
          .getOrElse(col("relType").startsWith("HAS_"))
        val base =
          if (hops == 0)
            g.nodes.filter(pred)
              .select(col("label").as("m_label"), col("name").as("m_name"),
                col("content").as("m_content"))
              .orderBy("m_label", "m_name", "m_content")
          else {
            val neigh = GraphOps.neighborhoodWhere(g, pred, hops, relFilter)
            val roots = g.nodes.filter(pred)
              .select(col("id").as("root_id"), col("label").as("m_label"),
                col("name").as("root_name_key"))
            if (wantsCount)
              // RETURN m, count(connected): aggregate the expansion per
              // root — a group-by on the root key, parallel across roots
              neigh.withColumnRenamed("root_name", "m_name")
                .groupBy("m_name")
                .agg(count(lit(1)).as("n_connected"))
                .orderBy("m_name")
            else if (wantsConnected)
              neigh.withColumnRenamed("root_name", "m_name")
                .select("m_name", "depth", "c_label", "c_name", "c_content")
                .orderBy("m_name", "depth", "c_label", "c_name", "c_content")
            else
              roots.select(col("m_label"), col("root_name_key").as("m_name"))
                .orderBy("m_label", "m_name")
          }
        limit.map(base.limit).getOrElse(base)
  }
}
