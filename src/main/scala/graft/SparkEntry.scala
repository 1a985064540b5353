package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's [[QueryDef]]s into the
  * `queries`/`oracleSql` maps the driver grades (DuckDB-oracle hash compare
  * at sf0.01, bench at sf0.1).
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    relational.RelationalQueries.defs ++
      relational.TpchQueries.defs ++
      relational.TimeQueries.defs ++
      text.TextQueries.defs ++
      multimodal.Multimodal.defs ++
      graph.GraphQueries.defs ++
      graph.ParquetGraph.defs

  /** Flagship query (reference read path §3.1): ingest the SB XML corpus,
    * match the bulletin, expand 3 hops downward, nest by root name.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    graph.GraphQueries.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (graph /
    * sketch queries) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
