package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-maintenance operators for mutable-at-rest relational data: MERGE
  * (upsert) and CDC diff. The reference mutates its graph store through
  * Neo4j MERGE/SET (`xml2neo.py:19-21`, `deleteneo.py:10-12`); these are
  * the same semantics for plain relational tables, expressed as
  * shuffle-minimal DataFrame plans (the graph-side counterpart is
  * [[graft.graph.GraphOps.upsert]]).
  */
object MergeOps {

  /** MERGE source INTO target ON keys — "when matched update all, when not
    * matched insert all" (the Delta/Iceberg MERGE default). Source rows win
    * on key match; target rows without a match survive unchanged.
    *
    * Plan shape: ONE shuffle of the target by key (the anti-join; AQE
    * broadcasts it when the source is small) + a free union — never a full
    * rewrite of unmatched data through a wide join. Assumes `source` has at
    * most one row per key (enforce upstream; a MERGE with duplicate source
    * keys is ill-defined in every engine).
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String])
      : DataFrame = {
    val survivors = target.join(
      source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    survivors.unionByName(source.select(target.columns.map(col): _*))
  }

  /** CDC diff of two snapshots keyed by `keys`: tags every key as
    * insert / delete / update / unchanged. One full-outer join on the key —
    * the single-shuffle change-capture shape; non-key columns are compared
    * as a struct with null-safe equality (no hashing, so no collision can
    * mislabel an update as unchanged).
    */
  def cdcDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String])
      : DataFrame = {
    val rest = oldDf.columns.filterNot(keys.contains).toSeq
    def pack(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+ struct(rest.map(col): _*).as(as): _*)
    pack(oldDf, "_old").join(pack(newDf, "_new"), keys, "full_outer")
      .withColumn("op",
        when(col("_old").isNull, "insert")
          .when(col("_new").isNull, "delete")
          .when(!(col("_old") <=> col("_new")), "update")
          .otherwise("unchanged"))
      .select(keys.map(col) :+ col("op"): _*)
  }
}
