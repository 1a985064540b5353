package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Guards the [[Tables]] resolution-memo contract (core.scala): the memo
  * pins each corpus file's listing at first resolution, which is only
  * sound while nothing writes into `sfDir`. This spec runs the declared
  * queries that exercise every WRITE path in the engine (streaming store
  * commits, Cypher write script, top-k SET / DETACH DELETE stages) and
  * asserts the corpus directory is byte-identical afterwards — a future
  * write path that targets a base table fails here instead of silently
  * reading a stale listing.
  */
class TablesImmutabilitySpec extends SparkSpec {

  private def snapshot(dir: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map((p: Path) => p.toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap

  test("write-path queries never touch the corpus under sfDir") {
    val dir = sf("sf0.001")
    val writers = Seq("graphp_stream_ingest", "graphp_cypher_write_script",
      "graphp_cypher_topk_set", "graphp_cypher_topk_delete")
    writers.foreach(name => assert(SparkEntry.queries.contains(name),
      s"write-path query $name disappeared from the registry"))
    val before = snapshot(dir)
    writers.foreach(name => SparkEntry.queries(name)(spark, dir).count())
    val after = snapshot(dir)
    assert(after == before,
      "corpus files changed under sfDir — the Tables memo contract " +
        s"is violated; diff: ${(after.toSet diff before.toSet).take(5)}")
  }
}
