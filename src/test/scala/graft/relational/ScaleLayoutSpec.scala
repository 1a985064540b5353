package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Partition-layout proof for the 100-TB posture (SURVEY.md §4.4),
  * complementing BucketedJoinSpec: a partitioned write must prune at the
  * scan — the filter becomes a directory listing, not a data read.
  */
class ScaleLayoutSpec extends SparkSpec {

  test("partitioned write prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    Tables.events(spark, sf("sf0.001"))
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
      .select("event_id", "user_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      "no partition filter reached the scan:\n" + p.take(1200))
    // the pruned scan must read strictly fewer files than the full table
    // (filter+project has no exchange, so the scan node is directly in the
    // executed plan — no AQE wrapper to unwrap)
    val scan = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "no partition filters on scan")
    df.collect()
    val all = spark.read.parquet(dir).inputFiles.length
    val read = scan.metrics("numFiles").value
    assert(read < all, s"pruning read $read of $all files")
  }
}
