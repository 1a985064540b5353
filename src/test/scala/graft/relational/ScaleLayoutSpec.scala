package graft.relational

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Partition-layout proof for the 100-TB posture (SURVEY.md §4.4),
  * complementing BucketedJoinSpec: a partitioned write must prune at the
  * scan — the filter becomes a directory listing, not a data read.
  */
class ScaleLayoutSpec extends SparkSpec {

  test("z-order clustered write skips files under a 2-D range predicate") {
    // Write-side proof for the o7_zorder_layout clustering (the registered
    // query computes the Morton layout; this writes it): rows are bucketed
    // by the top bits of the interleaved key — each bucket is a 128×128
    // tile of (x, y) space — sorted by the full Morton key within buckets,
    // and laid out as one parquet file per bucket. A z-order-aware reader
    // turns a 2-D box into the bucket set its tiles cover (pure arithmetic
    // below, no data read) plus the exact residual filter, so a box
    // touching t of T tiles reads t files; the same data in a flat layout
    // reads ALL files because neither dimension alone prunes. At 100 TB
    // this is the difference between scanning a few tiles and the lake.
    val bits = 10 // x, y ∈ [0, 1024)
    val tileShift = 7 // 128×128 tiles → zbucket keeps 3 bits per dim
    def interleave(x: Long, y: Long): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val src = Tables.orders(spark, sf("sf0.01"))
      .select((col("o_custkey") % 1024).as("x"),
        (col("o_orderkey") % 1024).as("y"))
      .withColumn("zval", expr(
        s"aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (a, i) -> a" +
          " + shiftleft(shiftright(x, i) & 1, 2 * i)" +
          " + shiftleft(shiftright(y, i) & 1, 2 * i + 1))"))
      .withColumn("zbucket", shiftright(col("zval"), 2 * tileShift))
    val zdir = java.nio.file.Files.createTempDirectory("orders_z").toString
    src.repartition(col("zbucket")).sortWithinPartitions("zval")
      .write.partitionBy("zbucket").mode("overwrite").parquet(zdir)
    val flatDir = java.nio.file.Files.createTempDirectory("orders_f").toString
    src.drop("zbucket").repartition(64).write.mode("overwrite").parquet(flatDir)

    // the 2-D box, and the bucket set of the tiles it overlaps
    val (x0, x1, y0, y1) = (0L, 255L, 256L, 511L)
    val buckets = (for {
      bx <- (x0 >> tileShift) to (x1 >> tileShift)
      by <- (y0 >> tileShift) to (y1 >> tileShift)
    } yield interleave(bx << tileShift, by << tileShift) >> (2 * tileShift))
      .distinct
    val box = col("x").between(x0, x1) && col("y").between(y0, y1)
    val zread = spark.read.parquet(zdir)
      .filter(col("zbucket").isin(buckets: _*) && box)
      .select("x", "y", "zval")
    val flatRead = spark.read.parquet(flatDir).filter(box)
      .select("x", "y", "zval")
    val zRows = zread.collect().map(_.toSeq).sortBy(_.toString)
    val fRows = flatRead.collect().map(_.toSeq).sortBy(_.toString)
    // bucket mapping is a superset + residual filter: results must be equal
    assert(zRows.nonEmpty && (zRows.toSeq == fRows.toSeq))
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    val zFiles = filesRead(zread)
    val flatFiles = filesRead(flatRead)
    info(s"z-clustered read $zFiles files; flat read $flatFiles " +
      s"(box covers ${buckets.size} of 64 tiles)")
    assert(zFiles == buckets.size.toLong,
      s"expected one file per covered tile, read $zFiles")
    assert(zFiles < flatFiles,
      s"z-order layout must skip files: $zFiles vs $flatFiles")
  }

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

  test("dynamic partition overwrite replaces only the touched partitions") {
    // the warehouse maintenance mode a daily pipeline runs: INSERT
    // OVERWRITE of one day must not clobber the others. STATIC overwrite
    // (the default) drops the whole table first — at 100 TB that is data
    // loss in a partial failure window; dynamic mode scopes the swap to
    // partitions present in the incoming batch.
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    val dir = java.nio.file.Files.createTempDirectory("events_dyn").toString
    try {
      val ev = Tables.events(spark, sf("sf0.001"))
      ev.write.partitionBy("event_type").mode("overwrite").parquet(dir)
      val before = spark.read.parquet(dir)
        .groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      spark.conf.set(key, "dynamic")
      // overwrite ONLY the click partition with a reduced slice
      ev.filter(col("event_type") === "click" && col("user_id") % 2 === 0)
        .write.partitionBy("event_type").mode("overwrite").parquet(dir)
      val after = spark.read.parquet(dir)
        .groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // untouched partitions byte-for-byte intact…
      (before.keySet - "click").foreach { t =>
        assert(after(t) == before(t), s"partition $t clobbered")
      }
      // …and the touched one fully replaced, not appended
      assert(after("click") < before("click"),
        s"click partition not replaced: ${after("click")} vs " +
          s"${before("click")}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }
}
