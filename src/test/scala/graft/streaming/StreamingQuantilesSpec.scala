package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming DDSketch percentiles: the per-batch snapshot must equal the
  * batch sketch over everything seen so far (the histogram's exact-merge
  * property), the state stays bin-bounded, and the scala-side binning the
  * processor uses agrees bit-for-bit with the Column-side binning of the
  * batch query `g19_ddsketch_quantiles`.
  */
class StreamingQuantilesSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream snapshot equals batch sketch over everything seen so far") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      val b1 = (1 to 40).map(i =>
        EventRow(i.toLong, ts(1), 1L, "view", i * 3.5))
      val b2 = (41 to 90).map(i =>
        EventRow(i.toLong, ts(2), 1L, "view", i * 1.25))
      val mem = MemoryStream[EventRow]
      val q = StreamingOps.streamingQuantiles(spark, mem.toDS())
        .writeStream.format("memory").queryName("ddq_stream")
        .outputMode(OutputMode.Update()).start()
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      q.stop()
      val snaps = spark.table("ddq_stream")
        .orderBy("n").collect()
        .map(r => (r.getAs[Long]("n"), r.getAs[Double]("p50"),
          r.getAs[Double]("p95"), r.getAs[Long]("n_bins")))
      assert(snaps.length == 2)
      // each snapshot equals the batch sketch over the prefix
      def batchSketch(xs: Seq[Double]): (Long, Double, Double) = {
        val bins = DdSketchBins.merge(Map.empty, xs)
        (xs.size.toLong, DdSketchBins.quantile(bins, 0.5),
          DdSketchBins.quantile(bins, 0.95))
      }
      val (n1, p50a, p95a) = batchSketch(b1.map(_.value))
      val (n2, p50b, p95b) = batchSketch((b1 ++ b2).map(_.value))
      assert(snaps(0) == ((n1, p50a, p95a, snaps(0)._4)))
      assert(snaps(1) == ((n2, p50b, p95b, snaps(1)._4)))
      // estimates carry the sketch's relative-error guarantee vs exact
      val exact50 = (b1 ++ b2).map(_.value).sorted.apply(45 - 1)
      assert(math.abs(snaps(1)._2 - exact50) / exact50 < 0.02,
        s"p50=${snaps(1)._2} exact~$exact50")
      // state is bin-bounded: far fewer bins than rows
      assert(snaps(1)._4 < 90, s"bins=${snaps(1)._4}")
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("scala-side bins agree with the g19 Column-side bins") {
    import spark.implicits._
    val xs = Seq(0.01, 1.0, 3.5, 99.99, 1234.56, 98765.4)
    val colBins = xs.toDF("x")
      .select(ceil(log(col("x")) /
        log(lit(101.0) / lit(99.0))).cast("long"))
      .collect().map(_.getLong(0))
    assert(colBins.toSeq == xs.map(DdSketchBins.bin),
      "Math.log/ceil and Spark's codegen disagree")
  }
}
