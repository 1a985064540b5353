package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** SpaceSaving streaming heavy hitters: the sketch's two guarantees hold
  * across batches on RocksDB state, and the state NEVER exceeds its
  * capacity no matter how many distinct items stream past — the property
  * that makes the operator viable where the exact batch form
  * (`l13_heavy_hitters`, one group per distinct item) is not.
  */
class HeavyHitterStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      body
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("exact regime: distinct items within capacity -> exact counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[EventRow]
      val q = StreamingOps.streamingHeavyHitters(spark, mem.toDS(), 8)
        .writeStream.format("memory").queryName("hh_exact")
        .outputMode(OutputMode.Update()).start()
      // 3 users with distinct frequencies, split across two batches
      mem.addData((1 to 6).map(i =>
        EventRow(i.toLong, ts(i), (i % 3).toLong, "view", 1.0)): _*)
      q.processAllAvailable()
      mem.addData((7 to 10).map(i =>
        EventRow(i.toLong, ts(i), 0L, "view", 1.0)): _*)
      q.processAllAvailable()
      q.stop()
      // newest snapshot per user = max est (counts only grow)
      val last = spark.table("hh_exact")
        .groupBy("user_id").agg(max("est").as("est"), max("err").as("err"))
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("est"), r.getAs[Long]("err"))).toMap
      // true counts: user 0 -> 2 + 4 = 6, users 1, 2 -> 2 each
      assert(last == Map(0L -> (6L, 0L), 1L -> (2L, 0L), 2L -> (2L, 0L)))
    }
  }

  test("sketch state survives kill-and-resume from the RocksDB checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("hh_resume_ckpt").toString
      val mem = MemoryStream[EventRow]
      // memory sink refuses checkpoint recovery; foreachBatch per-run
      // output dirs make the post-restart snapshots directly observable
      def start(outDir: String) = StreamingOps
        .streamingHeavyHitters(spark, mem.toDS(), 8)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[HeavyHitter], id: Long) =>
            batch.write.mode("append").parquet(s"$outDir/b=$id"): Unit
        }.start()
      val dirA = java.nio.file.Files
        .createTempDirectory("hh_resume_a").toString
      val dirB = java.nio.file.Files
        .createTempDirectory("hh_resume_b").toString
      val q1 = start(dirA)
      mem.addData((1 to 5).map(i =>
        EventRow(i.toLong, ts(i), 42L, "view", 1.0)): _*)
      q1.processAllAvailable()
      q1.stop() // the kill: recovery below runs purely off the checkpoint
      // arrives while the query is DOWN
      mem.addData((6 to 8).map(i =>
        EventRow(i.toLong, ts(i), 42L, "view", 1.0)): _*)
      val q2 = start(dirB)
      q2.processAllAvailable()
      q2.stop()
      // the resumed run's snapshot counts batch A's 5 events FROM STATE
      // plus the down-time 3 exactly once — 8 total, not 3, not 13
      val resumed = spark.read.parquet(s"$dirB/b=1")
        .filter(col("user_id") === 42L).collect()
      assert(resumed.length == 1 &&
        resumed.head.getAs[Long]("est") == 8L &&
        resumed.head.getAs[Long]("err") == 0L,
        resumed.mkString(","))
    }
  }

  test("capped regime: bounds hold, heavies survive, state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val capacity = 4
      val mem = MemoryStream[EventRow]
      val q = StreamingOps.streamingHeavyHitters(spark, mem.toDS(), capacity)
        .writeStream.format("memory").queryName("hh_capped")
        .outputMode(OutputMode.Update()).start()
      // interleaved skew: users 100/101 are heavy (24 and 16 events),
      // 20 singleton users churn through the sketch
      var eid = 0L
      def ev(u: Long): EventRow = { eid += 1; EventRow(eid, ts(1), u, "view", 1.0) }
      val batch1 = (1 to 12).flatMap(i =>
        Seq(ev(100L), ev(101L)) ++ (if (i <= 10) Seq(ev(200L + i)) else Nil))
      val batch2 = (1 to 12).map(_ => ev(100L)) ++
        (1 to 4).map(i => ev(101L)) ++ (11 to 20).map(i => ev(200L + i))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("hh_capped").collect()
      // every emitted snapshot holds <= capacity counters
      val perBatchRows = rows.length
      assert(perBatchRows <= 2 * capacity, s"snapshots leak: $perBatchRows")
      val fin = spark.table("hh_capped")
        .groupBy("user_id").agg(max("est").as("est"), max("err").as("err"))
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("est"), r.getAs[Long]("err"))).toMap
      val truth = Map(100L -> 24L, 101L -> 16L)
      // N = 70 events, N/capacity = 17.5: user 100 MUST be tracked
      assert(fin.contains(100L), s"lost the heavy hitter: $fin")
      // SpaceSaving bound for every tracked item with known truth
      truth.foreach { case (u, t) =>
        fin.get(u).foreach { case (est, err) =>
          assert(est >= t && est - err <= t,
            s"bound violated for $u: est=$est err=$err true=$t")
        }
      }
    }
  }
}
