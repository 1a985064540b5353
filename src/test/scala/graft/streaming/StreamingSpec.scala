package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Structured-Streaming behavior tests (SURVEY.md §5.2.5): streaming window
  * aggregates equal their batch equivalents on the same data; watermarks
  * drop late rows; stateful dedup and per-user state work incrementally.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  private def eventsFixture: Seq[EventRow] = Seq(
    EventRow(1L, ts(0), 1L, "view", 1.0),
    EventRow(2L, ts(3), 1L, "view", 2.0),
    EventRow(3L, ts(6), 2L, "click", 3.0),
    EventRow(4L, ts(11), 1L, "view", 4.0),
    EventRow(5L, ts(14), 2L, "click", 5.0),
    EventRow(6L, ts(55), 1L, "view", 6.0))

  test("streaming tumbling window equals batch on same data (T2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(eventsFixture: _*)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingCounts(mem.toDF()), "t2_stream",
      OutputMode.Complete())
      .orderBy("w_start", "event_type").collect()
    val want = StreamingOps.tumblingCounts(eventsFixture.toDF())
      .orderBy("w_start", "event_type").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("streaming sliding window equals batch on same data (T3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(eventsFixture: _*)
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.slidingCounts(mem.toDF()), "t3_stream",
      OutputMode.Complete())
      .orderBy("w_start").collect()
    val want = StreamingOps.slidingCounts(eventsFixture.toDF())
      .orderBy("w_start").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("watermark drops late rows in append mode (T1/T7)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = StreamingOps.tumblingCounts(mem.toDF()).writeStream
      .format("memory").queryName("t7_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(EventRow(1L, ts(0), 1L, "view", 1.0))
    q.processAllAvailable()
    // advance event time far past watermark, closing the first window
    mem.addData(EventRow(2L, ts(55), 1L, "view", 2.0))
    q.processAllAvailable()
    // late row for the long-closed first window → dropped
    mem.addData(EventRow(3L, ts(1), 1L, "view", 9.0))
    q.processAllAvailable()
    mem.addData(EventRow(4L, ts(59), 1L, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("t7_stream")
      .filter(col("w_start") === ts(0)).collect()
    assert(w0.forall(_.getAs[Long]("n") == 1L),
      s"late row was not dropped: ${w0.mkString(",")}")
  }

  test("streaming session windows emit closed sessions (T4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = StreamingOps.sessionCounts(mem.toDF()).writeStream
      .format("memory").queryName("t4s_stream")
      .outputMode(OutputMode.Append()).start()
    // session: two events 5 min apart, then silence
    mem.addData(EventRow(1L, ts(0), 1L, "view", 1.0),
      EventRow(2L, ts(5), 1L, "view", 1.0))
    q.processAllAvailable()
    // event far in the future closes the session past the watermark
    mem.addData(EventRow(3L, ts(59, 59), 1L, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("t4s_stream").collect()
    assert(sessions.length == 1, sessions.mkString(","))
    assert(sessions.head.getAs[Long]("n") == 2L)
    assert(sessions.head.getAs[Timestamp]("s_start") == ts(0))
    // end = last event + 30 min gap
    assert(sessions.head.getAs[Timestamp]("s_end") == ts(35))
  }

  test("dropDuplicatesWithinWatermark dedups by event_id (T5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(
      EventRow(1L, ts(0), 1L, "view", 1.0),
      EventRow(1L, ts(0, 30), 1L, "view", 1.0),
      EventRow(2L, ts(1), 1L, "view", 2.0))
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.dedupWithinWatermark(mem.toDF()), "t5_stream")
    assert(got.count() == 2)
  }

  test("mapGroupsWithState accumulates per-user state across batches (T6)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = StreamingOps
      .runningUserTotals(spark, mem.toDS())
      .writeStream.format("memory").queryName("t6_stream")
      .outputMode(OutputMode.Update()).start()
    mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0))
    q.processAllAvailable()
    mem.addData(EventRow(2L, ts(1), 7L, "view", 2.5))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("t6_stream").filter(col("user_id") === 7L)
      .orderBy(col("n_events").desc).collect().head
    assert(last.getAs[Long]("n_events") == 2L)
    assert(math.abs(last.getAs[Double]("total_value") - 3.5) < 1e-9)
  }

  test("transformWithState matches mapGroupsWithState across batches (T6+)") {
    // Spark 4's StatefulProcessor API; requires the RocksDB state store —
    // the same backend the scale-posture test pins for the legacy API
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[EventRow]
      val q = StreamingOps
        .runningUserTotalsTws(spark, mem.toDS())
        .writeStream.format("memory").queryName("t6_tws_stream")
        .outputMode(OutputMode.Update()).start()
      mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
        EventRow(2L, ts(0), 8L, "view", 4.0))
      q.processAllAvailable()
      mem.addData(EventRow(3L, ts(1), 7L, "view", 2.5))
      q.processAllAvailable()
      q.stop()
      // state accumulated ACROSS batches, per key
      val last7 = spark.table("t6_tws_stream")
        .filter(col("user_id") === 7L)
        .orderBy(col("n_events").desc).collect().head
      assert(last7.getAs[Long]("n_events") == 2L)
      assert(math.abs(last7.getAs[Double]("total_value") - 3.5) < 1e-9)
      val last8 = spark.table("t6_tws_stream")
        .filter(col("user_id") === 8L).collect().head
      assert(last8.getAs[Long]("n_events") == 1L)
      assert(math.abs(last8.getAs[Double]("total_value") - 4.0) < 1e-9)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState/ListState keep independent per-key state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[EventRow]
      val q = StreamingOps
        .userProfiles(spark, mem.toDS())
        .writeStream.format("memory").queryName("t6_profile_stream")
        .outputMode(OutputMode.Update()).start()
      mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
        EventRow(2L, ts(1), 7L, "click", 1.0))
      q.processAllAvailable()
      mem.addData(EventRow(3L, ts(2), 7L, "view", 1.0),
        EventRow(4L, ts(3), 7L, "view", 1.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("t6_profile_stream")
        .filter(col("user_id") === 7L).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_type"),
          r.getAs[scala.collection.Seq[Long]]("recent_ids").toSeq))
      // batch 2 emits only the types it saw: view with the MapState count
      // accumulated across batches, and the ListState truncated to last 3
      val viewRows = rows.filter(_._1 == "view").sortBy(_._2)
      assert(viewRows.map(_._2).toSeq == Seq(1L, 3L))
      assert(viewRows.last._3 == Seq(2L, 3L, 4L))
      // click count untouched by batch 2 (still 1, from batch 1's row)
      assert(rows.filter(_._1 == "click").map(_._2).toSeq == Seq(1L))
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timer closes sessions and evicts (T6+)") {
    // the timer-API twin of the EventTimeTimeout scenario below: same
    // traffic, same expected closes, state eviction via handleExpiredTimer
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[EventRow]
      val q = StreamingOps
        .sessionTotalsWithTimer(spark, mem.toDS())
        .writeStream.format("memory").queryName("t6_timer_stream")
        .outputMode(OutputMode.Update()).start()
      mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
        EventRow(2L, ts(0), 8L, "view", 1.0))
      q.processAllAvailable()
      // user 8 keeps going at 00:50 → watermark reaches 00:40, past user
      // 7's timer at 00:30; the expiry sweep runs against the new watermark
      mem.addData(EventRow(3L, ts(50), 8L, "view", 1.0))
      q.processAllAvailable()
      mem.addData(EventRow(4L, ts(51), 8L, "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("t6_timer_stream")
        .filter(col("closed") && col("user_id") === 7L).collect()
      assert(closed.length == 1, s"expected one close row: ${closed.toSeq}")
      assert(closed.head.getAs[Long]("n_events") == 1L)
      // user 7 returns — state was evicted, so the session restarts at 1
      mem.addData(EventRow(5L, ts(52), 7L, "view", 1.0))
      q.processAllAvailable()
      q.stop()
      val reopened = spark.table("t6_timer_stream")
        .filter(!col("closed") && col("user_id") === 7L)
        .orderBy(col("n_events").desc).collect()
      assert(reopened.head.getAs[Long]("n_events") == 1L,
        s"state survived the timer expiry: ${reopened.toSeq}")
      // user 8's timer kept re-arming: no close row for it
      assert(spark.table("t6_timer_stream")
        .filter(col("closed") && col("user_id") === 8L).isEmpty)
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("EventTimeTimeout evicts per-key state and emits the close (T6)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = StreamingOps
      .sessionTotalsWithTimeout(spark, mem.toDS())
      .writeStream.format("memory").queryName("t6_timeout_stream")
      .outputMode(OutputMode.Update()).start()
    // batch 1: users 7 and 8 open sessions at 00:00; user 7's timeout is
    // armed at 00:30 (last event + 30-min gap)
    mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
      EventRow(2L, ts(0), 8L, "view", 1.0))
    q.processAllAvailable()
    // batch 2: user 8 keeps going at 00:50 → after this batch the
    // watermark advances to 00:40, past user 7's 00:30 timeout
    mem.addData(EventRow(3L, ts(50), 8L, "view", 1.0))
    q.processAllAvailable()
    // batch 3: any traffic triggers the timeout sweep against the new
    // watermark — user 7 must be closed with its pre-timeout count
    mem.addData(EventRow(4L, ts(51), 8L, "view", 1.0))
    q.processAllAvailable()
    val closed = spark.table("t6_timeout_stream")
      .filter(col("closed") && col("user_id") === 7L).collect()
    assert(closed.length == 1, s"expected one close row: ${closed.toSeq}")
    assert(closed.head.getAs[Long]("n_events") == 1L)
    // batch 4: user 7 returns — a fresh session proves the state was
    // REMOVED, not just flagged (n_events restarts at 1, not 2)
    mem.addData(EventRow(5L, ts(52), 7L, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val reopened = spark.table("t6_timeout_stream")
      .filter(!col("closed") && col("user_id") === 7L)
      .orderBy(col("n_events").desc).collect()
    assert(reopened.head.getAs[Long]("n_events") == 1L,
      s"state survived the timeout: ${reopened.toSeq}")
    // user 8 never timed out: no close row for it
    assert(spark.table("t6_timeout_stream")
      .filter(col("closed") && col("user_id") === 8L).isEmpty)
  }

  test("flatMapGroupsWithState emits only on session close (T6 append)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = StreamingOps
      .closedSessions(spark, mem.toDS())
      .writeStream.format("memory").queryName("t6_closed_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
      EventRow(2L, ts(5), 7L, "view", 1.0),
      EventRow(3L, ts(0), 8L, "view", 1.0))
    q.processAllAvailable()
    // both sessions still open: an append-only consumer has seen NOTHING
    assert(spark.table("t6_closed_stream").isEmpty)
    // user 8 keeps going; watermark advances past user 7's 00:35 timeout
    mem.addData(EventRow(4L, ts(50), 8L, "view", 1.0))
    q.processAllAvailable()
    mem.addData(EventRow(5L, ts(51), 8L, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t6_closed_stream").collect()
    assert(out.length == 1, s"exactly one closed session: ${out.toSeq}")
    assert(out.head.getAs[Long]("user_id") == 7L)
    assert(out.head.getAs[Long]("n_events") == 2L)
    assert(out.head.getAs[Boolean]("closed"))
  }

  test("stream-static join enriches events with the customer dim (T8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(EventRow(1L, ts(0), 0L, "view", 1.0))
    val dim = Tables.customer(spark, sf("sf0.001"))
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.streamStaticJoin(mem.toDF(), dim), "t8_stream")
    assert(got.count() == 1)
    assert(got.collect().head.getAs[String]("c_mktsegment").nonEmpty)
  }

  /** Runs `body` with the RocksDB state store pinned (the backend every
    * `transformWithState` op requires), restoring the prior provider.
    */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      body
    } finally {
      prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState ValueState survives kill-and-resume from the " +
      "RocksDB checkpoint, exactly-once") {
    // stop the query mid-stream, enqueue MORE data while it is down, then
    // restart from the SAME checkpoint: the per-user counters must resume
    // from the checkpointed RocksDB state (not recount batch A), and the
    // down-time data must be processed exactly once
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("tws_resume_ckpt").toString
      val mem = MemoryStream[EventRow]
      // the memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable sink shape — each RUN writes its update rows to its
      // own directory, so post-restart output is directly observable
      def start(outDir: String) = StreamingOps
        .runningUserTotalsTws(spark, mem.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[UserSnapshot], id: Long) =>
            batch.write.mode("append").parquet(s"$outDir/b=$id"): Unit
        }.start()
      val dirA = java.nio.file.Files
        .createTempDirectory("tws_resume_a").toString
      val dirB = java.nio.file.Files
        .createTempDirectory("tws_resume_b").toString
      val q1 = start(dirA)
      mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
        EventRow(2L, ts(0), 7L, "view", 2.0),
        EventRow(3L, ts(0), 8L, "view", 4.0))
      q1.processAllAvailable()
      q1.stop() // the kill: recovery below runs purely off the checkpoint
      // arrives while the query is DOWN
      mem.addData(EventRow(4L, ts(1), 7L, "view", 0.5),
        EventRow(5L, ts(1), 9L, "view", 9.0))
      val q2 = start(dirB)
      q2.processAllAvailable()
      q2.stop()
      val resumed = spark.read.parquet(s"$dirB/*").collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      // user 7: state 2/3.0 recovered from RocksDB + one new event — a
      // from-scratch recount would say (1, 0.5), a replay of batch A
      // would say (4, 3.5)
      assert(resumed(7L) == (3L, 3.5),
        s"user 7 state after resume: ${resumed.get(7L)}")
      // user 9 first seen after the restart
      assert(resumed(9L) == (1L, 9.0))
      // user 8 had no post-restart events: Update mode re-emits nothing
      // for it, and batch A's rows were NOT re-processed into the new run
      assert(!resumed.contains(8L),
        s"batch A re-emitted after resume: ${resumed.get(8L)}")
    }
  }

  test("transformWithState timers survive kill-and-resume: a timer armed " +
      "before the kill fires after the restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("timer_resume_ckpt").toString
      val mem = MemoryStream[EventRow]
      def start(outDir: String) = StreamingOps
        .sessionTotalsWithTimer(spark, mem.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[SessionTotal], id: Long) =>
            batch.write.mode("append").parquet(s"$outDir/b=$id"): Unit
        }.start()
      val dirA = java.nio.file.Files
        .createTempDirectory("timer_resume_a").toString
      val dirB = java.nio.file.Files
        .createTempDirectory("timer_resume_b").toString
      val q1 = start(dirA)
      // user 7's session: 2 events, timer armed at 00:30 (gap 30m)
      mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
        EventRow(2L, ts(0, 30), 7L, "view", 1.0))
      q1.processAllAvailable()
      q1.stop()
      // watermark-advancing traffic from ANOTHER user lands while down;
      // after restart the watermark sweep must find user 7's RECOVERED
      // timer and close the session with the RECOVERED count
      mem.addData(EventRow(3L, ts(50), 8L, "view", 1.0))
      val q2 = start(dirB)
      q2.processAllAvailable()
      mem.addData(EventRow(4L, ts(51), 8L, "view", 1.0))
      q2.processAllAvailable()
      q2.stop()
      val closed = spark.read.parquet(s"$dirB/*")
        .filter(col("closed") && col("user_id") === 7L).collect()
      assert(closed.length == 1,
        s"expected exactly one close for user 7: ${closed.toSeq}")
      assert(closed.head.getAs[Long]("n_events") == 2L,
        "close row must carry the pre-kill session count")
    }
  }

  test("transformWithState MapState/ListState survive kill-and-resume") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val ckpt = java.nio.file.Files
        .createTempDirectory("profile_resume_ckpt").toString
      val mem = MemoryStream[EventRow]
      def start(outDir: String) = StreamingOps
        .userProfiles(spark, mem.toDS(), keepLast = 3)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[UserProfile], id: Long) =>
            batch.write.mode("append").parquet(s"$outDir/b=$id"): Unit
        }.start()
      val dirA = java.nio.file.Files
        .createTempDirectory("profile_resume_a").toString
      val dirB = java.nio.file.Files
        .createTempDirectory("profile_resume_b").toString
      val q1 = start(dirA)
      mem.addData(EventRow(1L, ts(0), 7L, "view", 1.0),
        EventRow(2L, ts(1), 7L, "click", 1.0))
      q1.processAllAvailable()
      q1.stop()
      mem.addData(EventRow(3L, ts(2), 7L, "view", 1.0))
      val q2 = start(dirB)
      q2.processAllAvailable()
      q2.stop()
      val rows = spark.read.parquet(s"$dirB/*")
        .filter(col("user_id") === 7L).collect()
      val viewRow = rows.find(_.getAs[String]("event_type") == "view").get
      // MapState: view count accumulated ACROSS the restart (1 + 1)
      assert(viewRow.getAs[Long]("n_type") == 2L,
        s"MapState lost across resume: ${rows.toSeq}")
      // ListState: the bounded recent-ids window still holds the pre-kill
      // event ids alongside the new one
      assert(viewRow.getSeq[Long](viewRow.fieldIndex("recent_ids")).toSeq
        == Seq(1L, 2L, 3L),
        s"ListState lost across resume: ${rows.toSeq}")
    }
  }

  test("stateful ops run on the RocksDB state store (scale-posture)") {
    // HDFS-backed in-memory state breaks down at large key cardinality;
    // RocksDB is the 100-TB state backend — prove the ops run on it
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val mem = MemoryStream[EventRow]
      mem.addData(eventsFixture: _*)
      val got = StreamingOps.runToMemory(spark,
        StreamingOps.tumblingCounts(mem.toDF()), "rocks_stream",
        OutputMode.Complete())
      val want = StreamingOps.tumblingCounts(eventsFixture.toDF())
      assert(got.count() == want.count())
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream join matches purchases to in-window views (T8+)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val joined = StreamingOps.streamStreamJoin(
      views.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("t8s_stream")
      .outputMode(OutputMode.Append()).start()
    views.addData(
      EventRow(10L, ts(0), 1L, "view", 0.0),
      EventRow(11L, ts(5), 1L, "view", 0.0),
      EventRow(12L, ts(0), 2L, "view", 0.0))
    purchases.addData(
      EventRow(20L, ts(10), 1L, "purchase", 5.0), // joins views 10 and 11
      EventRow(21L, ts(45), 1L, "purchase", 5.0)) // outside the 30-min bound
    q.processAllAvailable()
    // advance both watermarks so all joinable results emit
    views.addData(EventRow(19L, ts(59, 50), 3L, "view", 0.0))
    purchases.addData(EventRow(29L, ts(59, 55), 3L, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t8s_stream")
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((20L, 10L)) && got.contains((20L, 11L)), got)
    assert(!got.exists(_._1 == 21L), s"out-of-window view joined: $got")
    assert(!got.exists(p => p._1 == 20L && p._2 == 12L),
      "cross-user join leaked")
  }

  test("stream-stream LEFT OUTER join null-pads on watermark eviction (T8+)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val joined = StreamingOps.streamStreamJoinLeftOuter(
      views.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("t8s_left")
      .outputMode(OutputMode.Append()).start()
    views.addData(EventRow(10L, ts(0), 1L, "view", 0.0))
    purchases.addData(
      EventRow(20L, ts(10), 1L, "purchase", 5.0), // matches view 10
      EventRow(21L, ts(12), 2L, "purchase", 5.0)) // no view for user 2
    q.processAllAvailable()
    // before the watermark passes ts(12)+30min, purchase 21 must NOT have
    // emitted null-padded: a qualifying view could still arrive
    val early = spark.table("t8s_left").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(!early.contains((21L, -1L)),
      s"null-padded row emitted before eviction: ${early.toSeq}")
    // push both watermarks far past every bound → state evicts → the
    // unmatched purchase emits exactly once, null-padded
    views.addData(EventRow(19L, ts(59, 50), 3L, "view", 0.0))
    purchases.addData(EventRow(29L, ts(59, 55), 3L, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("t8s_left").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSeq
    assert(got.contains((20L, 10L)), s"matched pair missing: $got")
    assert(got.count(_ == (21L, -1L)) == 1,
      s"unmatched purchase should emit null-padded exactly once: $got")
  }

  test("stream-stream FULL OUTER join null-pads both sides on eviction (T8+)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EventRow]
    val purchases = MemoryStream[EventRow]
    val joined = StreamingOps.streamStreamJoinFullOuter(
      views.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("t8s_full")
      .outputMode(OutputMode.Append()).start()
    views.addData(
      EventRow(10L, ts(0), 1L, "view", 0.0),  // converts (purchase 20)
      EventRow(12L, ts(5), 4L, "view", 0.0))  // never converts
    purchases.addData(
      EventRow(20L, ts(10), 1L, "purchase", 5.0), // matches view 10
      EventRow(21L, ts(12), 2L, "purchase", 5.0)) // no view for user 2
    q.processAllAvailable()
    def rows() = spark.table("t8s_full").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    // nothing null-padded while a partner could still arrive
    assert(!rows().exists(p => p._1 == -1L || p._2 == -1L),
      s"null-padded before eviction: ${rows()}")
    // advance both watermarks past every bound → state evicts → BOTH
    // unmatched rows emit null-padded, each exactly once
    views.addData(EventRow(19L, ts(59, 50), 3L, "view", 0.0))
    purchases.addData(EventRow(29L, ts(59, 55), 3L, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = rows()
    assert(got.contains((20L, 10L)), s"matched pair missing: $got")
    assert(got.count(_ == (21L, -1L)) == 1,
      s"unmatched purchase should null-pad exactly once: $got")
    assert(got.count(_ == (-1L, 12L)) == 1,
      s"unconverted view should null-pad exactly once: $got")
  }

  test("streaming file source over events parquet works end-to-end (S6)") {
    val schema = Tables.events(spark, sf("sf0.001")).schema
    // file streaming source needs a plain-schema dir; stage a µs-normalized
    // copy (the raw corpus is TIMESTAMP(NANOS) which the source rejects)
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    Tables.events(spark, sf("sf0.001")).write.mode("overwrite")
      .parquet(dir.toString + "/data")
    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString + "/data")
    val got = StreamingOps.runToMemory(spark,
      StreamingOps.tumblingCounts(stream), "s6_stream",
      OutputMode.Complete())
    val want = StreamingOps.tumblingCounts(
      Tables.events(spark, sf("sf0.001")))
    assert(got.count() == want.count())
  }

  test("AvailableNow drains once and resumes from the checkpoint (S6+)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("avail_now").toString
    val first = eventsFixture.take(4)
    val second = eventsFixture.drop(4)
    first.toDF().write.parquet(s"$dir/data/part1")
    val schema = first.toDF().schema
    def stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(s"$dir/data")
    // run 1: drains the 4 available rows, then terminates on its own
    val got1 = StreamingOps.drainAvailable(spark, stream, s"$dir/out",
      s"$dir/ckpt")
    assert(got1.count() == first.size, "first drain should see all rows")
    // run 2, same checkpoint: processes ONLY the files added since run 1,
    // so the cumulative sink holds each input row exactly once
    second.toDF().write.parquet(s"$dir/data/part2")
    val got2 = StreamingOps.drainAvailable(spark, stream, s"$dir/out",
      s"$dir/ckpt")
    assert(got2.count() == eventsFixture.size,
      s"resume must not reprocess old files, got ${got2.count()}")
    assert(got2.select("event_id").distinct().count() == eventsFixture.size)
  }

  test("foreachBatch sink is exactly-once under batch replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("fb_sink").toString
    val mem = MemoryStream[EventRow]
    mem.addData(eventsFixture.take(4): _*)
    val q = StreamingOps.foreachBatchExactlyOnce(mem.toDF(),
      s"$dir/out", s"$dir/ckpt")
    q.processAllAvailable()
    mem.addData(eventsFixture.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val read = () => spark.read
      .option("basePath", s"$dir/out").parquet(s"$dir/out/batch_id=*")
    assert(read().count() == eventsFixture.size)
    assert(read().select("batch_id").distinct().count() >= 2)
    // simulate the at-least-once replay of an already-committed batch:
    // rewriting batch 0 with the same rows must leave the totals unchanged
    StreamingOps.writeBatchIdempotent(eventsFixture.take(4).toDF(), 0L,
      s"$dir/out")
    assert(read().count() == eventsFixture.size,
      "replayed batch must overwrite, not append")
    assert(read().select("event_id").distinct().count() == eventsFixture.size)
  }

  test("incremental aggregate maintenance equals full recompute; replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivm").toString
    val mem = MemoryStream[EventRow]
    val q = StreamingOps.incrementalAgg(mem.toDF(), s"$dir/state",
      s"$dir/ckpt")
    // three micro-batches, overlapping user keys
    eventsFixture.grouped(2).foreach { chunk =>
      mem.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val got = StreamingOps.readAggState(spark, s"$dir/state")
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
    val want = eventsFixture.toDF().groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("t"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq,
      s"incremental view diverged: ${got.toSeq} vs ${want.toSeq}")
    // at-least-once replay of the LAST batch: merging it again with the
    // same batch id must regenerate the same version, not double-count
    val lastChunk = eventsFixture.grouped(2).toSeq.last
    StreamingOps.mergeAggBatch(lastChunk.toDF(), 2L, s"$dir/state")
    val replayed = StreamingOps.readAggState(spark, s"$dir/state")
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value")))
    assert(replayed.toSeq == want.toSeq, "replay double-counted")
    // version snapshots must not accumulate forever: only the last two
    // committed versions (current + the one a replay would re-read)
    // survive a commit
    val kept = new java.io.File(s"$dir/state").listFiles()
      .map(_.getName).filter(_.startsWith("v=")).sorted.toSeq
    assert(kept == Seq("v=1", "v=2"),
      s"old state versions must be pruned, found $kept")
  }

  test("readAggState before any commit returns the documented empty schema") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_empty").toString
    val df = StreamingOps.readAggState(spark, s"$dir/state")
    assert(df.schema == StreamingOps.AggStateSchema)
    // the documented columns must be selectable (no AnalysisException)
    assert(df.select("user_id", "n_events", "total_value").count() == 0)
  }
}
