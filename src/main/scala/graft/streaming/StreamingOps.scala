package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import java.sql.Timestamp

/** Typed event row for streaming ops (mirrors the `events` table schema,
  * with `ts` already truncated to microseconds).
  */
final case class EventRow(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Per-user running state for the arbitrary-stateful operator (T6). */
final case class UserState(n_events: Long, total_value: Double)
final case class UserSnapshot(user_id: Long, n_events: Long,
    total_value: Double)

/** State of an open per-user session for [[StreamingOps.sessionTotalsWithTimeout]]. */
final case class SessionState(n_events: Long, last_ts_ms: Long)
/** Emitted session row: `closed = false` while the session is live (Update
  * mode progress), `true` exactly once when the event-time timeout fires.
  */
final case class SessionTotal(user_id: Long, n_events: Long, closed: Boolean)

/** [[org.apache.spark.sql.streaming.StatefulProcessor]] backing
  * [[StreamingOps.runningUserTotalsTws]]: one named `ValueState` holding
  * the per-user [[UserState]], updated per input batch, snapshot emitted
  * per invocation (Update-mode semantics, same contract as the
  * `mapGroupsWithState` twin it modernizes).
  */
class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventRow, UserSnapshot] {
  @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[UserState] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    totals = getHandle.getValueState[UserState]("totals",
      org.apache.spark.sql.Encoders.product[UserState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[EventRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserSnapshot] = {
    val prev = if (totals.exists()) totals.get() else UserState(0L, 0.0)
    val batch = rows.toSeq
    val next = UserState(prev.n_events + batch.size,
      prev.total_value + batch.map(_.value).sum)
    totals.update(next)
    Iterator.single(UserSnapshot(userId, next.n_events, next.total_value))
  }
}

/** Event-time-timer sessionization on the `transformWithState` API — the
  * modern twin of [[StreamingOps.sessionTotalsWithTimeout]]. Instead of
  * `GroupStateTimeout` bookkeeping, the processor registers an explicit
  * per-key timer at `last_event + gap` (re-armed on every batch by deleting
  * the stale timer — timers are a SET per key, not a single slot) and
  * evicts state in `handleExpiredTimer` when the watermark passes it. Same
  * bounded-by-ACTIVE-keys state guarantee, now with first-class timers.
  */
class SessionTimerProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventRow, SessionTotal] {
  @transient private var session:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    session = getHandle.getValueState[SessionState]("session",
      org.apache.spark.sql.Encoders.product[SessionState],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[EventRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[SessionTotal] = {
    val batch = rows.toSeq
    val prev = if (session.exists()) session.get() else SessionState(0L, 0L)
    val next = SessionState(prev.n_events + batch.size,
      math.max(prev.last_ts_ms, batch.map(_.ts.getTime).max))
    session.update(next)
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
    getHandle.registerTimer(next.last_ts_ms + gapMs)
    Iterator.single(SessionTotal(userId, next.n_events, closed = false))
  }

  override def handleExpiredTimer(userId: Long,
      timerValues: org.apache.spark.sql.streaming.TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
      : Iterator[SessionTotal] = {
    val fin = session.get()
    session.clear()
    Iterator.single(SessionTotal(userId, fin.n_events, closed = true))
  }
}

/** One tracked counter of the [[SpaceSavingProcessor]] snapshot: `est` is
  * an overestimate of the item's true count, `err` bounds the overshoot
  * (true ∈ [est − err, est] — the SpaceSaving guarantee).
  */
final case class HeavyHitter(event_type: String, user_id: Long,
    est: Long, err: Long)

/** Streaming heavy hitters with BOUNDED state: the SpaceSaving sketch
  * (Metwally et al. 2005) as a `transformWithState` processor — at most
  * `capacity` counters per key live in the store no matter how many
  * distinct items flow past, which is the only viable posture for a
  * 100 TB/day stream (the exact form, batch twin `l13_heavy_hitters`,
  * keeps one group per distinct item). Guarantees carried by the sketch:
  * any item with true count > N/capacity is tracked, and for every
  * tracked item est − err ≤ true ≤ est. Batch rows are pre-aggregated
  * and merged in sorted item order, so the snapshot is deterministic for
  * a given batch sequence; eviction ties break on (est, item id).
  */
/** The pure SpaceSaving merge step, factored out of the processor so its
  * invariants are directly property-testable without a streaming harness
  * (see SpaceSavingPropertySpec): given the current counter table and a
  * batch's (item → occurrences), returns the next table of at most
  * `capacity` counters. Deterministic: items merge in sorted order,
  * eviction ties break on (est, item).
  */
object SpaceSaving {
  def merge(cur: Map[Long, (Long, Long)], batch: Map[Long, Long],
      capacity: Int): Map[Long, (Long, Long)] = {
    val m = scala.collection.mutable.Map.empty[Long, (Long, Long)] ++ cur
    batch.toSeq.sortBy(_._1).foreach { case (u, c) =>
      m.get(u) match {
        case Some((est, err)) => m(u) = (est + c, err)
        case None if m.size < capacity => m(u) = (c, 0L)
        case None =>
          // evict the min-est counter; the newcomer inherits its count
          // as both floor and error bound (the SpaceSaving step)
          val (mu, (mEst, _)) = m.minBy { case (k, (e, _)) => (e, k) }
          m -= mu
          m(u) = (mEst + c, mEst)
      }
    }
    m.toMap
  }
}

/** One per-key quantile snapshot from [[DdSketchQuantilesProcessor]]. */
final case class QuantileSnapshot(event_type: String, n: Long,
    n_bins: Long, p50: Double, p95: Double)

/** The pure DDSketch kernel shared by the streaming processor and its
  * spec — SAME constants as the batch `g19_ddsketch_quantiles` query
  * (γ = 101/99 → 1% relative error; `Math.log`/`Math.exp` are exactly
  * the functions Spark's log/exp expressions codegen to, so scala-side
  * and Column-side bins agree bit-for-bit).
  */
object DdSketchBins {
  val lnGamma: Double = math.log(101.0 / 99.0)
  def bin(x: Double): Long = math.ceil(math.log(x) / lnGamma).toLong
  def estimate(bin: Long): Double = math.exp(bin * lnGamma) * 0.99
  def merge(cur: Map[Long, Long], xs: Iterable[Double]): Map[Long, Long] =
    xs.filter(_ > 0).foldLeft(cur) { (m, x) =>
      val b = bin(x); m.updated(b, m.getOrElse(b, 0L) + 1L)
    }
  def quantile(bins: Map[Long, Long], q: Double): Double = {
    val n = bins.values.sum
    val rk = math.floor(q * (n - 1)).toLong + 1
    var cum = 0L
    bins.toSeq.sortBy(_._1).foreach { case (b, c) =>
      cum += c
      if (cum >= rk) return estimate(b)
    }
    estimate(bins.keys.max)
  }
}

/** Streaming percentiles with BOUNDED state: the g19 DDSketch histogram
  * per key inside `transformWithState` — state is the (bin → count)
  * MapState, at most ~250 entries for any value range the fixture's
  * magnitudes span, regardless of row count. Merges are count increments
  * (the sketch's exact-merge property), so the per-batch snapshot equals
  * the batch sketch over everything seen so far — asserted in
  * StreamingQuantilesSpec, along with scala-vs-Column bin agreement.
  */
class DdSketchQuantilesProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, EventRow, QuantileSnapshot] {
  @transient private var bins:
      org.apache.spark.sql.streaming.MapState[Long, Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    bins = getHandle.getMapState[Long, Long]("bins",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(eventType: String, rows: Iterator[EventRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[QuantileSnapshot] = {
    val cur = bins.iterator().toMap
    val next = DdSketchBins.merge(cur, rows.map(_.value).toSeq)
    (next.keySet -- cur.keySet).foreach(b => bins.updateValue(b, next(b)))
    cur.keySet.foreach(b =>
      if (next(b) != cur(b)) bins.updateValue(b, next(b)))
    if (next.isEmpty) Iterator.empty
    else Iterator.single(QuantileSnapshot(eventType, next.values.sum,
      next.size.toLong, DdSketchBins.quantile(next, 0.5),
      DdSketchBins.quantile(next, 0.95)))
  }
}

class SpaceSavingProcessor(capacity: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, EventRow, HeavyHitter] {
  @transient private var counters:
      org.apache.spark.sql.streaming.MapState[Long, (Long, Long)] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    counters = getHandle.getMapState[Long, (Long, Long)]("counters",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(eventType: String, rows: Iterator[EventRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[HeavyHitter] = {
    // one state scan per BATCH (≤ capacity entries), not per row
    val cur = counters.iterator().toMap
    val batch = rows.toSeq.groupBy(_.user_id).view
      .mapValues(_.size.toLong).toMap
    val next = SpaceSaving.merge(cur, batch, capacity)
    (cur.keySet -- next.keySet).foreach(counters.removeKey)
    next.foreach { case (k, v) => counters.updateValue(k, v) }
    next.toSeq.sortBy(_._1).iterator.map { case (u, (est, err)) =>
      HeavyHitter(eventType, u, est, err)
    }
  }
}

/** Per-user profile emitted by [[UserProfileProcessor]]: running count per
  * event type plus the user's most recent event ids (bounded window).
  */
final case class UserProfile(user_id: Long, event_type: String,
    n_type: Long, recent_ids: Seq[Long])

/** Composable-state-variable demo on `transformWithState`: a MapState
  * (event-type → running count) and a ListState (last-N event ids, bounded
  * by truncating on every batch) side by side in ONE processor — the
  * state-store layout the old GroupState API forces into a single
  * monolithic case class. Each variable is schema'd and evolved
  * independently by the store; the bounded list is what keeps per-key
  * state O(N) on an unbounded stream.
  */
class UserProfileProcessor(keepLast: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventRow, UserProfile] {
  @transient private var typeCounts:
      org.apache.spark.sql.streaming.MapState[String, Long] = _
  @transient private var recent:
      org.apache.spark.sql.streaming.ListState[Long] = _

  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    val ttl = org.apache.spark.sql.streaming.TTLConfig.NONE
    typeCounts = getHandle.getMapState[String, Long]("type_counts",
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong, ttl)
    recent = getHandle.getListState[Long]("recent",
      org.apache.spark.sql.Encoders.scalaLong, ttl)
  }

  override def handleInputRows(userId: Long, rows: Iterator[EventRow],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserProfile] = {
    val batch = rows.toSeq
    batch.groupBy(_.event_type).foreach { case (t, evs) =>
      val prev = if (typeCounts.containsKey(t)) typeCounts.getValue(t) else 0L
      typeCounts.updateValue(t, prev + evs.size)
    }
    // bounded recent-ids window: append then truncate to the newest N
    val ids = (recent.get().toSeq ++
      batch.sortBy(e => (e.ts.getTime, e.event_id)).map(_.event_id))
      .takeRight(keepLast)
    recent.put(ids.toArray)
    val snapshot = ids
    batch.map(_.event_type).distinct.sorted.iterator.map(t =>
      UserProfile(userId, t, typeCounts.getValue(t), snapshot))
  }
}

/** Structured-Streaming operator surface (SURVEY.md §2.C T1-T8). Each
  * transform takes a (possibly streaming) events DataFrame and returns the
  * transformed frame — the same plans run in batch mode, which is how the
  * DuckDB oracle covers their semantics (see
  * [[graft.relational.TimeQueries]]); the streaming-specific behaviors
  * (watermark drops, incremental state) are asserted in the test suite with
  * `MemoryStream`.
  */
object StreamingOps {

  /** T1+T2: watermarked tumbling-window counts (append-able). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** T3: sliding window (10 min window / 5 min slide). */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** T4: session windows with a 30-minute gap, per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"))

  /** T5: stateful dedup bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** T6: arbitrary stateful per-user running counters via
    * `mapGroupsWithState` (state schema is ours: [[UserState]]).
    */
  def runningUserTotals(spark: SparkSession, events: Dataset[EventRow])
      : Dataset[UserSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val batch = rows.toSeq
          val next = UserState(prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          UserSnapshot(userId, next.n_events, next.total_value)
      }
  }

  /** T6 on the `transformWithState` API (Spark 4's successor to
    * `mapGroupsWithState`): the same per-user running counters, expressed
    * as a [[StatefulProcessor]] with a named, composable `ValueState`.
    * The new API is the forward path for arbitrary state at scale — state
    * variables are schema'd individually (so the store can evolve them),
    * TTL is declarative per state variable instead of hand-rolled timeout
    * bookkeeping, and it REQUIRES the RocksDB state store provider, the
    * backend sized for 100 TB key cardinality (the caller/spec sets
    * `spark.sql.streaming.stateStore.providerClass`).
    */
  def runningUserTotalsTws(spark: SparkSession, events: Dataset[EventRow])
      : Dataset[UserSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** T6+ bounded-state streaming heavy hitters per event type
    * ([[SpaceSavingProcessor]]): at most `capacity` counters per key ever
    * live in the state store.
    */
  def streamingHeavyHitters(spark: SparkSession, events: Dataset[EventRow],
      capacity: Int): Dataset[HeavyHitter] = {
    import spark.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new SpaceSavingProcessor(capacity),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** T6+ bounded-state streaming percentiles per event type
    * ([[DdSketchQuantilesProcessor]]): the g19 DDSketch histogram as
    * MapState — ~250 bins max regardless of stream length.
    */
  def streamingQuantiles(spark: SparkSession, events: Dataset[EventRow])
      : Dataset[QuantileSnapshot] = {
    import spark.implicits._
    events.groupByKey(_.event_type)
      .transformWithState(new DdSketchQuantilesProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** T6+ MapState/ListState per-user profile ([[UserProfileProcessor]]). */
  def userProfiles(spark: SparkSession, events: Dataset[EventRow],
      keepLast: Int = 3): Dataset[UserProfile] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor(keepLast),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** T6+ timer form of [[sessionTotalsWithTimeout]] on `transformWithState`
    * ([[SessionTimerProcessor]]): explicit per-key event-time timers drive
    * the session close + state eviction.
    */
  def sessionTotalsWithTimer(spark: SparkSession, events: Dataset[EventRow],
      gapMinutes: Int = 30): Dataset[SessionTotal] = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTimerProcessor(gapMinutes * 60L * 1000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Update())
  }

  /** T6 with `EventTimeTimeout`: per-user session counters whose state is
    * EVICTED by the engine when no event arrives within `gapMinutes` of the
    * user's last event (measured in event time against the watermark).
    * This is what bounds the state store on an unbounded stream: without a
    * timeout, one state entry per ever-seen key lives forever — at 100 TB
    * that's the difference between a state store sized by ACTIVE keys and
    * one sized by ALL keys in history. The timeout invocation both emits
    * the final `closed = true` row and removes the state, so a returning
    * key starts a fresh session (asserted in StreamingSpec).
    */
  def sessionTotalsWithTimeout(spark: SparkSession,
      events: Dataset[EventRow], gapMinutes: Int = 30)
      : Dataset[SessionTotal] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionTotal](
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last_ts + gap: close the session and DROP
            // the state — `remove()` is the eviction under test
            val fin = state.get
            state.remove()
            SessionTotal(userId, fin.n_events, closed = true)
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val next = SessionState(prev.n_events + batch.size,
              math.max(prev.last_ts_ms, batch.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutTimestamp(next.last_ts_ms + gapMs)
            SessionTotal(userId, next.n_events, closed = false)
          }
      }
  }

  /** T6 flatMap form, the Append-mode production shape: a session emits
    * NOTHING while open and exactly one row when the event-time timeout
    * closes it — the pattern for feeding a downstream append-only sink
    * (parquet lake, Kafka) where per-batch progress rows would be
    * duplicates. `flatMapGroupsWithState` is the API tier above
    * `mapGroupsWithState`: zero-or-more output rows per invocation, with
    * the output mode declared at the operator. State eviction is identical
    * to [[sessionTotalsWithTimeout]] — bounded by ACTIVE keys.
    */
  def closedSessions(spark: SparkSession, events: Dataset[EventRow],
      gapMinutes: Int = 30): Dataset[SessionTotal] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionTotal](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val fin = state.get
            state.remove()
            Iterator.single(SessionTotal(userId, fin.n_events, closed = true))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val next = SessionState(prev.n_events + batch.size,
              math.max(prev.last_ts_ms, batch.map(_.ts.getTime).max))
            state.update(next)
            state.setTimeoutTimestamp(next.last_ts_ms + gapMs)
            Iterator.empty
          }
      }
  }

  /** T8: stream-static enrichment join against the customer dimension. */
  def streamStaticJoin(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), events("user_id") === userDim("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment"))

  /** Stream-stream join with event-time bounds (the hardest T-op): each
    * purchase joins views by the same user within the preceding 30 minutes.
    * Watermarks on BOTH sides bound the buffered state — without them the
    * join state grows forever; with them Spark evicts rows older than
    * watermark - bound, which is what makes this runnable on an unbounded
    * stream at scale.
    */
  def streamStreamJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** T8 outer form: every purchase emits exactly once — matched rows as
    * soon as both sides arrive, unmatched ones null-padded only when the
    * watermark proves no qualifying view can still arrive. The emission
    * trigger IS the state eviction, which is why the outer join needs the
    * same watermark bounds as the inner one to run unbounded.
    */
  def streamStreamJoinLeftOuter(views: DataFrame, purchases: DataFrame)
      : DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
      "left_outer")
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"))
  }

  /** T8 full-outer form: BOTH sides null-pad once the watermark proves no
    * qualifying partner can still arrive — purchases without a preceding
    * view AND views that never converted, in one stream. Same interval
    * bounds as the inner join; state eviction on either side is what emits
    * its unmatched rows, so the join runs unbounded.
    */
  def streamStreamJoinFullOuter(views: DataFrame, purchases: DataFrame)
      : DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"),
      "full_outer")
      .select(col("purchase_id"), col("view_id"),
        coalesce(col("p_user"), col("v_user")).as("user_id"))
  }

  /** Run a streaming frame to completion against a memory sink and return
    * the materialized result (local test/verify harness; S7).
    */
  def runToMemory(spark: SparkSession, streaming: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  /** Incremental catch-up run (`Trigger.AvailableNow`): drain everything
    * currently available in the source, then terminate. With a persistent
    * checkpoint this is the production shape for scheduled incremental
    * jobs over a growing 100-TB lake — each invocation resumes from the
    * checkpointed offsets, processes only new files, and exits; no
    * always-on cluster, no reprocessing.
    */
  def drainAvailable(spark: SparkSession, streaming: DataFrame,
      outDir: String, checkpoint: String): DataFrame = {
    val q = streaming.writeStream
      .format("parquet").option("path", outDir)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Idempotent per-batch write — the unit of the foreachBatch
    * exactly-once pattern. The output path is a pure function of the
    * batch id and the write is an atomic directory overwrite, so a batch
    * replayed after a failure (Structured Streaming's at-least-once
    * foreachBatch contract) rewrites the same directory instead of
    * appending duplicates. Readers see `batch_id=N` as a partition column.
    */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long,
      outDir: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** One merge step of incremental aggregate maintenance: fold a
    * micro-batch's PARTIAL per-user aggregate into the stored result table,
    * writing the merged state to a version directory derived from the batch
    * id. Replaying batch N (foreachBatch's at-least-once contract) re-reads
    * version N−1 — still on disk — and overwrites version N with the same
    * bytes, so the merge is idempotent without a transactional format.
    * The merge joins ON THE GROUP KEY: the stored table never rescans the
    * source, and the batch side is aggregated before the join — at 100 TB
    * each increment costs O(batch + |distinct keys touched|), not O(lake).
    */
  def mergeAggBatch(batch: DataFrame, batchId: Long, stateDir: String)
      : Unit = {
    val spark = batch.sparkSession
    val partial = batch.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
    // newest committed version BELOW this batch id — on replay the state
    // may already hold v=batchId (possibly from an interrupted write), and
    // merging from it would double-count
    val prevV = versions(spark, stateDir).filter(_ < batchId) match {
      case Nil => None
      case vs => Some(vs.max)
    }
    val merged = prevV match {
      case None => partial
      case Some(v) =>
        val prev = spark.read.parquet(s"$stateDir/v=$v")
          .select(col("user_id"), col("n_events").as("p_n"),
            col("total_value").as("p_t"))
        prev.join(partial, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            (coalesce(col("p_n"), lit(0L)) +
              coalesce(col("n_events"), lit(0L))).as("n_events"),
            (coalesce(col("p_t"), lit(0.0)) +
              coalesce(col("total_value"), lit(0.0))).as("total_value"))
    }
    merged.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
    // prune AFTER the new version committed: a replay of THIS batch re-reads
    // prevV, so prevV and v=batchId must survive; anything older is a dead
    // full-key-set snapshot that would otherwise accumulate one per
    // micro-batch forever
    val fs = fileSystem(spark, stateDir)
    versions(spark, stateDir)
      .filter(_ < prevV.getOrElse(batchId))
      .foreach(v => fs.delete(
        new org.apache.hadoop.fs.Path(s"$stateDir/v=$v"), true))
  }

  private def fileSystem(spark: SparkSession, dir: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed state versions under `stateDir`, resolved through Hadoop's
    * FileSystem API so the state may live on HDFS/S3/local alike (a
    * java.io.File listing would silently see no versions on a remote store
    * and drop all prior history from the merge).
    */
  private def versions(spark: SparkSession, stateDir: String): List[Long] = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = fileSystem(spark, stateDir)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toList.flatMap { st =>
      val name = st.getPath.getName
      // a version counts only once its _SUCCESS marker exists — a crash
      // mid-write leaves a partial directory that must never be read or
      // merged from
      if (st.isDirectory && name.startsWith("v=") &&
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        scala.util.Try(name.drop(2).toLong).toOption
      else None
    }
  }

  /** Schema of the maintained per-user aggregate view ([[mergeAggBatch]]'s
    * output and [[readAggState]]'s result, including the no-data case).
    */
  val AggStateSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_events",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("total_value",
        org.apache.spark.sql.types.DoubleType)))

  /** The maintained view after all processed batches (latest version).
    * Before any batch commits this is an EMPTY frame with [[AggStateSchema]]
    * — not a zero-column frame — so callers selecting the documented
    * columns get an empty result instead of an AnalysisException.
    */
  def readAggState(spark: SparkSession, stateDir: String): DataFrame =
    versions(spark, stateDir) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], AggStateSchema)
      case vs => spark.read.parquet(s"$stateDir/v=${vs.max}")
    }

  /** Incrementally-maintained per-user aggregate view over a stream —
    * checkpointed offsets + [[mergeAggBatch]] per micro-batch.
    */
  def incrementalAgg(streaming: DataFrame, stateDir: String,
      checkpoint: String): StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeAggBatch(batch, batchId, stateDir)
      }
      .start()

  /** Exactly-once parquet sink: checkpointed offsets + idempotent
    * per-batch overwrite ([[writeBatchIdempotent]]). End-to-end
    * exactly-once without a transactional sink format.
    */
  def foreachBatchExactlyOnce(streaming: DataFrame, outDir: String,
      checkpoint: String): StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIdempotent(batch, batchId, outDir)
      }
      .start()
}
