package graft.relational

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over `events` (SURVEY.md §2.C T-ops batch
  * equivalents + J9 as-of join). The streaming forms of the same windows run
  * in `graft.streaming` and are asserted equal to these batch results in the
  * test suite — the oracle only checks the batch semantics.
  *
  * Every oracle casts `ts` to microseconds (`CAST(ts AS TIMESTAMp)`) because
  * the parquet column is nanosecond-precision and Spark truncates to µs on
  * read (see [[graft.Tables.events]]).
  */
object TimeQueries {
  import Det.duckCentSum

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "t2_tumbling_window",
      s"""SELECT time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS w_start,
         |  event_type, count(*) AS n, ${duckCentSum("value", 2)} AS sum_value
         |FROM events GROUP BY w_start, event_type
         |ORDER BY w_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), Det.centSum(col("value"), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },
    QueryDef.sql(
      "t3_sliding_window",
      // a 10-min window sliding by 5 min ⇒ each event lands in exactly two
      // windows: floor5(ts) and floor5(ts) - 5min. The oracle materializes
      // that expansion explicitly.
      s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS uts, value FROM events),
         |x AS (
         |  SELECT time_bucket(INTERVAL 5 MINUTE, uts) AS w_start, value FROM e
         |  UNION ALL
         |  SELECT time_bucket(INTERVAL 5 MINUTE, uts) - INTERVAL 5 MINUTE, value
         |  FROM e)
         |SELECT w_start, count(*) AS n, ${duckCentSum("value", 2)} AS sum_value
         |FROM x GROUP BY w_start ORDER BY w_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), Det.centSum(col("value"), 2).as("sum_value"))
        .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
        .orderBy("w_start")
    },
    QueryDef.sql(
      "t4_session_window",
      // sessionization with a 30-min gap; Spark's session end = last event +
      // gap, reproduced as max(ts) + 30min. Oracle is the classic
      // gaps-and-islands rewrite.
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS uts FROM events),
        |m AS (SELECT user_id, uts,
        |  CASE WHEN lag(uts) OVER w IS NULL
        |         OR uts - lag(uts) OVER w >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY uts)),
        |g AS (SELECT user_id, uts, sum(brk) OVER (PARTITION BY user_id
        |  ORDER BY uts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM m)
        |SELECT user_id, min(uts) AS s_start,
        |  max(uts) + INTERVAL 30 MINUTE AS s_end, count(*) AS n
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("n"))
        .orderBy("user_id", "s_start")
    },
    QueryDef.sql(
      "t4b_sessionize",
      // per-event session assignment (gaps-and-islands): a session break is
      // a >30-minute gap; the running sum of breaks is the user's session
      // sequence number. Computed on the epoch-microsecond axis so both
      // engines compare identical integers.
      """WITH e AS (SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |m AS (SELECT event_id, user_id, us,
        |  CASE WHEN lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) IS NULL
        |    OR us - lag(us) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) > 1800000000
        |  THEN 1 ELSE 0 END AS is_new FROM e)
        |SELECT event_id, user_id,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS session_seq
        |FROM m ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lagUs = lag(col("us"), 1).over(w)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("is_new",
          when(lagUs.isNull || (col("us") - lagUs) > 1800000000L, 1)
            .otherwise(0))
        .select(col("event_id"), col("user_id"),
          sum("is_new").over(cum).cast("int").as("session_seq"))
        .orderBy("event_id")
    },
    QueryDef.sql(
      "t5_dedup_batch",
      // keyed keep-first dedup — the batch shape of the stateful streaming
      // dedup (T5): one survivor per (user_id, event_type), earliest by
      // (ts, event_id). The id checksum verifies WHICH rows survived, not
      // just how many.
      """WITH ranked AS (
        |  SELECT event_type, event_id,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_first,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM ranked WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_first"), sum("event_id").as("id_checksum"))
        .orderBy("event_type")
    },
    QueryDef.sql(
      "t6_funnel_batch",
      // conversion funnel view → click → purchase, strictly ordered by the
      // user's first event of each type; the batch shape of what the
      // stateful streaming op (T6) computes incrementally
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
        |      AS first_view,
        |    min(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END)
        |      AS first_click,
        |    min(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END)
        |      AS first_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_viewed,
        |  CAST(sum(CASE WHEN first_click > first_view THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clicked_after_view,
        |  CAST(sum(CASE WHEN first_purchase > first_click
        |                 AND first_click > first_view THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_converted
        |FROM per_user""".stripMargin) { (s, d) =>
      val perUser = Tables.events(s, d).groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts")))
          .as("first_purchase"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("first_view").isNotNull, 1).otherwise(0)).cast("long")
          .as("n_viewed"),
        sum(when(col("first_click") > col("first_view"), 1).otherwise(0))
          .cast("long").as("n_clicked_after_view"),
        sum(when(col("first_purchase") > col("first_click") &&
          col("first_click") > col("first_view"), 1).otherwise(0))
          .cast("long").as("n_converted"))
    },
    QueryDef.sql(
      "t7_session_features",
      // per-session training features: duration, event count, value sum,
      // distinct types — the feature-engineering shape over sessionization
      s"""WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS uts, value,
         |  event_type FROM events),
         |m AS (SELECT user_id, uts, value, event_type,
         |  CASE WHEN lag(uts) OVER w IS NULL
         |         OR uts - lag(uts) OVER w >= INTERVAL 30 MINUTE
         |       THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY uts)),
         |g AS (SELECT user_id, uts, value, event_type, sum(brk) OVER
         |  (PARTITION BY user_id ORDER BY uts
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM m)
         |SELECT user_id, min(uts) AS s_start,
         |  CAST(date_diff('second', min(uts), max(uts)) AS BIGINT)
         |    AS duration_s,
         |  count(*) AS n_events,
         |  ${Det.duckCentSum("value", 2)} AS total_value,
         |  count(DISTINCT event_type) AS n_types
         |FROM g GROUP BY user_id, sid
         |ORDER BY user_id, s_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          Det.centSum(col("value"), 2).as("total_value"),
          countDistinct(col("event_type")).as("n_types"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .select(col("user_id"),
          col("session_window.start").as("s_start"),
          (unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts")))
            .as("duration_s"),
          col("n_events"), col("total_value"), col("n_types"))
        .orderBy("user_id", "s_start")
    },
    QueryDef.sql(
      "j9_asof_join",
      // as-of join: for each purchase, the latest view by the same user at
      // or before the purchase. Implemented as the scalable union+window
      // pattern (single shuffle on user_id, no range cross join); the
      // oracle is the identical rewrite rather than DuckDB's ASOF JOIN so
      // that equal-timestamp ties resolve identically (by event_id).
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS uts, 0 AS kind, event_id,
        |         event_id AS view_id
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), 1, event_id, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT user_id, kind, event_id,
        |  last_value(view_id IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY uts, kind, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_id
        |  FROM u)
        |SELECT event_id AS purchase_id, asof_view_id
        |FROM w WHERE kind = 1 ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("uts"), lit(0).as("kind"),
          col("event_id"), col("event_id").as("view_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("uts"), lit(1).as("kind"),
          col("event_id"), lit(null).cast("long").as("view_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("uts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purchases)
        .withColumn("asof_view_id", last(col("view_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id").as("purchase_id"), col("asof_view_id"))
        .orderBy("purchase_id")
    },
    QueryDef.sql(
      "j9b_asof_forward",
      // forward as-of: for each purchase, the EARLIEST view by the same
      // user at or after it (time-to-next-engagement attribution). Same
      // union+window single-shuffle pattern as j9, with the frame looking
      // forward; purchases sort before equal-timestamp views (kind 0 < 1)
      // so an exactly-simultaneous view still counts as "after".
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS uts, 1 AS kind, event_id,
        |         event_id AS view_id
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, CAST(ts AS TIMESTAMP), 0, event_id, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT user_id, kind, event_id,
        |  first_value(view_id IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY uts, kind, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS next_view_id
        |  FROM u)
        |SELECT event_id AS purchase_id, next_view_id
        |FROM w WHERE kind = 0 ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("uts"), lit(1).as("kind"),
          col("event_id"), col("event_id").as("view_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("uts"), lit(0).as("kind"),
          col("event_id"), lit(null).cast("long").as("view_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("uts"), col("kind"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      views.unionByName(purchases)
        .withColumn("next_view_id",
          first(col("view_id"), ignoreNulls = true).over(w))
        .filter(col("kind") === 0)
        .select(col("event_id").as("purchase_id"), col("next_view_id"))
        .orderBy("purchase_id")
    },
    QueryDef.sql(
      "t8_stream_stream_join",
      // Batch twin of StreamingOps.streamStreamJoin (T8): each purchase
      // joined to the same user's views within the preceding 30 minutes.
      // withWatermark is a no-op under batch execution, so this runs the
      // EXACT production join (same code path) and the oracle checks its
      // event-time-bound semantics; state eviction is asserted separately
      // in StreamingSpec.
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |       p.user_id AS user_id
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      graft.streaming.StreamingOps.streamStreamJoin(
          views = e.filter(col("event_type") === "view"),
          purchases = e.filter(col("event_type") === "purchase"))
        .orderBy("purchase_id", "view_id")
    },
    QueryDef.sql(
      "t8b_stream_stream_left_join",
      // Batch twin of the OUTER interval join: purchases with no qualifying
      // view survive null-padded. NULLS FIRST pinned explicitly — the
      // engines' default null sort orders differ.
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |       p.user_id AS user_id
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id, view_id NULLS FIRST""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      graft.streaming.StreamingOps.streamStreamJoinLeftOuter(
          views = e.filter(col("event_type") === "view"),
          purchases = e.filter(col("event_type") === "purchase"))
        .orderBy(col("purchase_id"), col("view_id").asc_nulls_first)
    },
    QueryDef.sql(
      "t8c_stream_stream_full_join",
      // Batch twin of the FULL OUTER interval join: both unconverted views
      // and view-less purchases survive null-padded. Runs the EXACT
      // production streaming join in batch mode.
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
        |           FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS vts
        |           FROM events WHERE event_type = 'view')
        |SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |       coalesce(p.user_id, v.user_id) AS user_id
        |FROM p FULL JOIN v ON p.user_id = v.user_id
        |  AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL 30 MINUTE
        |ORDER BY purchase_id NULLS FIRST, view_id NULLS FIRST""".stripMargin) {
      (s, d) =>
        val e = Tables.events(s, d)
        graft.streaming.StreamingOps.streamStreamJoinFullOuter(
            views = e.filter(col("event_type") === "view"),
            purchases = e.filter(col("event_type") === "purchase"))
          .orderBy(col("purchase_id").asc_nulls_first,
            col("view_id").asc_nulls_first)
    }
  )
}
