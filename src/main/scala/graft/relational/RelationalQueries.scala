package graft.relational

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface (SURVEY.md §2.C): scans, filters, joins,
  * aggregations, windows, sorts, set ops, scalar functions — each as a
  * canonical query over the driver corpus paired with its DuckDB oracle SQL.
  *
  * Scale posture: filters/projections stay adjacent to the scan so Catalyst
  * pushes them into parquet; dimension joins are `broadcast()` hinted; fact
  * joins shuffle on their join keys and rely on AQE for skew. Aggregates on
  * fixed-scale decimals use exact integer-cent sums ([[graft.Det]]) so the
  * result is bit-identical regardless of partitioning/order — required for
  * the oracle hash compare, and a 100-TB-safe idiom (no FP drift).
  */
object RelationalQueries {
  import Det.{centSum, duckCentSum}

  /** Max rows for which an unpartitioned `Window.orderBy` is acceptable: one
    * task sorting ~4M narrow rows is a few hundred MB. Every registered
    * query using a global window gates on this and falls back to the
    * two-pass `globalNtilePctRank` kernel above the bound.
    */
  val GlobalWindowMaxRows: Long = 4L * 1000 * 1000

  /** Distributed exact global ntile(4)/percent_rank over
    * (c_acctbal, c_custkey): range-partitioned sort (parallel exchange) +
    * zipWithIndex (one count job for partition offsets, then a narrow map),
    * so no single-partition stage anywhere. ntile/percent_rank are then pure
    * arithmetic on (rank, N). The sort key includes the unique c_custkey, so
    * ranks are tie-free and deterministic.
    */
  private[relational] def globalNtilePctRank(s: SparkSession,
      base: DataFrame, n: Long): DataFrame = {
    import s.implicits._
    val ranked = base
      .repartitionByRange(col("c_acctbal"), col("c_custkey"))
      .sortWithinPartitions("c_acctbal", "c_custkey")
      .select("c_custkey")
      .rdd.zipWithIndex()
      .map { case (row, i) => (row.getLong(0), i + 1) }
      .toDF("c_custkey", "rank")
    // exact ntile(k): first N%k buckets take ceil(N/k) rows, the rest floor
    val k = 4L
    val q = lit(n / k)
    val rem = lit(n % k)
    val big = rem * (q + 1) // rows covered by the size-(q+1) buckets
    // floor() because Spark's `/` on longs is double division
    val quartile = when(col("rank") <= big,
        floor((col("rank") - 1) / (q + 1)))
      .otherwise(rem + floor((col("rank") - big - 1) / q)) + 1
    ranked.select(col("c_custkey"),
        quartile.cast("int").as("quartile"),
        // max(n-1, 1): a single-row input has rank-1 = 0, and dividing by 1
        // yields percent_rank's defined value 0.0 instead of 0/0 = NaN
        Det.portableRound(
          (col("rank") - 1).cast("double") / lit(math.max(n - 1, 1).toDouble),
          6).as("pr"))
      .orderBy("c_custkey")
  }

  /** DuckDB mirror of the KMV sketch at sketch size `k`: the sketch hashes
    * with the repo's portable md5-60-bit hash, so its EXACT estimate is
    * reproducible — per group, take the k smallest hashes of the distinct
    * keys and apply the estimator (k-1)/(kth-min / 2^60); exact count
    * below k.
    */
  private def kmvOracleSql(k: Int): String =
    s"""WITH h AS (
       |  SELECT DISTINCT l_returnflag,
       |    CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)),
       |      1, 15)) AS BIGINT) AS hv
       |  FROM lineitem WHERE l_partkey IS NOT NULL),
       |r AS (
       |  SELECT l_returnflag, hv,
       |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
       |    count(*) OVER (PARTITION BY l_returnflag) AS nd
       |  FROM h)
       |SELECT l_returnflag,
       |  CASE WHEN nd < $k THEN nd
       |       ELSE CAST(floor(CAST(${k - 1} AS DOUBLE) /
       |         (CAST(hv AS DOUBLE) / CAST(1152921504606846976 AS DOUBLE))
       |         + 0.5) AS BIGINT) END AS kmv_parts
       |FROM r WHERE rn = least(nd, $k)
       |ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------- scans (S)
    QueryDef.sql(
      "s1_scan_project",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },
    QueryDef.sql(
      "s4_local_rows",
      """SELECT * FROM (VALUES (1, 'urgent'), (2, 'high'), (3, 'normal'))
        |AS t(prio_id, prio_name) ORDER BY prio_id""".stripMargin) { (s, _) =>
      import s.implicits._
      Seq((1, "urgent"), (2, "high"), (3, "normal"))
        .toDF("prio_id", "prio_name").orderBy("prio_id")
    },
    // S8/S9 JSON + CSV sources, proven by ROUND-TRIP: export a table
    // through the format, read it back with an EXPLICIT schema (inference
    // is sample-order-dependent — never at scale), and aggregate; the
    // oracle computes the same aggregate off the parquet directly, so any
    // value corruption in the writer/reader path (timestamp formatting,
    // quoting, null encoding, float repr) hash-misses. Exact cent sums
    // make the comparison byte-stable. Temp dir per run — the engine is
    // the system under test, not the tmpfs.
    QueryDef.sql(
      "s8_json_roundtrip",
      s"""SELECT o_orderpriority, count(*) AS n,
         |  ${Det.duckCentSum("o_totalprice", 2)} AS total
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_json_rt").toString
      val src = Tables.orders(s, d)
      src.write.mode("overwrite").json(tmp)
      s.read.schema(src.schema).json(tmp)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Det.centSum(col("o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    QueryDef.sql(
      "s10_orc_roundtrip",
      s"""SELECT o_orderpriority, count(*) AS n,
         |  ${Det.duckCentSum("o_totalprice", 2)} AS total,
         |  min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // ORC is Spark's second native columnar format (predicate pushdown,
      // vectorized reader, same writer semantics as parquet) — the same
      // round-trip proof as S8/S9: any value corruption in the ORC
      // writer/reader (timestamp encoding, decimal repr) hash-misses
      // against the parquet-derived oracle. min/max over the date column
      // exercises the type the two formats encode most differently.
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_orc_rt").toString
      val src = Tables.orders(s, d)
      src.write.mode("overwrite").orc(tmp)
      s.read.schema(src.schema).orc(tmp)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Det.centSum(col("o_totalprice"), 2).as("total"),
          min(col("o_orderdate")).as("first_dt"),
          max(col("o_orderdate")).as("last_dt"))
        .orderBy("o_orderpriority")
    },
    QueryDef.sql(
      "s9_csv_roundtrip",
      s"""SELECT o_orderstatus, count(*) AS n,
         |  ${Det.duckCentSum("o_totalprice", 2)} AS total
         |FROM orders GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_csv_rt").toString
      val src = Tables.orders(s, d)
      src.write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema(src.schema).option("header", "true").csv(tmp)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          Det.centSum(col("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    },
    // ------------------------------------------------ filters/predicates (P)
    QueryDef.sql(
      "p2_filter_eq",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    QueryDef.sql(
      "p3_filter_flag",
      """SELECT l_orderkey, l_linenumber, (l_returnflag = 'R') AS is_return
        |FROM lineitem WHERE (l_returnflag = 'R') = TRUE
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .withColumn("is_return", col("l_returnflag") === "R")
        .filter(col("is_return"))
        .select("l_orderkey", "l_linenumber", "is_return")
        .orderBy("l_orderkey", "l_linenumber")
    },
    QueryDef.sql(
      "p4_filter_compound",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE (l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24)
        |   OR (NOT (l_returnflag = 'N') AND l_tax > 0.06)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.filter(
          (col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24) ||
            (!(col("l_returnflag") === "N") && col("l_tax") > 0.06))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    },
    QueryDef.sql(
      "p5_null_semantics",
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        |  (nullif(o_orderstatus, 'O') IS NULL) AS was_open
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_or_open"),
        nullif(col("o_orderstatus"), lit("O")).isNull.as("was_open"))
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "p6_like_regexp",
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%blue%' OR regexp_matches(p_name, '^small .*t$')
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%blue%") ||
          col("p_name").rlike("^small .*t$"))
        .select("p_partkey", "p_name").orderBy("p_partkey")
    },
    QueryDef.sql(
      "p7_in_list",
      """SELECT n_nationkey, n_name FROM nation
        |WHERE n_name IN ('NATION_1', 'NATION_3', 'NATION_17')
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_3", "NATION_17"))
        .select("n_nationkey", "n_name").orderBy("n_nationkey")
    },
    // ----------------------------------------------------------- joins (J)
    QueryDef.sql(
      "j1_join_inner",
      """SELECT o_orderkey, c_name, o_totalprice FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "j2_join_broadcast_dims",
      s"""SELECT r_name, count(*) AS n_cust,
         |  ${duckCentSum("c_acctbal", 2)} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          centSum(col("c_acctbal"), 2).as("sum_bal"))
        .orderBy("r_name")
    },
    QueryDef.sql(
      "j3_join_fact_fact",
      s"""SELECT o_orderpriority,
         |  ${duckCentSum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            centSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
    },
    QueryDef.sql(
      "j4_join_left_outer",
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")
    },
    QueryDef.sql(
      "j5_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    QueryDef.sql(
      "j6_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    },
    QueryDef.sql(
      "j7_join_cross",
      """SELECT r_name, seg FROM region
        |CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) t
        |ORDER BY r_name, seg""".stripMargin) { (s, d) =>
      Tables.region(s, d).select("r_name")
        .crossJoin(
          Tables.customer(s, d).select(col("c_mktsegment").as("seg")).distinct())
        .orderBy("r_name", "seg")
    },
    QueryDef.sql(
      "j8_join_range",
      """SELECT bucket, count(*) AS n_parts FROM part
        |JOIN (VALUES ('small', 1, 16), ('medium', 17, 33), ('large', 34, 50))
        |  AS b(bucket, lo, hi)
        |ON p_size >= lo AND p_size <= hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      import s.implicits._
      val buckets = Seq(("small", 1, 16), ("medium", 17, 33), ("large", 34, 50))
        .toDF("bucket", "lo", "hi")
      // non-equi range join: small side broadcast => BroadcastNestedLoopJoin
      Tables.part(s, d)
        .join(broadcast(buckets),
          col("p_size") >= col("lo") && col("p_size") <= col("hi"))
        .groupBy("bucket").agg(count(lit(1)).as("n_parts"))
        .orderBy("bucket")
    },
    QueryDef.sql(
      "j8b_range_join_banded",
      // fact-fact interval×point range join in its SCALABLE form: j8's
      // BroadcastNestedLoopJoin needs one broadcastable side; here neither
      // side is assumed small, so each interval explodes to the month bands
      // it covers and the join becomes a shuffled EQUI-join on the band key
      // plus a residual range filter — every day lands in exactly one band,
      // so no distinct is needed and the pattern holds at any scale
      """WITH li_daily AS (
        |  SELECT l_shipdate AS d, count(*) AS n FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey, o_orderdate,
        |    CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS o_end
        |  FROM orders
        |  WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31')
        |SELECT o.o_orderkey, CAST(coalesce(sum(n), 0) AS BIGINT) AS n_shipped
        |FROM o LEFT JOIN li_daily
        |  ON d >= o_orderdate AND d <= o_end
        |GROUP BY o.o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val days = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("d")).agg(count(lit(1)).as("n"))
        .withColumn("m", trunc(col("d"), "MM"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate").between("1995-01-01", "1995-03-31"))
        .select(col("o_orderkey"), col("o_orderdate"),
          date_add(col("o_orderdate"), 90).as("o_end"))
      val banded = o.withColumn("m", explode(expr(
        "sequence(trunc(o_orderdate, 'MM'), trunc(o_end, 'MM')," +
          " interval 1 month)")))
      val counts = banded.join(days, Seq("m"))
        .filter(col("d") >= col("o_orderdate") && col("d") <= col("o_end"))
        .groupBy("o_orderkey").agg(sum("n").as("n_shipped"))
      o.select("o_orderkey")
        .join(counts, Seq("o_orderkey"), "left_outer")
        .select(col("o_orderkey"),
          coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "j10_self_join",
      """SELECT a.n_name AS nation_a, b.n_name AS nation_b
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
        |ORDER BY nation_a, nation_b""".stripMargin) { (s, d) =>
      val a = Tables.nation(s, d).select(
        col("n_regionkey"), col("n_name").as("nation_a"))
      val b = Tables.nation(s, d).select(
        col("n_regionkey").as("rk_b"), col("n_name").as("nation_b"))
      a.join(b, col("n_regionkey") === col("rk_b") &&
          col("nation_a") < col("nation_b"))
        .select("nation_a", "nation_b").orderBy("nation_a", "nation_b")
    },
    QueryDef.sql(
      "j13_null_safe_join",
      // null-safe equality (<=>): NULL keys match each OTHER instead of
      // nothing — the join form dimension backfills need when the key is
      // optional
      """SELECT a.n_nationkey AS a_key, b.n_nationkey AS b_key
        |FROM (SELECT n_nationkey, nullif(n_regionkey, 0) AS rk FROM nation) a
        |JOIN (SELECT n_nationkey, nullif(n_regionkey, 0) AS rk FROM nation) b
        |  ON a.rk IS NOT DISTINCT FROM b.rk
        |ORDER BY a_key, b_key""".stripMargin) { (s, d) =>
      val a = Tables.nation(s, d).select(col("n_nationkey").as("a_key"),
        expr("nullif(n_regionkey, 0)").as("a_rk"))
      val b = Tables.nation(s, d).select(col("n_nationkey").as("b_key"),
        expr("nullif(n_regionkey, 0)").as("b_rk"))
      a.join(b, col("a_rk") <=> col("b_rk"))
        .select("a_key", "b_key").orderBy("a_key", "b_key")
    },
    QueryDef.sql(
      "j14_lateral_topk",
      // LATERAL correlated derived table — the "top-k related rows per
      // driving row" SQL surface. Catalyst decorrelates the LATERAL into
      // a ranked window join (DomainJoin rewrite), so despite the
      // per-row subquery syntax the physical plan is one shuffle + one
      // partitioned rank — no nested-loop re-execution per customer.
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(
          """SELECT c_custkey, t.o_orderkey, t.o_totalprice
            |FROM customer JOIN LATERAL (
            |  SELECT o_orderkey, o_totalprice FROM orders
            |  WHERE o_custkey = c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
            |ORDER BY c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
    },
    // J15 fuzzy (edit-distance) self-join — the ED-Join shape (Xiao et
    // al. 2008, public): q-gram posting lists generate candidates, the
    // COUNT FILTER prunes them (any pair within edit distance d shares at
    // least max(|a|,|b|) − q + 1 − d·q grams — names here are ≥7 chars,
    // so the bound is positive), and exact levenshtein verifies only the
    // survivors. The bound holds for gram MULTISETS, so shared is the
    // true multiset intersection: per-name gram counts (groupBy name,
    // gram — repeats like 'aa' in 'aaa' keep their multiplicity), join
    // on the gram key, Σ least(cnt_a, cnt_b) per pair. Recall is then
    // complete for ANY input, including names with repeated grams that
    // a distinct-gram count would wrongly prune. The oracle states the
    // intended semantics as the all-pairs form — sound at |distinct
    // names| scale; the Spark side is the sub-quadratic plan you'd run
    // when the name column has millions of distinct values (posting
    // lists shuffle on the gram key; production adds ED-Join's
    // positional/prefix filters to thin hot grams further).
    QueryDef.sql(
      "j15_fuzzy_join",
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      val q = 2
      val maxDist = 2
      val names = Tables.part(s, d)
        .select(col("p_name").as("name")).distinct()
      val grams = names.select(col("name"), explode(expr(
          s"transform(sequence(0, length(name) - $q)," +
            s" i -> substring(name, i + 1, $q))")).as("g"))
        .groupBy("name", "g").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // both sides of the candidate join
      val cand = grams
        .select(col("name").as("name_a"), col("g"), col("cnt").as("cnt_a"))
        .join(grams.select(col("name").as("name_b"), col("g"),
          col("cnt").as("cnt_b")), "g")
        .filter(col("name_a") < col("name_b"))
        .groupBy("name_a", "name_b")
        // multiset intersection: Σ_g min(cnt_a, cnt_b)
        .agg(sum(least(col("cnt_a"), col("cnt_b"))).as("shared"))
        // count filter: true d≤2 pairs share ≥ max(len)−q+1−d·q grams
        .filter(col("shared") >= greatest(length(col("name_a")),
          length(col("name_b"))) - lit(q - 1 + maxDist * q))
      cand
        .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("int").as("dist"))
        .orderBy("name_a", "name_b")
    },
    // ---------------------------------------------------- aggregations (G)
    QueryDef.sql(
      "g1_group_nest",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) {
      (s, d) =>
        // collect_list is shuffle-order-nondeterministic; sort the array
        // before serializing (SURVEY.md §7.3 deterministic aggregation).
        Tables.nation(s, d).groupBy("n_regionkey")
          .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"))
          .orderBy("n_regionkey")
    },
    QueryDef.sql(
      "g2_agg_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  ${duckCentSum("l_extendedprice", 2)} AS sum_base_price,
         |  ${duckCentSum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |  ${duckCentSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
         |  sum(l_quantity) / count(*) AS avg_qty,
         |  ${duckCentSum("l_extendedprice", 2)} / count(*) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          centSum(col("l_extendedprice"), 2).as("sum_base_price"),
          centSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          centSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (centSum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    QueryDef.sql(
      "g3_count_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"))
          .orderBy("l_returnflag")
    },
    // HLL sketch differs engine-to-engine by design => rows-only check.
    // G4 approximate distinct: the oracle-graded face is the KMV sketch
    // below (engine-portable hash order statistics — DuckDB reproduces it
    // exactly); Spark's own HLL (`approx_count_distinct`) stays available
    // and is regression-pinned by G4SnapshotSpec, but is not a registered
    // query: HLL sketches differ engine-to-engine by design, and a
    // rows-only gate would hide drift the snapshot spec catches.
    QueryDef.sql("g4b_kmv_sketch", kmvOracleSql(1024)) { (s, d) =>
      // custom TypedImperativeAggregate KMV sketch, partial+final mergeable
      graft.functions.KmvSketch.register(s)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, graft_kmv_distinct(l_partkey) AS kmv_parts
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },
    // production-knob twin (round-7 directive 3): the sketch at k=4096
    // (rel. std error ≈ 1.6%, 32 KB buffer) through the same oracle —
    // estimator parity is k-independent because both engines derive the
    // estimate from the same portable kth-min hash
    QueryDef.sql("g4b_prod_knobs", kmvOracleSql(4096)) { (s, d) =>
      graft.functions.KmvSketch.register(s, "graft_kmv_distinct_4096", 4096)
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag,
          |  graft_kmv_distinct_4096(l_partkey) AS kmv_parts
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },
    QueryDef.sql(
      "g6_rollup",
      """SELECT r_name, n_name, count(*) AS n_cust FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) {
      (s, d) =>
        // SQL path: the DataFrame rollup-over-join form trips Spark 4.1's
        // DetectAmbiguousSelfJoin false positive; the SQL analyzer does not
        // attach the dataset-id metadata that rule keys on.
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.nation(s, d).createOrReplaceTempView("nation")
        Tables.region(s, d).createOrReplaceTempView("region")
        s.sql(
          """SELECT r_name, n_name, count(*) AS n_cust
            |FROM customer
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY ROLLUP (r_name, n_name)
            |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    },
    QueryDef.sql(
      "g6b_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderstatus, o_orderpriority, count(*) AS n
            |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
            |ORDER BY o_orderstatus ASC NULLS FIRST,
            |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    },
    QueryDef.sql(
      "g6c_grouping_sets",
      // explicit GROUPING SETS with grouping_id, the general form rollup and
      // cube specialize; the id disambiguates "NULL key" from "aggregated
      // over this key"
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
        |    AS INT) AS gid,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
          |    AS INT) AS gid,
          |  count(*) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
          |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    },
    QueryDef.sql(
      "g7_string_agg",
      """SELECT p_brand, string_agg(DISTINCT p_type, '|' ORDER BY p_type) AS types
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.part(s, d).groupBy("p_brand")
        .agg(array_join(array_sort(collect_set(col("p_type"))), "|")
          .as("types"))
        .orderBy("p_brand")
    },
    QueryDef.sql(
      "g8_max_by",
      """SELECT c_nationkey,
        |  arg_max(c_name, c_custkey) AS latest_cust,
        |  arg_min(c_name, c_custkey) AS first_cust
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d).groupBy("c_nationkey")
          .agg(max_by(col("c_name"), col("c_custkey")).as("latest_cust"),
            min_by(col("c_name"), col("c_custkey")).as("first_cust"))
          .orderBy("c_nationkey")
    },
    QueryDef.sql(
      "g10_pivot",
      // pivot = conditional aggregation; the oracle states it that way so
      // it stays portable (DuckDB PIVOT syntax differs)
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "5-LOW"))
          .agg(count(lit(1)))
          .select(col("o_orderstatus"),
            coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("high"),
            coalesce(col("5-LOW"), lit(0L)).as("low"))
          .orderBy("o_orderstatus")
    },
    QueryDef.sql(
      "g11_unpivot",
      // unpivot = stack(): wide per-status counts back to (status, metric,
      // n) rows; stated as UNION ALL so the oracle stays portable
      """WITH w AS (
        |  SELECT o_orderstatus,
        |    count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |    count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, metric, n FROM (
        |  SELECT o_orderstatus, 'urgent' AS metric, urgent AS n FROM w
        |  UNION ALL
        |  SELECT o_orderstatus, 'low', low FROM w)
        |ORDER BY o_orderstatus, metric""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("5-LOW"), lit(0L)).as("low"))
        .selectExpr("o_orderstatus",
          "stack(2, 'urgent', urgent, 'low', low) AS (metric, n)")
        .orderBy("o_orderstatus", "metric")
    },
    QueryDef.sql(
      "w8_locf_forward_fill",
      // last-observation-carried-forward: each event carries the user's most
      // recent purchase value (gap filling via IGNORE NULLS) — the classic
      // time-series imputation step
      """SELECT event_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"),
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w).as("locf_value"))
        .orderBy("event_id")
    },
    QueryDef.sql(
      "w9_running_distinct",
      // running COUNT(DISTINCT event_type) per user — no engine supports
      // DISTINCT aggregates over a window frame directly, so it rewrites as
      // first-occurrence flag (rank within (user, type) = 1) + running sum:
      // two windows, both PARTITIONED by user, nothing global
      """WITH f AS (SELECT event_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) = 1
        |    THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS n_distinct_types
        |FROM f ORDER BY event_id""".stripMargin) { (s, d) =>
      val wf = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      val wr = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("first_seen",
          when(row_number().over(wf) === 1, 1).otherwise(0))
        .select(col("event_id"), col("user_id"),
          sum("first_seen").over(wr).cast("int").as("n_distinct_types"))
        .orderBy("event_id")
    },
    QueryDef.sql(
      "f18_url_parse",
      // URL component extraction (host/path/query param). The URL is
      // constructed from row data so the op is exercised deterministically;
      // Spark's parse_url is mirrored by anchored regexps in the oracle
      """WITH u AS (SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/doc-'
        |      || CAST(doc_id AS VARCHAR) || '?q=' || CAST(n_chars AS VARCHAR)
        |      AS url
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, 'q=([^&]*)', 1) AS q
        |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/doc-"), col("doc_id").cast("string"),
            lit("?q="), col("n_chars").cast("string")).as("url"))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'q')").as("q"))
        .orderBy("doc_id")
    },
    QueryDef.sql(
      "f19_bit_ops",
      // bitwise scalar + aggregate surface: popcount per key and the
      // AND/OR/XOR folds per group — order-independent integer folds, the
      // same mergeable-aggregate shape as sum (partial+final, no sort)
      """SELECT o_orderpriority,
        |  CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS total_pop,
        |  CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
        |  CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
        |  CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(sum(bit_count(col("o_orderkey")).cast("long")).as("total_pop"),
          expr("bit_and(o_orderkey)").as("key_and"),
          expr("bit_or(o_orderkey)").as("key_or"),
          expr("bit_xor(o_orderkey)").as("key_xor"))
        .orderBy("o_orderpriority")
    },
    QueryDef.sql(
      "f20_try_functions",
      // ANSI-safe error-handling scalar surface: under ANSI SQL semantics
      // a bad cast / division by zero / out-of-range index ABORTS the
      // query; the try_* family yields NULL instead — the form a lake
      // pipeline needs when one malformed row must not kill a 100 TB job.
      // Restricted to forms both engines can express (overflow-sensitive
      // try_add/try_multiply have no DuckDB mirror).
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |       ELSE o_totalprice / CAST(o_orderkey % 7 AS DOUBLE) END
        |    AS safe_div,
        |  TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
        |  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS ok_cast,
        |  string_split(o_orderpriority, '-')[3] AS oob_elem
        |FROM orders WHERE o_orderkey < 200
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          expr("try_divide(o_totalprice, CAST(o_orderkey % 7 AS DOUBLE))")
            .as("safe_div"),
          expr("try_cast(o_orderpriority AS INT)").as("bad_cast"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
            .as("ok_cast"),
          expr("try_element_at(split(o_orderpriority, '-'), 3)")
            .as("oob_elem"))
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "f21_variant",
      // Spark 4's VARIANT type: parse_json once into the binary variant
      // encoding, then typed variant_get path extraction — the
      // semi-structured scale path (shredded access, no per-query string
      // re-parsing the way get_json_object does). DuckDB mirrors the
      // SEMANTICS via its JSON type; the values compare as extracted
      // primitives.
      """SELECT event_type,
        |  CAST(sum(CAST(props ->> '$.k' AS INTEGER)) AS BIGINT) AS sum_k,
        |  CAST(count(*) FILTER (CAST(props ->> '$.k' AS INTEGER) > 50)
        |    AS BIGINT) AS n_big
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
          .groupBy("event_type")
          .agg(sum(col("k").cast("long")).as("sum_k"),
            count(when(col("k") > 50, 1)).as("n_big"))
          .orderBy("event_type")
    },
    QueryDef.sql(
      "g14_filtered_aggs",
      // FILTER-clause conditional aggregation + boolean aggregates: one
      // pass computes every conditional slice (no self-joins, no CASE
      // pyramids) — partial+final mergeable like any sum
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (o_totalprice > 150000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderstatus = 'P') AS any_pending
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_totalprice") > 150000, 1)).as("n_big"),
          expr("bool_and(o_totalprice > 0)").as("all_positive"),
          expr("bool_or(o_orderstatus = 'P')").as("any_pending"))
        .orderBy("o_orderpriority")
    },
    QueryDef.sql(
      "g15_exact_median",
      // EXACT grouped median WITHOUT sorting rows: fixed-scale money
      // quantizes to integer cents, so the kernel aggregates a
      // (group, value) HISTOGRAM — cardinality bounded by the value
      // DOMAIN, not the row count — and selects the middle order
      // statistic(s) from per-group cumulative counts over the
      // histogram. At 100 TB this shuffles |distinct values| rows where
      // percentile/sort-based medians shuffle-and-sort ALL rows; the
      // per-group window runs over the compressed histogram only. The
      // (v1+v2)/2 average of the two middles is exact integer-cents
      // arithmetic; DuckDB's independent native median() agrees inside
      // the compare's 9-digit canon.
      """SELECT o_orderpriority AS g, median(o_totalprice) AS med
        |FROM orders GROUP BY o_orderpriority ORDER BY g""".stripMargin) {
      (s, d) =>
        val cents = Tables.orders(s, d)
          .select(col("o_orderpriority").as("g"),
            round(col("o_totalprice") * 100, 0).cast("long").as("v"))
        val hist = cents.groupBy("g", "v").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("hi", sum("c").over(w))
          .withColumn("lo", col("hi") - col("c") + 1)
          .join(cents.groupBy("g").agg(count(lit(1)).as("n")), "g")
        // 1-indexed middle positions: equal when n is odd (the bare `/`
        // on long columns is DOUBLE division — floor back to a position)
        val m1 = ((col("n") + 1) / 2).cast("long")
        val m2 = ((col("n") + 2) / 2).cast("long")
        cum.groupBy("g")
          .agg(((sum(when(col("lo") <= m1 && m1 <= col("hi"), col("v"))) +
            sum(when(col("lo") <= m2 && m2 <= col("hi"), col("v"))))
            .cast("double") / 200.0).as("med"))
          .orderBy("g")
    },
    QueryDef.sql(
      "g16_grouped_mode",
      // EXACT grouped mode with a DETERMINISTIC tie-break (highest count,
      // then smallest value) — native mode() is non-deterministic on ties
      // in both engines, so the kernel selects from the same (group,
      // value) HISTOGRAM g15 uses: cardinality bounded by the value
      // domain (l_quantity has 50 distinct values), so the per-group
      // ranking window runs over ≤|domain| rows per group no matter how
      // many source rows exist. At 100 TB the only row-count-sized work
      // is the partial+final histogram aggregate.
      """WITH h AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v,
        |         count(*) AS c
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT g, v AS mode_v, CAST(c AS BIGINT) AS n_rows
        |FROM (SELECT g, v, c,
        |        row_number() OVER (PARTITION BY g
        |                           ORDER BY c DESC, v ASC) AS rn
        |      FROM h)
        |WHERE rn = 1 ORDER BY g""".stripMargin) { (s, d) =>
      val hist = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("long").as("v"))
        .groupBy("g", "v").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("g")
        .orderBy(col("c").desc, col("v").asc)
      hist.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("g"), col("v").as("mode_v"), col("c").as("n_rows"))
        .orderBy("g")
    },

    // G17 retention cohorts (new r9): the classic product-analytics
    // rollup — users grouped by first-seen day, activity counted per
    // 7-day offset from THEIR cohort day, retention as the exact ratio
    // to cohort size. All shuffles key on user_id or the (cohort, offset)
    // pair — linear at any event volume; the cohort-size side is
    // |cohort days| rows → broadcast. The week offset is
    // floor(daydiff / 7.0): one identical IEEE division + floor in both
    // engines; the retention ratio divides exact integers once.
    QueryDef.sql(
      "g17_retention_cohorts",
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events),
        |first AS (
        |  SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT e.user_id, cohort_day,
        |    CAST(floor(date_diff('day', cohort_day, day) / 7.0) AS INT)
        |      AS week_offset
        |  FROM e JOIN first ON e.user_id = first.user_id),
        |sz AS (SELECT cohort_day, count(*) AS cohort_n
        |       FROM first GROUP BY cohort_day)
        |SELECT act.cohort_day, week_offset,
        |  count(*) AS n_active,
        |  CAST(count(*) AS DOUBLE) / cohort_n AS retention
        |FROM act JOIN sz ON act.cohort_day = sz.cohort_day
        |GROUP BY act.cohort_day, week_offset, cohort_n
        |ORDER BY act.cohort_day, week_offset""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      // consumed twice (activity join + cohort sizes) and |users| rows —
      // materialize once instead of re-scanning events per consumer
      val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
        .localCheckpoint()
      val act = e.join(first, "user_id")
        .select(col("user_id"), col("cohort_day"),
          floor(datediff(col("day"), col("cohort_day")) / lit(7.0))
            .cast("int").as("week_offset"))
        .distinct()
      val sz = first.groupBy("cohort_day")
        .agg(count(lit(1)).as("cohort_n"))
      act.groupBy("cohort_day", "week_offset")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sz), "cohort_day")
        .select(col("cohort_day"), col("week_offset"), col("n_active"),
          (col("n_active").cast("double") / col("cohort_n"))
            .as("retention"))
        .orderBy("cohort_day", "week_offset")
    },
    // G19 DDSketch quantiles (new r9): the mergeable relative-error
    // quantile sketch of Masson et al. 2019 (VLDB) — the shape production
    // latency/price monitoring runs at 100 TB, where exact per-group
    // percentiles (g15's full value histogram) or even sampling (g13) are
    // the wrong cost envelope. Values land in log-γ bins (γ = 101/99 →
    // 1% relative error); the sketch IS the per-(group, bin) count table:
    // merges are count sums (order-free, exactly mergeable across
    // partitions/days), quantile lookup walks the ≤~250-bin cumulative
    // histogram, never the data. Engine-portable by the ln discipline:
    // bin = ceil(ln(x)/ln γ) over bit-identical ln, rank arithmetic is
    // exact integers, and the γ-midpoint estimate micro-rounds away any
    // last-ulp exp() divergence. QuantileSketchSpec asserts the 1%
    // relative-error guarantee against exact percentiles.
    QueryDef.sql(
      "g19_ddsketch_quantiles",
      s"""WITH b AS (
         |  SELECT l_returnflag AS flag,
         |    CAST(ceil(ln(l_extendedprice) /
         |      ln(CAST(101 AS DOUBLE) / 99)) AS BIGINT) AS bin
         |  FROM lineitem WHERE l_extendedprice > 0),
         |h AS (SELECT flag, bin, CAST(count(*) AS BIGINT) AS c
         |      FROM b GROUP BY 1, 2),
         |n AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
         |cum AS (SELECT flag, bin, c,
         |    CAST(sum(c) OVER (PARTITION BY flag ORDER BY bin) AS BIGINT)
         |      AS cum
         |  FROM h),
         |ranks AS (SELECT flag, n, q,
         |    CAST(floor(q * (n - 1)) AS BIGINT) + 1 AS rk
         |  FROM n CROSS JOIN (SELECT unnest(
         |    CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q)),
         |sel AS (SELECT r.flag, r.q, min(c.bin) AS bin, max(r.n) AS n
         |  FROM ranks r JOIN cum c ON c.flag = r.flag AND c.cum >= r.rk
         |  GROUP BY r.flag, r.q)
         |SELECT flag, q, bin,
         |  ${Det.duckPortableRound(
             "exp(bin * ln(CAST(101 AS DOUBLE) / 99)) * 0.99", 4)} AS est,
         |  n
         |FROM sel ORDER BY flag, q""".stripMargin) { (s, d) =>
      import s.implicits._
      val lnG = log(lit(101.0) / lit(99.0))
      val b = Tables.lineitem(s, d).filter(col("l_extendedprice") > 0)
        .select(col("l_returnflag").as("flag"),
          ceil(log(col("l_extendedprice")) / lnG).cast("long").as("bin"))
      val h = b.groupBy("flag", "bin").agg(count(lit(1)).as("c"))
      val n = h.groupBy("flag").agg(sum("c").as("n"))
      val cum = h.withColumn("cum",
        sum("c").over(Window.partitionBy("flag").orderBy("bin")))
      val ranks = n.crossJoin(broadcast(Seq(0.5, 0.9, 0.99).toDF("q")))
        .withColumn("rk",
          floor(col("q") * (col("n") - 1)).cast("long") + 1)
      val sel = ranks.join(cum, Seq("flag"))
        .filter(col("cum") >= col("rk"))
        .groupBy("flag", "q")
        .agg(min("bin").as("bin"), max("n").as("n"))
      sel.select(col("flag"), col("q"), col("bin"),
        Det.portableRound(exp(col("bin") * lnG) * lit(0.99), 4).as("est"),
        col("n"))
        .orderBy("flag", "q")
    },

    // G18 A/B experiment readout (new r9): the two-proportion z-test a
    // product pipeline runs on every experiment — variant split by a
    // deterministic user hash (user_id parity here), conversion = user
    // ever made a high-value (>200) purchase — chosen so neither variant
    // is degenerate at any driver SF (a 0% or 100% pooled rate has no
    // defined z: its denominator is exactly 0). Shape: one user-keyed
    // aggregation collapses events
    // to a per-user conversion flag, then ONE conditional-aggregate pass
    // folds both variants into a single row — no join between variants,
    // no second scan. The z statistic is built from four exact integers
    // with one shared association order, so the doubles are bit-identical
    // across engines before the micro-round.
    QueryDef.sql(
      "g18_ab_test",
      s"""WITH u AS (
         |  SELECT user_id, user_id % 2 AS variant,
         |    max(CASE WHEN event_type = 'purchase' AND value > 200
         |      THEN 1 ELSE 0 END) AS conv
         |  FROM events GROUP BY 1, 2),
         |s AS (SELECT
         |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n0,
         |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END)
         |      AS BIGINT) AS c0,
         |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END)
         |      AS BIGINT) AS c1
         |  FROM u)
         |SELECT n0, c0, n1, c1,
         |  ${Det.duckPortableRound(
             "(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) / " +
               "sqrt(((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) * " +
               "(1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))) * " +
               "(1.0 / n0 + 1.0 / n1))", 6)} AS z
         |FROM s""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("variant"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 200, 1).otherwise(0)).as("conv"))
      val agg = u.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 0, col("conv").cast("long"))
          .otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 1, col("conv").cast("long"))
          .otherwise(0L)).as("c1"))
      val pool = (col("c0") + col("c1")).cast("double") /
        (col("n0") + col("n1"))
      val z = (col("c0").cast("double") / col("n0") -
        col("c1").cast("double") / col("n1")) /
        sqrt((pool * (lit(1) - pool)) *
          (lit(1.0) / col("n0") + lit(1.0) / col("n1")))
      agg.select(col("n0"), col("c0"), col("n1"), col("c1"),
        Det.portableRound(z, 6).as("z"))
    },
    QueryDef.sql(
      "dq1_constraint_audit",
      // the dbt-test / Great-Expectations audit battery as ONE relation:
      // each check is an independent aggregate over its own table, so at
      // scale they parallelize as separate stages and the union is free
      // (no shuffle joins between checks). A lake pipeline runs exactly
      // this shape after every load.
      """SELECT 'pk_orders_unique' AS check_name,
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |    AS n_violations
        |FROM orders
        |UNION ALL
        |SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT)
        |FROM orders ANTI JOIN customer ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'not_null_orderdate', CAST(count(*) AS BIGINT)
        |FROM orders WHERE o_orderdate IS NULL
        |UNION ALL
        |SELECT 'domain_orderstatus', CAST(count(*) AS BIGINT)
        |FROM orders WHERE o_orderstatus NOT IN ('F', 'O', 'P')
        |ORDER BY check_name""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val pk = orders.agg((count(lit(1)) -
        countDistinct(col("o_orderkey"))).as("n_violations"))
        .select(lit("pk_orders_unique").as("check_name"), col("n_violations"))
      val fk = orders.join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("fk_orders_customer").as("check_name"),
          col("n_violations"))
      val nn = orders.filter(col("o_orderdate").isNull)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("not_null_orderdate").as("check_name"),
          col("n_violations"))
      val dom = orders.filter(!col("o_orderstatus").isin("F", "O", "P"))
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("domain_orderstatus").as("check_name"),
          col("n_violations"))
      pk.unionByName(fk).unionByName(nn).unionByName(dom)
        .orderBy("check_name")
    },

    // DQ2 column profiler (new r9) — the Deequ/SUMMARIZE-style dataset
    // profile a pipeline runs before trusting a new drop: per column,
    // null count, exact distinct count, and min/max rendered through a
    // TYPE-AWARE exact formatter (fixed-scale doubles → integer cents,
    // timestamps → dates, strings verbatim) so the cross-engine compare
    // never touches float formatting. One pass per column over a
    // column-pruned scan; each profile row is an independent partial+final
    // aggregate, unioned — at cluster scale the per-column jobs
    // parallelize trivially and each reads ONLY its column.
    QueryDef.sql(
      "dq2_profile",
      {
        def num(c: String) =
          s"""SELECT '$c' AS col_name, count(*) - count($c) AS n_nulls,
             |  count(DISTINCT $c) AS ndv,
             |  CAST(CAST(round(min($c) * 100, 0) AS BIGINT) AS VARCHAR)
             |    AS min_v,
             |  CAST(CAST(round(max($c) * 100, 0) AS BIGINT) AS VARCHAR)
             |    AS max_v
             |FROM lineitem""".stripMargin
        def str(c: String) =
          s"""SELECT '$c', count(*) - count($c), count(DISTINCT $c),
             |  min($c), max($c) FROM lineitem""".stripMargin
        s"""${num("l_quantity")}
           |UNION ALL ${num("l_extendedprice")}
           |UNION ALL ${num("l_discount")}
           |UNION ALL ${str("l_returnflag")}
           |UNION ALL ${str("l_linestatus")}
           |UNION ALL SELECT 'l_shipdate', count(*) - count(l_shipdate),
           |  count(DISTINCT l_shipdate),
           |  CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR),
           |  CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR)
           |FROM lineitem
           |ORDER BY col_name""".stripMargin
      }) { (s, d) =>
      val li = Tables.lineitem(s, d)
      def prof(c: String, minR: Column, maxR: Column): DataFrame =
        li.select(c).agg(
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("ndv"),
          minR.as("min_v"), maxR.as("max_v"))
          .select(lit(c).as("col_name"), col("n_nulls"), col("ndv"),
            col("min_v"), col("max_v"))
      def cents(e: Column) =
        round(e * 100, 0).cast("long").cast("string")
      val numCols = Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(c => prof(c, cents(min(col(c))), cents(max(col(c)))))
      val strCols = Seq("l_returnflag", "l_linestatus")
        .map(c => prof(c, min(col(c)), max(col(c))))
      val dateCol = prof("l_shipdate",
        min(col("l_shipdate")).cast("date").cast("string"),
        max(col("l_shipdate")).cast("date").cast("string"))
      (numCols ++ strCols :+ dateCol)
        .reduce(_ unionByName _)
        .orderBy("col_name")
    },
    QueryDef.rowsOnly("o5_sampled_scan") { (s, d) =>
      // seeded Bernoulli sample: deterministic within Spark, but sampling
      // algorithms differ across engines → rows-only check
      Tables.lineitem(s, d).sample(withReplacement = false, 0.1, seed = 42L)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    QueryDef.sql(
      "o5b_hash_sample",
      // content-addressed ~10% sample: hash of the row key, keep bucket 0.
      // Unlike RNG sampling this is stable across engines, runs, partition
      // layouts, and re-ingests — the property train/test splits and
      // repeatable corpus subsets need at 100 TB — so it's fully
      // oracle-checkable
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n
         |FROM lineitem
         |WHERE ${graft.text.PortableHash.duck(
             "concat(CAST(l_orderkey AS VARCHAR), ':'," +
               " CAST(l_linenumber AS VARCHAR))")} % 10 = 0
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(graft.text.PortableHash.spark(
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))) % 10 === 0)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },
    // O8 weighted sampling without replacement (new r9): Efraimidis &
    // Spirakis 2006 (A-Res) — P(row in sample) ∝ its weight, the
    // importance-sampling primitive behind quality-weighted corpus
    // selection. Key insight made deterministic: rank rows by
    // ln(u)/w where u is the CONTENT-ADDRESSED hash-uniform (never RNG —
    // o5b's discipline), equivalent to the paper's u^(1/w) order;
    // top-k of that ranking IS the weighted sample. One map + one
    // TakeOrderedAndProject — no shuffle beyond the top-k, repeatable
    // across engines/runs/partitionings, and mergeable (top-k of unions =
    // union of top-ks re-topped, the distributed A-Res property).
    QueryDef.sql(
      "o8_weighted_sample",
      s"""WITH s AS (SELECT o_orderkey, o_totalprice,
         |    ln((${graft.text.PortableHash.duck(
               "CAST(o_orderkey AS VARCHAR)")} % 1000000 + 0.5)
         |      / CAST(1000000 AS DOUBLE)) / o_totalprice AS sc
         |  FROM orders)
         |SELECT o_orderkey, o_totalprice,
         |  ${Det.duckPortableRound("sc", 9)} AS score
         |FROM s ORDER BY sc DESC, o_orderkey LIMIT 20""".stripMargin) {
      (s, d) =>
        val u = (graft.text.PortableHash.spark(
          col("o_orderkey").cast("string")) % 1000000 + lit(0.5)) /
          lit(1000000.0)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            (log(u) / col("o_totalprice")).as("sc"))
          .orderBy(col("sc").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"),
            Det.portableRound(col("sc"), 9).as("score"))
          .limit(20)
    },
    QueryDef.sql(
      "o7_zorder_layout",
      // Morton (z-order) clustering key: interleave the low 16 bits of two
      // dimensions, bucket by the high z bits, and report each bucket's
      // min/max range on BOTH dimensions — the stat a lakehouse layout
      // optimizer checks to confirm z-ordering yields tight per-file ranges
      // (⇒ min/max skipping works on either predicate dimension). Pure
      // integer bit arithmetic — identical on both engines.
      """WITH z AS (SELECT o_custkey AS x, o_orderkey % 65536 AS y,
        |    list_sum(list_transform(generate_series(0, 15), i ->
        |      (((o_custkey >> i) & 1) << (2 * i))
        |      + ((((o_orderkey % 65536) >> i) & 1) << (2 * i + 1))))
        |      AS zval
        |  FROM orders)
        |SELECT CAST(zval >> 18 AS BIGINT) AS zbucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
        |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_custkey").as("x"),
          (col("o_orderkey") % 65536).as("y"))
        .withColumn("zval", expr(
          "aggregate(sequence(0, 15), CAST(0 AS BIGINT), (a, i) -> a" +
            " + shiftleft(shiftright(x, i) & 1, 2 * i)" +
            " + shiftleft(shiftright(y, i) & 1, 2 * i + 1))"))
        .groupBy(shiftright(col("zval"), 18).as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("zbucket")
    },
    QueryDef.sql(
      "g9_stats_percentiles",
      s"""SELECT l_returnflag,
         |  quantile_cont(l_quantity, 0.5) AS med_qty,
         |  ${Det.duckPortableRound("quantile_cont(l_extendedprice, 0.25)", 4)} AS p25_price,
         |  ${Det.duckPortableRound("quantile_cont(l_extendedprice, 0.75)", 4)} AS p75_price,
         |  ${Det.duckPortableRound("corr(l_quantity, l_extendedprice)", 6)} AS qty_price_corr,
         |  ${Det.duckPortableRound("stddev_samp(l_quantity)", 6)} AS qty_stddev
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("med_qty"),
            Det.portableRound(expr("percentile(l_extendedprice, 0.25)"), 4)
              .as("p25_price"),
            Det.portableRound(expr("percentile(l_extendedprice, 0.75)"), 4)
              .as("p75_price"),
            Det.portableRound(corr(col("l_quantity"), col("l_extendedprice")), 6)
              .as("qty_price_corr"),
            Det.portableRound(stddev_samp(col("l_quantity")), 6)
              .as("qty_stddev"))
          .orderBy("l_returnflag")
    },
    QueryDef.sql(
      "g12_regression",
      // grouped least-squares fit (price ~ quantity) — the classic
      // map-side-combinable second-moment aggregate: each partition folds
      // (n, Σx, Σy, Σxy, Σx²) and merge is exact, so the plan is
      // partial+final with no data movement beyond the group key
      s"""SELECT l_returnflag,
         |  ${Det.duckPortableRound(
           "regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
         |  ${Det.duckPortableRound(
           "regr_intercept(l_extendedprice, l_quantity)", 4)} AS intercept,
         |  ${Det.duckPortableRound(
           "regr_r2(l_extendedprice, l_quantity)", 6)} AS r2,
         |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(
            Det.portableRound(
              regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
              .as("slope"),
            Det.portableRound(
              regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
              .as("intercept"),
            Det.portableRound(
              regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
              .as("r2"),
            regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
          .orderBy("l_returnflag")
    },
    QueryDef.sql(
      "g13_sampled_quantiles",
      // quantile ESTIMATION from a content-addressed 10% sample — the
      // 100-TB pattern when exact percentiles (full sort per group) are too
      // expensive: the sample is deterministic (hash of the row key, never
      // RNG or partition order), so the estimate itself is oracle-exact
      s"""WITH s AS (SELECT l_returnflag, l_extendedprice FROM lineitem
         |  WHERE ${graft.text.PortableHash.duck(
           "concat(CAST(l_orderkey AS VARCHAR), ':'," +
             " CAST(l_linenumber AS VARCHAR))")} % 10 = 0)
         |SELECT l_returnflag,
         |  CAST(count(*) AS BIGINT) AS n_sample,
         |  ${Det.duckPortableRound("quantile_cont(l_extendedprice, 0.5)", 4)}
         |    AS est_median,
         |  ${Det.duckPortableRound("quantile_cont(l_extendedprice, 0.9)", 4)}
         |    AS est_p90,
         |  ${Det.duckPortableRound("quantile_cont(l_extendedprice, 0.99)", 4)}
         |    AS est_p99
         |FROM s GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(graft.text.PortableHash.spark(
            concat(col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string"))) % 10 === 0)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_sample"),
            Det.portableRound(expr("percentile(l_extendedprice, 0.5)"), 4)
              .as("est_median"),
            Det.portableRound(expr("percentile(l_extendedprice, 0.9)"), 4)
              .as("est_p90"),
            Det.portableRound(expr("percentile(l_extendedprice, 0.99)"), 4)
              .as("est_p99"))
          .orderBy("l_returnflag")
    },
    // --------------------------------------------------------- windows (W)
    QueryDef.sql(
      "w1_rank_topn",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
        |    CAST(rank() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderpriority) AS INT) AS prio_rank,
        |    CAST(dense_rank() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderpriority) AS INT) AS prio_dense
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wp = Window.partitionBy("o_custkey").orderBy(col("o_orderpriority"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(wp).as("prio_rank"),
          dense_rank().over(wp).as("prio_dense"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },
    QueryDef.sql(
      "w2_lag_delta",
      """SELECT event_id,
        |  round(value - lag(value) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id), 2) AS delta,
        |  lead(event_type) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"),
          round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("event_id")
    },
    QueryDef.sql(
      "w3_frame_moving",
      """SELECT l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY CAST(l_shipdate AS TIMESTAMP), l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS qty_3
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(-2, Window.currentRow)
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity")).over(w).as("qty_3"))
          .orderBy("l_orderkey", "l_linenumber")
    },
    QueryDef.sql(
      "w4_running_sum",
      """SELECT event_id,
        |  sum(CAST(round(value * 100, 0) AS BIGINT))
        |    OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
        |  AS running_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"),
          (sum(round(col("value") * 100, 0).cast("long")).over(w) / 100.0)
            .as("running_value"))
        .orderBy("event_id")
    },
    QueryDef.sql(
      "w5_ntile_pctrank",
      s"""SELECT c_custkey,
         |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile,
         |  ${Det.duckPortableRound(
             "percent_rank() OVER (ORDER BY c_acctbal, c_custkey)", 6)} AS pr
         |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // Size-gated: a global `Window.orderBy` funnels every row through one
      // task, which is fine for a sub-`GlobalWindowMaxRows` result (one task
      // sorting a few hundred MB) and catastrophic beyond it. The gate reads
      // the optimizer's size estimate (parquet footer bytes, pruned to the
      // two selected columns) — zero extra jobs, unlike a count(). The
      // estimate treats every 2 compressed bytes as a row: dictionary/RLE
      // encoding can push a well-encoded key+decimal column pair below
      // 8 B/row, so the divisor must sit under any plausible encoding for
      // the estimate to provably OVERSTATE rows — estimation error then
      // only ever pushes toward the scale path. Above the gate the EXACT
      // same semantics come from the distributed two-pass kernel (w5b's
      // plan), which derives its own exact n.
      val base = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_acctbal"))
      val stats = base.queryExecution.optimizedPlan.stats
      val estRows = stats.rowCount.map(_.toLong)
        .getOrElse(stats.sizeInBytes.toLong / 2L)
      if (estRows <= GlobalWindowMaxRows) {
        val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
        base.select(col("c_custkey"), ntile(4).over(w).as("quartile"),
            Det.portableRound(percent_rank().over(w), 6).as("pr"))
          .orderBy("c_custkey")
      } else globalNtilePctRank(s, base, base.count())
    },
    QueryDef.sql(
      "w5b_global_rank_scalable",
      // SAME oracle as w5: the scale path must reproduce exact window
      // semantics, graded against DuckDB's real ntile/percent_rank
      s"""SELECT c_custkey,
         |  CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT) AS quartile,
         |  ${Det.duckPortableRound(
             "percent_rank() OVER (ORDER BY c_acctbal, c_custkey)", 6)} AS pr
         |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_acctbal"))
      globalNtilePctRank(s, base, base.count())
    },
    QueryDef.sql(
      "w7_nth_value",
      // first/nth/last value over the full partition — explicit ROWS frame,
      // because the default RANGE..CURRENT ROW frame makes nth/last
      // prefix-dependent
      """SELECT s_suppkey,
        |  first_value(s_name) OVER w AS top_name,
        |  nth_value(s_name, 2) OVER w AS second_name,
        |  last_value(s_name) OVER w AS bottom_name
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        |  ORDER BY s_acctbal DESC, s_suppkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("s_nationkey")
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.supplier(s, d).select(col("s_suppkey"),
          first(col("s_name")).over(w).as("top_name"),
          nth_value(col("s_name"), 2).over(w).as("second_name"),
          last(col("s_name")).over(w).as("bottom_name"))
        .orderBy("s_suppkey")
    },
    QueryDef.sql(
      "w10_cume_dist",
      // cumulative distribution — rounds out the W-family's rank kernels
      // (rank/dense_rank/percent_rank/ntile already covered). cume_dist
      // is tie-stable by construction: its value depends only on the
      // ORDER BY key comparison (#rows with key <= current / N), never
      // on physical tie order, so supplier acctbal ties are safe. Same
      // single-shuffle sort-within-partition plan as every W kernel.
      """SELECT s_suppkey,
        |  round(cume_dist() OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal), 9) AS cd
        |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), round(cume_dist().over(w), 9).as("cd"))
        .orderBy("s_suppkey")
    },
    QueryDef.sql(
      "w6_range_frame",
      // events-in-the-last-hour per user: a RANGE frame over event time,
      // expressed on the epoch-microsecond axis so both engines use the
      // identical numeric frame
      """SELECT event_id,
        |  count(*) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |    AS n_last_hour
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), count(lit(1)).over(w).as("n_last_hour"))
        .orderBy("event_id")
    },
    // ---------------------------------------------------- sorts/limits (O)
    QueryDef.sql(
      "o1_sort_multi",
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey DESC, s_acctbal ASC, s_suppkey""".stripMargin) {
      (s, d) =>
        Tables.supplier(s, d).select("s_suppkey", "s_nationkey", "s_acctbal")
          .orderBy(col("s_nationkey").desc, col("s_acctbal").asc,
            col("s_suppkey"))
    },
    QueryDef.sql(
      "o2_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 5""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").limit(5)
    },
    QueryDef.sql(
      "o3_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) {
      (s, d) =>
        // order+limit fuses to TakeOrderedAndProject: no global sort at scale
        Tables.orders(s, d).select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    },
    // --------------------------------------------------------- set ops (U)
    QueryDef.sql(
      "u1_union_all",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_orderkey, o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      o.filter(col("o_orderpriority") === "1-URGENT")
        .unionByName(o.filter(col("o_orderpriority") === "2-HIGH"))
        .orderBy("o_orderkey", "o_orderpriority")
    },
    QueryDef.sql(
      "u2_union_distinct",
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT c_custkey AS custkey FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
        .union(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey")))
        .distinct()
        .orderBy("custkey")
    },
    QueryDef.sql(
      "u3_intersect",
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
        .intersect(o.filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },
    QueryDef.sql(
      "u4_except",
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("custkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },
    QueryDef.sql(
      "u5_intersect_all",
      // bag semantics: multiplicity = min of the two sides' counts
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT ALL
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
        .intersectAll(o.filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },
    QueryDef.sql(
      "u6_except_all",
      // bag semantics: multiplicity = left count minus right count
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT ALL
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
        .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey")))
        .orderBy("custkey")
    },

    // U7 MERGE (upsert): source = balance bump for nations 0-4 plus one
    // synthetic new customer per region; "matched update / not matched
    // insert" via MergeOps.mergeInto (anti-join + union — one shuffle,
    // never a full-table rewrite). Graded on the per-nation census of the
    // merged table.
    QueryDef.sql(
      "u7_merge_upsert",
      s"""WITH src AS (
         |  SELECT c_custkey, c_nationkey, c_acctbal + 100 AS c_acctbal
         |  FROM customer WHERE c_nationkey < 5
         |  UNION ALL
         |  SELECT 1000000 + r_regionkey, CAST(r_regionkey AS INT),
         |    CAST(0 AS DOUBLE)
         |  FROM region),
         |merged AS (
         |  SELECT c_custkey, c_nationkey, c_acctbal FROM src
         |  UNION ALL
         |  SELECT t.c_custkey, t.c_nationkey, t.c_acctbal FROM customer t
         |  WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.c_custkey = t.c_custkey))
         |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  ${graft.Det.duckCentSum("c_acctbal", 2)} AS total_bal
         |FROM merged GROUP BY nationkey ORDER BY nationkey""".stripMargin) {
      (s, d) =>
        val target = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        val updates = target.filter(col("c_nationkey") < 5)
          .withColumn("c_acctbal", col("c_acctbal") + 100)
        val inserts = Tables.region(s, d).select(
          (col("r_regionkey") + 1000000L).cast("long").as("c_custkey"),
          col("r_regionkey").cast("int").as("c_nationkey"),
          lit(0.0).as("c_acctbal"))
        val merged = MergeOps.mergeInto(target,
          updates.unionByName(inserts), Seq("c_custkey"))
        merged.groupBy(col("c_nationkey").cast("long").as("nationkey"))
          .agg(count(lit(1)).as("n_customers"),
            graft.Det.centSum(col("c_acctbal"), 2).as("total_bal"))
          .orderBy("nationkey")
    },

    // U8 CDC diff: tag every key as insert/delete/update/unchanged between
    // two snapshots — old = customer, new = the U7 merge result minus every
    // 97th customer, so all four tags genuinely occur. ONE full-outer join
    // on the key; non-key columns compared as a null-safe struct (no hash,
    // so no collision can mislabel an update). Graded on the tag census.
    QueryDef.sql(
      "u8_cdc_diff",
      """WITH src AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal + 100 AS c_acctbal
        |  FROM customer WHERE c_nationkey < 5
        |  UNION ALL
        |  SELECT 1000000 + r_regionkey, CAST(r_regionkey AS INT),
        |    CAST(0 AS DOUBLE)
        |  FROM region),
        |merged AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM src
        |  UNION ALL
        |  SELECT t.c_custkey, t.c_nationkey, t.c_acctbal FROM customer t
        |  WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.c_custkey = t.c_custkey)),
        |new_t AS (SELECT * FROM merged WHERE c_custkey % 97 <> 0),
        |diff AS (
        |  SELECT CASE WHEN o.c_custkey IS NULL THEN 'insert'
        |              WHEN n.c_custkey IS NULL THEN 'delete'
        |              WHEN o.c_nationkey IS DISTINCT FROM n.c_nationkey
        |                OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |                THEN 'update'
        |              ELSE 'unchanged' END AS op
        |  FROM customer o FULL OUTER JOIN new_t n
        |    ON o.c_custkey = n.c_custkey)
        |SELECT op, CAST(count(*) AS BIGINT) AS n
        |FROM diff GROUP BY op ORDER BY op""".stripMargin) { (s, d) =>
      val target = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val updates = target.filter(col("c_nationkey") < 5)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
      val inserts = Tables.region(s, d).select(
        (col("r_regionkey") + 1000000L).cast("long").as("c_custkey"),
        col("r_regionkey").cast("int").as("c_nationkey"),
        lit(0.0).as("c_acctbal"))
      val newSnap = MergeOps.mergeInto(target,
        updates.unionByName(inserts), Seq("c_custkey"))
        .filter(col("c_custkey") % 97 =!= 0)
      MergeOps.cdcDiff(target, newSnap, Seq("c_custkey"))
        .groupBy("op").agg(count(lit(1)).as("n"))
        .orderBy("op")
    },
    QueryDef.sql(
      "o2b_limit_offset",
      // pagination: deterministic only over a total order, which the unique
      // sort key provides
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 7 OFFSET 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey").offset(10).limit(7)
    },
    // ------------------------------------------------- scalar functions (F)
    QueryDef.sql(
      "f1_substring_instr",
      """SELECT p_partkey, substr(p_name, 1, 5) AS prefix,
        |  CAST(strpos(p_name, ' ') AS INT) AS space_at
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        substring(col("p_name"), 1, 5).as("prefix"),
        instr(col("p_name"), " ").as("space_at"))
        .orderBy("p_partkey")
    },
    QueryDef.sql(
      "f2_trim_case",
      """SELECT n_nationkey, upper(n_name) AS up, lower(n_name) AS lo,
        |  trim(concat(' ', n_name, ' ')) AS trimmed
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d).select(col("n_nationkey"),
        upper(col("n_name")).as("up"), lower(col("n_name")).as("lo"),
        trim(concat(lit(" "), col("n_name"), lit(" "))).as("trimmed"))
        .orderBy("n_nationkey")
    },
    QueryDef.sql(
      "f3_regexp_replace",
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_replace(p_brand, '[^a-zA-Z0-9_]', '_', 'g') AS sanitized
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      // sanitized mirrors the reference's label sanitizer (latest.js:16-18)
      Tables.part(s, d).select(col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_replace(col("p_brand"), "[^a-zA-Z0-9_]", "_").as("sanitized"))
        .orderBy("p_partkey")
    },
    QueryDef.sql(
      "f4_split_explode",
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS tok FROM part) t
        |GROUP BY tok ORDER BY tok""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy("tok")
    },
    QueryDef.sql(
      "f5_concat",
      """SELECT c_custkey, concat_ws('|', c_name, c_mktsegment) AS key_seg,
        |  concat(c_name, '@', c_mktsegment) AS at_seg
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("key_seg"),
        concat(col("c_name"), lit("@"), col("c_mktsegment")).as("at_seg"))
        .orderBy("c_custkey")
    },
    QueryDef.sql(
      "f6_string_predicates",
      """SELECT p_partkey, contains(p_name, 'ol') AS has_ol,
        |  starts_with(p_name, 'red') AS is_red,
        |  ends_with(p_name, 'bolt') AS is_bolt
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        col("p_name").contains("ol").as("has_ol"),
        col("p_name").startsWith("red").as("is_red"),
        col("p_name").endsWith("bolt").as("is_bolt"))
        .orderBy("p_partkey")
    },
    QueryDef.sql(
      "f7_case_when",
      """SELECT size_class, count(*) AS n FROM (
        |  SELECT CASE WHEN p_size >= 40 THEN 'large'
        |              WHEN p_size >= 15 THEN 'medium'
        |              ELSE 'small' END AS size_class
        |  FROM part) t GROUP BY size_class ORDER BY size_class""".stripMargin) {
      (s, d) =>
        Tables.part(s, d)
          .select(when(col("p_size") >= 40, "large")
            .when(col("p_size") >= 15, "medium")
            .otherwise("small").as("size_class"))
          .groupBy("size_class").agg(count(lit(1)).as("n"))
          .orderBy("size_class")
    },
    QueryDef.sql(
      "f8_date_functions",
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  o_orderdate + INTERVAL 30 DAY AS due
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .as("days_since"),
        expr("timestampadd(DAY, 30, o_orderdate)").as("due"))
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "f9_math",
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice / l_quantity * 100 + 0.5) / CAST(100 AS DOUBLE)
        |    AS unit_price,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  l_orderkey % 7 AS bucket7,
        |  CAST(floor(l_quantity / 10) AS BIGINT) AS qty_decile,
        |  sqrt(l_quantity) AS qty_root
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, d) =>
        // NOT round(x, 2): Spark rounds the shortest decimal repr of the
        // double, DuckDB rounds the binary value — they disagree on exact
        // .xx5 boundaries. floor(x*100 + 0.5)/100 is pure IEEE arithmetic,
        // identical in any engine.
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          (floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5) /
            100.0).as("unit_price"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          (col("l_orderkey") % 7).as("bucket7"),
          floor(col("l_quantity") / 10).as("qty_decile"),
          sqrt(col("l_quantity")).as("qty_root"))
          .orderBy("l_orderkey", "l_linenumber")
    },
    QueryDef.sql(
      "f10_casts",
      """SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(o_orderdate AS DATE) AS order_day
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // NB: Spark CAST(double AS INT) truncates while DuckDB rounds — both
      // sides trunc() explicitly before the cast (SURVEY.md §7.3).
      Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        expr("CAST(o_totalprice AS BIGINT)").as("price_floor"),
        col("o_orderdate").cast("date").as("order_day"))
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "f11_array_functions",
      // Array-typed output columns crash the driver's pandas canonicalizer
      // (unhashable ndarray), so every array result is serialized to a string
      // of round-half-up micro-units — integers stringify identically in both
      // engines, while raw float reprs do not.
      """SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
        |  embedding[1] AS first_val,
        |  array_to_string(list_transform(list_sort(embedding[1:4]),
        |    x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT)),
        |    ',') AS first4_sorted,
        |  list_max(embedding) AS max_val,
        |  list_min(embedding) AS min_val,
        |  array_to_string(list_transform(list_reverse(embedding[1:3]),
        |    x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5) AS BIGINT)),
        |    ',') AS first3_rev
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      // the float element is widened to double BEFORE scaling on both sides
      // — DuckDB would otherwise multiply in single precision and round to a
      // different micro-unit in the last place
      val micros = (c: Column) =>
        array_join(transform(c, x => floor(x.cast("double") * 1000000 + 0.5)
          .cast("long").cast("string")), ",")
      Tables.embeddings(s, d).select(col("vec_id"),
        size(col("embedding")).as("n_dims"),
        element_at(col("embedding"), 1).as("first_val"),
        micros(array_sort(slice(col("embedding"), 1, 4))).as("first4_sorted"),
        array_max(col("embedding")).as("max_val"),
        array_min(col("embedding")).as("min_val"),
        micros(reverse(slice(col("embedding"), 1, 3))).as("first3_rev"))
        .orderBy("vec_id")
    },
    QueryDef.sql(
      "f12_map_functions",
      // oracle builds the same MAP in DuckDB and derives every output from it
      // (extraction yields a 1-element list there, hence the [1])
      """SELECT doc_id,
        |  map {'lang': lang, 'source': source}['lang'][1] AS m_lang,
        |  map {'lang': lang, 'source': source}['source'][1] AS m_source,
        |  array_to_string(list_sort(map_keys(
        |    map {'lang': lang, 'source': source})), ',') AS m_keys,
        |  CAST(cardinality(map {'lang': lang, 'source': source}) AS INT)
        |    AS m_size
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("m", map(lit("lang"), col("lang"),
          lit("source"), col("source")))
        .select(col("doc_id"),
          element_at(col("m"), "lang").as("m_lang"),
          element_at(col("m"), "source").as("m_source"),
          array_join(array_sort(map_keys(col("m"))), ",").as("m_keys"),
          size(col("m")).as("m_size"))
        .orderBy("doc_id")
    },
    QueryDef.sql(
      "f12b_map_transform",
      // map rewrite chain — transform_values then map_filter — serialized
      // as sorted k=v entries; the oracle derives the surviving entries
      // directly from the base columns (DuckDB's concat_ws skips the NULL
      // CASE arms, and 'chars' < 'id' gives the sorted order for free)
      """SELECT doc_id, concat_ws(',',
        |  CASE WHEN n_chars * 2 >= 10 THEN 'chars=' ||
        |    CAST(n_chars * 2 AS VARCHAR) END,
        |  CASE WHEN doc_id * 2 >= 10 THEN 'id=' ||
        |    CAST(doc_id * 2 AS VARCHAR) END) AS entries
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("m", map_from_arrays(
          array(lit("chars"), lit("id")),
          array(col("n_chars"), col("doc_id"))))
        .withColumn("m2", expr("transform_values(m, (k, v) -> v * 2)"))
        .withColumn("mf", expr("map_filter(m2, (k, v) -> v >= 10)"))
        .select(col("doc_id"), expr(
          "array_join(transform(array_sort(map_keys(mf))," +
            " k -> concat(k, '=', element_at(mf, k))), ',')").as("entries"))
        .orderBy("doc_id")
    },
    QueryDef.sql(
      "f11b_array_setops",
      // string arrays serialized with a separator that can't appear in the
      // data, so the driver comparator sees plain strings (see f11 note)
      """SELECT p_partkey,
        |  COALESCE(array_to_string(list_sort(list_intersect(
        |    string_split(p_name, ' '),
        |    ['small', 'red', 'blue'])), '|'), '') AS color_hits,
        |  list_contains(string_split(p_name, ' '), 'bolt') AS has_bolt,
        |  array_to_string(list_sort(list_concat(string_split(p_name, ' '),
        |    [p_brand])), '|') AS with_brand
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        array_join(array_sort(array_intersect(split(col("p_name"), " "),
          array(lit("small"), lit("red"), lit("blue")))), "|").as("color_hits"),
        array_contains(split(col("p_name"), " "), "bolt").as("has_bolt"),
        array_join(array_sort(concat(split(col("p_name"), " "),
          array(col("p_brand")))), "|").as("with_brand"))
        .orderBy("p_partkey")
    },
    QueryDef.sql(
      "f15_more_strings",
      """SELECT n_nationkey,
        |  translate(n_name, 'NATION_', 'nation-') AS translated,
        |  lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
        |  rpad(n_name, 12, '.') AS rpadded,
        |  repeat('-', 3) AS dashes,
        |  reverse(n_name) AS reversed,
        |  left(n_name, 6) AS l6,
        |  right(n_name, 2) AS r2
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d).select(col("n_nationkey"),
        translate(col("n_name"), "NATION_", "nation-").as("translated"),
        lpad(col("n_nationkey").cast("string"), 4, "0").as("padded"),
        rpad(col("n_name"), 12, ".").as("rpadded"),
        lit("-" * 3).as("dashes"),
        reverse(col("n_name")).as("reversed"),
        substring(col("n_name"), 1, 6).as("l6"),
        expr("right(n_name, 2)").as("r2"))
        .orderBy("n_nationkey")
    },
    QueryDef.sql(
      "f8b_date_parts",
      // calendar navigation: month bucket (trunc → DATE on both engines),
      // month end, quarter, month arithmetic with end-clamping, day diff
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2,
        |  CAST(date_diff('day', o_orderdate, DATE '1995-01-01') AS INT)
        |    AS days_to_95
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey"),
          trunc(col("o_orderdate"), "MM").as("month_start"),
          last_day(col("o_orderdate")).as("month_end"),
          quarter(col("o_orderdate")).as("q"),
          add_months(col("o_orderdate"), 2).as("plus2"),
          datediff(lit(java.sql.Date.valueOf("1995-01-01")),
            col("o_orderdate")).as("days_to_95"))
        .orderBy("o_orderkey")
    },
    QueryDef.sql(
      "f17_array_quantifiers",
      // higher-order quantifiers over token arrays: exists / forall /
      // aggregate fold / first position (0 when absent on both engines)
      """SELECT doc_id,
        |  len(list_filter(l, t -> t = 'vector')) > 0 AS has_vector,
        |  len(list_filter(l, t -> len(t) > 8)) = 0 AS all_short,
        |  CAST(list_sum(list_transform(l, t -> len(t))) AS BIGINT)
        |    AS total_chars,
        |  CAST(coalesce(list_position(l, 'spark'), 0) AS INT) AS first_spark
        |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          expr("exists(toks, t -> t = 'vector')").as("has_vector"),
          expr("forall(toks, t -> length(t) <= 8)").as("all_short"),
          expr("CAST(aggregate(toks, 0L, (a, t) -> a + length(t)) AS BIGINT)")
            .as("total_chars"),
          expr("CAST(array_position(toks, 'spark') AS INT)")
            .as("first_spark"))
        .orderBy("doc_id")
    },
    QueryDef.sql(
      "f16_explode_outer",
      // explode_outer (X3 generator with outer semantics): rows whose array
      // is empty survive with a NULL element instead of vanishing — the
      // count pair distinguishes the two
      """SELECT d.doc_id, CAST(count(u.ztok) AS BIGINT) AS n_hits,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM (SELECT doc_id,
        |        list_filter(string_split(text, ' '), t -> t = 'vector') AS zs
        |      FROM documents) d
        |LEFT JOIN LATERAL (SELECT unnest(d.zs) AS ztok) u ON true
        |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> t = 'vector')").as("zs"))
        .select(col("doc_id"), explode_outer(col("zs")).as("ztok"))
        .groupBy("doc_id")
        .agg(count(col("ztok")).as("n_hits"), count(lit(1)).as("n_rows"))
        .orderBy("doc_id")
    },
    QueryDef.sql(
      "f13_json",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy("event_type")
    },
    QueryDef.sql(
      "f14_hash_md5",
      """SELECT p_partkey, md5(p_name) AS name_md5,
        |  sha256(concat(p_name, '|', p_brand)) AS nb_sha
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(col("p_partkey"),
        md5(col("p_name")).as("name_md5"),
        sha2(concat(col("p_name"), lit("|"), col("p_brand")), 256).as("nb_sha"))
        .orderBy("p_partkey")
    },
    // --------------------------------------------- UDF/UDAF/UDTF surface (X)
    QueryDef.sql(
      "x1_scalar_udf",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'a')) AS INT) AS n_a,
        |  CAST(len(regexp_extract_all(text, '[aeiou]')) AS INT) AS n_vowels
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // Scala closure UDF (X1) — the escape hatch when no built-in or
      // custom Expression fits; kept off hot paths (no codegen)
      val countChar = udf((text: String, c: String) =>
        text.count(ch => c.contains(ch)))
      Tables.documents(s, d).select(col("doc_id"),
        countChar(col("text"), lit("a")).as("n_a"),
        countChar(col("text"), lit("aeiou")).as("n_vowels"))
        .orderBy("doc_id")
    },
    QueryDef.sql(
      "x2_centroid_udaf",
      // per-label, per-dimension centroid of the embeddings: the typed
      // Aggregator runs partial+final; the oracle recomputes it as a plain
      // per-dimension average
      """SELECT label, i AS dim,
        |  floor(avg(CAST(embedding[i] AS DOUBLE)) * 1000000 + 0.5)
        |    / CAST(1000000 AS DOUBLE) AS centroid_val
        |FROM embeddings CROSS JOIN generate_series(1, 8) t(i)
        |GROUP BY label, i ORDER BY label, dim""".stripMargin) { (s, d) =>
      val centroid = udaf(graft.functions.CentroidAgg)
      Tables.embeddings(s, d)
        .select(col("label"),
          expr("transform(slice(embedding, 1, 8), x -> CAST(x AS DOUBLE))")
            .as("emb"))
        .groupBy("label").agg(centroid(col("emb")).as("centroid"))
        // posexplode = the generator/UDTF surface (X3)
        .select(col("label"), posexplode(col("centroid")))
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          graft.Det.portableRound(col("col"), 6).as("centroid_val"))
        .orderBy("label", "dim")
    },
    // ---------------------------------------------------------- joins: skew
    QueryDef.sql(
      "j12_salted_skew_join",
      // oracle is the PLAIN join — salting must be result-invariant
      """SELECT event_id, c_mktsegment FROM events
        |JOIN customer ON user_id = c_custkey
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      SkewJoin.saltedEquiJoin(
        Tables.events(s, d).withColumnRenamed("user_id", "c_custkey"),
        Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        key = "c_custkey", saltFrom = "event_id", saltBuckets = 8)
        .select("event_id", "c_mktsegment")
        .orderBy("event_id")
    },
    // ---------------------------------------------------------- SQL surface
    QueryDef.sql(
      "b1_sql_surface",
      s"""SELECT n_name, o_ym, ${duckCentSum("o_totalprice", 2)} AS revenue
         |FROM (SELECT o_custkey, o_totalprice,
         |        CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS o_ym
         |      FROM orders WHERE o_orderstatus = 'F') o
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name, o_ym
         |HAVING count(*) > 1
         |ORDER BY n_name, o_ym""".stripMargin) { (s, d) =>
      // the engine's "arbitrary query execution" surface (SURVEY.md §2.B B1):
      // register graph/relational views, run pure SQL through Catalyst.
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(
        s"""SELECT n_name, o_ym,
           |  ${Det.duckCentSum("o_totalprice", 2)} AS revenue
           |FROM (SELECT o_custkey, o_totalprice,
           |        CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS o_ym
           |      FROM orders WHERE o_orderstatus = 'F') o
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name, o_ym
           |HAVING count(*) > 1
           |ORDER BY n_name, o_ym""".stripMargin)
    },
    QueryDef.sql(
      "b2_correlated_subqueries",
      // scalar + correlated EXISTS subqueries: Catalyst decorrelates both
      """SELECT c_custkey FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal * 100, 0)
        |                      AS BIGINT)) AS DOUBLE)
        |                     / CAST(100 AS DOUBLE) / count(*) FROM customer)
        |  AND EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey FROM customer
          |WHERE c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal * 100, 0)
          |                      AS BIGINT)) AS DOUBLE)
          |                     / CAST(100 AS DOUBLE) / count(*) FROM customer)
          |  AND EXISTS (SELECT 1 FROM orders
          |              WHERE o_custkey = c_custkey
          |                AND o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
    },
    QueryDef.sql(
      "b4_recursive_cte",
      // recursive traversal in pure SQL (J11's SQL surface): follow the
      // next-nation-in-region successor chain to its end
      """WITH RECURSIVE nxt AS (
        |  SELECT n_nationkey AS src,
        |    lead(n_nationkey) OVER (PARTITION BY n_regionkey
        |      ORDER BY n_nationkey) AS dst
        |  FROM nation),
        |r(start, node, depth) AS (
        |  SELECT src, src, 0 FROM nxt
        |  UNION ALL
        |  SELECT r.start, nxt.dst, r.depth + 1
        |  FROM r JOIN nxt ON r.node = nxt.src
        |  WHERE nxt.dst IS NOT NULL)
        |SELECT start, CAST(max(depth) AS INT) AS chain_len,
        |  CAST(max(node) AS INT) AS chain_end
        |FROM r GROUP BY start ORDER BY start""".stripMargin) { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation")
      s.sql(
        """WITH RECURSIVE nxt AS (
          |  SELECT n_nationkey AS src,
          |    lead(n_nationkey) OVER (PARTITION BY n_regionkey
          |      ORDER BY n_nationkey) AS dst
          |  FROM nation),
          |r(start, node, depth) AS (
          |  SELECT src, src, 0 FROM nxt
          |  UNION ALL
          |  SELECT r.start, nxt.dst, r.depth + 1
          |  FROM r JOIN nxt ON r.node = nxt.src
          |  WHERE nxt.dst IS NOT NULL)
          |SELECT start, CAST(max(depth) AS INT) AS chain_len,
          |  CAST(max(node) AS INT) AS chain_end
          |FROM r GROUP BY start ORDER BY start""".stripMargin)
    },
    QueryDef.sql(
      "b3_cte_pipeline",
      """WITH fat_orders AS (
        |  SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 100000),
        |per_cust AS (
        |  SELECT o_custkey, count(*) AS n_fat FROM fat_orders GROUP BY o_custkey)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(n_fat) AS BIGINT) AS total_fat
        |FROM per_cust JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """WITH fat_orders AS (
          |  SELECT o_orderkey, o_custkey FROM orders
          |  WHERE o_totalprice > 100000),
          |per_cust AS (
          |  SELECT o_custkey, count(*) AS n_fat FROM fat_orders
          |  GROUP BY o_custkey)
          |SELECT c_mktsegment, count(*) AS n_cust,
          |  sum(n_fat) AS total_fat
          |FROM per_cust JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    }
  )
}
