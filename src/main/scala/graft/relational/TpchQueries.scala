package graft.relational

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The classic TPC-H multi-way-join suite, adapted to the driver corpus's
  * reduced star schema (TESTDATA.md: no `partsupp`, no commit/receipt
  * dates, no comment/phone/container columns — predicates that touched a
  * missing column are re-targeted onto an available one with the same
  * selectivity shape; every adaptation is noted per query).
  *
  * Why this pack exists (SURVEY.md §2.C B1 "arbitrary SQL" made concrete):
  * every other registered query joins at most three tables; these are the
  * canonical 4-to-6-way join pipelines an analytics engine is actually
  * judged on, and they exercise Catalyst's join reorder, semi/anti
  * rewrites, scalar-subquery decorrelation, and AQE in one place.
  *
  * Scale posture (100 TB): `nation`/`region` are FIXED-cardinality dims →
  * explicit `broadcast()`. `customer`/`orders`/`lineitem`/`part`/
  * `supplier` all grow with SF → declared as plain shuffle joins and left
  * to Catalyst + AQE (auto-broadcast picks them up at test SF; at cluster
  * SF they hash-exchange on the join key — the correct plan at both
  * scales, from one declaration). Money aggregates use the exact
  * integer-cent discipline ([[graft.Det]]) so results are bit-identical
  * across partitionings and engines. LIMIT queries carry a unique
  * tiebreak key so the selected SET is deterministic.
  */
object TpchQueries {
  import Det.{centSum, duckCentSum}

  private def ts(s: String) = lit(s).cast("timestamp")

  /** revenue = Σ extprice·(1−discount), exact at scale 4 (2+2 decimals). */
  private val revenue =
    centSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
  private val duckRevenue =
    duckCentSum("l_extendedprice * (1 - l_discount)", 4)

  val defs: Seq[QueryDef] = Seq(

    // Q1 pricing summary report: the canonical scan→8-aggregate rollup.
    // All referenced columns exist verbatim; every money/rate aggregate
    // uses the integer-cent discipline (sums at the column's decimal
    // scale, averages as exact-sum/count) so the 8-way result is
    // bit-identical across engines and partitionings. The charge product
    // extprice·(1−disc)·(1+tax) carries ≤6 decimals → scale-6 cents; at
    // 600k rows the long accumulator peaks ~6e16, far under 2^63.
    QueryDef.sql(
      "tpch_q1",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${duckCentSum("l_quantity", 2)} AS sum_qty,
         |  ${duckCentSum("l_extendedprice", 2)} AS sum_base_price,
         |  ${duckCentSum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |  ${duckCentSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
         |  ${Det.duckCentAvg("l_quantity", 2)} AS avg_qty,
         |  ${Det.duckCentAvg("l_extendedprice", 2)} AS avg_price,
         |  ${Det.duckCentAvg("l_discount", 2)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= ts("2001-09-01"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          centSum(col("l_quantity"), 2).as("sum_qty"),
          centSum(col("l_extendedprice"), 2).as("sum_base_price"),
          centSum(discPrice, 4).as("sum_disc_price"),
          centSum(discPrice * (lit(1.0) + col("l_tax")), 6)
            .as("sum_charge"),
          Det.centAvg(col("l_quantity"), 2).as("avg_qty"),
          Det.centAvg(col("l_extendedprice"), 2).as("avg_price"),
          Det.centAvg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q2 minimum-cost supplier. Adaptation: no `partsupp` → the
    // part-supplier cost relation is DERIVED from the fact table
    // (ps_cost = min unit price ever charged by that supplier for that
    // part), which preserves the point of Q2: a correlated scalar-min
    // subquery over a shared relation, decorrelated into a per-part min
    // joined back on exact equality (sound on doubles because both sides
    // pick the min of the IDENTICAL value set — no re-arithmetic).
    // The part filter pushes in FRONT of the per-part min: correlation is
    // on p_partkey alone, so dropping whole parts early cannot change any
    // surviving part's min.
    QueryDef.sql(
      "tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS ps_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, ps, supplier, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_cost = (
        |    SELECT min(ps_cost)
        |    FROM ps ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val euroSupp = broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
                .filter(col("r_name") === "EUROPE").select("r_regionkey")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey")))
      val targetParts = broadcast(Tables.part(s, d)
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select("p_partkey", "p_name"))
      val euroPs = Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(targetParts.select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("ps_cost"))
        .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
        // consumed twice (per-part min + the equality join back) and small
        // (≤ |filtered parts|·|suppliers| rows) — materialize once
        .localCheckpoint()
      val minCost = euroPs.groupBy(col("l_partkey").as("min_pkey"))
        .agg(min(col("ps_cost")).as("min_cost"))
      euroPs
        .join(minCost, col("l_partkey") === col("min_pkey") &&
          col("ps_cost") === col("min_cost"))
        .join(targetParts, col("l_partkey") === col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey")).limit(100)
    },

    // Q3 shipping priority — BUILDING-segment orders still open at the
    // cutoff date, top 10 by open revenue. Adaptation: the projected
    // o_shippriority column does not exist → o_orderpriority stands in.
    QueryDef.sql(
      "tpch_q3",
      s"""SELECT l_orderkey, $duckRevenue AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1996-06-15'
         |  AND l_shipdate > TIMESTAMP '1996-06-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") < ts("1996-06-15"))
              .select("o_orderkey", "o_custkey", "o_orderdate",
                "o_orderpriority"),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d)
              .filter(col("l_shipdate") > ts("1996-06-15"))
              .select("l_orderkey", "l_extendedprice", "l_discount"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(revenue.as("revenue"))
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
          // revenue is exact (cent sum) and l_orderkey unique → the
          // top-10 SET is deterministic; TakeOrderedAndProject, no
          // global sort materialization
          .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // Q4 order-priority checking. Adaptation: the original's
    // l_commitdate < l_receiptdate (late lines) does not exist →
    // "shipped after the order quarter opened" (l_shipdate > o_orderdate)
    // keeps the correlated-EXISTS shape, which is the point of Q4: a
    // LEFT SEMI join with a non-equi term riding the equi key.
    QueryDef.sql(
      "tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1996-04-01"))
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val l = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
        o.join(l, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
    },

    // Q5 local-supplier volume: the canonical 6-way join — the
    // customer-and-supplier-in-the-same-nation constraint rides the
    // lineitem⋈supplier join as an extra equi term.
    QueryDef.sql(
      "tpch_q5",
      s"""SELECT n_name, $duckRevenue AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) {
      (s, d) =>
        val asiaNations = broadcast(Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "ASIA").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
        Tables.customer(s, d).select("c_custkey", "c_nationkey")
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1997-01-01"))
              .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d)
              .select("l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(revenue.as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q6 forecasting-revenue change: pure scan-filter-agg; the value here
    // is the PLAN — every predicate and both referenced columns push into
    // the parquet scan (asserted alongside s1's pushdown plan test).
    QueryDef.sql(
      "tpch_q6",
      s"""SELECT ${duckCentSum("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(centSum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"))
    },

    // Q7 volume shipping between two nations, per direction per year:
    // the same `nation` dim joins TWICE under different roles (supplier
    // side, customer side) — alias-disambiguated, both broadcast.
    QueryDef.sql(
      "tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year, $duckRevenue AS revenue
         |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |        CAST(year(l_shipdate) AS INT) AS l_year,
         |        l_extendedprice, l_discount
         |      FROM supplier, lineitem, orders, customer, nation n1,
         |           nation n2
         |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |        AND c_nationkey = n2.n_nationkey
         |        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
         |                           AND TIMESTAMP '1996-12-31') shipping
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) {
      (s, d) =>
        val n1 = broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("n1_key"),
            col("n_name").as("supp_nation")))
        val n2 = broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("n2_key"),
            col("n_name").as("cust_nation")))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate").between(ts("1995-01-01"),
            ts("1996-12-31")))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount")
          .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
            col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
            col("c_custkey") === col("o_custkey"))
          .join(n1, col("s_nationkey") === col("n1_key"))
          .join(n2, col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_1" &&
              col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" &&
              col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(revenue.as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8 national market share: NATION_5's share of AMERICA-market PROMO
    // revenue per order year. Adaptation: p_type is a single word here →
    // equality instead of the original's exact-type match. The share is a
    // ratio of two exact cent sums (conditional / total) — deterministic.
    QueryDef.sql(
      "tpch_q8",
      s"""SELECT o_year,
         |  (${duckCentSum("CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END", 4)})
         |    / (${duckCentSum("volume", 4)}) AS mkt_share
         |FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |        l_extendedprice * (1 - l_discount) AS volume,
         |        n2.n_name AS nation
         |      FROM part, supplier, lineitem, orders, customer,
         |           nation n1, nation n2, region
         |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |        AND c_nationkey = n1.n_nationkey
         |        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         |        AND s_nationkey = n2.n_nationkey
         |        AND p_type = 'PROMO') all_nations
         |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
      val americaNations = broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "AMERICA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cust_nkey")))
      val suppNation = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("supp_nkey"),
          col("n_name").as("nation")))
      val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
          "l_discount")
        .join(Tables.part(s, d).filter(col("p_type") === "PROMO")
            .select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_custkey",
            "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(americaNations, col("c_nationkey") === col("cust_nkey"))
        .join(suppNation, col("s_nationkey") === col("supp_nkey"))
        .select(year(col("o_orderdate")).as("o_year"),
          volume.as("volume"), col("nation"))
        .groupBy("o_year")
        .agg((centSum(when(col("nation") === "NATION_5", col("volume"))
            .otherwise(0.0), 4) / centSum(col("volume"), 4))
          .as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9 product-type profit by nation and year. Adaptation: no
    // `partsupp` supply cost → cost proxy 0.1·p_retailprice·l_quantity
    // (retailprice has one decimal, quantity is whole → the proxy has ≤2
    // decimals; the amount expression carries ≤4 → scale-4 cents exact).
    // The 5-way join shape and the group-by-(nation, year) rollup — the
    // point of Q9 — are intact; the LIKE filter rides the part dim.
    QueryDef.sql(
      "tpch_q9",
      s"""SELECT nation, o_year,
         |  ${duckCentSum("amount", 4)} AS sum_profit
         |FROM (SELECT n_name AS nation,
         |        CAST(year(o_orderdate) AS INT) AS o_year,
         |        l_extendedprice * (1 - l_discount)
         |          - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity
         |          AS amount
         |      FROM part, supplier, lineitem, orders, nation
         |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
         |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |        AND p_name LIKE '%red%') profit
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(Tables.part(s, d).filter(col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(centSum(amount, 4).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q10 returned-item reporting: top 20 customers by revenue lost to
    // returns in a quarter. The projected address/phone/comment columns
    // don't exist; the join/agg/topk shape is intact, c_custkey tiebreaks.
    QueryDef.sql(
      "tpch_q10",
      s"""SELECT c_custkey, c_name, $duckRevenue AS revenue, c_acctbal,
         |  n_name
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
          .join(Tables.orders(s, d)
              .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1996-04-01"))
              .select("o_orderkey", "o_custkey"),
            col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d)
              .filter(col("l_returnflag") === "R")
              .select("l_orderkey", "l_extendedprice", "l_discount"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, d)
              .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(revenue.as("revenue"))
          .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
          .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // Q11 important stock. Adaptation: no `partsupp` → a part's "value"
    // is the discounted revenue its NATION_3-based suppliers shipped;
    // the defining shape — a grouped sum gated by a SCALAR-SUBQUERY
    // fraction of the same sum's grand total — is intact. Both the
    // per-part values and the grand total are exact cent sums, so the
    // `>` gate is engine- and partitioning-independent; the threshold
    // multiply is one identical IEEE op on both sides.
    QueryDef.sql(
      "tpch_q11",
      s"""WITH val AS (
         |  SELECT l_partkey,
         |    ${duckCentSum("l_extendedprice * (1 - l_discount)", 4)} AS value
         |  FROM lineitem, supplier, nation
         |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_3'
         |  GROUP BY l_partkey)
         |SELECT l_partkey AS ps_partkey, value
         |FROM val
         |WHERE value > (
         |  SELECT CAST(0.002 AS DOUBLE) *
         |    ${duckCentSum("l_extendedprice * (1 - l_discount)", 4)}
         |  FROM lineitem, supplier, nation
         |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |    AND n_name = 'NATION_3')
         |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, d) =>
      val n3Supp = broadcast(Tables.supplier(s, d)
        .select("s_suppkey", "s_nationkey")
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
      val n3Lines = Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(n3Supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      // consumed twice (grand-total threshold + the gate) and ≤ |part|
      // rows — materialize once instead of re-scanning the fact per side
      val values = n3Lines.groupBy("l_partkey")
        .agg(revenue.as("value"))
        .localCheckpoint()
      // grand total re-aggregates the per-part cent sums — exact longs
      // summed in any order equal the direct grand total, so this reuses
      // `values` instead of scanning the fact twice
      val threshold = values
        .agg((lit(0.002) * centSum(col("value"), 4)).as("bound"))
      values
        .join(broadcast(threshold), col("value") > col("bound"))
        .select(col("l_partkey").as("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    // Q12 shipping-lag classes. Adaptation: no l_shipmode / commit /
    // receipt dates → the mode is DERIVED (SLOW = shipped >60 days after
    // the order opened), and "late" rides the join as a timestamp-interval
    // comparison. The point of Q12 — conditional CASE-sums over a
    // fact⋈dim join keyed by a derived class — is intact.
    QueryDef.sql(
      "tpch_q12",
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |         THEN 'SLOW' ELSE 'FAST' END AS ship_mode,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .select("l_orderkey", "l_shipdate")
        .join(Tables.orders(s, d)
            .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(when(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"), "SLOW")
          .otherwise("FAST").as("ship_mode"))
        .agg(
          sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
          sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
        .orderBy("ship_mode")
    },

    // Q13 customer order-count distribution: LEFT join with an extra
    // predicate INSIDE the join condition (the original excludes a
    // comment pattern; here the excluded class is '4-NOT SPECIFIED'
    // priority), then a two-level aggregate.
    QueryDef.sql(
      "tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |        AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) {
      (s, d) =>
        Tables.customer(s, d).select("c_custkey")
          .join(Tables.orders(s, d)
              .select("o_orderkey", "o_custkey", "o_orderpriority"),
            col("c_custkey") === col("o_custkey") &&
              col("o_orderpriority") =!= "4-NOT SPECIFIED",
            "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14 promotion effect: PROMO share of one month's revenue, percent.
    // Ratio of exact cent sums × an exact integer literal — deterministic.
    QueryDef.sql(
      "tpch_q14",
      s"""SELECT CAST(100 AS DOUBLE)
         |    * (${duckCentSum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4)})
         |    / ($duckRevenue) AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-03-01") &&
            col("l_shipdate") < ts("1996-04-01"))
          .select("l_partkey", "l_extendedprice", "l_discount")
          .join(Tables.part(s, d).select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) *
            centSum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .otherwise(0.0), 4) / revenue).as("promo_revenue"))
    },

    // Q15 top supplier: suppliers achieving the maximum quarterly
    // revenue. The scalar-subquery max is a 1-row broadcast joined on
    // EXACT equality — sound only because revenue is an integer-cent sum
    // (a float sum would make `= max` partition-dependent).
    QueryDef.sql(
      "tpch_q15",
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey AS supplier_no, $duckRevenue AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier, revenue0
         |WHERE s_suppkey = supplier_no
         |  AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val revenue0 = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(revenue.as("total_revenue"))
      val maxRev = revenue0.agg(max(col("total_revenue")).as("max_rev"))
      revenue0
        .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
        .join(Tables.supplier(s, d).select("s_suppkey", "s_name"),
          col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // Q16 part-supplier relationship count. Adaptation: the supplier set
    // per part comes from the fact table; the excluded-supplier NOT IN
    // subquery targets negative balances (original: complaint comments).
    // The point — a count(DISTINCT) rollup over a fact⋈dim join minus a
    // null-safe anti-joined exclusion set — is intact. s_suppkey is
    // never null, so NOT IN ≡ left-anti.
    QueryDef.sql(
      "tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
      (s, d) =>
        val targetParts = broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        val badSupp = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        Tables.lineitem(s, d).select("l_partkey", "l_suppkey")
          .join(targetParts, col("p_partkey") === col("l_partkey"))
          .join(broadcast(badSupp),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
    },

    // Q17 small-quantity-order revenue: lines under 20% of their part's
    // average quantity, for one brand. The correlated scalar subquery is
    // declared as a per-part aggregate joined back — the decorrelated
    // plan Catalyst would have to derive anyway, stated directly. The
    // quantity average is exact (whole-number doubles), so the < bound is
    // engine-portable.
    QueryDef.sql(
      "tpch_q17",
      s"""SELECT ${duckCentSum("l_extendedprice", 2)}
         |    / CAST(7 AS DOUBLE) AS avg_yearly
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND p_brand = 'Brand#13'
         |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
         |                    WHERE l2.l_partkey = p_partkey)""".stripMargin) {
      (s, d) =>
        val partAvg = Tables.lineitem(s, d)
          .groupBy(col("l_partkey").as("avg_pkey"))
          .agg((lit(0.2) * (sum(col("l_quantity")) / count(lit(1))))
            .as("qty_bound"))
        Tables.lineitem(s, d)
          .select("l_partkey", "l_quantity", "l_extendedprice")
          .join(Tables.part(s, d).filter(col("p_brand") === "Brand#13")
              .select("p_partkey"),
            col("l_partkey") === col("p_partkey"))
          .join(partAvg, col("l_partkey") === col("avg_pkey"))
          .filter(col("l_quantity") < col("qty_bound"))
          .agg((centSum(col("l_extendedprice"), 2) / lit(7.0))
            .as("avg_yearly"))
    },

    // Q18 large-volume customers: orders whose total quantity exceeds the
    // threshold — a HAVING-gated semi join back onto the fact, then the
    // customer roll-up. Threshold 300 ≈ the original's top-tail cut.
    QueryDef.sql(
      "tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  sum(l_quantity) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING sum(l_quantity) > 300)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) {
      (s, d) =>
        val l = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        val bigOrders = l.groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("sq"))
          .filter(col("sq") > 300)
          .select(col("l_orderkey").as("big_okey"))
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
          .join(bigOrders, col("o_orderkey") === col("big_okey"),
            "left_semi")
          .join(Tables.customer(s, d).select("c_custkey", "c_name"),
            col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice")
          .agg(sum(col("l_quantity")).as("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    },

    // Q19 discounted-revenue under a DISJUNCTION of brand/size/quantity
    // bands. Adaptation: the container and shipinstruct terms don't exist
    // → each branch keeps its (brand equality, size band, quantity band)
    // triple. The point of Q19 — an OR-of-ANDs predicate straddling a
    // join, where the join key equality is the only common factor and the
    // per-side conjuncts (brand/size on part, quantity on lineitem) must
    // still prune their scans — is intact.
    QueryDef.sql(
      "tpch_q19",
      s"""SELECT $duckRevenue AS revenue
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND (
         |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |      AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |      AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
         |      AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(Tables.part(s, d).select("p_partkey", "p_brand", "p_size"),
          col("p_partkey") === col("l_partkey") && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))))
        .agg(revenue.as("revenue"))
    },

    // Q20 dominant suppliers of red parts. Adaptation: no partsupp
    // availqty → "excess stock" becomes "shipped >30% of the part's 1996
    // volume". The defining shape — an IN-subquery whose HAVING gate is
    // itself a correlated scalar subquery, then a semi join up to the
    // supplier dim — is intact. Quantity sums are whole-number doubles →
    // exact; the 0.3 multiply is one identical IEEE op in both engines.
    QueryDef.sql(
      "tpch_q20",
      """SELECT s_name, n_name
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem l1, part
        |    WHERE l1.l_partkey = p_partkey AND p_name LIKE 'red%'
        |      AND l1.l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l1.l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_suppkey, l1.l_partkey
        |    HAVING sum(l_quantity) > (
        |      SELECT CAST(0.3 AS DOUBLE) * sum(l2.l_quantity)
        |      FROM lineitem l2
        |      WHERE l2.l_partkey = l1.l_partkey
        |        AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
        |  AND s_nationkey = n_nationkey AND n_regionkey = 2
        |ORDER BY s_name""".stripMargin) { (s, d) =>
      val redL96 = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(Tables.part(s, d)
            .filter(col("p_name").like("red%")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
      // consumed twice (per-part totals + the dominance filter) and small
      // (≤ |supplier|·|red parts| rows) — materialize once
      val perSuppPart = redL96.groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity")).as("sq"))
        .localCheckpoint()
      // per-part 1996 totals re-aggregate the (supp, part) partials —
      // whole-number doubles sum exactly, so this equals a direct scan
      val perPart = perSuppPart.groupBy(col("l_partkey").as("t_pkey"))
        .agg((lit(0.3) * sum(col("sq"))).as("bound"))
      val dominant = perSuppPart
        .join(perPart, col("l_partkey") === col("t_pkey"))
        .filter(col("sq") > col("bound"))
        .select("l_suppkey")
      Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)
            .filter(col("n_regionkey") === 2)
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    },

    // Q21 suppliers who kept orders waiting. Adaptation: no commit /
    // receipt dates → "late" = shipped >90 days after the order opened.
    // The defining shape — a correlated EXISTS (another supplier touched
    // the same order) AND NOT EXISTS (another supplier was ALSO late),
    // both riding the order key with a supplier-inequality term — is
    // intact: semi + anti joins carrying a non-equi conjunct. The late
    // relation is built once and reused for both the probe and the anti
    // side.
    QueryDef.sql(
      "tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate >
        |                        o3.o_orderdate + INTERVAL 90 DAY)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
        |GROUP BY s_name ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin) { (s, d) =>
      val fOrders = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      // all late (order, supplier) pairs on F-status orders — consumed
      // TWICE (probe side and anti side), so materialize once instead of
      // re-running the lineitem⋈orders join per consumer (the l30
      // shared-relation discipline; at scale this persists to local disk)
      val late = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(fOrders, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint()
      val allLines = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("l2_okey"),
          col("l_suppkey").as("l2_skey"))
      val lateOther = late
        .select(col("l_orderkey").as("l3_okey"),
          col("l_suppkey").as("l3_skey"))
      late
        .join(allLines, col("l2_okey") === col("l_orderkey") &&
          col("l2_skey") =!= col("l_suppkey"), "left_semi")
        .join(lateOther, col("l3_okey") === col("l_orderkey") &&
          col("l3_skey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(Tables.supplier(s, d)
            .select("s_suppkey", "s_name", "s_nationkey")
            .join(broadcast(Tables.nation(s, d)
                .filter(col("n_name") === "NATION_2")
                .select("n_nationkey")),
              col("s_nationkey") === col("n_nationkey"))
            .select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(100)
    },

    // Q22 global sales opportunity: high-balance customers in a key set
    // with no recent orders. Adaptations: the phone-prefix country code
    // doesn't exist → c_nationkey IN (…); plain NOT EXISTS is empty here
    // (every customer has old orders) → "no orders SINCE 2000" keeps the
    // anti-join + avg-scalar-subquery shape with a non-empty answer.
    QueryDef.sql(
      "tpch_q22",
      s"""SELECT c_nationkey AS cntrycode, count(*) AS numcust,
         |  ${duckCentSum("c_acctbal", 2)} AS totacctbal
         |FROM customer
         |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
         |  AND c_acctbal > (SELECT ${Det.duckCentAvg("c_acctbal", 2)}
         |                   FROM customer
         |                   WHERE c_acctbal > 0
         |                     AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |                  WHERE o_custkey = c_custkey
         |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin) {
      (s, d) =>
        val keys = Seq(1, 3, 5, 7, 9, 11, 13)
        val cust = Tables.customer(s, d)
          .filter(col("c_nationkey").isin(keys: _*))
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg(Det.centAvg(col("c_acctbal"), 2).as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("2000-01-01"))
          .select("o_custkey")
        cust
          .join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            centSum(col("c_acctbal"), 2).as("totacctbal"))
          .orderBy("cntrycode")
    }
  )
}
