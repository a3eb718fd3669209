package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational surface of the reference (SURVEY.md §2.3–§2.5, §2.7).
  *
  * The reference delegates all of this to embedded DuckDB through the two
  * passthrough calls (reference `db/db.go:52` write, `db/db.go:70` read);
  * here each capability is re-expressed as a declarative DataFrame plan so
  * Catalyst gets to push filters to parquet, prune columns, and pick join
  * strategies. Dimension tables (region/nation/supplier/part/customer) are
  * explicitly `broadcast()` where they join a fact table — at 100 TB the
  * fact side never shuffles for those joins.
  *
  * Determinism contract with the DuckDB oracle: see [[Det]]. Output VALUES
  * are bit-deterministic; output ROW ORDER is not part of the contract —
  * the driver's compare row-sorts both sides before hashing, and a global
  * sort appended to every query is exactly the operation you would not run
  * over a 100 TB result (it adds a range-sampling pass + a range exchange
  * per query for presentation only). Ordering stays where it is semantics:
  * top-k/limit/offset (q03, q37), the dedicated ORDER BY query (q09), and
  * every window/positional ordering inside the plans. ORDER BY in the
  * oracle SQL is harmless (DuckDB-side, cheap) and kept for readability.
  */
object Relational {
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- scan → filter → hash-agg → sort (TPC-H Q1 style pricing summary)
    "q01_pricing_summary" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          chargeSum(col("l_extendedprice"), col("l_discount"), col("l_tax"))
            .as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // ---- projection + predicate zoo: IN / BETWEEN / LIKE / boolean mix
    "q02_filter_project" -> { (s, dir) =>
      Tables(s, dir, "part")
        .filter(
          col("p_size").between(10, 30) &&
          col("p_type").isin("ECONOMY", "PROMO", "STANDARD") &&
          col("p_name").like("%widget%") &&
          !(col("p_brand") === "Brand#13"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          (money(col("p_retailprice")) * lit(1.1).cast(DecimalType(4, 2)))
            .cast(DoubleType).as("marked_up"),
          col("p_size"))
    },

    // ---- 3-way join, group, top-k revenue (TPC-H Q3 style)
    "q03_topk_revenue" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").filter(col("o_orderdate") < lit("1997-06-01").cast(TimestampType))
      val l = Tables(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-06-01").cast(TimestampType))
      // no broadcast hint on customer: it scales with the corpus, so the
      // join strategy must stay a stats/AQE decision (broadcast at small
      // SF, shuffle join at 100 TB).
      // Revenue pre-aggregates BELOW the joins (q04's r2 rewrite): the
      // group keys are functionally just l_orderkey (orders is unique per
      // key, so o_orderdate/o_orderpriority are constant within a group),
      // and the aggregation runs on the pinned orderkey layout — zero
      // exchange — shrinking the join input from line items to orders.
      // Joining orders AFTER the per-order aggregate is exact: both the
      // customer-segment and order-date predicates drop whole orders.
      val lAgg = l.groupBy(col("l_orderkey"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      lAgg.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(
          col("l_orderkey"),
          col("revenue"),
          col("o_orderdate").cast(DateType).as("odate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc_nulls_last, col("l_orderkey").asc_nulls_first)
        .limit(10)
    },

    // ---- left outer join, per-order line stats (orders with no lines kept).
    // lineitem is pre-aggregated per l_orderkey BELOW the join: the join's
    // streamed side shrinks from ~4 lines/order to 1 row/order before any
    // join shuffle — at 100 TB that is a 4×+ cut in shuffled bytes, and the
    // partial aggregate absorbs key skew before the join sees it.
    "q04_join_left" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val lagg = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("ln"), dsum(col("l_quantity")).as("sq"))
      o.join(lagg, col("o_orderkey") === col("l_orderkey"), "left")
        .select(
          col("o_orderkey"),
          coalesce(col("ln"), lit(0L)).as("n_lines"),
          coalesce(col("sq"), lit(0.0)).as("sum_qty"))
    },

    // ---- right outer join (the mirrored preserve-side: every order kept,
    // bulk lines optional). Same scale posture as q04 — the preserved side
    // is the smaller pre-filtered relation, Catalyst/AQE picks the build.
    "q44_join_right" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val bulk = Tables(s, dir, "lineitem").filter(col("l_quantity") > 45)
      bulk.join(o, col("l_orderkey") === col("o_orderkey"), "right")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(col("l_orderkey")).as("n_bulk_lines"),
          count(lit(1)).as("n_rows"),
          coalesce(dsum(col("l_extendedprice")), lit(0.0)).as("bulk_revenue"))
    },

    // ---- 6-way star join with two broadcast dims (TPC-H Q5 style)
    "q05_star_join" -> { (s, dir) =>
      val r = Tables(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      val sup = Tables(s, dir, "supplier")
      val l = Tables(s, dir, "lineitem")
      // broadcast hints only on the bounded dims (nation: 25 rows, region:
      // 5 rows — fixed at any scale factor); customer/supplier grow with
      // the corpus, so their join strategy stays with Catalyst/AQE.
      // The region restriction is pushed THROUGH the join graph by hand:
      // only ASIA nations' customers and suppliers can survive the final
      // joins, so both fact-side dims shrink ~5× BEFORE the expensive
      // shuffles — a transitive pushdown Catalyst cannot infer from the
      // c_nationkey = s_nationkey link (inner joins commute, so the plan
      // is semantically identical; the oracle replays the stock shape)
      val asiaN = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cA = c.join(broadcast(asiaN), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val supA = sup.join(broadcast(asiaN.select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"))
      // join ORDER matters for shuffle volume (r5 regression, A/B'd r6):
      // l⋈o first kept lineitem's pinned orderkey layout free, but then
      // re-shuffled the whole l⋈o RESULT by custkey — the fattest possible
      // re-key. Joining o⋈cA first shuffles only orders by custkey; the
      // ASIA-filtered result re-keys back to orderkey (~1/5 of orders) and
      // lineitem — the biggest table — joins on its native layout and is
      // never exchanged before the final agg. supA's keying stays an
      // AQE/stats decision (broadcast at bench SF, shuffle at 100 TB,
      // where it re-keys the ASIA-filtered fifth of the join result).
      // custkey-side of the star reads the custkey-keyed resident layout
      // (Tables.keyed — the in-memory twin of a second bucketed projection)
      // so o⋈cA is co-located when customer outgrows the broadcast
      // threshold; outside a pinned session it is the plain table
      val oCust = Tables.keyed(s, dir, "orders", "o_custkey", "customer")
      val oc = oCust.join(cA, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
      l.join(oc, col("l_orderkey") === col("o_orderkey"))
        .join(supA,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },

    // ---- conditional aggregation (FILTER / CASE WHEN inside agg)
    "q06_cond_agg" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"),
          dsum(when(col("l_quantity") > 25, col("l_extendedprice")).otherwise(lit(0.0)))
            .as("bulk_revenue"),
          count(lit(1)).as("n_total"))
    },

    // ---- semi/anti join semantics (EXISTS / NOT EXISTS decorrelated)
    "q07_semi_anti" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      // custkey-keyed resident layout: the distinct over 1.5M order rows
      // folds map-side into the existing hash(custkey) partitioning
      // instead of exchanging the fact side every run (plain table when
      // the session has no pinned corpus)
      val oKeys = Tables.keyed(s, dir, "orders", "o_custkey", "customer")
        .select(col("o_custkey")).distinct()
      c.join(oKeys, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(col("o_custkey")).as("n_with_orders"),
          (count(lit(1)) - count(col("o_custkey"))).as("n_without_orders"))
    },

    // ---- full outer join with both-side-only counts
    "q08_full_outer" -> { (s, dir) =>
      val rich = Tables(s, dir, "customer").filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("k")).distinct()
      val big = Tables.keyed(s, dir, "orders", "o_custkey", "customer")
        .filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey").as("k2")).distinct()
      rich.join(big, col("k") === col("k2"), "full")
        .agg(
          count(when(col("k").isNotNull && col("k2").isNotNull, 1)).as("n_both"),
          count(when(col("k2").isNull, 1)).as("n_rich_only"),
          count(when(col("k").isNull, 1)).as("n_big_only"))
    },

    // ---- cross join (tiny × tiny)
    "q09_cross_join" -> { (s, dir) =>
      val r = Tables(s, dir, "region").select(col("r_name"))
      val st = Tables(s, dir, "orders").select(col("o_orderstatus")).distinct()
      r.crossJoin(st)
        .orderBy(col("r_name").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
    },

    // ---- set operations: UNION / INTERSECT / EXCEPT as labeled counts.
    // All six set-operation cardinalities derive from ONE shuffle (r5
    // verdict floor item — the literal six-operator formulation paid six
    // shuffle pairs over the same two inputs): tag each side, count per
    // key, and fold each per-key multiplicity pair (ca, cb) with the
    // standard SQL bag algebra —
    //   union_all = Σ(ca+cb)         union     = #keys
    //   intersect = #keys(ca>0∧cb>0) intersect_all = Σ min(ca,cb)
    //   except    = #keys(ca>0∧cb=0) except_all    = Σ max(ca−cb,0)
    // NULL keys group together, exactly the NULL-equality semantics SQL
    // set operators use. The genuine Dataset union/intersect/intersectAll/
    // except/exceptAll operators stay exercised — and asserted equal to
    // this derivation — in SetOpsAndRecursiveSpec (§2.7 evidence).
    "q10_setops" -> { (s, dir) =>
      val a = Tables(s, dir, "customer").filter(col("c_acctbal") < 1000.0)
        .select(col("c_custkey").as("k"), lit(1L).as("ia"), lit(0L).as("ib"))
      val b = Tables(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
        .select(col("o_custkey").as("k"), lit(0L).as("ia"), lit(1L).as("ib"))
      a.unionByName(b)
        .groupBy(col("k"))
        .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
        .agg(
          count(lit(1)).as("u"),
          sum(col("ca") + col("cb")).as("ua"),
          sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)).as("i"),
          sum(least(col("ca"), col("cb"))).as("ia_"),
          sum(when(col("ca") > 0 && col("cb") === 0, 1L).otherwise(0L)).as("e"),
          sum(greatest(col("ca") - col("cb"), lit(0L))).as("ea"))
        .select(expr(
          // coalesce: a global agg over ZERO groups yields one row with
          // NULL sums — every operator's count of two empty inputs is 0
          """stack(6, 'union', u, 'union_all', coalesce(ua, 0L),
            |'intersect', coalesce(i, 0L), 'intersect_all', coalesce(ia_, 0L),
            |'except', coalesce(e, 0L), 'except_all', coalesce(ea, 0L))
            |AS (op, n)""".stripMargin))
    },

    // ---- ROLLUP with GROUPING() flags
    "q11_rollup" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"),
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_prio"))
    },

    // ---- CUBE
    "q12_cube" -> { (s, dir) =>
      Tables(s, dir, "events")
        .cube(col("event_type"), (col("user_id") % 10).as("user_bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    },

    // ---- HAVING (post-aggregation filter)
    "q13_having" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), davg(col("c_acctbal")).as("avg_bal"))
        .filter(col("n_cust") >= 5)
    },

    // ---- DISTINCT aggregates. Stock Expand-based plan, kept after THREE
    // A/Bs against split formulations: r4 wash; r5 stock 1.19 vs split
    // 1.34 s at 10×; r13 re-measured under the current engine (static
    // pins + suite codegen cache) at BOTH scales — stock 0.342/1.275 s
    // vs two-phase 0.464/1.920 and preagg-then-expand 0.487/2.275
    // (BENCH_NOTES r13). Expand's ×3 fan-out partial-aggregates map-side
    // in ONE pass; every alternative adds a full extra shuffle.
    "q14_count_distinct" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          countDistinct(col("o_orderpriority")).as("n_prios"),
          count(lit(1)).as("n"))
    },

    // ---- scalar subquery (orders above global deterministic average)
    "q15_scalar_subquery" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val avgPrice = o.agg(davg(col("o_totalprice")).as("ap"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("ap"))
        .agg(count(lit(1)).as("n_above"), dsum(col("o_totalprice")).as("sum_above"))
    })

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  $revenueSumSql AS sum_disc_price,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         |    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q02_filter_project" ->
      """SELECT p_partkey, UPPER(p_name) AS uname,
        |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(4,2)) AS DOUBLE) AS marked_up,
        |  p_size
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30
        |  AND p_type IN ('ECONOMY','PROMO','STANDARD')
        |  AND p_name LIKE '%widget%'
        |  AND NOT (p_brand = 'Brand#13')
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "q03_topk_revenue" ->
      s"""SELECT l_orderkey,
         |  $revenueSumSql AS revenue,
         |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC NULLS LAST, l_orderkey ASC NULLS FIRST
         |LIMIT 10""".stripMargin,

    "q04_join_left" ->
      s"""SELECT o_orderkey, COUNT(l_orderkey) AS n_lines,
         |  COALESCE(${dsumSql("l_quantity")}, CAST(0.0 AS DOUBLE)) AS sum_qty
         |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderkey
         |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "q44_join_right" ->
      s"""SELECT o_orderstatus,
         |  COUNT(l_orderkey) AS n_bulk_lines,
         |  COUNT(*) AS n_rows,
         |  COALESCE(${dsumSql("l_extendedprice")}, CAST(0.0 AS DOUBLE)) AS bulk_revenue
         |FROM (SELECT * FROM lineitem WHERE l_quantity > 45) bulk
         |RIGHT JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q05_star_join" ->
      s"""SELECT n_name,
         |  $revenueSumSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""".stripMargin,

    "q06_cond_agg" ->
      s"""SELECT l_returnflag,
         |  COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
         |  ${dsumSql("CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE CAST(0.0 AS DOUBLE) END")} AS bulk_revenue,
         |  COUNT(*) AS n_total
         |FROM lineitem
         |GROUP BY l_returnflag
         |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin,

    "q07_semi_anti" ->
      """SELECT c_mktsegment,
        |  COUNT(o_custkey) AS n_with_orders,
        |  COUNT(*) - COUNT(o_custkey) AS n_without_orders
        |FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment ASC NULLS FIRST""".stripMargin,

    "q08_full_outer" ->
      """SELECT
        |  COUNT(*) FILTER (WHERE k IS NOT NULL AND k2 IS NOT NULL) AS n_both,
        |  COUNT(*) FILTER (WHERE k2 IS NULL) AS n_rich_only,
        |  COUNT(*) FILTER (WHERE k IS NULL) AS n_big_only
        |FROM (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0) a
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey AS k2 FROM orders WHERE o_totalprice > 150000.0) b
        |ON a.k = b.k2""".stripMargin,

    "q09_cross_join" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
        |ORDER BY r_name ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q10_setops" ->
      """WITH a AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal < 1000.0),
        |     b AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000.0)
        |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM a UNION SELECT k FROM b)
        |UNION ALL
        |SELECT 'union_all' AS op, COUNT(*) AS n FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, COUNT(*) AS n FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |UNION ALL
        |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
        |UNION ALL
        |SELECT 'except_all' AS op, COUNT(*) AS n FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        |ORDER BY op ASC NULLS FIRST""".stripMargin,

    "q11_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS total,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY g_status ASC NULLS FIRST, g_prio ASC NULLS FIRST,
         |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q12_cube" ->
      s"""SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n,
         |  ${dsumSql("\"value\"")} AS sum_value
         |FROM events
         |GROUP BY CUBE (event_type, user_id % 10)
         |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,

    "q13_having" ->
      s"""SELECT c_nationkey, COUNT(*) AS n_cust, ${davgSql("c_acctbal")} AS avg_bal
         |FROM customer
         |GROUP BY c_nationkey
         |HAVING COUNT(*) >= 5
         |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin,

    "q14_count_distinct" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS n_custs,
        |  COUNT(DISTINCT o_orderpriority) AS n_prios,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q15_scalar_subquery" ->
      s"""SELECT COUNT(*) AS n_above, ${dsumSql("o_totalprice")} AS sum_above
         |FROM orders
         |WHERE o_totalprice > (SELECT ${davgSql("o_totalprice")} FROM orders)""".stripMargin)
}
