package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DuckDB-dialect conveniences reachable through the reference passthrough
  * (`db/db.go:70`) that Spark SQL does not spell the same way: QUALIFY,
  * DISTINCT ON, SELECT * EXCLUDE/REPLACE, GROUP BY ALL. Each query is the
  * idiomatic Spark rewrite; each ORACLE uses the native DuckDB syntax —
  * so the driver check certifies that a reference client's dialect query
  * has an exact-equivalent here.
  */
object Dialect {
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- QUALIFY (filter on a window result without a subquery):
    // Spark rewrite = window column + filter, which Catalyst plans
    // identically to DuckDB's QUALIFY
    "q45_qualify" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      Tables(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 2)
    },

    // ---- DISTINCT ON (first row per key under an explicit order):
    // Spark rewrite = row_number = 1 (arg-top-1 per key)
    "q46_distinct_on" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    },

    // ---- SELECT * EXCLUDE (...) REPLACE (...): drop + in-place rewrite.
    // No round() on the computed quotient: Spark rounds via the double's
    // shortest decimal rendering, DuckDB via its binary value — they split
    // at e.g. 69.195 (Det rule). A plain IEEE division is bit-identical.
    "q47_star_modifiers" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .drop("o_orderdate", "o_orderpriority")
        .withColumn("o_totalprice", col("o_totalprice") / 1000.0)
    },

    // ---- GROUP BY ALL (group by every non-aggregate select column)
    "q48_group_by_all" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    },

    // ---- LATERAL correlated subquery in FROM (per-key top-k without a
    // window): Spark ≥3.2 plans this as a decorrelated join, same as
    // DuckDB — the SQL text is identical on both engines
    "q49_lateral_topk" -> { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders_lat")
      s.sql(
        """SELECT s.o_orderstatus, t.o_orderkey, t.o_totalprice
          |FROM (SELECT DISTINCT o_orderstatus FROM orders_lat) s,
          |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
          |         WHERE o.o_orderstatus = s.o_orderstatus
          |         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
          |         LIMIT 2) t""".stripMargin)
    },

    // ---- WITH RECURSIVE (Spark ≥4.0): month spine + per-month order
    // counts — the canonical gaps-preserving time series.
    // Spark executes a recursive CTE one JOB per recursion step (24
    // months = 24 driver-latency round trips for a 24-row spine — r5
    // verdict's top floor item). The spine is statically bounded, so the
    // registered plan generates it with sequence() in ONE job and
    // pre-aggregates orders per month BELOW the join: the join input
    // shrinks from |orders| rows to |distinct months| rows, which is the
    // scale-correct shape at any corpus size. The genuine iterative
    // WITH RECURSIVE execution stays exercised — and asserted equal to
    // this plan — in SetOpsAndRecursiveSpec.
    "q50_recursive_cte" -> { (s, dir) =>
      val months = s.sql(
        "SELECT explode(sequence(DATE'1995-01-01', DATE'1996-12-01', INTERVAL '1' MONTH)) AS m")
      val counts = Tables(s, dir, "orders")
        .groupBy(date_trunc("MONTH", col("o_orderdate")).cast(DateType).as("m"))
        .agg(count(col("o_orderkey")).as("cnt"))
      months.join(counts, Seq("m"), "left")
        .select(col("m").as("month_start"),
          coalesce(col("cnt"), lit(0L)).as("n_orders"))
    },

    // ---- COLUMNS('regex') projection: DuckDB selects by column-name
    // pattern; the Spark rewrite resolves the pattern against the schema
    // at plan time (a pure metadata operation — the scan is pruned to the
    // matched columns exactly as with an explicit list)
    "q52_columns_regex" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
      val picked = li.columns
        .filter(c => c == "l_orderkey" || c.matches("l_.*price|l_discount"))
      li.select(picked.map(col).toIndexedSeq: _*)
    },

    // ---- SUMMARIZE-style table profiling (the data-audit statement a
    // pipeline runs before trusting a new drop): one aggregation pass per
    // profiled column — count, exact distinct, nulls, min/max rendered as
    // strings (deterministic for int/date/varchar; double rendering
    // differs between engines, so doubles profile via their own queries).
    // Each per-column aggregate is partial+final; the union is metadata.
    "q53_profile" -> { (s, dir) =>
      // one scan per profiled column, deliberately: an all-columns fused
      // agg was A/B-measured 4× SLOWER at the 10× corpus (three
      // multi-column count-distincts force one Expand carrying every
      // distinct column through the shuffle — 3 narrow passes beat 1 wide
      // one; same conclusion as r4's q14 split-distinct A/B)
      val o = Tables(s, dir, "orders")
      def prof(c: String) = o
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col(c)).as("n_distinct"),
          count(when(col(c).isNull, 1)).as("n_null"),
          min(col(c)).cast(StringType).as("min_v"),
          max(col(c)).cast(StringType).as("max_v"))
        .select(lit(c).as("column_name"), col("n"), col("n_distinct"),
          col("n_null"), col("min_v"), col("max_v"))
      prof("o_orderkey")
        .unionByName(prof("o_orderstatus"))
        .unionByName(prof("o_orderdate"))
    },

    // ---- window frame EXCLUDE (DuckDB: EXCLUDE CURRENT ROW / GROUP /
    // TIES): Spark has no EXCLUDE clause, but over a whole-partition
    // frame each variant is exact frame arithmetic on two windows —
    // partition totals and the RANGE CURRENT ROW peer group:
    //   EXCLUDE CURRENT ROW = total − current
    //   EXCLUDE GROUP       = total − peer_sum
    //   EXCLUDE TIES        = total − peer_sum + current
    // Sums run on exact scaled longs (Det contract; `value` is 2-decimal
    // by data contract — round(value*100) and the oracle's DECIMAL(18,2)
    // cast agree on exactly-2-decimal doubles) so the subtraction is
    // partition-order invariant. NULL handling matches native EXCLUDE (a
    // NULL row contributes nothing whether included or excluded): the
    // arithmetic coalesces the excluded terms to 0 and each result is
    // NULL exactly when its post-exclusion frame holds no NON-NULL value
    // — gates count `c`, not rows. Both windows are user-partitioned —
    // no global sort, parallelism scales with users.
    "q58_frame_exclude" -> { (s, dir) =>
      val part = Window.partitionBy(col("user_id"))
      val peers = part.orderBy(col("day").asc_nulls_first)
        .rangeBetween(Window.currentRow, Window.currentRow)
      Tables(s, dir, "events")
        .withColumn("day", col("ts").cast(DateType))
        // PRECONDITION: events.value is an exact 2-dp double (generator
        // contract, TESTDATA.md) — only then ScaledLong ≡ round(v*100)
        // (ScaledLong.apply scaladoc); a non-2-dp column here would
        // silently change rounding vs the oracle's DECIMAL(18,2) cast
        .withColumn("c", graft.functions.ScaledLong(col("value"), 2))
        .withColumn("c_nn", when(col("c").isNotNull, 1).otherwise(0))
        .withColumn("nn_part", count(col("c")).over(part))
        .withColumn("nn_peer", count(col("c")).over(peers))
        .withColumn("sum_part", sum(coalesce(col("c"), lit(0L))).over(part))
        .withColumn("sum_peer", sum(coalesce(col("c"), lit(0L))).over(peers))
        .select(col("event_id"), col("user_id"), col("day"), col("value"),
          when(col("nn_part") - col("c_nn") > 0,
            (col("sum_part") - coalesce(col("c"), lit(0L))) / 100.0).as("excl_current"),
          when(col("nn_part") - col("nn_peer") > 0,
            (col("sum_part") - col("sum_peer")) / 100.0).as("excl_group"),
          when(col("nn_part") - col("nn_peer") + col("c_nn") > 0,
            (col("sum_part") - col("sum_peer") + coalesce(col("c"), lit(0L))) / 100.0)
            .as("excl_ties"))
    },

    // ---- frame EXCLUDE over BOUNDED frames (closing q58's partial):
    //   - EXCLUDE CURRENT ROW composes with an arbitrary ROWS frame under
    //     a fully deterministic ordering (day, event_id): frame sum minus
    //     the current row.
    //   - EXCLUDE GROUP / TIES compose with a bounded RANGE frame: RANGE
    //     bounds are VALUE-based, so the peer group (equal order key) is
    //     always wholly inside the frame and the arithmetic
    //     frame − peers (+ current) is exact. A ROWS frame that cuts
    //     through a peer group is nondeterministic ACROSS ENGINES by
    //     construction — which peers land in the frame depends on tie
    //     order — so the RANGE spelling is the one with a well-defined
    //     answer to verify against.
    // Same Det scaled-long + non-null-count gating as q58; windows stay
    // user-partitioned.
    "q58b_frame_exclude_bounded" -> { (s, dir) =>
      val byRows = Window.partitionBy(col("user_id"))
        .orderBy(col("day_num").asc_nulls_first, col("event_id").asc_nulls_first)
        .rowsBetween(-3, 3)
      val byRange = Window.partitionBy(col("user_id"))
        .orderBy(col("day_num").asc_nulls_first).rangeBetween(-3, 3)
      val peers = Window.partitionBy(col("user_id"))
        .orderBy(col("day_num").asc_nulls_first).rangeBetween(0, 0)
      Tables(s, dir, "events")
        .withColumn("day", col("ts").cast(DateType))
        .withColumn("day_num", datediff(col("day"), to_date(lit("1990-01-01"))))
        // PRECONDITION: exact-2-dp events.value (see q58's note)
        .withColumn("c", graft.functions.ScaledLong(col("value"), 2))
        .withColumn("c_nn", when(col("c").isNotNull, 1).otherwise(0))
        .withColumn("rows_sum", sum(coalesce(col("c"), lit(0L))).over(byRows))
        .withColumn("rows_nn", count(col("c")).over(byRows))
        .withColumn("rng_sum", sum(coalesce(col("c"), lit(0L))).over(byRange))
        .withColumn("rng_nn", count(col("c")).over(byRange))
        .withColumn("peer_sum", sum(coalesce(col("c"), lit(0L))).over(peers))
        .withColumn("peer_nn", count(col("c")).over(peers))
        .select(col("event_id"), col("user_id"), col("day"), col("value"),
          when(col("rows_nn") - col("c_nn") > 0,
            (col("rows_sum") - coalesce(col("c"), lit(0L))) / 100.0)
            .as("excl_current_rows"),
          when(col("rng_nn") - col("peer_nn") > 0,
            (col("rng_sum") - col("peer_sum")) / 100.0).as("excl_group_range"),
          when(col("rng_nn") - col("peer_nn") + col("c_nn") > 0,
            (col("rng_sum") - col("peer_sum") + coalesce(col("c"), lit(0L))) / 100.0)
            .as("excl_ties_range"))
    },

    // ---- read_parquet table function in PURE SQL TEXT through the
    // gateway (db/db.go:70 — a DuckDB client's most common ad-hoc idiom):
    // the gateway rewrites `FROM read_parquet('path')` to a temp view over
    // the file, so pushdown/pruning work exactly as on a registered table.
    // The oracle runs DuckDB's native read_* machinery on the same file
    // (the driver's `documents` view IS that parquet), certifying the
    // whole SQL-text path end to end.
    "q59_read_fn" -> { (s, dir) =>
      new graft.engine.SqlGateway(s).queryDf(
        s"""SELECT source, count(*) AS n_docs,
           |  CAST(sum(length(text)) AS BIGINT) AS total_chars
           |FROM read_parquet('$dir/documents.parquet')
           |GROUP BY source""".stripMargin)
    })

  val oracles: Map[String, String] = Map(
    "q45_qualify" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS INT) AS rn
        |FROM orders
        |QUALIFY rn <= 2
        |ORDER BY o_orderstatus ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin,

    "q46_distinct_on" ->
      """SELECT DISTINCT ON (o_orderstatus) o_orderstatus, o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC NULLS LAST,
        |  o_orderkey ASC NULLS FIRST""".stripMargin,

    "q47_star_modifiers" ->
      """SELECT * EXCLUDE (o_orderdate, o_orderpriority)
        |  REPLACE (o_totalprice / 1000.0 AS o_totalprice)
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "q48_group_by_all" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders
         |GROUP BY ALL
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q49_lateral_topk" ->
      """SELECT s.o_orderstatus, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT o_orderstatus FROM orders) s,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_orderstatus = s.o_orderstatus
        |         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |         LIMIT 2) t
        |ORDER BY s.o_orderstatus ASC NULLS FIRST, t.o_totalprice DESC NULLS LAST""".stripMargin,

    "q50_recursive_cte" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        |  WHERE m < CAST('1996-12-01' AS DATE)
        |)
        |SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders
        |  ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
        |GROUP BY m
        |ORDER BY month_start ASC NULLS FIRST""".stripMargin,

    "q52_columns_regex" ->
      """SELECT l_orderkey, COLUMNS('l_.*price|l_discount')
        |FROM lineitem
        |WHERE l_orderkey < 1000
        |ORDER BY l_orderkey ASC NULLS FIRST, l_extendedprice ASC NULLS FIRST,
        |  l_discount ASC NULLS FIRST""".stripMargin,

    "q53_profile" ->
      """SELECT 'o_orderkey' AS column_name, COUNT(*) AS n,
        |  COUNT(DISTINCT o_orderkey) AS n_distinct,
        |  COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS n_null,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_v,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_v
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*), COUNT(DISTINCT o_orderstatus),
        |  COUNT(*) FILTER (WHERE o_orderstatus IS NULL),
        |  CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', COUNT(*), COUNT(DISTINCT o_orderdate),
        |  COUNT(*) FILTER (WHERE o_orderdate IS NULL),
        |  CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
        |FROM orders
        |ORDER BY column_name ASC NULLS FIRST""".stripMargin,

    "q58_frame_exclude" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS day, "value",
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE CURRENT ROW) AS DOUBLE) AS excl_current,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS DATE) ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS DOUBLE) AS excl_group,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS DATE) ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE TIES) AS DOUBLE) AS excl_ties
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,

    "q58b_frame_exclude_bounded" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS day, "value",
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS DATE) ASC NULLS FIRST, event_id ASC NULLS FIRST
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
        |    EXCLUDE CURRENT ROW) AS DOUBLE) AS excl_current_rows,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY (CAST(ts AS DATE) - DATE '1990-01-01') ASC NULLS FIRST
        |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
        |    EXCLUDE GROUP) AS DOUBLE) AS excl_group_range,
        |  CAST(SUM(CAST("value" AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY (CAST(ts AS DATE) - DATE '1990-01-01') ASC NULLS FIRST
        |    RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING
        |    EXCLUDE TIES) AS DOUBLE) AS excl_ties_range
        |FROM events
        |ORDER BY event_id ASC NULLS FIRST""".stripMargin,

    "q59_read_fn" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin)
}
