package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining scalar-function families and join-rewrite surfaces of the
  * reference dialect (SURVEY.md §2.4 positional join, §2.8 math / array /
  * struct-map / interval families). All reachable through the reference's
  * `db/db.go:70` passthrough; re-expressed as codegen'd built-ins here.
  */
object Scalars {
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- math function family (deterministic IEEE ops only)
    "q29_math" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1 && col("l_orderkey") < 2000)
        .select(
          col("l_orderkey"),
          abs(col("l_quantity") - 25.0).as("dev"),
          ceil(col("l_discount") * 100).cast(LongType).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).cast(LongType).as("tax_pct_floor"),
          round(col("l_extendedprice") / 1000.0, 2).as("price_k"),
          // libm fns (pow/ln/exp) can differ from C in the last ulp —
          // round to 6 digits on both sides
          round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          greatest(col("l_quantity"), col("l_linenumber") * 10.0).as("g"),
          least(col("l_tax"), col("l_discount")).as("l"),
          pmod(col("l_orderkey"), lit(7)).as("okmod"),
          signum(col("l_quantity") - 25.0).cast(IntegerType).as("sgn"))
    },

    // ---- array family: construct, index, contains, sort, higher-order.
    // Array-typed outputs are serialized to JSON text in the contract
    // result (to_json here, to_json::VARCHAR in the oracle) so every cell
    // is scalar — the driver harness row-sorts/hashes cells and cannot
    // hash raw arrays.
    "q30_arrays" -> { (s, dir) =>
      Tables(s, dir, "nation")
        .withColumn("arr", array(col("n_nationkey"), col("n_regionkey"),
          col("n_nationkey") + col("n_regionkey")))
        .select(
          col("n_nationkey"),
          size(col("arr")).cast(LongType).as("arr_len"),
          element_at(col("arr"), 2).as("second"),
          array_contains(col("arr"), 3).as("has_three"),
          to_json(expr("transform(arr, x -> x * 2)")).as("doubled"),
          to_json(expr("filter(arr, x -> x % 2 = 0)")).as("evens"),
          aggregate(col("arr"), lit(0), (acc, x) => acc + x).as("arr_sum"),
          to_json(sort_array(col("arr"), asc = false)).as("sorted_desc"),
          to_json(sort_array(array_distinct(col("arr")))).as("uniq"))
    },

    // ---- struct/map family: pack, access, map ops
    "q31_struct_map" -> { (s, dir) =>
      Tables(s, dir, "region")
        .withColumn("st", struct(col("r_regionkey").as("k"), col("r_name").as("nm")))
        .withColumn("mp", map(col("r_name"), col("r_regionkey")))
        .select(
          col("r_regionkey"),
          col("st.k").as("packed_key"),
          upper(col("st.nm")).as("packed_name"),
          element_at(col("mp"), col("r_name")).as("map_val"),
          size(col("mp")).cast(LongType).as("map_len"))
    },

    // ---- interval arithmetic on dates/timestamps
    "q32_intervals" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 DAY")).cast(DateType).as("plus3d"),
          (col("o_orderdate") - expr("INTERVAL 2 MONTH")).cast(DateType).as("minus2mo"),
          (col("o_orderdate") + expr("INTERVAL 1 YEAR")).cast(DateType).as("plus1y"),
          // calendar-month distance via y*12+m (identical formula both engines;
          // months_between/date_diff('month') have incompatible semantics)
          (lit(1998 * 12 + 1) - (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))))
            .as("mo_dist"))
    },

    // ---- POSITIONAL JOIN (DuckDB extension): zip two sets row-by-row,
    // NULL-padding the shorter side. Spark rewrite: distributed global
    // position per side ([[Positions.withGlobalPosition]] — parallel range
    // sort + zipWithIndex offsets, NO single-partition window), then FULL
    // equi-join on position.
    "q33_positional_join" -> { (s, dir) =>
      val r = Positions.withGlobalPosition(
        Tables(s, dir, "region").select(col("r_name")),
        Seq(col("r_name").asc_nulls_first), "pos1")
      val st = Positions.withGlobalPosition(
        Tables(s, dir, "orders").select(col("o_orderstatus")).distinct(),
        Seq(col("o_orderstatus").asc_nulls_first), "pos2")
      r.join(st, col("pos1") === col("pos2"), "full")
        .select(coalesce(col("pos1"), col("pos2")).as("pos"),
          col("r_name"), col("o_orderstatus"))
    },

    // ---- correlated scalar subquery (per-order max line price)
    "q34_correlated_scalar" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val maxLine = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_extendedprice")).as("max_line_price"))
      o.join(maxLine, col("o_orderkey") === col("l_orderkey"), "left")
        .filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"), col("max_line_price"))
    },

    // ---- LIMIT / OFFSET pagination (deterministic total order first)
    "q37_limit_offset" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
        .offset(10)
        .limit(5)
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // ---- explicit GROUPING SETS (through the spark.sql entry — the same
    // parser the gateway exposes; Catalyst Expand underneath)
    "q38_grouping_sets" -> { (s, dir) =>
      Tables(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           |  ${Det.dsumSql("o_totalprice")} AS total
           |FROM orders_gs
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
    },

    // ---- string family 2: slicing/repetition/predicates
    "q41_strings2" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          expr("left(p_name, 4)").as("l4"),
          expr("right(p_name, 4)").as("r4"),
          repeat(col("p_brand"), 2).as("brandbrand"),
          reverse(col("p_type")).as("rev_type"),
          ascii(col("p_name")).as("first_code"),
          trim(lpad(col("p_name"), 20, " ")).as("trimmed"),
          col("p_name").contains("widget").as("is_widget"),
          col("p_name").startsWith("small").as("starts_small"),
          col("p_type").endsWith("DARD").as("ends_dard"))
    },

    // ---- regex family: extract groups, match predicate
    "q42_regex" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .filter(col("c_name").rlike("Customer#[0-9]+"))
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "#([0-9]+)", 1).as("num_str"),
          regexp_extract(col("c_mktsegment"), "([A-Z]+)", 1).as("seg_word"),
          size(regexp_extract_all(col("c_name"), lit("[0-9]"), lit(0)))
            .cast(LongType).as("n_digits"))
    },

    // ---- pattern-predicate family: LIKE / ILIKE / regex-as-SIMILAR-TO
    "q43_like_family" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(
          col("p_partkey"),
          col("p_name").like("%bolt%").as("like_bolt"),
          col("p_name").ilike("%WIDGET%").as("ilike_widget"),
          col("p_name").rlike("^(small|large) ").as("sim_size"),
          not(col("p_type").like("PRO%")).as("not_promo"))
    },

    // ---- arg-max/arg-min aggregates (DuckDB arg_max/arg_min ≡ Spark
    // max_by/min_by). Ties broken deterministically by bundling the
    // unique key into the ordering struct on both sides.
    "q39_argmax" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          max(struct(col("o_totalprice"), col("o_orderkey"))).getField("o_orderkey")
            .as("max_price_order"),
          min(struct(col("o_totalprice"), col("o_orderkey"))).getField("o_orderkey")
            .as("min_price_order"),
          max(col("o_totalprice")).as("max_price"))
    },

    // ---- UNPIVOT / melt: wide metrics to (metric, value) rows
    "q40_unpivot" -> { (s, dir) =>
      Tables(s, dir, "part")
        .filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          col("p_size").cast(DoubleType).as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("size"), col("retail")),
          "metric", "val")
    },

    // ---- inline VALUES relation joined against a table (E2 family)
    // ---- type-surface corners (SURVEY §1.2 via db/db.go:70): DECIMAL(38)
    // arithmetic beyond BIGINT range (= DuckDB HUGEINT territory), UUID
    // round-trip formatting, TIME-of-day and TIMESTAMPTZ-instant
    // renderings. Every value is stringified identically in both engines
    // so the compare is on the VALUES, not fetch-layer type accidents;
    // the gateway-level DatabaseTypeName fidelity for these types is
    // spec-asserted in GatewaySpec (metadata-declared corner types).
    "q57_type_corners" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val ev = Tables(s, dir, "events")
      val docs = Tables(s, dir, "documents")
      def metric(name: String, df: org.apache.spark.sql.DataFrame) =
        df.select(lit(name).as("metric"), col("val").cast(StringType).as("val"))
      // ONE aggregation pass per table (r5 — was one scan per metric):
      // lineitem carries both wide-decimal sums, events both time metrics.
      // Σ (l_orderkey · 10^12) exceeds 2^63 — exact only in 128-bit ints
      // (DuckDB HUGEINT) / DECIMAL(38,0) (Spark)
      // the two-metric tables melt through explode(map(...)) so each is
      // guaranteed ONE scan (separate selects off the same agg can replan
      // the aggregate per branch)
      val liM = li.agg(
        sum(col("l_extendedprice").cast(DecimalType(38, 2))).as("dec38"),
        sum(col("l_orderkey").cast(DecimalType(38, 0)) *
          lit("1000000000000").cast(DecimalType(38, 0))).as("huge"))
        .select(explode(map(
          lit("dec38_sum"), col("dec38").cast(StringType),
          lit("hugeint_sum"), col("huge").cast(StringType))).as(Seq("metric", "val")))
      // deterministic UUID per document from its content hash, min over
      // the corpus; DuckDB round-trips it through the UUID type
      val h = md5(col("text"))
      val uuid = docs.agg(min(concat_ws("-",
        substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), substring(h, 21, 12))).as("val"))
      // TIME rendering (second-truncated min-of-events) + TIMESTAMPTZ
      // instant semantics (epoch micros of the max event), one pass
      val evM = ev.agg(
        min(date_format(date_trunc("second", col("ts")), "HH:mm:ss")).as("tod"),
        max(unix_micros(col("ts"))).as("epoch"))
        .select(explode(map(
          lit("time_min"), col("tod").cast(StringType),
          lit("tstz_epoch_max"), col("epoch").cast(StringType))).as(Seq("metric", "val")))
      liM.unionByName(metric("uuid_min", uuid)).unionByName(evM)
    },

    "q35_values_inline" -> { (s, dir) =>
      val seg = s.sql(
        """SELECT * FROM VALUES ('BUILDING', 1), ('MACHINERY', 2), ('FURNITURE', 3)
          |AS t(seg, prio)""".stripMargin)
      Tables(s, dir, "customer")
        .join(broadcast(seg), col("c_mktsegment") === col("seg"), "inner")
        .groupBy(col("seg"), col("prio"))
        .agg(count(lit(1)).as("n"), davg(col("c_acctbal")).as("avg_bal"))
    })

  val oracles: Map[String, String] = Map(
    "q29_math" ->
      """SELECT l_orderkey,
        |  abs(l_quantity - 25.0) AS dev,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(floor(l_tax * 100) AS BIGINT) AS tax_pct_floor,
        |  round(l_extendedprice / 1000.0, 2) AS price_k,
        |  round(pow(l_quantity, 2.0), 6) AS qty_sq,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  round(ln(l_extendedprice), 6) AS ln_price,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  greatest(l_quantity, l_linenumber * 10.0) AS g,
        |  least(l_tax, l_discount) AS l,
        |  l_orderkey % 7 AS okmod,
        |  CAST(sign(l_quantity - 25.0) AS INT) AS sgn
        |FROM lineitem
        |WHERE l_linenumber = 1 AND l_orderkey < 2000
        |ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin,

    "q30_arrays" ->
      """SELECT n_nationkey,
        |  CAST(len(arr) AS BIGINT) AS arr_len,
        |  arr[2] AS second,
        |  list_contains(arr, 3) AS has_three,
        |  CAST(to_json(list_transform(arr, x -> x * 2)) AS VARCHAR) AS doubled,
        |  CAST(to_json(list_filter(arr, x -> x % 2 = 0)) AS VARCHAR) AS evens,
        |  CAST(list_sum(arr) AS INTEGER) AS arr_sum,
        |  CAST(to_json(list_reverse_sort(arr)) AS VARCHAR) AS sorted_desc,
        |  CAST(to_json(list_sort(list_distinct(arr))) AS VARCHAR) AS uniq
        |FROM (SELECT n_nationkey,
        |        [n_nationkey, n_regionkey, n_nationkey + n_regionkey] AS arr
        |      FROM nation)
        |ORDER BY n_nationkey ASC NULLS FIRST""".stripMargin,

    "q31_struct_map" ->
      """SELECT r_regionkey,
        |  st.k AS packed_key,
        |  upper(st.nm) AS packed_name,
        |  mp[r_name][1] AS map_val,
        |  CAST(cardinality(mp) AS BIGINT) AS map_len
        |FROM (SELECT r_regionkey, r_name,
        |        {'k': r_regionkey, 'nm': r_name} AS st,
        |        MAP {r_name: r_regionkey} AS mp
        |      FROM region)
        |ORDER BY r_regionkey ASC NULLS FIRST""".stripMargin,

    "q32_intervals" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS plus3d,
        |  CAST(o_orderdate - INTERVAL 2 MONTH AS DATE) AS minus2mo,
        |  CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus1y,
        |  CAST((1998 * 12 + 1)
        |    - (date_part('year', o_orderdate) * 12 + date_part('month', o_orderdate))
        |    AS INT) AS mo_dist
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    // semantically equals DuckDB's `a POSITIONAL JOIN b` (zip + NULL-pad):
    // spelled as FULL JOIN on row position so the oracle is order-stable
    "q33_positional_join" ->
      """WITH a AS (SELECT r_name,
        |    ROW_NUMBER() OVER (ORDER BY r_name ASC NULLS FIRST) AS pos1
        |  FROM region),
        |b AS (SELECT o_orderstatus,
        |    ROW_NUMBER() OVER (ORDER BY o_orderstatus ASC NULLS FIRST) AS pos2
        |  FROM (SELECT DISTINCT o_orderstatus FROM orders))
        |SELECT COALESCE(pos1, pos2) AS pos, r_name, o_orderstatus
        |FROM a FULL OUTER JOIN b ON pos1 = pos2
        |ORDER BY pos ASC NULLS FIRST""".stripMargin,

    "q34_correlated_scalar" ->
      """SELECT o_orderkey,
        |  (SELECT max(l_extendedprice) FROM lineitem
        |   WHERE l_orderkey = o_orderkey) AS max_line_price
        |FROM orders
        |WHERE o_orderkey < 3000
        |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin,

    "q43_like_family" ->
      """SELECT p_partkey,
        |  p_name LIKE '%bolt%' AS like_bolt,
        |  p_name ILIKE '%WIDGET%' AS ilike_widget,
        |  regexp_matches(p_name, '^(small|large) ') AS sim_size,
        |  NOT (p_type LIKE 'PRO%') AS not_promo
        |FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "q41_strings2" ->
      """SELECT p_partkey,
        |  left(p_name, 4) AS l4,
        |  right(p_name, 4) AS r4,
        |  repeat(p_brand, 2) AS brandbrand,
        |  reverse(p_type) AS rev_type,
        |  ascii(p_name) AS first_code,
        |  trim(lpad(p_name, 20, ' ')) AS trimmed,
        |  contains(p_name, 'widget') AS is_widget,
        |  starts_with(p_name, 'small') AS starts_small,
        |  ends_with(p_type, 'DARD') AS ends_dard
        |FROM part
        |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "q42_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '#([0-9]+)', 1) AS num_str,
        |  regexp_extract(c_mktsegment, '([A-Z]+)', 1) AS seg_word,
        |  CAST(len(regexp_extract_all(c_name, '[0-9]')) AS BIGINT) AS n_digits
        |FROM customer
        |WHERE regexp_matches(c_name, 'Customer#[0-9]+')
        |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin,

    // arg_max with an explicit composite tie-break == Spark's
    // lexicographic max(struct(price, key)); spelled via window ranking
    "q39_argmax" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderstatus,
        |  MAX(o_orderkey) FILTER (WHERE rmax = 1) AS max_price_order,
        |  MAX(o_orderkey) FILTER (WHERE rmin = 1) AS min_price_order,
        |  MAX(o_totalprice) AS max_price
        |FROM r
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q40_unpivot" ->
      """SELECT p_partkey, metric, val
        |FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS retail
        |      FROM part WHERE p_partkey < 100)
        |UNPIVOT (val FOR metric IN (size, retail))
        |ORDER BY p_partkey ASC NULLS FIRST, metric ASC NULLS FIRST""".stripMargin,

    "q37_limit_offset" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 5 OFFSET 10""".stripMargin,

    "q38_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${Det.dsumSql("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q57_type_corners" ->
      """SELECT 'dec38_sum' AS metric,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS VARCHAR) AS val
        |FROM lineitem
        |UNION ALL
        |SELECT 'hugeint_sum',
        |  CAST(SUM(CAST(l_orderkey AS HUGEINT) * 1000000000000) AS VARCHAR)
        |FROM lineitem
        |UNION ALL
        |SELECT 'uuid_min',
        |  CAST(CAST(MIN(substr(h,1,8) || '-' || substr(h,9,4) || '-' ||
        |    substr(h,13,4) || '-' || substr(h,17,4) || '-' || substr(h,21,12))
        |    AS UUID) AS VARCHAR)
        |FROM (SELECT md5(text) AS h FROM documents)
        |UNION ALL
        |SELECT 'time_min',
        |  CAST(MIN(CAST(date_trunc('second', CAST(ts AS TIMESTAMP)) AS TIME))
        |    AS VARCHAR)
        |FROM events
        |UNION ALL
        |SELECT 'tstz_epoch_max',
        |  CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS VARCHAR)
        |FROM events""".stripMargin,

    "q35_values_inline" ->
      s"""SELECT seg, prio, COUNT(*) AS n, ${davgSql("c_acctbal")} AS avg_bal
         |FROM customer
         |JOIN (VALUES ('BUILDING', 1), ('MACHINERY', 2), ('FURNITURE', 3)) AS t(seg, prio)
         |  ON c_mktsegment = seg
         |GROUP BY seg, prio
         |ORDER BY prio ASC NULLS FIRST""".stripMargin)
}
