package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew- and range-join techniques (builder-prompt scale checklist:
  * "salting for skew", "range join"). Both are plan *rewrites* that keep
  * results identical to the naive join — so both are DuckDB-oracle-checked
  * against the plain formulation.
  */
object ScaleJoins {
  import Det._

  /** Salted equi-join for skewed keys: the (big, skewed) left side gets a
    * deterministic salt in [0, n); the (small) right side is exploded n×;
    * the join key becomes (key, salt), spreading each hot key over n
    * reducers. Result set is exactly the plain join's. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, nSalts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(left(_)).toIndexedSeq: _*), lit(nSalts)).cast(IntegerType))
    val exploded = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(exploded,
      leftKey === rightKey && salted("__salt") === exploded("__salt"))
      .drop("__salt")
  }

  /** Point-in-interval range join via binning: instead of a nested-loop
    * over every (point, interval) pair, intervals are exploded to the bins
    * they overlap and points join their bin — an equi-join shuffle whose
    * cost is |points| + Σ interval-widths/binWidth. Post-filter keeps
    * exact semantics. */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column, binWidth: Double): DataFrame = {
    val p = points.withColumn("__bin", floor(point / binWidth).cast(LongType))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast(LongType),
        floor(hi / binWidth).cast(LongType))))
    p.join(iv, p("__bin") === iv("__bin") && point >= lo && point <= hi)
      .drop("__bin")
  }

  val queries: Map[String, Q] = Map(
    // ---- salted skew join: lineitem (600k rows, 10 hot supplier keys)
    "x17_skew_salted_join" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val sup = Tables(s, dir, "supplier")
      saltedJoin(li, sup, col("l_suppkey"), col("s_suppkey"), nSalts = 8)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---- binned range join: events whose value falls in a part's
    // [retailprice-bucketed] interval — point-in-range without a
    // nested-loop join
    "x18_range_join_binned" -> { (s, dir) =>
      val ev = Tables(s, dir, "events").select(col("event_id"), col("value"))
      val iv = Tables(s, dir, "part")
        .filter(col("p_partkey") < 50)
        .select(col("p_partkey"),
          (col("p_size") * 2.0).as("lo"), (col("p_size") * 2.0 + 15.0).as("hi"))
      binnedRangeJoin(ev, iv, col("value"), col("lo"), col("hi"), binWidth = 16.0)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_in_range"), dsum(col("value")).as("sum_in_range"))
    },

    // ---- Bloom-pruned semi join (the runtime-filter pattern): build a
    // 16 KiB distributed Bloom filter over the qualifying part keys
    // (mergeable bit-OR Aggregator), materialize it to the driver — the
    // same bounded index-metadata collect Spark's own runtime bloom/
    // InSubquery filters perform — and inline the bits as a LITERAL
    // predicate on the fact scan. A joined-relation formulation lets
    // Catalyst reorder the exact semi join below the bloom filter (making
    // it useless); the literal predicate is guaranteed to sit on the scan,
    // pruning lineitem to ~0.6% BEFORE any join. No false negatives, so
    // the result — and the oracle, the PLAIN IN-subquery — is exact;
    // false positives only cost extra rows into the verify join. At
    // 100 TB this is the difference between shuffling the whole fact
    // table and shuffling a sliver.
    "x35_bloom_semi_join" -> { (s, dir) =>
      import graft.functions.BloomFilterAgg
      val keys = Tables(s, dir, "part")
        .filter(col("p_brand") === "Brand#13" && col("p_size") < 10)
        .select(col("p_partkey").as("k"))
      val bits: Seq[Long] = keys
        .select(BloomFilterAgg.explodedPositions(col("k")).as("pos"))
        .agg(BloomFilterAgg.bloomAgg(col("pos")).as("bits"))
        .collect()(0).getSeq[Long](0)
      val pruned = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .filter(BloomFilterAgg.mightContain(typedlit(bits), col("l_partkey")))
      pruned.join(broadcast(keys), pruned("l_partkey") === keys("k"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
    })

  val oracles: Map[String, String] = Map(
    // oracle = the PLAIN formulations; the rewrites must be invisible
    "x17_skew_salted_join" ->
      s"""SELECT s_name, COUNT(*) AS n_lines, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name
         |ORDER BY s_name ASC NULLS FIRST""".stripMargin,

    "x18_range_join_binned" ->
      s"""SELECT p_partkey, COUNT(*) AS n_in_range,
         |  ${dsumSql("\"value\"")} AS sum_in_range
         |FROM events
         |JOIN (SELECT p_partkey, p_size * 2.0 AS lo, p_size * 2.0 + 15.0 AS hi
         |      FROM part WHERE p_partkey < 50) iv
         |  ON "value" >= lo AND "value" <= hi
         |GROUP BY p_partkey
         |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin,

    "x35_bloom_semi_join" ->
      s"""SELECT l_partkey, COUNT(*) AS n_lines, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_partkey IN (SELECT p_partkey FROM part
         |                    WHERE p_brand = 'Brand#13' AND p_size < 10)
         |GROUP BY l_partkey
         |ORDER BY l_partkey ASC NULLS FIRST""".stripMargin)
}
