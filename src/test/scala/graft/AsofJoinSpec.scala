package graft

import graft.plans.Asof
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** The custom ASOF operator: semantics on crafted edges + plan shape. */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("picks the greatest right ts <= left ts, per key; null when none") {
    val quotes = Seq(
      (1L, t(0), 100.0), (1L, t(10), 101.0), (1L, t(20), 102.0),
      (2L, t(5), 200.0)).toDF("q_key", "q_ts", "px")
    val trades = Seq(
      (1L, t(0)),  // equal ts → inclusive match (100.0)
      (1L, t(15)), // between → 101.0
      (1L, t(99)), // after all → 102.0
      (2L, t(4)),  // before any quote for key 2 → null
      (3L, t(50))) // key absent on right → null
      .toDF("t_key", "t_ts")
    val out = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select($"t_key", $"t_ts", $"px").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(out == Set(
      (1L, t(0), 100.0), (1L, t(15), 101.0), (1L, t(99), 102.0),
      (2L, t(4), null), (3L, t(50), null)))
  }

  test("survives multi-partition inputs (co-clustered by key)") {
    // unique (key, ts) per right row — duplicate (key, ts) makes ASOF
    // ambiguous by definition
    val right = (0 until 1000).map(i => (i.toLong % 50, t(i / 50), i.toDouble))
      .toDF("rk", "rts", "v").repartition(7)
    val left = (0 until 500).map(i => (i.toLong % 50, t(100 + i % 100)))
      .toDF("k", "ts").repartition(5)
    val joined = Asof.join(left, right, "k", "rk", "ts", "rts")
    assert(joined.count() == 500) // left-outer: every left row exactly once
    // spot-check one row against a brute-force computation
    val sample = left.limit(1).collect().head
    val (sk, st) = (sample.getLong(0), sample.getTimestamp(1))
    val expected = right.filter($"rk" === sk && $"rts" <= st)
      .orderBy($"rts".desc).limit(1).select($"v").collect().headOption.map(_.getDouble(0))
    val got = joined.filter($"k" === sk && $"ts" === st)
      .select($"v").collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got == expected)
  }

  test("forward direction picks the least right ts >= left ts, per key") {
    val quotes = Seq(
      (1L, t(0), 100.0), (1L, t(10), 101.0), (1L, t(20), 102.0),
      (2L, t(5), 200.0)).toDF("q_key", "q_ts", "px")
    val trades = Seq(
      (1L, t(0)),  // equal ts → inclusive match (100.0)
      (1L, t(15)), // between → next is t(20) → 102.0
      (1L, t(99)), // after all → null
      (2L, t(4)),  // before key-2's only quote → 200.0
      (3L, t(50))) // key absent on right → null
      .toDF("t_key", "t_ts")
    val out = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        forward = true)
      .select($"t_key", $"t_ts", $"px").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(out == Set(
      (1L, t(0), 100.0), (1L, t(15), 102.0), (1L, t(99), null),
      (2L, t(4), 200.0), (3L, t(50), null)))
  }

  test("a forward right row is reusable by several left rows") {
    val quotes = Seq((1L, t(50), 9.0)).toDF("q_key", "q_ts", "px")
    val trades = Seq((1L, t(1)), (1L, t(2)), (1L, t(3))).toDF("t_key", "t_ts")
    val out = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        forward = true)
      .select($"px").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(9.0, 9.0, 9.0))
  }

  test("tolerance bounds the match distance in both directions") {
    val quotes = Seq(
      (1L, t(0), 100.0), (1L, t(30), 103.0)).toDF("q_key", "q_ts", "px")
    val trades = Seq((1L, t(10)), (1L, t(25))).toDF("t_key", "t_ts")
    val tolMicros = 10L * 60L * 1000000L // 10 minutes
    // backward: t(10) is 10 min after t(0) → in; t(25) is 25 min after → out
    val back = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        tolerance = Some(tolMicros))
      .select($"t_ts", $"px").collect()
      .map(r => (r.getTimestamp(0), if (r.isNullAt(1)) null else r.getDouble(1))).toSet
    assert(back == Set((t(10), 100.0), (t(25), null)))
    // forward: t(10)→t(30) is 20 min → out; t(25)→t(30) is 5 min → in
    val fwd = Asof.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        forward = true, tolerance = Some(tolMicros))
      .select($"t_ts", $"px").collect()
      .map(r => (r.getTimestamp(0), if (r.isNullAt(1)) null else r.getDouble(1))).toSet
    assert(fwd == Set((t(10), null), (t(25), 103.0)))
  }

  test("forward multi-partition agrees with a brute-force computation") {
    val right = (0 until 1000).map(i => (i.toLong % 50, t(i / 50), i.toDouble))
      .toDF("rk", "rts", "v").repartition(7)
    val left = (0 until 500).map(i => (i.toLong % 50, t(i % 100)))
      .toDF("k", "ts").repartition(5)
    val joined = Asof.join(left, right, "k", "rk", "ts", "rts", forward = true)
    assert(joined.count() == 500)
    val sample = left.limit(1).collect().head
    val (sk, st) = (sample.getLong(0), sample.getTimestamp(1))
    val expected = right.filter($"rk" === sk && $"rts" >= st)
      .orderBy($"rts".asc).limit(1).select($"v").collect().headOption.map(_.getDouble(0))
    val got = joined.filter($"k" === sk && $"ts" === st)
      .select($"v").collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got == expected)
  }

  test("plan is one AsofJoinExec with sorted-exchange children, no window") {
    val a = Seq((1L, t(1))).toDF("k", "ts")
    val b = Seq((1L, t(0), 5.0)).toDF("k2", "ts2", "v")
    val plan = Asof.join(a, b, "k", "k2", "ts", "ts2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("integer keys work (widened to long) and null keys never match") {
    val left = Seq((Some(1), t(10)), (None, t(10))).toDF("k", "ts")
    val right = Seq((1, t(0), 7.0)).toDF("k2", "ts2", "v")
    val out = Asof.join(left, right, "k", "k2", "ts", "ts2")
      .select($"k", $"v").collect()
    val byKey = out.map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byKey(Some(1)) == Some(7.0))
    assert(byKey(None).isEmpty) // null key row kept, unmatched
  }

  test("empty right side yields all-null matches") {
    val a = Seq((1L, t(1)), (2L, t(2))).toDF("k", "ts")
    val b = Seq.empty[(Long, Timestamp, Double)].toDF("k2", "ts2", "v")
    val out = Asof.join(a, b, "k", "k2", "ts", "ts2").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(2)))
  }

  test("strict bound excludes equal ts — both directions, long ts") {
    val a = Seq((1L, 10L), (1L, 20L)).toDF("k", "ts")
    val b = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 20L, 3.0))
      .toDF("k2", "ts2", "v")
    def got(fwd: Boolean) = Asof.join(a, b, "k", "k2", "ts", "ts2",
        forward = fwd, strict = true)
      .orderBy($"ts").select($"v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    // backward strict: ts=10 has no right < 10; ts=20 picks 15 (not 20)
    assert(got(fwd = false) == Seq(None, Some(2.0)))
    // forward strict: ts=10 picks 15 (not 10); ts=20 has no right > 20
    assert(got(fwd = true) == Seq(Some(2.0), None))
  }

  test("fractional (double) ts: strict semantics are exact, no shift") {
    val a = Seq((1L, 5.0, 10), (1L, 6.5, 20)).toDF("k", "fts", "lv")
    val b = Seq((1L, 4.5, 7), (1L, 6.5, 9)).toDF("k2", "rts", "p")
    val out = Asof.join(a, b, "k", "k2", "fts", "rts", strict = true)
      .orderBy($"lv").select($"p").collect().map(_.getInt(0)).toSeq
    // DuckDB-probed: 4.5 < 5.0 matches; for lv=20 the 6.5 tie is excluded
    // so 4.5 wins again — the one-unit-shift approximation got this wrong
    assert(out == Seq(7, 7))
    // non-strict: the 6.5 tie is admitted for lv=20
    val ns = Asof.join(a, b, "k", "k2", "fts", "rts")
      .orderBy($"lv").select($"p").collect().map(_.getInt(0)).toSeq
    assert(ns == Seq(7, 9))
  }

  test("composite (struct) keys join per key-tuple; NULL fields never match") {
    val l = Seq((1, 2, 20L, 5), (1, 3, 20L, 6), (1, 2, 5L, 7))
      .toDF("x", "y", "ts", "v")
      .withColumn("lk", when(!col("x").isNull && !col("y").isNull,
        struct(col("x").as("k0"), col("y").as("k1"))))
    val r = Seq((1, 2, 10L, 77), (1, 3, 15L, 88))
      .toDF("x2", "y2", "ts2", "p")
      .withColumn("rk", when(!col("x2").isNull && !col("y2").isNull,
        struct(col("x2").as("k0"), col("y2").as("k1"))))
    val out = Asof.join(l, r, "lk", "rk", "ts", "ts2")
      .select($"v", $"p").collect()
      .map(row => (row.getInt(0),
        if (row.isNullAt(1)) None else Some(row.getInt(1)))).toSet
    // (1,2)@20 → 77; (1,3)@20 → 88; (1,2)@5 precedes its match → None
    assert(out == Set((5, Some(77)), (6, Some(88)), (7, None)))
  }

  test("keyless ASOF via a constant key is one global merge") {
    val l = Seq((0L, 20L, 1)).toDF("k", "ts", "v")
    val r = Seq((0L, 5L, 6), (0L, 15L, 7)).toDF("k2", "ts2", "p")
    val out = Asof.join(l, r, "k", "k2", "ts", "ts2")
      .select($"p").collect().map(_.getInt(0)).toSeq
    assert(out == Seq(7))
  }

  test("tolerance over fractional ts is rejected loudly") {
    val a = Seq((1L, 5.0)).toDF("k", "fts")
    val b = Seq((1L, 4.5, 7)).toDF("k2", "rts", "p")
    intercept[IllegalArgumentException] {
      Asof.join(a, b, "k", "k2", "fts", "rts", tolerance = Some(1L))
    }
  }
}
