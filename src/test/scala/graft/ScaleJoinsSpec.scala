package graft

import graft.ops.ScaleJoins
import org.apache.spark.sql.functions._

/** The skew/range rewrites must be result-invisible vs the naive joins. */
class ScaleJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on row multisets") {
    val li = Tables(spark, sfDir, "lineitem")
    val sup = Tables(spark, sfDir, "supplier")
    val salted = ScaleJoins.saltedJoin(li, sup, col("l_suppkey"), col("s_suppkey"), 8)
      .select("l_orderkey", "l_linenumber", "s_suppkey")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads a hot key across partitions") {
    // all rows share one key — the worst skew case
    val left = (1 to 10000).map(i => (1L, i)).toDF("k", "v")
    val right = Seq((1L, "only")).toDF("k2", "name")
    val joined = ScaleJoins.saltedJoin(left, right, col("k"), col("k2"), 8)
    assert(joined.count() == 10000)
    val saltCard = left.withColumn("__salt",
        pmod(xxhash64(left.columns.map(left(_)).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(saltCard == 8L, "deterministic salt must use all buckets")
  }

  test("binned range join equals nested-loop range join") {
    val pts = (0 until 500).map(i => (i.toLong, i * 0.7)).toDF("id", "x")
    val ivs = (0 until 40).map(i => (i.toLong, i * 5.0, i * 5.0 + 7.0)).toDF("iid", "lo", "hi")
    val binned = ScaleJoins.binnedRangeJoin(pts, ivs, col("x"), col("lo"), col("hi"), 8.0)
      .select("id", "iid")
    val naive = pts.join(ivs, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("id", "iid")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("binned range join handles negative values and boundary inclusivity") {
    val pts = Seq((1L, -5.0), (2L, 0.0), (3L, 7.0), (4L, 7.0001)).toDF("id", "x")
    val ivs = Seq((10L, -10.0, 0.0), (20L, 0.0, 7.0)).toDF("iid", "lo", "hi")
    val got = ScaleJoins.binnedRangeJoin(pts, ivs, col("x"), col("lo"), col("hi"), 4.0)
      .select("id", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("bloom filter: zero false negatives, and the filter actually prunes") {
    import graft.functions.BloomFilterAgg
    val keys = (0 until 200).map(i => i * 7L).toDF("k")
    val bloom = keys.select(BloomFilterAgg.explodedPositions($"k").as("pos"))
      .agg(BloomFilterAgg.bloomAgg($"pos").as("bits"))
    val probes = (0 until 20000).map(_.toLong).toDF("p")
      .crossJoin(broadcast(bloom))
      .withColumn("hit", BloomFilterAgg.mightContain($"bits", $"p"))
    val present = probes.filter($"p" % 7 === 0 && $"p" < 1400)
    assert(present.filter(!$"hit").count() == 0, "bloom false negative!")
    // fp sanity: at 200 keys / 2^17 bits the pass-through must stay tiny
    val passed = probes.filter($"hit").count()
    assert(passed < 600, s"bloom passed $passed of 20000 — not pruning")
  }
}
