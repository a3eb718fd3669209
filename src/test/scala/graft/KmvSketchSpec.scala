package graft

import graft.functions.KmvSketch
import graft.functions.KmvSketch.KmvAggregator
import org.apache.spark.sql.functions._

/** KMV sketch: exactness below k, bounded error above k, merge laws. */
class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("exact below k: small cardinalities are counted exactly") {
    val df = (1 to 500).map(i => i % 37).toDF("v")
    val est = df.agg(KmvSketch.approxDistinctKmv($"v")).collect().head.getLong(0)
    assert(est == 37L)
  }

  test("estimate within 10% for cardinality far above k") {
    val n = 100000
    val df = (1 to n).toDF("v").repartition(8) // force partial/merge path
    val est = df.agg(KmvSketch.approxDistinctKmv($"v")).collect().head.getLong(0)
    assert(math.abs(est - n.toDouble) / n < 0.10, s"estimate $est vs $n")
  }

  test("merge is associative/commutative and deduplicating") {
    val a = new KmvAggregator(8)
    val b1 = Seq(5L, 1L, 9L, 3L).map(_ << 40).foldLeft(a.zero)(a.reduce)
    val b2 = Seq(7L, 3L, 2L, 11L).map(_ << 40).foldLeft(a.zero)(a.reduce)
    val m12 = a.merge(b1, b2)
    val m21 = a.merge(b2, b1)
    assert(m12.toSeq == m21.toSeq)
    assert(m12.toSeq == m12.toSeq.distinct.sorted)
    assert(a.merge(m12, a.zero).toSeq == m12.toSeq)
  }

  test("buffer never exceeds k") {
    val a = new KmvAggregator(4)
    // spread inputs across the hash space (the buffer keys by h >>> 11)
    val buf = (1L to 100L).map(i => i << 40).foldLeft(a.zero)(a.reduce)
    assert(buf.length == 4)
    assert(buf.toSeq == buf.toSeq.sorted)
  }
}
