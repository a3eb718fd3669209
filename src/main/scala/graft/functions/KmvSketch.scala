package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** K-minimum-values distinct-count sketch as a typed `Aggregator`
  * (SURVEY.md §2.5: custom aggregate for *mergeable* sketches — Spark's
  * built-in `approx_count_distinct` exposes only the final estimate, not a
  * mergeable state; KMV buffers merge associatively, which is exactly what
  * partial aggregation needs at scale: each executor keeps k longs, the
  * shuffle carries k longs per group, merges are a sorted-union-truncate).
  *
  * Estimator: with the k smallest of n uniform hashes, the k-th minimum
  * sits at ≈ k/(n+1) of the hash space → n̂ = (k-1)/frac(v_k). Standard
  * error ≈ 1/√(k-2) (~3% at k=1024).
  */
object KmvSketch {
  val DefaultK = 1024

  final class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Long] {
    /** Buffer = ascending array of the k smallest *fractions'* raw hashes
      * (compared unsigned via the >>> 11 projection, which is monotonic). */
    override def zero: Array[Long] = Array.emptyLongArray

    private def key(h: Long): Long = h >>> 11

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val kk = key(h)
      val pos = java.util.Arrays.binarySearch(buf, kk)
      if (pos >= 0) buf // duplicate hash
      else {
        val ins = -pos - 1
        if (buf.length >= k && ins >= k) buf
        else {
          val grow = math.min(buf.length + 1, k)
          val out = new Array[Long](grow)
          System.arraycopy(buf, 0, out, 0, math.min(ins, grow))
          if (ins < grow) {
            out(ins) = kk
            System.arraycopy(buf, ins, out, ins + 1, grow - ins - 1)
          }
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted union, distinct, truncated to k — associative and commutative
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      var last = Long.MinValue; var first = true
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (first || v != last) { out(o) = v; o += 1; last = v; first = false }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(buf: Array[Long]): Long =
      if (buf.length < k) buf.length.toLong
      else {
        val vk = (buf(k - 1) + 1).toDouble / (1L << 53).toDouble
        math.round((k - 1) / vk)
      }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column API: approximate COUNT(DISTINCT c) via a k-minimum-values
    * sketch over xxhash64(c). */
  def approxDistinctKmv(c: Column, k: Int = DefaultK): Column =
    udaf(new KmvAggregator(k)).apply(xxhash64(c))
}
