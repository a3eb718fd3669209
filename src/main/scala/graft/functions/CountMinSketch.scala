package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.functions.udaf

/** Count–min sketch as a typed `Aggregator` (SURVEY.md §2.5: mergeable
  * sketches — the point-query-frequency counterpart of [[MisraGries]]).
  * The buffer is a fixed `depth × width` counter array; partial
  * aggregation keeps per-executor state constant-size and the shuffle
  * carries exactly `depth·width` longs per group regardless of corpus
  * vocabulary — the dual of MG: MG never overestimates, CMS never
  * underestimates.
  *
  * Guarantees (Cormode & Muthukrishnan 2005; counters are purely additive,
  * so the sketch is exactly mergeable — any partitioning, any merge order,
  * bit-identical result):
  *  - `est(t) ≥ true(t)` — never underestimates (all increments land);
  *  - `est(t) ≤ true(t) + ε·N` with probability `1 − δ` for
  *    `ε = e/width`, `δ = exp(−depth)` (N = stream length).
  *
  * Unlike MG the finished value is order-invariant (additive counters), so
  * raw estimates are safe to expose; contract queries still emit the
  * guarantee booleans so sketch drift turns a driver row red rather than
  * producing a silently-wrong count.
  *
  * The row hashes are the repo's md5 hash family (`graft.ops.Det`): row
  * `d` of term `t` buckets at `parseLong(md5("{d}#{t}").take(15), 16) %
  * width`, which [[estimate]] replays as a codegen'd column expression —
  * the JVM and SQL sides are the same function by construction.
  */
object CountMinSketch {
  val DefaultWidth = 1024
  val DefaultDepth = 4

  /** Bucket for row `d`, term `t`: identical value to
    * `parseLong(hex(md5("$d#$t")).take(15), 16) % width` — the first 15 hex
    * chars of a digest ARE its first 8 bytes read as an unsigned big-endian
    * long shifted right 4 bits, so the bucket is derived arithmetically from
    * the digest bytes with no hex formatting or re-parsing (the r4 hot path
    * spent ~32 boxed `f"%02x"` calls per token here). `tb` is the term's
    * UTF-8 bytes, computed once per term and reused across the `depth` rows. */
  private def bucket(d: Int, tb: Array[Byte], width: Int, md: MessageDigest): Int = {
    md.reset()
    if (d < 10) md.update(('0' + d).toByte)
    else md.update(d.toString.getBytes("UTF-8"))
    md.update('#'.toByte)
    md.update(tb)
    val dg = md.digest()
    var long = 0L
    var i = 0
    while (i < 8) { long = (long << 8) | (dg(i) & 0xffL); i += 1 }
    (((long >>> 4) % width)).toInt // >>>4 keeps the top 60 bits: non-negative
  }

  final class CmsAggregator(width: Int, depth: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    @transient private lazy val md = MessageDigest.getInstance("MD5")

    override def zero: Array[Long] = new Array[Long](width * depth)

    override def reduce(arr: Array[Long], t: String): Array[Long] = {
      val tb = t.getBytes("UTF-8")
      var d = 0
      while (d < depth) {
        arr(d * width + bucket(d, tb, width, md)) += 1L
        d += 1
      }
      arr
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(arr: Array[Long]): Seq[Long] = arr.toSeq

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column API: the flat `depth × width` counter array for a string
    * column. */
  def sketch(c: Column, width: Int = DefaultWidth, depth: Int = DefaultDepth): Column =
    udaf(new CmsAggregator(width, depth)).apply(c)

  /** Point-frequency estimate of `term` against a finished [[sketch]]
    * column: `min_d counters[d·width + h_d(term)]`. Pure `functions._`
    * composition (codegen'd) replaying the aggregator's md5 bucketing. */
  def estimate(sk: Column, term: Column,
               width: Int = DefaultWidth, depth: Int = DefaultDepth): Column =
    array_min(transform(sequence(lit(0), lit(depth - 1)), d => {
      val hex15 = substring(md5(concat(d.cast("string"), lit("#"), term)), 1, 15)
      val b = pmod(conv(hex15, 16, 10).cast(LongType), lit(width.toLong)).cast(IntegerType)
      element_at(sk, d.cast(IntegerType) * width + b + 1)
    }))
}
