package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SimHash signature as a typed `Aggregator` over per-word
  * [[Md5Head64]] bit patterns: the buffer is 64 bit-counts + the word
  * count, merged by vector addition — exact integers, so the signature is
  * identical under any partitioning/merge order (same determinism class
  * as the decimal-sum contract, without the 64-column-wide aggregate the
  * composed formulation shuffled: 65 longs per group instead of 64
  * independent sum states through the whole agg machinery).
  *
  * Signature bit j is set iff the sign-sum over words is positive:
  * s_j = 2·c_j − n > 0, where c_j counts words whose pattern has bit
  * (63−j) set — bit-identical to the `sum(when(...1...-1))` formulation
  * and to the SQL oracle's digit-by-digit replay.
  */
object SimhashAgg {
  final class SimhashAggregator extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](65) // counts[0..63], n at [64]

    override def reduce(b: Array[Long], p: Long): Array[Long] = {
      var j = 0
      while (j < 64) {
        b(j) += (p >>> (63 - j)) & 1L
        j += 1
      }
      b(64) += 1
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 65) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Long = {
      val n = b(64)
      var sig = 0L
      var j = 0
      while (j < 64) {
        if (2 * b(j) > n) sig |= (1L << j) // j=63 → the sign bit, as shiftleft does
        j += 1
      }
      sig
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column API: 64-bit SimHash signature from [[Md5Head64]] word patterns. */
  def simhash64(pattern: Column): Column =
    udaf(new SimhashAggregator).apply(pattern)
}
