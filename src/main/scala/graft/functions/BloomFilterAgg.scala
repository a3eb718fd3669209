package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter build as a typed `Aggregator` (SURVEY.md
  * §2.11: the semi-join runtime-filter pattern — build a compact membership
  * summary of the small side's keys, broadcast it, and prune the big side
  * BEFORE its shuffle; the exact join then touches only survivors).
  *
  * The buffer is the bit array itself (`m/64` longs); merge is bitwise OR —
  * commutative and associative, so the built filter is IDENTICAL under any
  * partitioning (unlike count-style sketches there is no merge-order
  * dependence at all). No false negatives ever; false positives only cost
  * extra rows into the exact verify.
  *
  * Hash discipline: the aggregator does not hash — callers feed it bit
  * POSITIONS computed with the same Catalyst expressions
  * ([[BloomFilterAgg.positions]]) the probe side uses
  * ([[BloomFilterAgg.mightContain]]), so build and probe agree by
  * construction.
  */
object BloomFilterAgg {
  /** Bits (2^17) and probes-per-key — ~16 KiB filter, <1% fp at ~10k keys. */
  val NumBits = 1 << 17
  val NumProbes = 3

  final class BloomAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](NumBits / 64)

    override def reduce(bits: Array[Long], pos: Long): Array[Long] = {
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      bits
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bits: Array[Long]): Array[Long] = bits

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** The probe positions for a key: pmod(xxhash64(seed, key), m) per seed.
    * Shared by the build explode and the membership test. */
  def positions(key: Column): Seq[Column] =
    (0 until NumProbes).map(seed => pmod(xxhash64(lit(seed), key), lit(NumBits.toLong)))

  /** Build input: one row per (key, probe) bit position. */
  def explodedPositions(key: Column): Column = explode(array(positions(key): _*))

  /** Membership test of `key` against a bits-array column (1-based
    * element_at over the long words) — pure built-ins, fully codegen'd.
    * (`call_function("shiftright", ...)` because the Scala `shiftright`
    * helper only accepts a literal shift amount.) */
  def mightContain(bits: Column, key: Column): Column =
    positions(key).map { pos =>
      (call_function("shiftright",
        element_at(bits, shiftright(pos, 6).cast("int") + 1),
        (pos % 64).cast("int")).bitwiseAND(1L)) === 1L
    }.reduce(_ && _)

  def bloomAgg(pos: Column): Column = udaf(new BloomAggregator).apply(pos)
}
