package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 64-permutation MinHash signature as a typed `Aggregator`: input is the
  * shingle's 8-byte hash; the buffer is the 64 running minima, merged
  * elementwise — min is commutative/associative/idempotent, so the
  * signature is IDENTICAL under any partitioning, merge order, or
  * re-delivery, and partial aggregation ships exactly 64 longs per doc.
  *
  * Each permutation re-mixes the shingle hash with a fixed seed through a
  * murmur3-style finalizer in ONE tight JVM loop — replacing the 64
  * separate `min(xxhash64(lit(i), h))` aggregate expressions the composed
  * formulation evaluated per shingle row (64 expression-tree hashes each
  * re-hashing 12 bytes). Plain JVM arithmetic wraps silently, so no ANSI
  * overflow concerns (those apply to Catalyst expressions, not Aggregator
  * code). The hash family is engine-internal by design: x02's contract
  * output is the exact-verified pair list, which the oracle equates to the
  * full-corpus exact Jaccard pair set — a recall loss from a bad family
  * turns the driver row red.
  */
object MinHashAgg {
  val NumHashes = 64

  /** Weyl-sequence seeds (odd increments of the golden-ratio constant). */
  private val seeds: Array[Long] =
    Array.tabulate(NumHashes)(i => 0x9E3779B97F4A7C15L * (i + 1) + 0x165667B19E3779F9L)

  /** murmur3 fmix64 of h ⊕ seed — full avalanche per permutation. */
  private def mix(h: Long, seed: Long): Long = {
    var x = h ^ seed
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  final class MinHashAggregator extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < NumHashes) {
        val v = mix(h, seeds(i))
        if (v < b(i)) b(i) = v
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NumHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Column API: 64-minima signature (array<bigint>) over shingle hashes. */
  def minhash64(shingleHash: Column): Column =
    udaf(new MinHashAggregator).apply(shingleHash)
}
