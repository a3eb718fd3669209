package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter sketch as a typed `Aggregator` (SURVEY.md
  * §2.5: mergeable sketches — the frequent-items counterpart of
  * [[KmvSketch]]). The buffer is at most k (term → counter) entries;
  * partial aggregation keeps per-executor state k-bounded and the shuffle
  * carries ≤ k entries per group, however many distinct terms the corpus
  * has — the property that makes frequency estimation tractable at 100 TB.
  *
  * Guarantees (Misra–Gries 1982; merge form Agarwal et al., "Mergeable
  * Summaries", PODS 2012):
  *  - `est(t) ≤ true(t)` — never overestimates;
  *  - `true(t) − est(t) ≤ N/(k+1)` for EVERY term (N = stream length),
  *    under any partitioning and any merge order;
  *  - every term with `true(t) > N/(k+1)` is present in the sketch.
  *
  * The individual counter values DO depend on merge order (unlike KMV's
  * order-invariant k-minima), so contract outputs expose only the
  * order-invariant facts: the guarantee booleans, never raw estimates.
  */
object MisraGries {
  val DefaultK = 32

  final class MgAggregator(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], t: String): Map[String, Long] =
      m.get(t) match {
        case Some(c) => m.updated(t, c + 1)
        case None if m.size < k => m.updated(t, 1L)
        case None =>
          // classic MG step: a miss at capacity decrements every counter
          // (amortized: at most N/(k+1) decrement rounds over the stream)
          m.iterator.map { case (s, c) => (s, c - 1) }.filter(_._2 > 0).toMap
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // prune to ≤ k entries by subtracting the (k+1)-th largest counter
        // — the merge rule that keeps the N/(k+1) error bound additive
        val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.iterator.map { case (t, c) => (t, c - d) }.filter(_._2 > 0).toMap
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** Column API: heavy-hitter (term → lower-bound counter) map with at
    * most k entries. */
  def topkSketch(c: Column, k: Int = DefaultK): Column =
    udaf(new MgAggregator(k)).apply(c)
}
