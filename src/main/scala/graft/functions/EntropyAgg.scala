package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DuckDB's `entropy` aggregate (no Spark builtin): the Shannon entropy
  * (log base 2) of the input value distribution — Σ (c/n)·log2(n/c) over
  * per-value counts c. NULL inputs are skipped and an empty/all-NULL
  * group is 0.0, not NULL (both probed against DuckDB 1.0). State is the
  * value→count map; inputs arrive cast to STRING by the gateway rewrite
  * (a 1:1 rendering, so the distribution — and therefore the entropy —
  * is unchanged). Registered for SQL as `graft_entropy`; the gateway
  * rewrites `entropy(x)` onto it. */
class EntropyAggregator extends Aggregator[String,
    scala.collection.immutable.Map[String, Long], Double] {
  type B = scala.collection.immutable.Map[String, Long]
  override def zero: B = Map.empty
  override def reduce(b: B, a: String): B =
    if (a == null) b else b.updated(a, b.getOrElse(a, 0L) + 1L)
  override def merge(x: B, y: B): B =
    y.foldLeft(x) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
  override def finish(r: B): Double = {
    val total = r.valuesIterator.sum.toDouble
    if (total == 0) return 0.0
    // DuckDB's per-value shape: Σ (c/n)·log2(n/c). The JVM has no libm
    // log2, so ln-ratio stands in — within 1 ulp of DuckDB on non-dyadic
    // distributions (the corpus pins only exactly-representable cases,
    // same posture as the unpinned regr_syy)
    var acc = 0.0
    r.valuesIterator.foreach { c =>
      acc += (c / total) * (math.log(total / c) / math.log(2.0)) }
    acc
  }
  override def bufferEncoder: Encoder[B] =
    Encoders.kryo[scala.collection.immutable.Map[String, Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
