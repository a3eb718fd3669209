package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DuckDB's `mad` aggregate (median absolute deviation; no Spark
  * builtin): median(|x - median(x)|) with the INTERPOLATED median in both
  * passes (probed 1.0: (1,2,3,4) → 1.0 via median 2.5; (1.5,2.0,8.5,9.0)
  * → 3.5 via median 5.25). NULLs are skipped, an empty/all-NULL group is
  * NULL, a single value is 0.0 (all probed). Output is DOUBLE (DuckDB
  * keeps DECIMAL for DECIMAL inputs — width-normalized at the corpus
  * boundary; the gateway rewrite casts the operand to DOUBLE).
  *
  * Holistic state (the group's values), like DuckDB's own mad — the
  * buffer is bounded by the group size, the same memory shape as Spark's
  * exact `percentile`. Registered for SQL as `graft_mad`; the gateway
  * rewrites `mad(x)` onto it. */
class MadAggregator extends Aggregator[java.lang.Double, Vector[Double], java.lang.Double] {
  override def zero: Vector[Double] = Vector.empty
  override def reduce(b: Vector[Double], a: java.lang.Double): Vector[Double] =
    if (a == null) b else b :+ a.doubleValue()
  override def merge(x: Vector[Double], y: Vector[Double]): Vector[Double] = x ++ y
  override def finish(r: Vector[Double]): java.lang.Double =
    if (r.isEmpty) null
    else {
      val med = interpolated(r.sorted)
      Double.box(interpolated(r.map(v => math.abs(v - med)).sorted))
    }
  private def interpolated(sorted: Vector[Double]): Double = {
    val n = sorted.size
    if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }
  override def bufferEncoder: Encoder[Vector[Double]] =
    Encoders.kryo[Vector[Double]]
  override def outputEncoder: Encoder[java.lang.Double] =
    Encoders.DOUBLE
}
