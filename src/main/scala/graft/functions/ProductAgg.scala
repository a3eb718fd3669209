package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DuckDB's `product` aggregate (no Spark builtin): the DOUBLE product
  * of the non-NULL inputs, NULL over zero rows (probed: product() of an
  * empty/all-NULL group is NULL, NULL elements are skipped, negatives
  * multiply through). Constant-size mergeable state (running product +
  * non-null count) — partition-order float rounding applies, the same
  * caveat DuckDB's own scan order carries. Registered for SQL as
  * `graft_product`; the gateway rewrites `product(x)` onto it. */
class ProductAggregator
    extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
  override def zero: (Double, Long) = (1.0, 0L)
  override def reduce(b: (Double, Long), a: java.lang.Double): (Double, Long) =
    if (a == null) b else (b._1 * a.doubleValue(), b._2 + 1)
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 * y._1, x._2 + y._2)
  override def finish(r: (Double, Long)): java.lang.Double =
    if (r._2 == 0) null else Double.box(r._1)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
