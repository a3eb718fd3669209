package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Helpers that make aggregate results *bit-deterministic across engines* so
  * the driver's hash-compare against the DuckDB oracle cannot be tripped by
  * floating-point summation order.
  *
  * Doubles summed in parallel are order-dependent; decimals are exact. So
  * every money/quantity aggregate is computed as an exact DECIMAL sum and
  * only rendered back to DOUBLE at the end. The oracle SQL mirrors the same
  * construction (`CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`), making
  * Spark-vs-DuckDB results identical regardless of partitioning — the
  * property that lets the same query run unchanged on a 1000-executor
  * cluster and still hash-match.
  */
object Det {
  /** Exact decimal sum rendered as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count (one IEEE division). */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(c)

  /** Money input as exact decimal cents. Casting the *input* (an exact
    * 2-dp value stored as double) is safe in both engines; casting a
    * *computed* double product is not (HALF_UP vs banker's rounding at the
    * cent boundary) — so arithmetic on money happens after this cast. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Rate input (discount/tax, 2-dp in [0,1]) as exact decimal. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  val oneRate: Column = lit(1.0).cast(DecimalType(4, 2))

  /** Exact decimal revenue sum: SUM(price * (1 - discount)) as double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(money(price) * (oneRate - rate(discount))).cast(DoubleType)

  val revenueSumSql: String =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side SQL for [[davg]]. */
  def davgSql(expr: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr))"
}
