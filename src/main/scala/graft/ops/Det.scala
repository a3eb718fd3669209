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
  /** Engine-side fast path for the exact sums: sum SCALED LONGS (cents)
    * instead of decimals. Spark's sum over DECIMAL(18,s) widens to
    * precision 28 and falls off the primitive fast path into per-row
    * BigDecimal work (~2× slower in the pinned-cache bench); a long sum
    * stays a codegen'd integer add — exact, partition-order invariant,
    * and ANSI-checked (overflow throws loudly instead of wrapping).
    *
    * Equality with the oracle's `CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)`
    * is bit-exact: both sides hold the same exact rational (round-to-cents
    * per row, then exact integer summation) and round it to DOUBLE once at
    * the end — IEEE division of an exact long by the scale factor is the
    * same single rounding as the decimal→double cast, while the long sum
    * stays below 2^53 (9e15 cents ≈ 90T money units per group — orders of
    * magnitude of headroom at the bench SFs; the decimal construction
    * remains the fallback past that envelope, see q01's sum_charge). */
  private def scaledLongSum(c: Column, scale: Int): Column =
    sum(graft.functions.ScaledLong(c, scale))

  /** Exact sum rendered as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    scaledLongSum(c, scale) / lit(math.pow(10, scale))

  /** Deterministic average: exact sum → double, / count (one IEEE
    * division each, mirroring the oracle's CAST(...)/COUNT structure). */
  def davg(c: Column, scale: Int = 2): Column =
    (scaledLongSum(c, scale) / lit(math.pow(10, scale))) / count(c)

  /** Money input as exact decimal cents. Casting the *input* (an exact
    * 2-dp value stored as double) is safe in both engines; casting a
    * *computed* double product is not (HALF_UP vs banker's rounding at the
    * cent boundary) — so arithmetic on money happens after this cast. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Rate input (discount/tax, 2-dp in [0,1]) as exact decimal. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  val oneRate: Column = lit(1.0).cast(DecimalType(4, 2))

  /** Exact revenue sum: SUM(price * (1 - discount)) as double. Same
    * scaled-long construction at scale 4 (cents × discount basis points):
    * per-row products and the group sum stay exact integers, one rounding
    * to double at the end — identical to the oracle's decimal expression. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(graft.functions.ScaledLong(price, 2) *
      (lit(100L) - graft.functions.ScaledLong(discount, 2))) / lit(1e4)

  val revenueSumSql: String =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"

  /** Exact charge sum: SUM(price·(1−discount)·(1+tax)) as double — the
    * three-factor cousin of [[revenueSum]], whose per-row scaled-long
    * product (cents × bp × bp ≤ 4·10^11 at scale 6) no longer leaves
    * single-long headroom for big group sums. Until r5 this was the one
    * aggregate left on the decimal path, and its per-row BigDecimal
    * multiply chain was ~40% of q01's time at the 10× corpus
    * (1.72 → 1.05 s with this fix). Exact long-only fix: SPLIT each product
    * around 2^20 and sum the two halves separately —
    * hi ≤ 4·10^5 and lo < 2^20 per row, so even 10^12-row groups stay
    * orders of magnitude inside long — then recombine ONCE PER GROUP in
    * DECIMAL(38): hi·2^20 + lo is the same exact integer a decimal sum
    * would hold, /10^6 is exact at scale 6, and the final double cast is
    * the oracle's single rounding. Bit-identical to
    * CAST(SUM(decimal product) AS DOUBLE) by construction, at codegen'd
    * integer-multiply cost per row. */
  def chargeSum(price: Column, discount: Column, tax: Column): Column = {
    val x = graft.functions.ScaledLong(price, 2) *
      (lit(100L) - graft.functions.ScaledLong(discount, 2)) *
      (lit(100L) + graft.functions.ScaledLong(tax, 2))
    val hi = sum(shiftright(x, 20))
    val lo = sum(x.bitwiseAND(lit((1L << 20) - 1)))
    ((hi.cast(DecimalType(38, 0)) * lit(1L << 20) + lo.cast(DecimalType(38, 0))) /
      lit(1000000L).cast(DecimalType(7, 0))).cast(DoubleType)
  }

  /** Oracle-side SQL for [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Oracle-side SQL for [[davg]]. */
  def davgSql(expr: String, scale: Int = 2): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / COUNT($expr))"

  /** Run `body` with adaptive execution pinned OFF, restoring the session
    * conf after. For one-shot queries AQE is the right default (runtime
    * stats pick join strategies and coalesce partitions) — but a few
    * operators execute a STATICALLY KNOWN, stable plan shape repeatedly or
    * in driver-sequenced phases (iterative graph loops, the phased IVF
    * probe): there AQE's one-materialization-job-per-exchange turns a
    * handful of stages into a long chain of sequential barrier jobs and
    * re-derives the same tiny-stat decisions every round. Pinning the plan
    * for exactly that scope is the classic iterative-superstep execution
    * model; everything else in the session keeps AQE.
    *
    * Only safe when the caller materializes INSIDE `body` (checkpoint or
    * action) — a lazy frame returned from `body` would execute under
    * whatever conf the session has later. */
  def withAqeOff[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val was = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally s.conf.set("spark.sql.adaptive.enabled", was)
  }
}
