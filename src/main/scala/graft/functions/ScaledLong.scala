package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

import org.apache.spark.sql.graft.ColumnShim

/** `round(x * factor)` → LONG, HALF_UP away from zero — the hot inner step
  * of every [[graft.ops.Det]] exact money/rate sum — as a single
  * allocation-free codegen'd expression.
  *
  * Spark's `Round` on a DOUBLE input materializes
  * `java.math.BigDecimal.valueOf(x).setScale(0, HALF_UP)` PER ROW (two
  * allocations + slow-path decimal scaling); with four–five rounded
  * columns per row that chain was measured as ~2× the whole aggregation
  * body of q01 (AggProbe: 0.175 s vs 0.083 s for the same shape with
  * plain sums). Here the fixed-dp contract of the corpus (money 2-dp,
  * rates 2-dp — see Det's scaladoc) makes the BigDecimal detour
  * unnecessary: for x·f within ±1 ulp of an integer k (always true when
  * x is an exact ≤`dp`-decimal and f = 10^dp), `(long)(|x|·f + 0.5)`
  * truncation IS HALF_UP, and the sign branch extends it away-from-zero —
  * bit-identical to `round(x·f)` across the whole envelope |x·f| < 2^52
  * (vs the ~9·10^13 money-cent bound Det already documents).
  */
case class ScaledLong(child: Expression, factor: Double)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType

  // misuse (a decimal/int/string child) fails at ANALYSIS time with a type
  // error instead of a runtime ClassCastException in interpreted eval or a
  // Janino compile error that silently falls back to interpreted eval
  // (Seq[DataType]: covariant override — AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(DoubleType)

  override def nullSafeEval(input: Any): Any =
    ScaledLong.scaled(input.asInstanceOf[Double], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScaledLong.scaled($c, ${factor}D)")

  override protected def withNewChildInternal(newChild: Expression): ScaledLong =
    copy(child = newChild)
}

object ScaledLong {
  /** 2^52 — above this |x·f| doubles no longer resolve 0.5 ulps, so the
    * truncation identity with round() stops being provable. */
  private val ExactBound = 4503599627370496.0

  def scaled(x: Double, f: Double): Long = {
    val s = x * f
    // loud failure outside the documented envelope (mirrors Det's
    // loud-overflow sum posture): NaN and |x·f| ≥ 2^52 used to produce
    // plausible-looking numbers (NaN → 0, ±Inf → saturation) — garbage
    // input must error, not silently change rounding
    if (java.lang.Double.isNaN(s) || math.abs(s) >= ExactBound)
      throw new ArithmeticException(
        s"ScaledLong: $x * $f = $s outside the exact envelope |x*f| < 2^52")
    if (s >= 0) (s + 0.5).toLong else -((-s) + 0.5).toLong
  }

  /** PRECONDITION (callers' responsibility): the column holds exact
    * ≤`scale`-decimal doubles — the corpus generator contract for money
    * (2 dp) and rates (2 dp). Only then is the truncation provably equal
    * to `round(x * 10^scale)`; an arbitrary double with x·f just below
    * k.5 (e.g. 0.49999999999999994 at scale 0) would round up where
    * round() rounds down. */
  def apply(c: Column, scale: Int): Column =
    ColumnShim.column(ScaledLong(ColumnShim.expression(c), math.pow(10, scale)))
}
