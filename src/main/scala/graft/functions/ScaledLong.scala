package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
case class ScaledLong(child: Expression, factor: Double) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    ScaledLong.scaled(input.asInstanceOf[Double], factor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScaledLong.scaled($c, ${factor}D)")

  override protected def withNewChildInternal(newChild: Expression): ScaledLong =
    copy(child = newChild)
}

object ScaledLong {
  def scaled(x: Double, f: Double): Long = {
    val s = x * f
    if (s >= 0) (s + 0.5).toLong else -((-s) + 0.5).toLong
  }

  def apply(c: Column, scale: Int): Column =
    ColumnShim.column(ScaledLong(ColumnShim.expression(c), math.pow(10, scale)))
}
