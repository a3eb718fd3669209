package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** DuckDB's `//` operator, exactly as DuckDB 1.0 evaluates it (the oracle
  * engine; every corner probed directly):
  *
  *   - both operands integral → BIGINT division truncating toward zero
  *     (`-5 // 2 = -2`, `-7 // 2 = -3`), divisor 0 → NULL, and
  *     `Long.MinValue // -1` raises the same loud overflow DuckDB raises
  *     ("Out of Range Error: Overflow in division") instead of Java's
  *     silent wraparound;
  *   - any fractional operand (DOUBLE/FLOAT/DECIMAL) → plain DOUBLE
  *     division (`5.5 // 2 = 2.75` in DuckDB 1.0 — the floor-division
  *     reading only applies to integers in that version), divisor 0 → NULL.
  *
  * The gateway rewrites the `//` token to Spark's `div` (same multiplicative
  * precedence, so operand grouping is preserved exactly) and then swaps the
  * parsed `IntegralDivide` nodes for this expression — see
  * `SqlGateway.duckDivSql`. Mixed-type children are handled here rather
  * than by analyzer coercion, so no silent widening cast changes semantics.
  */
case class DuckFloorDiv(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private lazy val integral = isIntegral(left.dataType) && isIntegral(right.dataType)

  override def dataType: DataType = if (integral) LongType else DoubleType

  // divisor 0 yields NULL (DuckDB 1.0), independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"// requires numeric operands, got ${left.dataType.catalogString} " +
        s"and ${right.dataType.catalogString}")

  private def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    if (integral) {
      val rl = r.asInstanceOf[java.lang.Number].longValue()
      if (rl == 0L) null
      else DuckFloorDiv.intDiv(l.asInstanceOf[java.lang.Number].longValue(), rl)
    } else {
      val rd = toD(r)
      if (rd == 0.0) null else toD(l) / rd
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def asDouble(code: String, dt: DataType): String = dt match {
      case _: DecimalType => s"$code.toDouble()"
      case _ => s"(double) $code"
    }
    val rv = ctx.freshName("duckDivR") // unique per site: two `//` in one
    nullSafeCodeGen(ctx, ev, (l, r) =>   // codegen scope must not collide
      if (integral)
        s"""
           |long $rv = (long) $r;
           |if ($rv == 0L) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.DuckFloorDiv.intDiv((long) $l, $rv); }
         """.stripMargin
      else
        s"""
           |double $rv = ${asDouble(r, right.dataType)};
           |if ($rv == 0.0D) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${asDouble(l, left.dataType)} / $rv; }
         """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DuckFloorDiv = copy(left = newLeft, right = newRight)
}

object DuckFloorDiv {
  /** Truncating long division with DuckDB's loud overflow on MIN/-1. */
  def intDiv(l: Long, r: Long): Long = {
    if (l == Long.MinValue && r == -1L)
      throw new ArithmeticException(s"Overflow in division of $l / $r")
    l / r
  }
}
