package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** DuckDB's `age(a, b)` — the Postgres-style calendar difference as an
  * INTERVAL (reachable through the reference passthrough `db/db.go:70`).
  * Probed semantics: the largest whole months (with end-of-month clamping
  * — age('2024-03-01','2024-01-31') is '1 month 1 day' because Jan 31 +
  * 1 month clamps to Feb 29), then whole days, then the sub-day
  * remainder ('10:00:44.5' across a midnight borrow); a reversed pair
  * negates every component; NULL in → NULL out. `java.time`'s
  * MONTHS.between applies the identical clamping rule, so the borrow
  * chain is months → days → micros over LocalDateTime. The 1-arg form
  * (current_date anchor) is spelled by the gateway rewrite. */
object DuckAgeKernel {
  def age(aMicros: Long, bMicros: Long): CalendarInterval = {
    val utc = java.time.ZoneOffset.UTC
    def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000).toInt, utc)
    val (a, b, sign) =
      if (aMicros >= bMicros) (ldt(aMicros), ldt(bMicros), 1)
      else (ldt(bMicros), ldt(aMicros), -1)
    // Postgres' field-wise diff with borrow (probed: a negative day count
    // borrows the length of the EARLIER timestamp's month, walking back —
    // age('2001-04-10','1957-06-13') is 27 days via June's 30, while
    // age('2024-03-01','2024-01-31') is 1 day via January's 31)
    var micros = (a.getNano - b.getNano).toLong / 1000
    var sec = a.getSecond - b.getSecond
    var min = a.getMinute - b.getMinute
    var hour = a.getHour - b.getHour
    var day = a.getDayOfMonth - b.getDayOfMonth
    var month = a.getMonthValue - b.getMonthValue
    var year = a.getYear - b.getYear
    if (micros < 0) { micros += 1000000L; sec -= 1 }
    if (sec < 0) { sec += 60; min -= 1 }
    if (min < 0) { min += 60; hour -= 1 }
    if (hour < 0) { hour += 24; day -= 1 }
    var borrowMonth = java.time.YearMonth.of(b.getYear, b.getMonthValue)
    while (day < 0) {
      day += borrowMonth.lengthOfMonth()
      month -= 1
      borrowMonth = borrowMonth.minusMonths(1)
    }
    while (month < 0) { month += 12; year -= 1 }
    val totalMicros =
      ((hour * 60L + min) * 60L + sec) * 1000000L + micros
    new CalendarInterval(sign * (year * 12 + month), sign * day,
      sign * totalMicros)
  }
}

case class DuckAge(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = CalendarIntervalType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e =>
        Seq(TimestampType, TimestampNTZType, DateType, NullType)
          .contains(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("age expects timestamp arguments")
  private def toMicros(v: Any, dt: DataType): Long = dt match {
    case DateType => v.asInstanceOf[Int].toLong * 86400000000L
    case _ => v.asInstanceOf[Long]
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    DuckAgeKernel.age(toMicros(a, left.dataType), toMicros(b, right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def conv(e: Expression, v: String): String = e.dataType match {
      case DateType => s"((long)($v) * 86400000000L)"
      case _ => s"(long)($v)"
    }
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DuckAgeKernel.age(${conv(left, a)}, ${conv(right, b)})")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckAge = copy(left = l, right = r)
}
