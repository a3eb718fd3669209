package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's cast to TIMESTAMP WITH TIME ZONE, per-row, exactly as DuckDB
  * 1.0 evaluates it (every corner probed; the reference reaches this
  * through its passthrough, `db/db.go:70`). The engine's model stores
  * the UTC instant (session zone is pinned UTC), so the result type is
  * Spark's instant-typed TIMESTAMP; rendering differences are documented
  * at the result boundary (`engine/Results.scala`).
  *
  * String sources parse DuckDB's TIMESTAMPTZ text grammar — probed:
  *
  *   - `YYYY-MM-DD[ T]H[H]:MM:SS[.fraction][Z|±HH[[:]MM]| zone]`, with
  *     single-digit month/day/hour accepted (`2020-2-1 2:00:00`), the
  *     seconds REQUIRED when a time is present (`12:00` errors), and
  *     leading/trailing whitespace trimmed;
  *   - a date-only text takes NO zone/offset suffix (`2020-06-01 UTC`
  *     and `2020-06-01+02` both error);
  *   - fractions beyond 6 digits TRUNCATE (`.1234567` → `.123456`,
  *     `.1234564` → `.123456` — not rounded);
  *   - the offset must be ATTACHED: `12:00:00 +02` (with a space) is a
  *     ZONE-NAME lookup of the token `+02`, which is unknown — and
  *     DuckDB silently IGNORES an unknown zone name (probed:
  *     `... Nope/Zone` and the case-mismatched `... europe/berlin` both
  *     parse as naive session-zone text); a KNOWN name (`America/
  *     New_York`, `UTC`) interprets the wall-clock in that zone;
  *   - `Z` is accepted uppercase only (`z` errors); short (`+2`) and
  *     second-bearing (`+02:30:30`) offsets error;
  *   - `24:00:00` (exactly) rolls to next-day midnight; `24:30:00`
  *     errors; invalid calendar dates (`2020-06-31`) error;
  *   - the special `epoch` parses to 1970-01-01 00:00:00+00 (the
  *     `infinity` specials stay unsupported — loud, not wrong).
  *
  * Naive TIMESTAMP sources re-interpret in the session zone (UTC →
  * identity on the stored micros), DATE sources are UTC midnight.
  * Failures raise DuckDB's exact Conversion Error text, or NULL under
  * TRY_CAST (`tryMode`). */
case class DuckTstzCast(child: Expression, tryMode: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  /** Foldable over a foldable child: the literal rewrite wraps
    * `TIMESTAMP '<utc>'` in this cast purely to mark instant-typedness
    * on the ANALYZED plan (the boundary's `+00`/type-name rendering);
    * ConstantFolding must still collapse it to a plain timestamp
    * literal so comparisons against it keep their parquet filter
    * pushdown at scale. */
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | DateType | TimestampNTZType | NullType |
         _: TimestampType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cannot cast ${other.catalogString} to timestamp with time zone")
  }

  /** Boxed micros-since-epoch (UTC instant), or null when TRY_CAST
    * absorbs a conversion failure. */
  def castBoxed(v: Any): Any =
    try {
      child.dataType match {
        case StringType =>
          java.lang.Long.valueOf(DuckTstzCast.parseUtcMicros(v.toString))
        case TimestampNTZType | _: TimestampType =>
          java.lang.Long.valueOf(v.asInstanceOf[Long])
        case DateType =>
          java.lang.Long.valueOf(v.asInstanceOf[Int].toLong * 86400000000L)
        case other => throw new UnsupportedOperationException(
          s"DuckTstzCast source ${other.catalogString}")
      }
    } catch {
      case scala.util.control.NonFatal(_) if tryMode => null
    }

  override def nullSafeEval(input: Any): Any = castBoxed(input match {
    case s: UTF8String => s.toString
    case other => other
  })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("duckTstzCast", this,
      classOf[DuckTstzCast].getName)
    val boxed = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("dtz")
      s"""
         |Object $tmp = $ref.castBoxed($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (($boxed) $tmp).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DuckTstzCast =
    copy(child = newChild)
}

object DuckTstzCast {

  private val TstzRe = ("""^(\d{4,6})-(\d{1,2})-(\d{1,2})""" +
    """(?:[ T](\d{1,2}):(\d{2}):(\d{2})(\.\d+)?""" +
    """(?:(Z)|([+-]\d{2}(?::?\d{2})?)|\s+(\S+)\s*)?)?$""").r

  /** Cached once: ZoneRulesProvider copies the full ~600-entry set on
    * every getAvailableZoneIds call — a per-row allocation on the
    * codegen'd cast path otherwise (r14 review). The tz database does
    * not change within a JVM. */
  private val AvailableZones: java.util.Set[String] =
    java.util.Collections.unmodifiableSet(
      new java.util.HashSet(java.time.ZoneId.getAvailableZoneIds))

  /** Parse DuckDB TIMESTAMPTZ text (grammar in the class scaladoc) to
    * UTC-instant micros; throws DuckDB's Conversion Error on mismatch. */
  def parseUtcMicros(text: String): Long = {
    def fail(): Nothing = throw new IllegalArgumentException(
      "Conversion Error: timestamp field value out of range: \"" +
        text.trim + "\", expected format is " +
        "(YYYY-MM-DD HH:MM:SS[.US][±HH:MM| ZONE])")
    text.trim match {
      case "epoch" => 0L
      case TstzRe(y, mo, d, h, mi, se, frac, z, off, zone) =>
        try {
          val micros = Option(frac).map(f =>
            (f.drop(1) + "00000").substring(0, 6).toLong).getOrElse(0L)
          var hour = Option(h).map(_.toInt).getOrElse(0)
          var rollDay = 0
          if (hour == 24) {
            // 24:00:00 exactly is next-day midnight (probed); any other
            // 24:xx is out of range
            if (mi != "00" || se != "00" || micros != 0) fail()
            hour = 0; rollDay = 1
          }
          val date = java.time.LocalDate.of(y.toInt, mo.toInt, d.toInt)
            .plusDays(rollDay)
          val ldt = java.time.LocalDateTime.of(date,
            java.time.LocalTime.of(hour,
              Option(mi).map(_.toInt).getOrElse(0),
              Option(se).map(_.toInt).getOrElse(0),
              micros.toInt * 1000))
          val utc: java.time.LocalDateTime =
            if (z != null) ldt
            else if (off != null) {
              val norm =
                if (off.length == 3) off // +HH
                else if (!off.contains(":")) off.take(3) + ":" + off.drop(3)
                else off
              ldt.atOffset(java.time.ZoneOffset.of(norm))
                .withOffsetSameInstant(java.time.ZoneOffset.UTC)
                .toLocalDateTime
            } else if (zone != null && AvailableZones.contains(zone)) {
              // known zone name: wall-clock in that zone → instant;
              // an UNKNOWN name is silently ignored (naive) — probed
              ldt.atZone(java.time.ZoneId.of(zone))
                .withZoneSameInstant(java.time.ZoneOffset.UTC)
                .toLocalDateTime
            } else ldt
          utc.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            utc.getNano / 1000L
        } catch {
          case _: java.time.DateTimeException => fail()
          case _: NumberFormatException => fail()
        }
      case _ => fail()
    }
  }

  /** UTC-instant micros → duck's naive text (`2020-06-01 10:00:00[.f]`,
    * fraction trimmed of trailing zeros) — the single formatter behind
    * both the literal rewrite and [[DuckInstantToVarchar]]'s '+00'
    * rendering (one source of truth for fraction/negative-epoch edges). */
  def microsToUtcText(micros: Long): String = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val frac = if (ldt.getNano == 0) ""
      else ("." + f"${ldt.getNano}%09d").reverse.dropWhile(_ == '0').reverse
    f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
      f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d$frac"
  }

  /** The UTC-naive text of a TIMESTAMPTZ literal — the rewrite-time twin
    * of the per-row cast (`SqlGateway`'s literal pass emits
    * `TIMESTAMP '<this>'`). */
  def toUtcText(text: String): String = microsToUtcText(parseUtcMicros(text))
}
