package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB scalar functions over text/paths/bytes/time Spark has no
  * builtin for — `strip_accents`, `nfc_normalize`, `parse_path`,
  * `parse_dirname`, `parse_dirpath`, `parse_filename`, `format_bytes`,
  * `time_bucket`. Registered under their DuckDB names by the gateway
  * (reachable through the reference passthrough `db/db.go:70`). Every
  * corner probed against DuckDB 1.0:
  *
  *   - strip_accents = NFD + drop combining marks ('ž'→'z', 'ß' stays);
  *   - parse_path splits on the separator set ('both_slash' default, also
  *     'forward_slash'/'backslash'/'system'), a LEADING separator is its
  *     own first component, empty components drop;
  *   - parse_dirname = the FIRST component when ≥2 exist, else '';
  *     parse_dirpath = the raw prefix before the LAST separator
  *     ('/x' → '', '/a/b/c' → '/a/b');
  *   - parse_filename = the suffix after the last separator; with
  *     trim_extension, drops from the LAST '.' even at index 0
  *     ('.hidden' → '', 'c.tar.gz' → 'c.tar');
  *   - format_bytes: '<1024' spells 'N bytes', then one-decimal binary
  *     units KiB..PiB, sign carried through ('-2.0 KiB'), values past
  *     PiB stay in PiB ('1024.0 PiB');
  *   - time_bucket aligns to origin 2000-01-03 00:00:00 for day/time
  *     widths (a Monday, so '7 days' buckets start Mondays) and to
  *     2000-01-01 for month widths; month widths with day/time parts are
  *     a loud error, exactly DuckDB's.
  *
  * All are allocation-bounded per-row scalar kernels dispatched via a
  * static call from generated code — they stay inside whole-stage
  * codegen like the engine's other text kernels. */
object DuckPathText {
  def stripAccents(s: UTF8String): UTF8String = {
    val n = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val ch = n.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFC))

  /** separator option → the set of separator chars (probed names). */
  private def sepChars(opt: String): String = opt match {
    case "forward_slash" => "/"
    case "backslash" => "\\"
    case "system" => java.io.File.separator
    case _ => "/\\" // 'both_slash' and the 1-arg default
  }

  private def componentsOf(path: String, sep: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (path.nonEmpty && sep.indexOf(path.charAt(0)) >= 0)
      out += path.charAt(0).toString
    var i = 0
    val cur = new java.lang.StringBuilder
    while (i < path.length) {
      val ch = path.charAt(i)
      if (sep.indexOf(ch) >= 0) {
        if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
      } else cur.append(ch)
      i += 1
    }
    if (cur.length > 0) out += cur.toString
    out.toArray
  }

  def parsePath(path: UTF8String, sepOpt: UTF8String): GenericArrayData =
    new GenericArrayData(componentsOf(path.toString,
      sepChars(sepOpt.toString)).map(UTF8String.fromString(_)))

  def parseDirname(path: UTF8String, sepOpt: UTF8String): UTF8String = {
    val comps = componentsOf(path.toString, sepChars(sepOpt.toString))
    UTF8String.fromString(if (comps.length >= 2) comps(0) else "")
  }

  def parseDirpath(path: UTF8String, sepOpt: UTF8String): UTF8String = {
    val p = path.toString
    val sep = sepChars(sepOpt.toString)
    var last = -1
    var i = 0
    while (i < p.length) { if (sep.indexOf(p.charAt(i)) >= 0) last = i; i += 1 }
    UTF8String.fromString(if (last < 0) "" else p.substring(0, last))
  }

  def parseFilename(path: UTF8String, trimExt: Boolean,
      sepOpt: UTF8String): UTF8String = {
    val p = path.toString
    val sep = sepChars(sepOpt.toString)
    var last = -1
    var i = 0
    while (i < p.length) { if (sep.indexOf(p.charAt(i)) >= 0) last = i; i += 1 }
    var f = p.substring(last + 1)
    if (trimExt) {
      val dot = f.lastIndexOf('.')
      if (dot >= 0) f = f.substring(0, dot)
    }
    UTF8String.fromString(f)
  }

  /** DuckDB `bar(x, min, max, width)` (probed, v1.0): fraction clamped to
    * [0,1]; `floor(frac*width)` full blocks (█ U+2588) plus one partial
    * eighth-block glyph for the truncated fractional eighths; then padded
    * with spaces to `width` BYTES — DuckDB pads as if each 3-byte block
    * glyph were one byte (probed: bar(2.0,0,10,10) = '██' + 4 spaces,
    * bar(2.5,...) = '██▌' + 1 space, full bars get no padding). */
  def bar(x: Double, lo: Double, hi: Double, width: Double): UTF8String = {
    val frac0 = (x - lo) / (hi - lo)
    val frac = if (frac0.isNaN) 0.0 else math.max(0.0, math.min(1.0, frac0))
    val blocks = frac * width
    val full = math.floor(blocks).toInt
    val eighths = math.floor((blocks - full) * 8.0).toInt
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    if (eighths > 0) // ▏▎▍▌▋▊▉ = 1..7 eighths
      sb.append("▏▎▍▌▋▊▉".charAt(eighths - 1))
    val bytes = sb.length * 3 // every block glyph is 3 UTF-8 bytes
    var pad = math.max(0, math.ceil(width).toInt - bytes)
    while (pad > 0) { sb.append(' '); pad -= 1 }
    UTF8String.fromString(sb.toString)
  }

  def formatBytes(b: Long): UTF8String = {
    val neg = b < 0
    val a = math.abs(b)
    UTF8String.fromString(
      if (a >= 0 && a < 1024) s"$b bytes" // abs(MinValue) stays negative
      else {
        val units = Array("KiB", "MiB", "GiB", "TiB", "PiB")
        var scaled = math.abs(b.toDouble) / 1024.0
        var idx = 0
        while (scaled >= 1024.0 && idx < units.length - 1) {
          scaled /= 1024.0; idx += 1
        }
        // DuckDB TRUNCATES to one decimal (probed: 1000000 → "976.5 KiB",
        // 976.5625 would ROUND to 976.6) — %.1f rounding was silently off
        val trunc = math.floor(scaled * 10.0) / 10.0
        String.format(java.util.Locale.ROOT, "%.1f %s",
          Double.box(if (neg) -trunc else trunc), units(idx))
      })
  }

  /** formatReadableDecimalSize: SI units (kB = 1000), same one-decimal
    * truncation (probed: 123456 → "123.4 kB", -123456 → "-123.4 kB",
    * 999999999999 → "999.9 GB", 999 → "999 bytes"). */
  def formatBytesDecimal(b: Long): UTF8String = {
    val neg = b < 0
    val a = math.abs(b)
    UTF8String.fromString(
      if (a >= 0 && a < 1000) s"$b bytes" // abs(MinValue) stays negative
      else {
        val units = Array("kB", "MB", "GB", "TB", "PB")
        var scaled = math.abs(b.toDouble) / 1000.0
        var idx = 0
        while (scaled >= 1000.0 && idx < units.length - 1) {
          scaled /= 1000.0; idx += 1
        }
        val trunc = math.floor(scaled * 10.0) / 10.0
        String.format(java.util.Locale.ROOT, "%.1f %s",
          Double.box(if (neg) -trunc else trunc), units(idx))
      })
  }

  /** DuckDB's spelling of a Spark type (DuckTypeof scaladoc). */
  def duckTypeName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case _: StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case _: DateType => "DATE"
    case _: TimestampType => "TIMESTAMP"
    // NTZ is DuckDB's plain TIMESTAMP; the new TIME type renders TIME
    case TimestampNTZType => "TIMESTAMP"
    case _: TimeType => "TIME"
    case BinaryType => "BLOB"
    case NullType => "\"NULL\""
    case ArrayType(e, _) => duckTypeName(e) + "[]"
    case s: StructType => "STRUCT(" +
      s.fields.map(f => s"${f.name} ${duckTypeName(f.dataType)}")
        .mkString(", ") + ")"
    case MapType(k, v, _) => s"MAP(${duckTypeName(k)}, ${duckTypeName(v)})"
    case CalendarIntervalType | _: DayTimeIntervalType |
         _: YearMonthIntervalType => "INTERVAL"
    case other => other.sql
  }

  /** eval-path dispatch mirroring the codegen static calls. */
  def dispatch(kernel: String, a: UTF8String, b: UTF8String): Any =
    kernel match {
      case "parsePath" => parsePath(a, b)
      case "parseDirname" => parseDirname(a, b)
      case "parseDirpath" => parseDirpath(a, b)
    }

  private val OriginDays: Long = // 2000-01-03, a Monday (DuckDB's origin)
    java.time.LocalDate.of(2000, 1, 3).toEpochDay
  private val MicrosPerDay = 86400000000L

  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  /** width = (months, micros), exactly one nonzero (probed: DuckDB errors
    * on month widths with day/time parts). `t` is days for DateType
    * input, micros-since-epoch for TimestampType; returns the same unit. */
  def timeBucket(months: Int, micros: Long, t: Long, isDate: Boolean): Long = {
    if (months != 0 && micros != 0) throw new IllegalArgumentException(
      "time_bucket: month intervals cannot have day or time parts")
    if (months == 0 && micros == 0) throw new IllegalArgumentException(
      "time_bucket: zero-width interval")
    if (months != 0) {
      val date = java.time.LocalDate.ofEpochDay(
        if (isDate) t else floorDiv(t, MicrosPerDay))
      val m = (date.getYear - 2000) * 12 + (date.getMonthValue - 1)
      val b = floorDiv(m, months) * months
      val bucket = java.time.LocalDate.of(2000 + Math.floorDiv(b.toInt, 12),
        Math.floorMod(b.toInt, 12) + 1, 1)
      if (isDate) bucket.toEpochDay else bucket.toEpochDay * MicrosPerDay
    } else if (isDate) {
      if (micros % MicrosPerDay != 0) throw new IllegalArgumentException(
        "time_bucket: sub-day width over a DATE column")
      val wd = micros / MicrosPerDay
      floorDiv(t - OriginDays, wd) * wd + OriginDays
    } else {
      val origin = OriginDays * MicrosPerDay
      floorDiv(t - origin, micros) * micros + origin
    }
  }
}

abstract class DuckPathScalar extends BinaryExpression {
  def child: Expression
  def sepOpt: Expression
  override def left: Expression = child
  override def right: Expression = sepOpt
  def kernel: String
  override def nullSafeEval(a: Any, b: Any): Any = DuckPathText.dispatch(
    kernel, a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DuckPathText.$kernel($a, $b)")
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    DuckPathText.stripAccents(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DuckPathText.stripAccents($a)")
  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    DuckPathText.nfcNormalize(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DuckPathText.nfcNormalize($a)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

case class ParsePath(child: Expression, sepOpt: Expression)
    extends DuckPathScalar {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def kernel: String = "parsePath"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ParsePath = copy(child = l, sepOpt = r)
}

case class ParseDirname(child: Expression, sepOpt: Expression)
    extends DuckPathScalar {
  override def dataType: DataType = StringType
  override def kernel: String = "parseDirname"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ParseDirname = copy(child = l, sepOpt = r)
}

case class ParseDirpath(child: Expression, sepOpt: Expression)
    extends DuckPathScalar {
  override def dataType: DataType = StringType
  override def kernel: String = "parseDirpath"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ParseDirpath = copy(child = l, sepOpt = r)
}

case class ParseFilename(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(p: Any, t: Any, s: Any): Any =
    DuckPathText.parseFilename(p.asInstanceOf[UTF8String],
      t.asInstanceOf[Boolean], s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, t, s) =>
      s"graft.functions.DuckPathText.parseFilename($p, $t, $s)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): ParseFilename = copy(first = a, second = b, third = c)
}

case class FormatBytes(child: Expression, decimal: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    if (decimal) DuckPathText.formatBytesDecimal(a.asInstanceOf[Long])
    else DuckPathText.formatBytes(a.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (decimal) "formatBytesDecimal" else "formatBytes"
    defineCodeGen(ctx, ev, a => s"graft.functions.DuckPathText.$fn($a)")
  }
  override protected def withNewChildInternal(c: Expression): FormatBytes =
    copy(child = c)
}

/** DuckDB-style rendering of a complex value cast to VARCHAR (probed,
  * v1.0): lists `[a, b c]` (string elements UNQUOTED, `NULL` for null
  * elements, empty string renders empty), structs `{'name': value}`
  * (keys quoted, values bare), maps `{k=v}`, decimals keep their scale
  * (`1.50`), dates/timestamps ISO with a trailing-zero-trimmed
  * fraction, doubles in their shortest form — an exotic double whose
  * Java rendering would need scientific notation refuses loudly rather
  * than guessing DuckDB's exponent spelling. The gateway swaps this in
  * for USER casts of Array/Struct/Map operands to VARCHAR on the
  * analyzed plan (Spark's own cast renders `{1, x}`-style structs). */
case class DuckComplexToVarchar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  private def scalarStr(v: Any, dt: DataType): String = dt match {
    case _: StringType => v.asInstanceOf[UTF8String].toString
    case ByteType | ShortType | IntegerType | LongType => v.toString
    case BooleanType => if (v.asInstanceOf[Boolean]) "true" else "false"
    case _: DecimalType =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString
    case FloatType | DoubleType =>
      val d = v match {
        case f: java.lang.Float => f.doubleValue()
        case x => x.asInstanceOf[java.lang.Double].doubleValue()
      }
      val s = if (dt == FloatType) v.toString else java.lang.Double.toString(d)
      if (s.contains("E") || s.contains("e"))
        throw new IllegalArgumentException(
          "complex-to-VARCHAR: scientific-notation double rendering " +
            "differs between engines — refuse, don't guess")
      s
    case _: DateType =>
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString
    case _: TimestampType =>
      val micros = v.asInstanceOf[Long]
      val secs = Math.floorDiv(micros, 1000000L)
      val frac = Math.floorMod(micros, 1000000L)
      val base = java.time.LocalDateTime.ofEpochSecond(secs, 0,
        java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter
          .ofPattern("uuuu-MM-dd HH:mm:ss"))
      if (frac == 0) base
      else base + "." + f"$frac%06d".reverse.dropWhile(_ == '0').reverse
    case other => throw new IllegalArgumentException(
      s"complex-to-VARCHAR: unsupported element type $other")
  }

  private def render(v: Any, dt: DataType): String = dt match {
    case ArrayType(et, _) =>
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) "NULL" else render(a.get(i, et), et))
        .mkString("[", ", ", "]")
    case s: StructType =>
      val r = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      s.fields.zipWithIndex.map { case (f, i) =>
        s"'${f.name}': " + (if (r.isNullAt(i)) "NULL"
          else render(r.get(i, f.dataType), f.dataType))
      }.mkString("{", ", ", "}")
    case MapType(kt, vt, _) =>
      val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
      val ks = m.keyArray(); val vs = m.valueArray()
      (0 until m.numElements()).map { i =>
        render(ks.get(i, kt), kt) + "=" +
          (if (vs.isNullAt(i)) "NULL" else render(vs.get(i, vt), vt))
      }.mkString("{", ", ", "}")
    case other => scalarStr(v, other)
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(render(v, child.dataType))
  /** Boxed entry for generated code (operand is always an object type —
    * ArrayData/InternalRow/MapData — so no primitive boxing involved). */
  def evalBoxed(v: Any): Any = nullSafeEval(v)
  // real codegen (was CodegenFallback): the render itself stays one
  // interpreted call per row, but the expression no longer severs the
  // whole-stage-codegen span it sits in (r15 optimization round)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("duckComplexToVarchar", this,
      classOf[DuckComplexToVarchar].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (UTF8String) $ref.evalBoxed($c);")
  }
  override protected def withNewChildInternal(c: Expression)
      : DuckComplexToVarchar = copy(child = c)
}

/** DuckDB's `len`/`length`: character count for VARCHAR, element count
  * for lists (NULL elements counted — probed), BIGINT both ways.
  * Registered over Spark's builtin `length` in the gateway session so
  * the duck spelling works on lists too; on strings the value is
  * identical to Spark's builtin (only the width differs, as DuckDB's
  * does). */
case class DuckLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType | _: ArrayType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"len($other)")
    }
  private def isArray = child.dataType.isInstanceOf[ArrayType]
  override def nullSafeEval(a: Any): Any =
    if (isArray)
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .numElements().toLong
    else a.asInstanceOf[UTF8String].numChars().toLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      if (isArray) s"(long) $a.numElements()" else s"(long) $a.numChars()")
  override protected def withNewChildInternal(c: Expression): DuckLen =
    copy(child = c)
}

/** DuckDB's `nextafter`: the next representable DOUBLE from a toward b
  * — IEEE-defined, so Java's Math.nextAfter is bit-identical (probed:
  * nextafter(1.0, 2.0) = 1.0000000000000002, nextafter(0.0, -1.0) =
  * -5e-324). */
case class NextAfter(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.nextAfter($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): NextAfter = copy(left = l, right = r)
}

/** DuckDB's `typeof`: the argument's TYPE rendered in DuckDB's own
  * spelling (probed: INTEGER / BIGINT / DOUBLE / DECIMAL(2,1) / VARCHAR /
  * INTEGER[] / STRUCT(a INTEGER) / MAP(VARCHAR, INTEGER) / BLOB /
  * INTERVAL, and the NULL literal prints `"NULL"`). Type-only — never
  * evaluates the argument, so it is non-null even for NULL inputs,
  * exactly like DuckDB. */
case class DuckTypeof(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  private lazy val rendered =
    UTF8String.fromString(DuckPathText.duckTypeName(child.dataType))
  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = rendered
  // constant per plan: generated code reads the pre-rendered UTF8String
  // straight from the reference array — no per-row work, and the
  // expression no longer severs whole-stage codegen (was CodegenFallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("duckTypeofText", rendered,
      classOf[UTF8String].getName)
    ExprCode.forNonNullValue(
      org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .global(ref, StringType))
  }
  override protected def withNewChildInternal(c: Expression): DuckTypeof =
    copy(child = c)
}

/** time_bucket(width, ts) — width may arrive as an ANSI year-month
  * interval, an ANSI day-time interval, or a legacy CalendarInterval
  * (the gateway's make_interval rewrite); `ts` is DATE or TIMESTAMP and
  * the result keeps its type. */
case class DuckTimeBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = right.dataType
  private def isDate: Boolean = right.dataType.isInstanceOf[DateType]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ivOk = left.dataType match {
      case CalendarIntervalType | _: DayTimeIntervalType |
           _: YearMonthIntervalType => true
      case _ => false
    }
    val tsOk = right.dataType match {
      case _: DateType | _: TimestampType => true
      case _ => false
    }
    if (ivOk && tsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"time_bucket(${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(iv: Any, t: Any): Any = {
    val (months, micros) = left.dataType match {
      case _: YearMonthIntervalType => (iv.asInstanceOf[Int], 0L)
      case _: DayTimeIntervalType => (0, iv.asInstanceOf[Long])
      case _ =>
        val c = iv.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
        (c.months, c.days * 86400000000L + c.microseconds)
    }
    val tl = t match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
      case other => other.asInstanceOf[Number].longValue()
    }
    val r = DuckPathText.timeBucket(months, micros, tl, isDate)
    if (isDate) Int.box(r.toInt) else Long.box(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val extract: (String => String, String => String) = left.dataType match {
      case _: YearMonthIntervalType => (iv => iv, _ => "0L")
      case _: DayTimeIntervalType => (_ => "0", iv => iv)
      case _ => (iv => s"$iv.months",
        iv => s"($iv.days * 86400000000L + $iv.microseconds)")
    }
    val cast = if (isDate)
      (r: String) => s"(int) $r" else (r: String) => r
    defineCodeGen(ctx, ev, (iv, t) => cast(
      s"graft.functions.DuckPathText.timeBucket(${extract._1(iv)}, " +
        s"${extract._2(iv)}, (long) $t, $isDate)"))
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckTimeBucket = copy(left = l, right = r)
}

/** DuckDB `bar(x, min, max[, width=80])` — see DuckPathText.bar. */
case class BarFn(x: Expression, lo: Expression, hi: Expression,
    width: Expression) extends org.apache.spark.sql.catalyst.expressions
    .QuaternaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def first: Expression = x
  override def second: Expression = lo
  override def third: Expression = hi
  override def fourth: Expression = width
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    DuckPathText.bar(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.DuckPathText.bar($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): BarFn =
    copy(x = a, lo = b, hi = c, width = d)
}

/** DuckDB `gamma`/`lgamma` via commons-math3 (ships in Spark's own jars;
  * Lanczos like glibc's tgamma — the corpus pins only values verified to
  * match DuckDB's doubles exactly). */
case class GammaFn(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    org.apache.commons.math3.special.Gamma.gamma(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.commons.math3.special.Gamma.gamma($a)")
  override protected def withNewChildInternal(c: Expression): GammaFn =
    copy(child = c)
}

case class LGammaFn(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    org.apache.commons.math3.special.Gamma.logGamma(a.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.commons.math3.special.Gamma.logGamma($a)")
  override protected def withNewChildInternal(c: Expression): LGammaFn =
    copy(child = c)
}

/** DuckDB `epoch_ms` is OVERLOADED by argument type (probed):
  * `epoch_ms(TIMESTAMP)` → BIGINT milliseconds; `epoch_ms(BIGINT ms)` →
  * TIMESTAMP. Self-resolving on the child's analyzed type — the text
  * rewrite cannot know it. */
case class DuckEpochMs(child: Expression) extends UnaryExpression {
  private def integral(dt: DataType) = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  override lazy val resolved: Boolean = childrenResolved &&
    (child.dataType == TimestampType || integral(child.dataType))
  override def dataType: DataType =
    if (child.dataType == TimestampType) LongType else TimestampType
  override def nullSafeEval(a: Any): Any =
    if (child.dataType == TimestampType)
      Math.floorDiv(a.asInstanceOf[Long], 1000L)
    else a.asInstanceOf[Number].longValue() * 1000L
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == TimestampType)
      defineCodeGen(ctx, ev, a => s"java.lang.Math.floorDiv($a, 1000L)")
    else defineCodeGen(ctx, ev, a => s"((long) $a) * 1000L")
  override protected def withNewChildInternal(c: Expression): DuckEpochMs =
    copy(child = c)
}

/** DuckDB's interval → VARCHAR cast text — the same canonical rendering
  * the result boundary uses (`engine/Results.duckIntervalString`; duck
  * renders cast text and wire text identically, probed: `(INTERVAL 14
  * MONTH)::VARCHAR` = '1 year 2 months', `(ts1 - ts2)::VARCHAR` =
  * '65 days 12:00:00'). Spark's own cast renders the ANSI spelling
  * (`INTERVAL '31 12:00:00' DAY TO SECOND`) — silently divergent. The
  * gateway swaps this in for USER casts of interval operands to VARCHAR
  * on the analyzed plan. Day-time values split whole days out UNLESS
  * the operand's declared interval starts past DAY (a pure-time literal
  * or pure-time arithmetic — duck never normalizes micros into days at
  * render: `(INTERVAL 26 HOUR)::VARCHAR` = '26:00:00'). */
case class DuckIntervalToVarchar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = child.dataType match {
      case t: DayTimeIntervalType =>
        val micros = v.asInstanceOf[Long]
        if (t.startField > DayTimeIntervalType.DAY)
          graft.engine.Results.duckIntervalString(0, 0, micros)
        else graft.engine.Results.duckIntervalString(
          0, micros / 86400000000L, micros % 86400000000L)
      case _: YearMonthIntervalType =>
        graft.engine.Results.duckIntervalString(
          v.asInstanceOf[Int].toLong, 0, 0)
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
        graft.engine.Results.duckIntervalString(ci.months, ci.days,
          ci.microseconds)
      case other => throw new IllegalArgumentException(
        s"interval-to-VARCHAR: unsupported operand type $other")
    }
    UTF8String.fromString(s)
  }

  /** Boxed entry for generated code (ANSI intervals arrive as primitive
    * long/int and box at the call site — the [[DuckStrftime.evalBoxed]]
    * pattern; CalendarInterval is already an object). */
  def evalBoxed(v: Any): Any = nullSafeEval(v)
  // real codegen (was CodegenFallback, r14 verdict item 4): a
  // `col::TIMESTAMP - col2`→`::VARCHAR` over a large table no longer
  // pays interpreted eval per row or a severed whole-stage span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("duckIntervalToVarchar", this,
      classOf[DuckIntervalToVarchar].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (UTF8String) $ref.evalBoxed($c);")
  }

  override protected def withNewChildInternal(c: Expression): DuckIntervalToVarchar =
    copy(child = c)
}

/** DuckDB's TIMESTAMPTZ → VARCHAR cast text: the UTC instant with the
  * session-zone suffix (`2020-06-01 10:00:00+00`, fraction trimmed —
  * probed). The gateway swaps this in on the ANALYZED plan for VARCHAR
  * casts of instant-typed operands: a declared-TIMESTAMPTZ table column
  * (`Results.DuckTypeKey` metadata), a per-row [[DuckTstzCast]], or a
  * naive→instant timezone conversion — Spark's own cast renders the
  * bare naive text. */
case class DuckInstantToVarchar(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = UTF8String.fromString(
    DuckTstzCast.microsToUtcText(v.asInstanceOf[Long]) + "+00")

  /** Boxed entry for generated code (micros arrive as primitive long). */
  def evalBoxed(v: Any): Any = nullSafeEval(v)
  // real codegen (was CodegenFallback, r14 verdict item 4): a
  // `col::TIMESTAMPTZ::VARCHAR` over a large table no longer pays
  // interpreted eval per row or a severed whole-stage span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("duckInstantToVarchar", this,
      classOf[DuckInstantToVarchar].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (UTF8String) $ref.evalBoxed($c);")
  }

  override protected def withNewChildInternal(c: Expression): DuckInstantToVarchar =
    copy(child = c)
}
