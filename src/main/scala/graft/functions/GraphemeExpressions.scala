package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's grapheme-cluster text functions — `length_grapheme`,
  * `left_grapheme`, `right_grapheme`, `substring_grapheme` (reachable
  * through the reference passthrough `db/db.go:70`). DuckDB segments with
  * utf8proc's UAX #29 extended grapheme clusters; the JVM twin is
  * `java.util.regex` `\X`, which applies the same extended-cluster rules
  * (verified: combining marks, regional-indicator flag pairs, and
  * ZWJ emoji sequences each count as ONE cluster, matching DuckDB 1.0).
  *
  * Index semantics probed against DuckDB 1.0:
  *   - `left_grapheme(s, n)`: first n clusters; negative n trims |n|
  *     clusters from the END; n = 0 → '';
  *   - `right_grapheme(s, n)`: last n clusters; negative n trims |n|
  *     clusters from the FRONT;
  *   - `substring_grapheme(s, start, len)`: 1-based cluster positions,
  *     begin = start-1 (positive) / count+start clamped to 0 (negative) /
  *     -1 (zero: the pre-1 position counts against len, like substr);
  *     end = begin+len, a NEGATIVE len selects |len| clusters BEFORE
  *     start (bounds swap), both bounds clamped to [0, count]
  *     (probed: ('abc',0,2)→'a', ('abc',-5,4)→'abc', ('abc',3,-2)→'ab');
  *   - NULL in → NULL out for every form.
  *
  * Per-row scalar kernels dispatched via a static call from generated
  * code — they stay inside whole-stage codegen. */
object GraphemeKernels {
  /** Cluster start offsets (char indices) plus the terminal length. */
  private def boundaries(s: String): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val m = java.util.regex.Pattern.compile("\\X").matcher(s)
    while (m.find()) out += m.start()
    out += s.length
    out.toArray
  }

  def lengthGrapheme(s: UTF8String): Long = {
    val m = java.util.regex.Pattern.compile("\\X").matcher(s.toString)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  private def sliceClusters(str: String, begin0: Int, end0: Int): UTF8String = {
    val b = boundaries(str)
    val count = b.length - 1
    val begin = math.max(0, math.min(begin0, count))
    val end = math.max(begin, math.min(end0, count))
    UTF8String.fromString(str.substring(b(begin), b(end)))
  }

  def leftGrapheme(s: UTF8String, n: Long): UTF8String = {
    val str = s.toString
    val count = boundaries(str).length - 1
    val take = if (n >= 0) n else count + n
    sliceClusters(str, 0, math.max(take, 0L).min(Int.MaxValue).toInt)
  }

  def rightGrapheme(s: UTF8String, n: Long): UTF8String = {
    val str = s.toString
    val count = boundaries(str).length - 1
    val from = if (n >= 0) count - math.min(n, count.toLong).toInt
               else math.min(-n, count.toLong).toInt
    sliceClusters(str, from, count)
  }

  def substringGrapheme(s: UTF8String, start: Long, len: Long): UTF8String = {
    val str = s.toString
    val count = boundaries(str).length - 1
    val begin: Long =
      if (start > 0) start - 1
      else if (start < 0) math.max(count + start, 0L)
      else -1L
    val end = begin + len
    val (lo, hi) = if (end < begin) (end, begin) else (begin, end)
    sliceClusters(str, math.max(lo, 0L).min(Int.MaxValue).toInt,
      math.max(hi, 0L).min(Int.MaxValue).toInt)
  }
}

case class LengthGrapheme(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("length_grapheme expects a string")
  override def nullSafeEval(a: Any): Any =
    GraphemeKernels.lengthGrapheme(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.GraphemeKernels.lengthGrapheme($a)")
  override protected def withNewChildInternal(c: Expression): LengthGrapheme =
    copy(child = c)
}

abstract class GraphemeSlice2 extends BinaryExpression {
  override def dataType: DataType = StringType
  def kernel: String
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(StringType, NullType).contains(left.dataType) &&
        Seq(ByteType, ShortType, IntegerType, LongType, NullType)
          .contains(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$kernel expects (string, integer)")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val n = b match {
      case x: java.lang.Number => x.longValue()
    }
    if (kernel == "leftGrapheme")
      GraphemeKernels.leftGrapheme(a.asInstanceOf[UTF8String], n)
    else GraphemeKernels.rightGrapheme(a.asInstanceOf[UTF8String], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraphemeKernels.$kernel($a, (long)($b))")
}

case class LeftGrapheme(left: Expression, right: Expression)
    extends GraphemeSlice2 {
  override def kernel: String = "leftGrapheme"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LeftGrapheme = copy(left = l, right = r)
}

case class RightGrapheme(left: Expression, right: Expression)
    extends GraphemeSlice2 {
  override def kernel: String = "rightGrapheme"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): RightGrapheme = copy(left = l, right = r)
}

case class SubstringGrapheme(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(StringType, NullType).contains(first.dataType) &&
        Seq(second, third).forall(e => Seq(ByteType, ShortType, IntegerType,
          LongType, NullType).contains(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("substring_grapheme expects (string, int, int)")
  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    def l(v: Any): Long = v.asInstanceOf[java.lang.Number].longValue()
    GraphemeKernels.substringGrapheme(a.asInstanceOf[UTF8String], l(b), l(c))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.GraphemeKernels.substringGrapheme($a, (long)($b), " +
        s"(long)($c))")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): SubstringGrapheme = copy(first = a, second = b, third = c)
}
