package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (x22's engine) as ONE native expression: hash
  * every 8-char gram (first 4 md5 bytes as an unsigned 32-bit value — the
  * same number as `conv(substring(md5(substring(text,i,8)),1,8),16,10)`),
  * take the minimum of each 4-gram sliding window, and keep first-occurrence
  * distinct minima.
  *
  * Bit-identical to the higher-order-function composition it replaces —
  * the SQL oracle is untouched — but one fused pass per document: the md5
  * digest object is reused per thread and ASCII documents hash grams
  * straight out of the string's UTF-8 bytes (no per-gram substring,
  * hex-string, or conv() allocation; the composed pipeline allocates all
  * three per gram). Non-ASCII documents take a code-point-correct slow
  * path matching `substring` semantics on both engines.
  *
  * Per-document work, zero shuffle — the map-only scale shape is unchanged.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.fps(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprints.fps($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val GramLen = 8
  private val WindowLen = 4

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** First 4 digest bytes as an unsigned 32-bit value == the first 8 md5
    * hex digits read in base 16. */
  private def head32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  def fps(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var ascii = true
    var b = 0
    while (ascii && b < bytes.length) { if (bytes(b) < 0) ascii = false; b += 1 }
    val digest = md5.get()
    val hs: Array[Long] =
      if (ascii) {
        val n = bytes.length
        if (n < GramLen) return Empty
        val out = new Array[Long](n - GramLen + 1)
        var i = 0
        while (i <= n - GramLen) {
          digest.reset()
          digest.update(bytes, i, GramLen)
          out(i) = head32(digest.digest())
          i += 1
        }
        out
      } else {
        // code-point slicing, matching substring() semantics in both engines
        val cps = s.toString.codePoints().toArray
        val n = cps.length
        if (n < GramLen) return Empty
        val out = new Array[Long](n - GramLen + 1)
        var i = 0
        while (i <= n - GramLen) {
          val gram = new String(cps, i, GramLen).getBytes(StandardCharsets.UTF_8)
          digest.reset()
          digest.update(gram)
          out(i) = head32(digest.digest())
          i += 1
        }
        out
      }
    val m = hs.length - WindowLen + 1
    if (m <= 0) return Empty
    // first-occurrence distinct window minima (== array_distinct(transform))
    val seen = new java.util.HashSet[java.lang.Long]()
    val buf = new Array[Long](m)
    var o = 0
    var j = 0
    while (j < m) {
      var mn = hs(j)
      var t = j + 1
      while (t < j + WindowLen) { if (hs(t) < mn) mn = hs(t); t += 1 }
      if (seen.add(mn)) { buf(o) = mn; o += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, o))
  }

  /** Column API: distinct winnowing fingerprints of a text column. */
  def winnowFps(c: Column): Column =
    ColumnShim.column(WinnowFingerprints(ColumnShim.expression(c)))
}

/** First 8 md5 digest bytes of a string, big-endian, as one LONG — bit
  * (63−j) equals bit (3−j%4) of hex digit j/4, i.e. exactly the
  * per-word bit pattern the SimHash sign sums read digit-by-digit out of
  * `md5()` hex (`ext.Dedup.simhash`). One fused digest per word instead
  * of 16 substring+conv decodes; the md5 hex formulation stays the SQL
  * oracle's spelling of the same 64 bits. */
case class Md5Head64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Head64.head64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Head64.head64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Head64 =
    copy(child = newChild)
}

object Md5Head64 {
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def head64(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    d.update(s.getBytes)
    val h = d.digest()
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
  }

  def md5Head64(c: Column): Column =
    ColumnShim.column(Md5Head64(ColumnShim.expression(c)))
}
