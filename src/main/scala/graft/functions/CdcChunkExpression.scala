package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (x44's engine) as ONE native expression: a
  * chunk ends after any word whose md5 hex starts with '0' or '1'
  * (P = 2/16, ~8-word expected chunks), the trailing span is dropped when
  * the last word is itself a boundary, and each chunk carries
  * `md5(array_join(words, ' '))` as its fingerprint.
  *
  * Bit-identical to the higher-order-function composition it replaces —
  * the SQL oracle is untouched — but one fused pass per document:
  *  - the boundary test reads the first digest BYTE (`(b & 0xff) < 0x20`
  *    ⇔ first hex char ∈ {'0','1'}) instead of formatting a hex string
  *    and `substring`-ing it per word;
  *  - each word's UTF-8 bytes are fetched once and reused for both the
  *    boundary digest and the chunk fingerprint (the composed pipeline
  *    re-joined and re-hashed every chunk through interpreted
  *    `filter`/`transform` lambdas, which never whole-stage-codegen);
  *  - the chunk fingerprint digest is fed word-bytes + 0x20 separators
  *    directly — no intermediate joined string.
  *
  * Per-document work, zero shuffle — x44's map-only scale shape is
  * unchanged; this is the same fusion discipline as [[WinnowFingerprints]]
  * (which took x22 8×).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CdcChunks.OutType

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk_fp", StringType, nullable = false))), containsNull = false)

  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val Hex = "0123456789abcdef".getBytes("US-ASCII")
  private val Space = ' '.toByte

  /** 32-char lowercase hex of a 16-byte digest — the exact `md5()` text. */
  private def hex32(d: Array[Byte]): UTF8String = {
    val cs = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = Hex((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  def chunks(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val digest = md5.get()
    // one pass: each word's UTF-8 bytes fetched once, boundary classified
    // from the first digest byte (== first md5 hex char in {'0','1'})
    val wb = new Array[Array[Byte]](n)
    val boundary = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val b = arr.getUTF8String(i).getBytes
      wb(i) = b
      digest.reset()
      digest.update(b)
      boundary(i) = (digest.digest()(0) & 0xff) < 0x20
      i += 1
    }
    val out = new java.util.ArrayList[InternalRow](n / 8 + 1)
    var start = 0
    var chunkId = 0L
    while (start < n) {
      var end = start
      while (end < n - 1 && !boundary(end)) end += 1
      digest.reset()
      var w = start
      while (w <= end) {
        if (w > start) digest.update(Space)
        digest.update(wb(w))
        w += 1
      }
      out.add(InternalRow(chunkId, (end - start + 1).toLong, hex32(digest.digest())))
      chunkId += 1L
      start = end + 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Column API: array of (chunk_id, n_tokens, chunk_fp) structs for a
    * word-array column — `explode` it to get x44's chunk table. */
  def cdcChunks(c: Column): Column =
    ColumnShim.column(CdcChunks(ColumnShim.expression(c)))
}
