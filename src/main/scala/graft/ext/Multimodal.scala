package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension surface, SURVEY.md §2.11).
  *
  * Images/audio/video are carried as opaque `binary` payloads + a typed
  * metadata struct. The media *decode* itself is STUBBED (no codec
  * libraries in this container): [[fakeDecodePayload]] derives a
  * deterministic 16-byte payload from the document text, standing in for
  * real image bytes. Everything around the stub — schema, batch shape,
  * partition-parallel feature extraction via a native Catalyst
  * [[ByteHistogram]] expression — is real and tested, so swapping in a
  * true decoder is a one-function change.
  */
object Multimodal {
  /** Native Catalyst expression: histogram of a binary column's bytes into
    * `buckets` equal ranges, returned as array<long>. Runs per-row inside
    * the task (fully distributed); CodegenFallback keeps it simple — the
    * surrounding projections still codegen. */
  case class ByteHistogram(child: Expression, buckets: Int)
      extends UnaryExpression with CodegenFallback {
    require(buckets > 0 && buckets <= 256 && 256 % buckets == 0,
      s"buckets must divide 256 (got $buckets)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val counts = new Array[Long](buckets)
      val width = 256 / buckets
      var i = 0
      while (i < bytes.length) {
        counts((bytes(i) & 0xFF) / width) += 1L
        i += 1
      }
      new GenericArrayData(counts)
    }
    override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
      copy(child = newChild)
  }

  def byteHistogram(c: Column, buckets: Int = 8): Column = {
    import org.apache.spark.sql.graft.ColumnShim
    ColumnShim.column(ByteHistogram(ColumnShim.expression(c), buckets))
  }

  /** STUB decode: deterministic fake payload (md5 bytes of the text). A real
    * deployment replaces this one function with an image/audio decode. */
  def fakeDecodePayload(text: Column): Column = unhex(md5(text))

  /** documents → multimodal frame: (doc_id, payload binary, meta struct). */
  def asMultimodal(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      fakeDecodePayload(col("text")).as("payload"),
      struct(
        lit("image/fake").as("mime"),
        col("n_chars").as("source_chars"),
        col("source").as("origin")).as("meta"))

  /** Fixed-size frame view of a binary payload: (frame_idx, frame bytes).
    * Stand-in for video frame extraction — the SLICING is real binary
    * work (Spark `substring` on BinaryType); only the payload itself is
    * the stub decode. */
  def frames(payload: Column, frameBytes: Int, nFrames: Int): Column =
    array((0 until nFrames).map(i =>
      struct(lit(i).as("frame_idx"),
        substring(payload, 1 + i * frameBytes, frameBytes).as("fb"))): _*)

  /** "Resize" stub: byte-stride downsample of the payload (every
    * `stride`-th byte), the shape of a thumbnail pass. Real binary
    * slicing + concat; swap the stub decode for a real codec and this
    * becomes an actual subsampling resize. */
  def downsample(payload: Column, stride: Int, outBytes: Int): Column =
    concat((0 until outBytes).map(i =>
      substring(payload, 1 + i * stride, 1)): _*)

  val queries: Map[String, Q] = Map(
    // ---- frame sampling + resize over binary payloads: every 2nd 4-byte
    // frame of the 16-byte stub payload + a stride-4 thumbnail. Slicing,
    // concat and hex run on BinaryType columns (distributed, codegen'd);
    // the oracle re-derives every byte from the md5 hex string.
    "x21_multimodal_frames" -> { (s, dir) =>
      val mm = asMultimodal(Tables(s, dir, "documents"))
        .withColumn("thumb_hex", lower(hex(downsample(col("payload"), 4, 4))))
        .select(col("doc_id"), col("thumb_hex"),
          explode(frames(col("payload"), 4, 4)).as("f"))
        .filter(col("f.frame_idx") % 2 === 0) // stride-2 frame sample
      mm.select(
        col("doc_id"),
        col("f.frame_idx").as("frame_idx"),
        lower(hex(col("f.fb"))).as("frame_hex"),
        // first byte value of the frame, decoded from its hex rendering —
        // identical arithmetic on both engines
        conv(substring(lower(hex(col("f.fb"))), 1, 2), 16, 10)
          .cast(IntegerType).as("first_byte"),
        col("thumb_hex"))
    },
    // ---- feature extraction over binary payloads (rows-only check: the
    // histogram expression is exercised precisely in MultimodalSpec)
    "x12_multimodal_features" -> { (s, dir) =>
      val mm = asMultimodal(Tables(s, dir, "documents"))
        .withColumn("n_bytes", length(col("payload")).cast(LongType))
        .withColumn("hist", byteHistogram(col("payload"), 8))
      mm.select(
          col("doc_id"),
          col("n_bytes"),
          col("meta.origin").as("origin"),
          element_at(col("hist"), 1).as("b0"),
          element_at(col("hist"), 2).as("b1"),
          aggregate(col("hist"), lit(0L), (acc, x) => acc + x).as("hist_total"))
    },

    // ---- per-source payload profile (aggregation over binary metadata)
    "x13_multimodal_profile" -> { (s, dir) =>
      asMultimodal(Tables(s, dir, "documents"))
        .groupBy(col("meta.origin").as("origin"))
        .agg(
          count(lit(1)).as("n_payloads"),
          sum(length(col("payload"))).cast(LongType).as("total_bytes"),
          countDistinct(col("payload")).as("n_distinct_payloads"))
    })

  val oracles: Map[String, String] = Map(
    "x21_multimodal_frames" ->
      """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |f AS (SELECT doc_id, hx, unnest([0, 2]) AS frame_idx FROM h)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  substr(hx, 1 + frame_idx * 8, 8) AS frame_hex,
        |  CAST((strpos('0123456789abcdef', substr(hx, 1 + frame_idx * 8, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(hx, 2 + frame_idx * 8, 1)) - 1) AS INT)
        |    AS first_byte,
        |  substr(hx, 1, 2) || substr(hx, 9, 2) || substr(hx, 17, 2) || substr(hx, 25, 2)
        |    AS thumb_hex
        |FROM f
        |ORDER BY doc_id ASC NULLS FIRST, frame_idx ASC NULLS FIRST""".stripMargin,

    // The ByteHistogram expression IS oracle-checkable: the stub payload is
    // unhex(md5(text)), so DuckDB can re-derive every byte value from the
    // md5 hex string (strpos arithmetic over the hex alphabet) and count
    // the same 32-wide buckets the native expression fills.
    "x12_multimodal_features" ->
      """WITH h AS (SELECT doc_id, source AS origin, md5(text) AS hx FROM documents),
        |b AS (
        |  SELECT doc_id, origin,
        |    (strpos('0123456789abcdef', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(hx, CAST(2*i AS INT), 1)) - 1) AS bv
        |  FROM h CROSS JOIN (SELECT unnest(range(1, 17)) AS i) r)
        |SELECT doc_id,
        |  COUNT(*) AS n_bytes,
        |  origin,
        |  COUNT(*) FILTER (WHERE bv < 32) AS b0,
        |  COUNT(*) FILTER (WHERE bv >= 32 AND bv < 64) AS b1,
        |  COUNT(*) AS hist_total
        |FROM b
        |GROUP BY doc_id, origin
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    // The profile is SQL-expressible because the stub decode (md5) exists
    // in DuckDB too.
    "x13_multimodal_profile" ->
      """SELECT source AS origin, COUNT(*) AS n_payloads,
        |  CAST(SUM(octet_length(unhex(md5(text)))) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT unhex(md5(text))) AS n_distinct_payloads
        |FROM documents
        |GROUP BY source
        |ORDER BY origin ASC NULLS FIRST""".stripMargin)
}
