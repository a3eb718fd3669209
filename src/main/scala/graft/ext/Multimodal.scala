package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling (extension surface, SURVEY.md §2.11).
  *
  * Images are carried as opaque `binary` columns + a typed metadata struct,
  * and — since r7 — the decode step is REAL: each document's 16-byte md5
  * seed is rendered into a genuine BMP file ([[EncodeBmp]], `javax.imageio`
  * encoder, data-dependent dimensions) and read back executor-side with
  * `ImageIO.read` ([[DecodeImage]]), which extracts width/height/channel
  * means/pixel bytes from the actual file. Because the pixel layout is a
  * pure function of the md5 hex, every decoded feature is re-derivable in
  * ANSI SQL, so the DuckDB oracle certifies the whole encode→decode→extract
  * pipeline bit-exactly. Only the *source* of the pixels is synthetic (no
  * real photos ship in a test corpus); the codec work is not.
  *
  * Scale posture: both expressions are per-row, map-only, executor-side —
  * no shuffle, no driver involvement, arbitrarily partitionable. BMP was
  * chosen because the JDK codec is pure-JVM, lossless, and deterministic.
  */
object Multimodal {
  /** Per-JVM: ImageIO's default stream cache is a temp FILE — 32 tasks
    * decoding concurrently would contend on disk for no reason. */
  private lazy val imageIoInMemory: Unit = ImageIO.setUseCache(false)

  /** Native Catalyst expression: histogram of a binary column's bytes into
    * `buckets` equal ranges, returned as array<long>. Runs per-row inside
    * the task (fully distributed); CodegenFallback keeps it simple — the
    * surrounding projections still codegen. */
  case class ByteHistogram(child: Expression, buckets: Int)
      extends UnaryExpression {
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
    /** Boxed entry for generated code (binary input is already an object). */
    def evalBoxed(v: Any): Any = nullSafeEval(v)
    // real codegen (was CodegenFallback, r15 optimization round): the
    // per-row work stays one call, but the expression no longer severs
    // the whole-stage-codegen span of the surrounding projections
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("byteHistogram", this,
        classOf[ByteHistogram].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalBoxed($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
      copy(child = newChild)
  }

  /** Render a ≥2-byte seed into a real BMP image via the JDK encoder.
    *
    * Contract (what the oracle re-derives from the md5 hex):
    *   width  = 3 + seed[0] % 4   (3..6)
    *   height = 2 + seed[1] % 3   (2..4)
    *   pixel byte k (row-major, RGB interleaved, k = 3·p + channel)
    *          = seed[k % seed.length]
    * Dimensions are data-dependent on purpose: the decoder must genuinely
    * read them out of the file header, not assume a constant. The map
    * seed → (dims, pixels) is injective (the first 6 pixels already cycle
    * through all 16 seed bytes), so DISTINCT over encoded payloads equals
    * DISTINCT over seeds — x13 relies on that. */
  /** Shared seed → pixels render (the documented contract above), then one
    * JDK encoder pass in the requested lossless format ("bmp" or "png" —
    * both pure-JVM ImageIO writers, so the SAME oracle derivation holds
    * for either container). */
  private def encodeSeed(seed: Array[Byte], fmt: String): Array[Byte] = {
    imageIoInMemory
    require(seed.length >= 2, s"image seed needs >=2 bytes, got ${seed.length}")
    val w = 3 + (seed(0) & 0xFF) % 4
    val h = 2 + (seed(1) & 0xFF) % 3
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = seed((3 * p) % seed.length) & 0xFF
      val g = seed((3 * p + 1) % seed.length) & 0xFF
      val b = seed((3 * p + 2) % seed.length) & 0xFF
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
      p += 1
    }
    val out = new ByteArrayOutputStream(256)
    val ok = ImageIO.write(img, fmt, out)
    require(ok, s"JDK has no $fmt writer (should never happen on a JDK)")
    out.toByteArray
  }

  case class EncodeBmp(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      encodeSeed(input.asInstanceOf[Array[Byte]], "bmp")
    /** Boxed entry for generated code (binary in/out). */
    def evalBoxed(v: Any): Any = nullSafeEval(v)
    // real codegen (was CodegenFallback, r15 optimization round): the
    // per-row work stays one call, but the expression no longer severs
    // the whole-stage-codegen span of the surrounding projections
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("encodeBmp", this,
        classOf[EncodeBmp].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (byte[]) $ref.evalBoxed($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): EncodeBmp =
      copy(child = newChild)
  }

  /** Second codec path (r8): same pixel contract, PNG container — the
    * decoder must undo a DEFLATE-compressed, filtered scanline format
    * rather than BMP's raw rows, so agreement between the two paths
    * certifies genuine codec work, not byte-copying. */
  case class EncodePng(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      encodeSeed(input.asInstanceOf[Array[Byte]], "png")
    /** Boxed entry for generated code (binary in/out). */
    def evalBoxed(v: Any): Any = nullSafeEval(v)
    // real codegen (was CodegenFallback, r15 optimization round): the
    // per-row work stays one call, but the expression no longer severs
    // the whole-stage-codegen span of the surrounding projections
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("encodePng", this,
        classOf[EncodePng].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (byte[]) $ref.evalBoxed($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): EncodePng =
      copy(child = newChild)
  }

  /** REAL image decode: `ImageIO.read` over the binary payload, per row on
    * the executor. Emits the features a training pipeline wants —
    * dimensions (from the file header), per-channel means, and the raw
    * row-major RGB pixel buffer for downstream feature extraction
    * ([[ByteHistogram]]). Fails loudly on an undecodable payload rather
    * than emitting garbage. */
  case class DecodeImage(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_r", DoubleType, nullable = false),
      StructField("mean_g", DoubleType, nullable = false),
      StructField("mean_b", DoubleType, nullable = false),
      StructField("pixels", BinaryType, nullable = false)))
    override def nullSafeEval(input: Any): Any = {
      imageIoInMemory
      val bytes = input.asInstanceOf[Array[Byte]]
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val pix = new Array[Byte](w * h * 3)
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF
          val g = (rgb >> 8) & 0xFF
          val b = rgb & 0xFF
          val p = y * w + x
          pix(3 * p) = r.toByte
          pix(3 * p + 1) = g.toByte
          pix(3 * p + 2) = b.toByte
          sr += r; sg += g; sb += b
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      InternalRow(w, h, sr / n, sg / n, sb / n, pix)
    }
    /** Boxed entry for generated code (binary in, struct row out). */
    def evalBoxed(v: Any): Any = nullSafeEval(v)
    // real codegen (was CodegenFallback, r15 optimization round): the
    // per-row work stays one call, but the expression no longer severs
    // the whole-stage-codegen span of the surrounding projections
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("decodeImage", this,
        classOf[DecodeImage].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = (InternalRow) $ref.evalBoxed($c);")
    }
    override protected def withNewChildInternal(newChild: Expression): DecodeImage =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graft.ColumnShim

  def byteHistogram(c: Column, buckets: Int = 8): Column =
    ColumnShim.column(ByteHistogram(ColumnShim.expression(c), buckets))

  def encodeBmp(seed: Column): Column =
    ColumnShim.column(EncodeBmp(ColumnShim.expression(seed)))

  def encodePng(seed: Column): Column =
    ColumnShim.column(EncodePng(ColumnShim.expression(seed)))

  def decodeImage(payload: Column): Column =
    ColumnShim.column(DecodeImage(ColumnShim.expression(payload)))

  /** Deterministic 16-byte seed for a document's synthetic image: the md5
    * of its text. Stands in for "the raw sensor bytes" — DuckDB has md5
    * too, which is what makes every downstream feature oracle-checkable. */
  def seedBytes(text: Column): Column = unhex(md5(text))

  /** documents → multimodal frame: (doc_id, payload = real BMP bytes,
    * meta struct). The payload is an actual image file — `file`/`xxd`
    * would recognize it — produced by [[EncodeBmp]] on the executors. */
  def asMultimodal(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encodeBmp(seedBytes(col("text"))).as("payload"),
      struct(
        lit("image/bmp").as("mime"),
        col("n_chars").as("source_chars"),
        col("source").as("origin")).as("meta"))

  /** Fixed-size frame view of a binary payload: (frame_idx, frame bytes).
    * Stand-in for video frame extraction over a raw byte stream — the
    * SLICING is real binary work (Spark `substring` on BinaryType). */
  def frames(payload: Column, frameBytes: Int, nFrames: Int): Column =
    array((0 until nFrames).map(i =>
      struct(lit(i).as("frame_idx"),
        substring(payload, 1 + i * frameBytes, frameBytes).as("fb"))): _*)

  /** Byte-stride downsample of a raw payload (every `stride`-th byte) —
    * the shape of a thumbnail pass over a byte stream. */
  def downsample(payload: Column, stride: Int, outBytes: Int): Column =
    concat((0 until outBytes).map(i =>
      substring(payload, 1 + i * stride, 1)): _*)

  val queries: Map[String, Q] = Map(
    // ---- frame sampling + resize over raw binary payloads: every 2nd
    // 4-byte frame of the 16-byte seed stream + a stride-4 thumbnail.
    // Slicing, concat and hex run on BinaryType columns (distributed,
    // codegen'd); the oracle re-derives every byte from the md5 hex.
    "x21_multimodal_frames" -> { (s, dir) =>
      val mm = Tables(s, dir, "documents")
        .select(col("doc_id"), seedBytes(col("text")).as("payload"))
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

    // ---- REAL encode→decode→extract: BMP-encode each doc's seed, decode
    // it back with javax.imageio on the executors, and emit header dims,
    // channel means, and a pixel-byte histogram head. The oracle reproduces
    // every value from the md5 hex + the documented pixel-layout contract,
    // certifying that the decoder read the actual file correctly.
    "x12_multimodal_features" -> { (s, dir) =>
      val mm = asMultimodal(Tables(s, dir, "documents"))
        .withColumn("img", decodeImage(col("payload")))
        .withColumn("hist", byteHistogram(col("img.pixels"), 8))
      mm.select(
        col("doc_id"),
        col("meta.origin").as("origin"),
        col("img.width").as("width"),
        col("img.height").as("height"),
        (col("img.width") * col("img.height") * lit(3))
          .cast(LongType).as("n_pixel_bytes"),
        col("img.mean_r").as("mean_r"),
        col("img.mean_g").as("mean_g"),
        col("img.mean_b").as("mean_b"),
        element_at(col("hist"), 1).as("b0"),
        element_at(col("hist"), 2).as("b1"))
    },

    // ---- per-source payload profile over DECODED image dimensions: the
    // total-bytes figure comes out of each file's header via ImageIO, not
    // from the seed. DISTINCT over the encoded BMPs equals DISTINCT over
    // seeds because EncodeBmp is injective (scaladoc).
    "x13_multimodal_profile" -> { (s, dir) =>
      asMultimodal(Tables(s, dir, "documents"))
        .withColumn("img", decodeImage(col("payload")))
        .groupBy(col("meta.origin").as("origin"))
        .agg(
          count(lit(1)).as("n_payloads"),
          sum(col("img.width") * col("img.height") * lit(3))
            .cast(LongType).as("total_pixel_bytes"),
          countDistinct(col("payload")).as("n_distinct_payloads"))
    },

    // ---- codec breadth (r8): the SAME pixel contract encoded through
    // BOTH pure-JVM lossless containers (BMP raw rows, PNG deflate +
    // filtered scanlines), decoded back independently. The emitted
    // features come from the PNG path — the oracle re-derives them from
    // the md5 hex, certifying the deflate decode — and `codecs_agree`
    // asserts dimensional + pixel-exact agreement between the two
    // decoders row by row (TRUE for every row in the oracle). Map-only,
    // per-row, no shuffle before the final sort-free projection.
    "x47_multimodal_codecs" -> { (s, dir) =>
      val mm = Tables(s, dir, "documents")
        .select(col("doc_id"), seedBytes(col("text")).as("seed"))
        .withColumn("bimg", decodeImage(encodeBmp(col("seed"))))
        .withColumn("pimg", decodeImage(encodePng(col("seed"))))
      mm.select(
        col("doc_id"),
        col("pimg.width").as("width"),
        col("pimg.height").as("height"),
        col("pimg.mean_r").as("mean_r"),
        col("pimg.mean_g").as("mean_g"),
        col("pimg.mean_b").as("mean_b"),
        (col("bimg.width") === col("pimg.width") &&
         col("bimg.height") === col("pimg.height") &&
         col("bimg.pixels") === col("pimg.pixels")).as("codecs_agree"))
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

    // Re-derive the decoded features from the md5 hex: byte j of the seed
    // via strpos arithmetic over the hex alphabet, dims from bytes 1-2
    // (EncodeBmp contract), pixel byte k = seed[k % 16], means as exact
    // integer sums cast to double (IEEE division is correctly rounded on
    // both engines, so the doubles compare bit-exactly).
    "x12_multimodal_features" ->
      """WITH h AS (SELECT doc_id, source AS origin, md5(text) AS hx FROM documents),
        |b AS (SELECT doc_id, i AS j,
        |    (strpos('0123456789abcdef', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(hx, CAST(2*i AS INT), 1)) - 1) AS bv
        |  FROM h CROSS JOIN (SELECT unnest(range(1, 17)) AS i) r),
        |dims AS (SELECT h.doc_id, h.origin,
        |    3 + MAX(CASE WHEN j = 1 THEN bv END) % 4 AS w,
        |    2 + MAX(CASE WHEN j = 2 THEN bv END) % 3 AS hh
        |  FROM h JOIN b ON b.doc_id = h.doc_id GROUP BY h.doc_id, h.origin),
        |px AS (SELECT doc_id, origin, w, hh, unnest(range(0, w * hh * 3)) AS k FROM dims),
        |pv AS (SELECT px.doc_id, px.origin, px.w, px.hh, px.k % 3 AS c, b.bv
        |  FROM px JOIN b ON b.doc_id = px.doc_id AND b.j = (px.k % 16) + 1)
        |SELECT doc_id, origin,
        |  CAST(w AS INT) AS width, CAST(hh AS INT) AS height,
        |  CAST(w * hh * 3 AS BIGINT) AS n_pixel_bytes,
        |  CAST(SUM(bv) FILTER (WHERE c = 0) AS DOUBLE) / (w * hh) AS mean_r,
        |  CAST(SUM(bv) FILTER (WHERE c = 1) AS DOUBLE) / (w * hh) AS mean_g,
        |  CAST(SUM(bv) FILTER (WHERE c = 2) AS DOUBLE) / (w * hh) AS mean_b,
        |  COUNT(*) FILTER (WHERE bv < 32) AS b0,
        |  COUNT(*) FILTER (WHERE bv >= 32 AND bv < 64) AS b1
        |FROM pv GROUP BY doc_id, origin, w, hh
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    // PNG-path features re-derived from the md5 hex exactly as x12's; the
    // cross-codec agreement flag is provably TRUE when both decoders read
    // their files correctly (same pixel contract), so the oracle pins it.
    "x47_multimodal_codecs" ->
      """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |b AS (SELECT doc_id, i AS j,
        |    (strpos('0123456789abcdef', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(hx, CAST(2*i AS INT), 1)) - 1) AS bv
        |  FROM h CROSS JOIN (SELECT unnest(range(1, 17)) AS i) r),
        |dims AS (SELECT h.doc_id,
        |    3 + MAX(CASE WHEN j = 1 THEN bv END) % 4 AS w,
        |    2 + MAX(CASE WHEN j = 2 THEN bv END) % 3 AS hh
        |  FROM h JOIN b ON b.doc_id = h.doc_id GROUP BY h.doc_id),
        |px AS (SELECT doc_id, w, hh, unnest(range(0, w * hh * 3)) AS k FROM dims),
        |pv AS (SELECT px.doc_id, px.w, px.hh, px.k % 3 AS c, b.bv
        |  FROM px JOIN b ON b.doc_id = px.doc_id AND b.j = (px.k % 16) + 1)
        |SELECT doc_id,
        |  CAST(w AS INT) AS width, CAST(hh AS INT) AS height,
        |  CAST(SUM(bv) FILTER (WHERE c = 0) AS DOUBLE) / (w * hh) AS mean_r,
        |  CAST(SUM(bv) FILTER (WHERE c = 1) AS DOUBLE) / (w * hh) AS mean_g,
        |  CAST(SUM(bv) FILTER (WHERE c = 2) AS DOUBLE) / (w * hh) AS mean_b,
        |  TRUE AS codecs_agree
        |FROM pv GROUP BY doc_id, w, hh
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin,

    // Dims re-derived from seed bytes 1-2; DISTINCT over seeds equals
    // DISTINCT over encoded payloads (EncodeBmp injectivity).
    "x13_multimodal_profile" ->
      """WITH h AS (SELECT doc_id, source AS origin, md5(text) AS hx FROM documents),
        |d AS (SELECT doc_id, origin, hx,
        |    3 + ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)) % 4 AS w,
        |    2 + ((strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 3 AS hh
        |  FROM h)
        |SELECT origin, COUNT(*) AS n_payloads,
        |  CAST(SUM(w * hh * 3) AS BIGINT) AS total_pixel_bytes,
        |  COUNT(DISTINCT hx) AS n_distinct_payloads
        |FROM d GROUP BY origin
        |ORDER BY origin ASC NULLS FIRST""".stripMargin)
}
