package graft

import graft.ext.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantics tests on crafted inputs for the ops the DuckDB oracle can't
  * check (hash-family-specific pipelines). */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("minhash signature is identical for identical texts") {
    val docs = docsDF(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j",
      3L -> "k l m n o p q r s t")
    val sig = Dedup.minhashSignature(docs).collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("LSH candidates + jaccard verification finds the clone pair only") {
    val docs = docsDF(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> "the quick brown fox jumps over the lazy dog again tomorrow",
      3L -> "completely different words about spark query engines and scale")
    val bands = Dedup.lshBands(Dedup.minhashSignature(docs))
    val cand = bands.as("l").join(bands.as("r"),
        $"l.band" === $"r.band" && $"l.band_key" === $"r.band_key" && $"l.doc_id" < $"r.doc_id")
      .select($"l.doc_id".as("a"), $"r.doc_id".as("b")).distinct()
    val verified = Dedup.verifyJaccard(docs, cand).filter($"jacc" >= 0.5).collect()
    assert(verified.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("simhash: identical texts hash identically; near texts are close") {
    val docs = docsDF(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "alpha beta gamma delta epsilon zeta eta iota")
    val sig = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(java.lang.Long.bitCount(sig(1L) ^ sig(3L)) < 16)
  }

  test("fused simhash (Md5Head64 + bit-count aggregator) == composed md5-hex form") {
    val docs = Tables(spark, sfDir, "documents")
    val fused = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = Dedup.simhashComposed(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.size == 500 && fused == composed)
  }

  test("connected components: chain, separate pair, min-label clusters") {
    // chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components converges on a 96-node chain (depth guard)") {
    // worst-case diameter graph: a path 0-1-2-...-95. Min-label propagation
    // needs O(diameter) rounds (the repo runs 2 per materialized iteration),
    // so this is the case that (a) proves convergence isn't an artifact of
    // the shallow fixtures, (b) proves per-round lineage cutting holds up
    // at depth — ~50 chained join+agg rounds without checkpoints would
    // blow the plan stack long before 100 TB does.
    import spark.implicits._
    val n = 96
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs, maxIters = 60).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == n)
    assert(cc.values.forall(_ == 0L), "every chain node must reach label 0")
  }

  test("connected components REFUSES to return unconverged labels") {
    // same chain, too few rounds: the guard must throw, not silently hand
    // back a half-propagated clustering (which downstream dedup would
    // treat as distinct clusters — wrong data, no error)
    import spark.implicits._
    val pairs = (0L until 95L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIters = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connected components uses RELIABLE checkpoints when a dir is configured") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
      val cc = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
      // the fault-tolerant path actually wrote checkpoint data
      def count(f: java.io.File): Int =
        (if (f.isFile) 1 else 0) + Option(f.listFiles).toSeq.flatten.map(count).sum
      assert(count(new java.io.File(dir)) > 0, "no reliable checkpoint files written")
    } finally {
      // the shared session outlives this suite — revert to executor-local
      // lineage cuts so other suites keep their round-1 behavior
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("cosine similarity: orthogonal = 0, identical = 1") {
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(2.0, 0.0, 0.0))).toDF("vec_id", "v")
    val a = df.as("a"); val b = df.as("b")
    val sims = a.crossJoin(b)
      .select($"a.vec_id".as("x"), $"b.vec_id".as("y"),
        (Similarity.dot($"a.v", $"b.v") /
          (Similarity.l2norm($"a.v") * Similarity.l2norm($"b.v"))).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sims((1L, 2L))) < 1e-12)
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12)
  }

  test("byte histogram counts every byte into the right bucket") {
    val df = Seq(Tuple1(Array[Byte](0, 1, 31, 32, -1))).toDF("b") // -1 = 0xFF
    val hist = df.select(Multimodal.byteHistogram($"b", 8).as("h"))
      .collect().head.getSeq[Long](0)
    assert(hist == Seq(3L, 1L, 0L, 0L, 0L, 0L, 0L, 1L)) // {0,1,31} | {32} | {255}
  }

  test("byte histogram: bucket 0 holds 0..31, last holds 224..255") {
    val df = Seq(Tuple1((0 until 256).map(_.toByte).toArray)).toDF("b")
    val hist = df.select(Multimodal.byteHistogram($"b", 8).as("h"))
      .collect().head.getSeq[Long](0)
    assert(hist == Seq.fill(8)(32L))
  }

  test("BMP encode produces a real image file; ImageIO decode round-trips " +
       "dims, pixels, and channel means per the documented contract") {
    import org.apache.spark.sql.functions.{col, md5, unhex}
    val df = Seq("hello world", "graft", "a longer document with more text")
      .toDF("text")
      .select(col("text"), Multimodal.encodeBmp(unhex(md5(col("text")))).as("bmp"))
      .withColumn("img", Multimodal.decodeImage(col("bmp")))
      .select(col("text"), col("bmp"), col("img.width"), col("img.height"),
        col("img.mean_r"), col("img.mean_g"), col("img.mean_b"), col("img.pixels"))
    df.collect().foreach { r =>
      val text = r.getString(0)
      val bmp = r.getAs[Array[Byte]](1)
      // a genuine BMP file: magic "BM" header
      assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
      val seed = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val w = 3 + (seed(0) & 0xFF) % 4
      val h = 2 + (seed(1) & 0xFF) % 3
      assert(r.getInt(2) == w && r.getInt(3) == h)
      val expectedPix = Array.tabulate(w * h * 3)(k => seed(k % 16))
      assert(r.getAs[Array[Byte]](7).sameElements(expectedPix))
      def mean(c: Int): Double =
        (0 until w * h).map(p => (seed((3 * p + c) % 16) & 0xFF).toLong)
          .sum.toDouble / (w * h)
      assert(r.getDouble(4) == mean(0))
      assert(r.getDouble(5) == mean(1))
      assert(r.getDouble(6) == mean(2))
    }
  }

  test("DecodeImage fails loudly on an undecodable payload") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Tuple1(Array[Byte](1, 2, 3, 4))).toDF("b")
      .select(Multimodal.decodeImage(col("b")).as("img"))
    val e = intercept[Exception](df.collect())
    assert(e.getMessage != null)
  }
}
