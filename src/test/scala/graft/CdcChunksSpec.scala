package graft

import graft.functions.CdcChunks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The fused CDC expression (x44's r5 engine) must be BIT-IDENTICAL to the
  * composed higher-order-function formulation it replaced — same boundary
  * classification (md5 hex char 1 ∈ {'0','1'}), same span arithmetic
  * (trailing empty span dropped), same per-chunk `md5(array_join(…, ' '))`
  * fingerprint — on adversarial inputs (non-ASCII, empty words from double
  * spaces, boundary-on-last-word, single-word docs) and on the real
  * documents table. */
class CdcChunksSpec extends SparkTestBase {
  import spark.implicits._

  /** The r4 composed formulation, kept verbatim as the reference law. */
  private def composed(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      .withColumn("bpos",
        filter(expr("sequence(1, n)"),
          i => substring(md5(element_at(col("ws"), i)), 1, 1).isin("0", "1")))
      .withColumn("starts",
        concat(array(lit(1)), transform(col("bpos"), p => p + 1)))
      .withColumn("ends", concat(col("bpos"), array(col("n"))))
      .withColumn("j", explode(expr("sequence(1, size(starts))")))
      .filter(element_at(col("ends"), col("j")) >= element_at(col("starts"), col("j")))
      .select(
        col("doc_id"),
        (col("j") - 1).cast(LongType).as("chunk_id"),
        (element_at(col("ends"), col("j")) - element_at(col("starts"), col("j")) + 1)
          .cast(LongType).as("n_tokens"),
        md5(array_join(
          slice(col("ws"), element_at(col("starts"), col("j")),
            element_at(col("ends"), col("j")) - element_at(col("starts"), col("j")) + 1),
          " ")).as("chunk_fp"))

  private def fused(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(CdcChunks.cdcChunks(split(col("text"), " "))).as("ch"))
      .select(col("doc_id"),
        col("ch.chunk_id").as("chunk_id"),
        col("ch.n_tokens").as("n_tokens"),
        col("ch.chunk_fp").as("chunk_fp"))

  private def assertSame(docs: DataFrame): Unit = {
    val a = fused(docs).orderBy("doc_id", "chunk_id").collect()
    val b = composed(docs).orderBy("doc_id", "chunk_id").collect()
    assert(a.length == b.length, s"row counts: fused ${a.length} vs composed ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"row diverged: $x vs $y") }
  }

  test("fused == composed on adversarial synthetic docs") {
    // find a word whose md5 hex starts with '0'/'1' so we can pin a
    // boundary on the LAST word (the dropped-empty-trailing-span case)
    val md = java.security.MessageDigest.getInstance("MD5")
    val boundaryWord = Iterator.from(0).map(i => s"w$i").find { w =>
      (md.digest(w.getBytes("UTF-8"))(0) & 0xff) < 0x20
    }.get
    val rng = new scala.util.Random(44)
    val randomDoc = (1 to 200).map(_ => s"t${rng.nextInt(500)}").mkString(" ")
    val docs = Seq(
      (1L, randomDoc),
      (2L, s"alpha beta $boundaryWord"),                  // boundary mid-ish
      (3L, s"alpha beta gamma $boundaryWord"),            // boundary on last word
      (4L, boundaryWord),                                 // single boundary word
      (5L, "solo"),                                       // single non-boundary word
      (6L, "héllo wörld 日本語 テキスト emoji🎉 ümlaut"), // non-ASCII
      (7L, "double  space  makes  empty  words"),         // "" words
      (8L, ""),                                           // split("") == [""]
      (9L, s"$boundaryWord $boundaryWord $boundaryWord")  // all-boundary: 1-word chunks
    ).toDF("doc_id", "text")
    assertSame(docs)
  }

  test("fused == composed on the real documents table") {
    assertSame(Tables(spark, sfDir, "documents").select(col("doc_id"), col("text")))
  }

  test("chunk shape laws: tokens sum to word count, ids contiguous") {
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val chk = fused(docs)
    val agg = chk.groupBy("doc_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("k"), max("chunk_id").as("mx"))
    val words = docs.select(col("doc_id"), size(split(col("text"), " ")).cast(LongType).as("n"))
    val bad = agg.join(words, "doc_id")
      .filter(col("tok") =!= col("n") || col("mx") =!= col("k") - 1)
    assert(bad.count() == 0, "token conservation or chunk_id contiguity violated")
  }
}
