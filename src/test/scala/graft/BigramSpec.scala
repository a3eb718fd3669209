package graft

import graft.functions.TopBigramCount
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The fused top-bigram expression (x28's r5 engine) must be BIT-IDENTICAL
  * to the explode → groupBy(doc, bigram) → max composition it replaced —
  * same `concat(w[i-1], ' ', w[i])` bigram key — on adversarial inputs
  * (repeats, non-ASCII, empty words from double spaces, ambiguous joins
  * like ["a b","c"] vs ["a","b c"]) and on the real documents table. */
class BigramSpec extends SparkTestBase {
  import spark.implicits._

  private def composed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_words", size(col("ws")).cast(LongType))
      .filter(col("n_words") >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> concat(ws[i-1], ' ', ws[i]))")).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram_n"))

  private def fused(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_words", size(col("ws")).cast(LongType))
      .filter(col("n_words") >= 2)
      .select(col("doc_id"),
        TopBigramCount.topBigramCount(col("ws")).as("top_bigram_n"))

  private def assertSame(docs: DataFrame): Unit = {
    val a = fused(docs).orderBy("doc_id").collect()
    val b = composed(docs).orderBy("doc_id").collect()
    assert(a.length == b.length, s"row counts: fused ${a.length} vs composed ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x == y, s"diverged: $x vs $y") }
  }

  test("fused == composed on adversarial synthetic docs") {
    val rng = new scala.util.Random(28)
    val randomDoc = (1 to 300).map(_ => s"t${rng.nextInt(40)}").mkString(" ")
    val docs = Seq(
      (1L, randomDoc),
      (2L, "a a a a a a"),                       // one bigram repeated
      (3L, "x y x y x y x"),                     // alternating
      (4L, "héllo wörld héllo wörld 日本 語"),   // non-ASCII
      (5L, "double  space  double  space"),      // "" words form bigrams
      (6L, "only two"),                          // single bigram
      (7L, (1 to 50).map(i => s"u$i").mkString(" ")) // all bigrams unique
    ).toDF("doc_id", "text")
    assertSame(docs)
  }

  test("fused == composed on the real documents table") {
    assertSame(Tables(spark, sfDir, "documents").select(col("doc_id"), col("text")))
  }

  test("sub-2-word docs return 0 from the expression (callers filter)") {
    val v = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
      .select(TopBigramCount.topBigramCount(split(col("text"), " ")).as("t"))
      .collect().map(_.getLong(0))
    assert(v.toSeq == Seq(0L, 0L))
  }
}
