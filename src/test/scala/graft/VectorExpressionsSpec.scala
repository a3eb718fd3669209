package graft

import graft.ext.Similarity
import graft.functions.VectorExpressions.cosineSim
import org.apache.spark.sql.functions._

/** The fused codegen expression must agree bit-for-bit with the
  * higher-order-function composition (same accumulation order). */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("fused cosine == composed cosine, bit-for-bit, on real embeddings") {
    val e = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val q = e.filter($"vec_id" === 0).select($"v".as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        $"vec_id",
        cosineSim($"v", $"qv").as("fused"),
        (Similarity.dot($"v", $"qv") /
          (Similarity.l2norm($"v") * Similarity.l2norm($"qv"))).as("composed"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"mismatch at vec ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("fused cosine survives whole-stage codegen and interpreted paths") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0))).toDF("a", "b")
    val expected = 10.0 / 14.0 // dot=10, |a|=|b|=sqrt(14)
    val got = df.select(cosineSim($"a", $"b")).collect().head.getDouble(0)
    assert(math.abs(got - expected) < 1e-15)
    // interpreted path (eval) via filter on a literal-free plan
    val gotFiltered = df.filter(cosineSim($"a", $"b") > 0.5).count()
    assert(gotFiltered == 1)
  }

  test("mismatched lengths yield null") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(cosineSim($"a", $"b")).collect().head.isNullAt(0))
  }

  /** The md5/conv higher-order pipeline WinnowFingerprints replaced —
    * kept here as the equivalence oracle for the fused expression. */
  private def composedFps(textCol: String) = {
    import org.apache.spark.sql.functions.{array_distinct, expr}
    array_distinct(expr(
      s"""transform(
         |  sequence(1, size(transform(sequence(1, length($textCol) - 7),
         |    i -> CAST(conv(substring(md5(substring($textCol, i, 8)), 1, 8), 16, 10)
         |              AS BIGINT))) - 3),
         |  j -> array_min(slice(transform(sequence(1, length($textCol) - 7),
         |    i -> CAST(conv(substring(md5(substring($textCol, i, 8)), 1, 8), 16, 10)
         |              AS BIGINT)), j, 4)))""".stripMargin))
  }

  test("fused winnowing == composed md5/conv pipeline on real documents") {
    val docs = Tables(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.length($"text") >= 11)
      .select($"doc_id",
        graft.functions.WinnowFingerprints.winnowFps($"text").as("fused"),
        composedFps("text").as("composed"))
      .collect()
    assert(docs.length == 500)
    docs.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("fused winnowing matches on non-ASCII text (code-point slow path)") {
    val df = Seq(
      "héllo wörld — naïve façade über schön çalışma",
      "日本語のテキストでも正しく動く必要がある八文字グラム",
      "mixed ascii and ünïcôde content of useful length here")
      .toDF("text")
    val rows = df.select(
      graft.functions.WinnowFingerprints.winnowFps($"text").as("fused"),
      composedFps("text").as("composed")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && r.getSeq[Long](0).nonEmpty)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }
}
