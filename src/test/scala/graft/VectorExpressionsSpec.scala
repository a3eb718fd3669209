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
}
