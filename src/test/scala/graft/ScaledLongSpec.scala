package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins [[graft.functions.ScaledLong]] to Spark's `round()` semantics on
  * the fixed-dp envelope it replaces it on (Det money/rate sums): HALF_UP
  * away from zero, null passthrough, and bit-agreement with the
  * BigDecimal path across sign/boundary cases. */
class ScaledLongSpec extends SparkTestBase {
  import spark.implicits._

  private def both(vals: Seq[java.lang.Double], scale: Int) = {
    val df = vals.toDF("x")
    df.select(
        graft.functions.ScaledLong(col("x"), scale).as("fast"),
        round(col("x") * math.pow(10, scale)).cast(LongType).as("slow"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
                           if (r.isNullAt(1)) null else r.getLong(1)))
  }

  test("agrees with round() on money/rate boundary cases, both signs") {
    val cases = Seq[java.lang.Double](
      0.0, 0.01, -0.01, 0.005, -0.005, 1.005, 123.45, -123.45,
      0.125, -0.125, 94949.5, 12344.99, 99999999.99, -99999999.99,
      1.0e9 + 0.07, 0.49, 0.5, -0.5, 2.5, -2.5, null)
    both(cases, 2).foreach { case (fast, slow) => assert(fast == slow, cases) }
  }

  test("agrees with round() on the corpus money columns at sf0.001") {
    val li = Tables(spark, sfDir, "lineitem")
    val diff = li.select(
        graft.functions.ScaledLong(col("l_extendedprice"), 2).as("f1"),
        round(col("l_extendedprice") * 100).cast(LongType).as("s1"),
        graft.functions.ScaledLong(col("l_discount"), 2).as("f2"),
        round(col("l_discount") * 100).cast(LongType).as("s2"))
      .filter(col("f1") =!= col("s1") || col("f2") =!= col("s2")).count()
    assert(diff == 0)
  }

  test("HALF_UP is away from zero at exact .5 in scaled space") {
    // 0.125 at scale 2 → 12.5 → 13; -0.125 → -13 (away from zero)
    val r = both(Seq[java.lang.Double](0.125, -0.125), 2)
    assert(r(0)._1 == 13L && r(1)._1 == -13L)
  }

  test("non-double child is rejected at analysis time (ADVICE r6)") {
    val df = Seq(1, 2).toDF("i")
    val e = intercept[Exception] {
      df.select(graft.functions.ScaledLong(col("i"), 2)).collect()
    }
    // AnalysisException (DATATYPE_MISMATCH), not a runtime ClassCastException
    assert(e.getMessage.toLowerCase.contains("datatype") ||
      e.getMessage.toLowerCase.contains("type"), e.getMessage)
  }

  test("NaN and out-of-envelope inputs fail loudly, not plausibly (ADVICE r6)") {
    intercept[ArithmeticException](graft.functions.ScaledLong.scaled(Double.NaN, 100.0))
    intercept[ArithmeticException](graft.functions.ScaledLong.scaled(1e15, 100.0))
    intercept[ArithmeticException](
      graft.functions.ScaledLong.scaled(Double.NegativeInfinity, 100.0))
    // the envelope boundary itself still works
    assert(graft.functions.ScaledLong.scaled(4.5e13, 100.0) == 4500000000000000L)
  }
}
