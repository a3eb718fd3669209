package graft

import graft.engine.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed join must plan with no Exchange (shuffle) under the join —
  * the property that makes repeated fact⋈fact joins viable at 100 TB. */
class BucketingSpec extends SparkTestBase {
  test("co-located bucketed join plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(
        Tables(spark, sfDir, "lineitem"), "li_bkt", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables(spark, sfDir, "orders"), "o_bkt", "o_orderkey", 8)
      val joined = Bucketing.colocatedJoin(spark, "li_bkt", "o_bkt", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      val n = joined.count()
      val expected = Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
