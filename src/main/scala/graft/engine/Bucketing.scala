package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location (SURVEY.md "Partitioning & shuffle": bucketing
  * for co-located joins). Writing both sides of a hot join bucketed+sorted
  * on the join key lets Catalyst plan a sort-merge join with ZERO Exchange
  * and ZERO Sort — at 100 TB this turns every lineitem⋈orders query from a
  * full-corpus shuffle into a per-bucket streaming merge. The bench-scale
  * plan shape is asserted in BucketingSpec (no Exchange below the join).
  */
object Bucketing {
  /** Persist a DataFrame as a managed bucketed+sorted table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketing tables on their bucket key — shuffle-free. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))
}
