package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: explain("formatted") under the BENCH session profile (pinned
  * cache, SHJ preference, AQE on) — PlanAudit shows the cold-session plan,
  * which diverges from what Bench actually runs. */
object PlanPinned {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0ms")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try Tables.pin(spark, sfDir) catch { case _: Throwable => () }
    for (name <- args) {
      println(s"===== $name =====")
      // apply the same per-query plan profile Bench executes under
      // (adaptive conf is read at physical-planning time, which explain
      // triggers) — a pinned query's dump shows its static plan
      ops.PlanProfile.withProfile(spark, name) {
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
