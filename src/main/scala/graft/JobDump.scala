package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: print every Spark JOB one query launches (with its stage
  * count and description) under the bench session profile. [[StageAudit]]
  * gives the per-query totals; this shows WHERE they come from — e.g. AQE
  * materializing each exchange as its own sequential job, per-read parquet
  * schema-inference jobs, broadcast builds. Not part of the driver
  * contract.
  *
  * Usage: runMain graft.JobDump <sfDir> <queryName>
  */
object JobDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val q = args(1)
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties.getProperty("spark.job.description")).getOrElse("")
        println(s"JOB ${j.jobId} stages=${j.stageInfos.size} ${d.take(80)} | ${j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(";").take(160)}")
      }
    })
    try Tables.pin(spark, sfDir) catch { case _: Throwable => () }
    val fn = SparkEntry.queries(q)
    println("=== warm pass ===")
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(300)
    println("=== counted pass ===")
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"SEC ${(System.nanoTime()-t0)/1e9}%.2f")
    spark.stop()
  }
}
