package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Dev tool: per-query Spark job / stage / task counts at a given SF dir.
  * The bench floor at small SF is almost entirely stage sequencing (AQE
  * materializes one exchange at a time) plus actions — this main makes
  * that cost visible per query so floor work targets the worst shapes
  * instead of guessing. Not part of the driver contract.
  *
  * Usage: runMain graft.StageAudit <sfDir> [prefix,prefix,...]
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = args.lift(1).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.locality.wait", "0ms")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    try Tables.pin(spark, sfDir) catch { case _: Throwable => () }
    try ext.IvfIndex.centroids(spark, sfDir).count() catch { case _: Throwable => () }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // one untimed pass to absorb codegen compiles, then the counted pass
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    println(f"${"query"}%-28s jobs stages tasks   sec")
    val rows = ordered.map { case (name, fn) =>
      // settle the async listener queue so counts attribute to the right
      // query (listenerBus is private[spark]; a short sleep is enough for
      // a dev tool)
      Thread.sleep(150)
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      (name, jobs.get(), stages.get(), tasks.get(), if (ok) sec else -1.0)
    }
    rows.sortBy(-_._5).foreach { case (n, j, st, t, sec) =>
      println(f"$n%-28s $j%4d $st%6d $t%5d $sec%6.2f")
    }
    val (tj, ts, tt) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    println(f"${"TOTAL"}%-28s $tj%4d $ts%6d $tt%5d ${rows.map(_._5).sum}%6.2f")
    spark.stop()
  }
}
