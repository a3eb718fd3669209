package graft.http

import graft.Tables
import graft.engine.SqlGateway
import org.apache.spark.sql.SparkSession

/** Service entry point — the `main.go:24-82` equivalent: build the engine,
  * optionally pre-register the testdata corpus as views, serve HTTP.
  *
  * Usage: sbt "runMain graft.http.ServeMain <port> [sfDir]"
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-service")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE",
          java.nio.file.Files.createTempDirectory("graft-wh").toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.lift(1).foreach(dir => Tables.registerAll(spark, dir))
    // durability knobs, mirroring the reference's raft-dir flag
    // (`main.go`): GRAFT_LOG_DIR enables the JSONL statement log +
    // snapshot recovery; GRAFT_SNAPSHOT_EVERY=N takes an async snapshot
    // each N logged statements
    val service = new Service(new SqlGateway(spark), port,
      logDir = sys.env.get("GRAFT_LOG_DIR"),
      snapshotEvery = sys.env.get("GRAFT_SNAPSHOT_EVERY")
        .map(_.toInt).getOrElse(0))
    val bound = service.start()
    println(s"graft service listening on :$bound")
    Thread.currentThread().join()
  }
}
