package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: raw scan-aggregate throughput — pinned in-memory cache vs the
  * vectorized parquet reader on the same table. Decides whether the
  * resident profile should pin big fact tables at all. */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s min=${ts.min}%.3f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val q1cols = Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
    def q1like(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sq"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sp"),
        avg(col("l_discount")).as("ad"), count(lit(1)).as("n"))
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("parquet cold+warm")(q1like(raw).write.format("noop").mode("overwrite").save())
    val rawSel = raw.select(q1cols.map(col): _*)
    Tables.pin(spark, sfDir)
    val pinned = Tables(spark, sfDir, "lineitem")
    time("pinned cache")(q1like(pinned).write.format("noop").mode("overwrite").save())
    time("parquet again")(q1like(raw).write.format("noop").mode("overwrite").save())
    // pure scan: count non-null over one column
    time("cache count col")(pinned.agg(count(col("l_quantity"))).write.format("noop").mode("overwrite").save())
    time("parquet count col")(raw.agg(count(col("l_quantity"))).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
