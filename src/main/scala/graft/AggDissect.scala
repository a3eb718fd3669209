package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Det._

/** Dev tool: q01 aggregate-cost dissection at a given SF dir. */
object AggDissect {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/sf1x10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.pin(spark, sfDir)
    val l = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
    def gb = l.groupBy(col("l_returnflag"), col("l_linestatus"))
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-24s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    time("count only")(run(gb.agg(count(lit(1)).as("n"))))
    time("2 dsum + count")(run(gb.agg(dsum(col("l_quantity")).as("a"),
      dsum(col("l_extendedprice")).as("b"), count(lit(1)).as("n"))))
    time("+revenueSum")(run(gb.agg(dsum(col("l_quantity")).as("a"),
      dsum(col("l_extendedprice")).as("b"),
      revenueSum(col("l_extendedprice"), col("l_discount")).as("c"),
      count(lit(1)).as("n"))))
    time("+chargeSum")(run(gb.agg(dsum(col("l_quantity")).as("a"),
      dsum(col("l_extendedprice")).as("b"),
      revenueSum(col("l_extendedprice"), col("l_discount")).as("c"),
      chargeSum(col("l_extendedprice"), col("l_discount"), col("l_tax")).as("d"),
      count(lit(1)).as("n"))))
    time("full q01")(run(SparkEntry.queries("q01_pricing_summary")(spark, sfDir)))
    time("full q01 again")(run(SparkEntry.queries("q01_pricing_summary")(spark, sfDir)))
    spark.stop()
  }
}
