package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  *
  * The reference service keeps all state in one embedded DuckDB file
  * (reference `db/db.go:17`); our engine's equivalent durable state is a
  * directory of parquet tables, which is also exactly what the reference
  * snapshots to (`store/store.go:263`, `EXPORT DATABASE ... FORMAT PARQUET`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
      // default. Read nanos as long and truncate to microseconds — exactly
      // what DuckDB's CAST(ts AS TIMESTAMP) does (verified: truncation, not
      // rounding) — so both engines see identical µs instants.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every corpus table as a temp view so `spark.sql` works with the
    * same table names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
