package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV / JSON source-sink surface (SURVEY.md §2.2 — reachable through the
  * reference's passthrough as DuckDB `read_csv` / `read_json`).
  *
  * Schema is carried explicitly on read-back: at 100 TB you never let the
  * engine infer a schema with a full extra pass over the data. Readers are
  * plain DataFrame sources, so pushdown/pruning behave like any scan.
  */
object FileSources {
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Headerless inference variant (kept for parity with `read_csv` defaults;
    * costs an extra pass — prefer the explicit-schema reader). */
  def readCsvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path) // ORC carries its schema

  /** Hive-style partitioned parquet layout: one directory per key value.
    * At 100 TB this is THE pruning lever — a filter on the partition key
    * skips whole directories before any file is opened. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
