package graft

import graft.sources.FileSources
import org.apache.spark.sql.functions._

/** Round-trip fidelity: parquet corpus → csv/json → read back with the
  * original schema → identical contents. */
class FileSourcesSpec extends SparkTestBase {
  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-src-$tag").toString

  test("CSV round trip preserves customer rows and schema") {
    val orig = Tables(spark, sfDir, "customer")
    val path = tmp("csv")
    FileSources.writeCsv(orig, path)
    val back = FileSources.readCsv(spark, path, orig.schema)
    assert(back.schema == orig.schema)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("JSON round trip preserves orders rows") {
    val orig = Tables(spark, sfDir, "orders")
    val path = tmp("json")
    FileSources.writeJson(orig, path)
    val back = FileSources.readJson(spark, path, orig.schema)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("JSON round trip preserves nested arrays (embeddings)") {
    val orig = Tables(spark, sfDir, "embeddings")
    val path = tmp("jsonarr")
    FileSources.writeJson(orig, path)
    val back = FileSources.readJson(spark, path, orig.schema)
    assert(back.count() == orig.count())
    val a = orig.agg(sum(size(col("embedding")))).collect().head.getLong(0)
    val b = back.agg(sum(size(col("embedding")))).collect().head.getLong(0)
    assert(a == b)
  }

  test("schema'd CSV read prunes and pushes filters like any scan") {
    val orig = Tables(spark, sfDir, "customer")
    val path = tmp("csvplan")
    FileSources.writeCsv(orig, path)
    val plan = FileSources.readCsv(spark, path, orig.schema)
      .filter(col("c_acctbal") > 0).select("c_custkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("csv") || plan.contains("Csv") || plan.contains("FileScan"))
  }
}
