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

  test("ORC round trip preserves lineitem rows") {
    val orig = Tables(spark, sfDir, "lineitem")
    val path = tmp("orc")
    FileSources.writeOrc(orig, path)
    val back = FileSources.readOrc(spark, path)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("partitioned write enables partition pruning (directories skipped)") {
    val orig = Tables(spark, sfDir, "lineitem")
    val path = tmp("part")
    FileSources.writePartitioned(orig, path, "l_returnflag")
    val pruned = FileSources.readPartitioned(spark, path)
      .filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"expected partition filter in plan:\n$plan")
    val expected = orig.filter(col("l_returnflag") === "A").count()
    assert(pruned.count() == expected)
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
