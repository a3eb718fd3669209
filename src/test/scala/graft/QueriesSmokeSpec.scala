package graft

/** Every registered query must run on sf0.001 and produce a schema with the
  * aliased column names the oracle contract expects (no auto-generated
  * names like `sum(x)` — those would hash-mismatch in the driver compare). */
class QueriesSmokeSpec extends SparkTestBase {
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and yields clean column names") {
      val df = fn(spark, sfDir)
      val cols = df.columns
      assert(cols.nonEmpty)
      cols.foreach { c =>
        assert(!c.contains("("), s"auto-generated column name '$c' in $name")
      }
      assert(df.count() >= 0)
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
