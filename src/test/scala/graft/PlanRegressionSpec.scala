package graft

import org.apache.spark.sql.functions._

/** Plan-shape regressions: the properties that make these queries scale
  * are asserted, not assumed — a refactor that silently un-pushes a
  * filter, widens a scan, lifts an aggregate above a join, or
  * reintroduces a single-partition exchange fails here first. */
class PlanRegressionSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def optimizedOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan; agg is partial+final") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan.take(3000))
    // partial + final hash aggregation (two HashAggregate nodes)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q02: scan reads only the projected/filtered columns") {
    val plan = planOf("q02_filter_project")
    val schemaLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // 5 columns used (partkey, name, brand, type, size, retailprice = 6)
    assert(!schemaLine.contains("p_comment") || schemaLine.isEmpty)
    Seq("p_partkey", "p_name", "p_retailprice").foreach(c =>
      assert(schemaLine.contains(c), s"pruned scan lost $c: $schemaLine"))
  }

  test("q04: lineitem aggregate sits BELOW the left join") {
    val plan = optimizedOf("q04_join_left")
    val joinAt = plan.indexOf("Join LeftOuter")
    val aggAt = plan.indexOf("Aggregate [l_orderkey")
    assert(joinAt >= 0 && aggAt >= 0, plan.take(3000))
    // tree prints parents first: the aggregate must be a descendant of the join
    assert(aggAt > joinAt, s"aggregate not under join\n${plan.take(3000)}")
  }

  test("q33: positional join plans no single-partition exchange") {
    val plan = planOf("q33_positional_join")
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000)) // no global-window numbering
  }

  test("q05: bounded dims broadcast; fact side never pre-shuffles for them") {
    val plan = planOf("q05_star_join")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      plan.take(3000))
  }

  test("x19: no cartesian product and no broadcast of the corpus pair side") {
    val plan = planOf("x19_embed_dedup")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("x25: heavy hitters aggregate partially before the shuffle, then TakeOrdered") {
    val plan = planOf("x25_frequent_terms")
    // map-side combine: two HashAggregate nodes around one term shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("x22: winnowing stays map-only — no shuffle at all before the sink") {
    val plan = planOf("x22_winnow_fingerprint")
    assert(!plan.contains("Exchange"), plan.take(3000))
    // the fused expression runs inside whole-stage codegen (the `*(n)`
    // prefix in toString marks WholeStageCodegenExec spans)
    assert(plan.contains("*(1)"), plan.take(3000))
  }

  test("x29: token chunking is map-only (explode without shuffle)") {
    val plan = planOf("x29_token_chunks")
    assert(!plan.contains("Exchange"), plan.take(3000))
    assert(plan.contains("Generate explode"), plan.take(3000))
  }

  test("x35: bloom predicate sits on the fact scan, below the semi join") {
    val plan = planOf("x35_bloom_semi_join")
    // the literal-bits formulation must NOT plan a nested-loop join for
    // the filter, and the semi join must still be present above it
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("LeftSemi"), plan.take(3000))
    val filterAt = plan.indexOf("element_at")
    val semiAt = plan.indexOf("LeftSemi")
    assert(filterAt >= 0 && semiAt >= 0 && filterAt > semiAt,
      s"bloom filter not below the semi join\n${plan.take(3000)}")
  }

  test("x27: postings heads never hash-aggregate unbounded lists — window then agg") {
    val plan = planOf("x27_inverted_index")
    // per-term window (row_number ≤ 8) feeds the aggregation; the
    // collect_list sees ≤ 8 doc_ids per term, not a stop word's millions
    assert(plan.contains("Window"), plan.take(3000))
    assert(plan.contains("collect_list"), plan.take(3000))
  }

  /** Run `body` with silent interpreted fallback DISABLED, so a generated
    * class Janino cannot compile fails the test instead of quietly
    * running 3× slower (the r6 static-forwarder lesson). */
  private def strictCodegen[T](body: => T): T = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  // r15 optimization round: the boundary renderers were CodegenFallback
  // (r14 verdict item 4) — each one severed the whole-stage-codegen span
  // it sat in, so e.g. `col::TIMESTAMPTZ::VARCHAR` over a fact table ran
  // interpreted per row. Ported to doGenCode (reference-object pattern);
  // these tests pin BOTH properties: the project stays inside a
  // WholeStageCodegen span (`*(n)` prefix), and the generated code
  // produces the same bytes the interpreted eval did.
  test("DuckInstantToVarchar runs inside whole-stage codegen, same text") {
    import org.apache.spark.sql.graft.ColumnShim
    val df = spark.range(0, 1000).select(ColumnShim.column(
      graft.functions.DuckInstantToVarchar(ColumnShim.expression(
        col("id").cast("timestamp")))).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(2000))
    val rows = strictCodegen(df.collect())
    assert(rows(0).getString(0) == "1970-01-01 00:00:00+00")
    assert(rows(61).getString(0) == "1970-01-01 00:01:01+00")
  }

  test("DuckIntervalToVarchar runs inside whole-stage codegen, same text") {
    import org.apache.spark.sql.graft.ColumnShim
    // non-foldable day-time interval: ts-column minus a literal instant
    val df = spark.range(0, 100).select(ColumnShim.column(
      graft.functions.DuckIntervalToVarchar(ColumnShim.expression(
        (col("id") * 90000).cast("timestamp") -
          lit("1970-01-01 00:00:00").cast("timestamp")))).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(2000))
    val rows = strictCodegen(df.collect())
    // ts − ts declares DAY TO SECOND, so whole days split out (duck does
    // the same for subtraction results): 90 000 s = 1 day 01:00:00
    assert(rows(0).getString(0) == "00:00:00")
    assert(rows(1).getString(0) == "1 day 01:00:00")
  }

  test("DuckComplexToVarchar runs inside whole-stage codegen, same text") {
    import org.apache.spark.sql.graft.ColumnShim
    val df = spark.range(0, 100).select(ColumnShim.column(
      graft.functions.DuckComplexToVarchar(ColumnShim.expression(
        array(col("id"), col("id") + 1)))).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(2000))
    assert(strictCodegen(df.collect())(3).getString(0) == "[3, 4]")
  }

  test("DuckTypeof is a per-plan constant under codegen") {
    import org.apache.spark.sql.graft.ColumnShim
    val df = spark.range(0, 10).select(ColumnShim.column(
      graft.functions.DuckTypeof(ColumnShim.expression(col("id")))).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(2000))
    assert(strictCodegen(df.collect()).forall(_.getString(0) == "BIGINT"))
  }

  test("multimodal encode→decode→histogram chain stays in whole-stage codegen") {
    import org.apache.spark.sql.graft.ColumnShim
    // md5-seed → BMP → decode → byte histogram: the x12/x13/x21/x47 hot
    // path; all four expressions were CodegenFallback before r15
    val seeds = spark.range(0, 50).select(
      unhex(md5(col("id").cast("string"))).as("seed"))
    val enc = seeds.select(ColumnShim.column(graft.ext.Multimodal.EncodeBmp(
      ColumnShim.expression(col("seed")))).as("img"))
    val dec = enc.select(
      ColumnShim.column(graft.ext.Multimodal.DecodeImage(
        ColumnShim.expression(col("img")))).as("d"),
      ColumnShim.column(graft.ext.Multimodal.ByteHistogram(
        ColumnShim.expression(col("img")), 8)).as("h"))
      .select(col("d.width"), col("d.height"), col("h"))
    val plan = dec.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(2000))
    val rows = strictCodegen(dec.collect())
    assert(rows.forall(r => r.getInt(0) >= 3 && r.getInt(0) <= 6))
    assert(rows.forall(r => r.getSeq[Long](2).sum > 0))
  }
}
