package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the round-4 pipeline operators: per-source caps
  * (x39), cross-document chunk dedup (x40), and the composite quality
  * filter (x41). The oracle checks value-equality against DuckDB; these
  * pin the BEHAVIOR on crafted inputs where the expected answer is
  * enumerable by hand. */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("x39 source cap keeps at most K docs per source, deterministically") {
    val out = SparkEntry.queries("x39_source_cap")(spark, sfDir)
    val bySource = out.groupBy($"source").agg(count(lit(1)).as("n"),
        max($"rn").as("max_rn")).collect()
    assert(bySource.nonEmpty)
    bySource.foreach { r =>
      assert(r.getLong(1) <= 10, s"${r.getString(0)} kept ${r.getLong(1)} > 10")
      assert(r.getInt(2) <= 10)
    }
    // determinism: the same corpus picks the same docs on a rerun
    val again = SparkEntry.queries("x39_source_cap")(spark, sfDir)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("x40 chunk dedup flags a passage shared by two docs, not unique text") {
    // doc 1 and 2 share their first 32 words exactly (one grid chunk);
    // doc 3 is disjoint. Stride grid: chunks start at words 1 and 25.
    val common = (1 to 32).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, common + " tail1 unique to one"),
      (2L, common + " tail2 other ending words"),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .withColumn("n", size($"ws"))
      .select($"doc_id", $"ws", explode(expr("sequence(1, greatest(n, 1), 24)")).as("start"))
      .select($"doc_id", md5(array_join(expr("slice(ws, start, 32)"), " ")).as("chunk_fp"))
    val dup = chunks.groupBy($"chunk_fp")
      .agg(countDistinct($"doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min($"doc_id").as("canonical_doc"))
      .filter($"n_docs" >= 2).collect()
    assert(dup.length == 1, s"expected exactly the shared head chunk, got ${dup.length}")
    assert(dup(0).getLong(1) == 2L && dup(0).getLong(3) == 1L)
  }

  test("x41 quality filter: first failing rule wins, clean docs keep") {
    val docs = Seq(
      (1L, "too short"),                                           // word_count
      (2L, ("the quick brown fox jumps over a lazy dog today " * 2).trim), // ok (20 words)
      (3L, (1 to 20).map(_ => "same").mkString(" ")),              // no stopwords → stopword_ratio
      (4L, ("the " + Seq.fill(19)("same").mkString(" ")))          // repetition (2/20 distinct)
    ).toDF("doc_id", "text")
    val ws = split($"text", " ")
    val out = docs
      .withColumn("ws", ws)
      .withColumn("n_words", size($"ws").cast("long"))
      .withColumn("n_distinct", size(array_distinct($"ws")).cast("long"))
      .withColumn("n_stop", size(filter($"ws", w => w === "the" || w === "a")).cast("long"))
      .withColumn("avg_wl", length(replace($"text", lit(" "), lit(""))).cast("double") / $"n_words")
      .withColumn("reason",
        when($"n_words" < 10 || $"n_words" > 5000, "word_count")
          .when($"avg_wl" < 2.0 || $"avg_wl" > 12.0, "word_length")
          .when($"n_stop".cast("double") / $"n_words" < 0.01, "stopword_ratio")
          .when($"n_distinct".cast("double") / $"n_words" < 0.3, "repetition")
          .otherwise("ok"))
      .select($"doc_id", $"reason").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "word_count")
    assert(out(2L) == "ok")
    assert(out(3L) == "stopword_ratio")
    assert(out(4L) == "repetition")
  }

  test("x41 on the corpus emits only known reasons and keep == (reason == ok)") {
    val out = SparkEntry.queries("x41_quality_filter")(spark, sfDir)
    val reasons = out.select($"reason").distinct().collect().map(_.getString(0)).toSet
    assert(reasons.subsetOf(Set("ok", "word_count", "word_length", "stopword_ratio", "repetition")))
    assert(out.filter(($"reason" === "ok") =!= $"keep").isEmpty)
  }
}
