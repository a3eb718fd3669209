package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text primitives for the training-data-pipeline operators
  * (dedup / text analysis). Everything here is pure `functions._`
  * composition — codegen'd, no UDFs — so it stays inside whole-stage
  * codegen and scales linearly with the corpus.
  */
object TextOps {
  /** Whitespace word list. */
  def words(text: Column): Column = split(text, " ")

  /** Distinct 3-word shingles of a text column (order-sensitive n-grams —
    * unlike word *sets*, these discriminate near-duplicates even when the
    * global vocabulary is tiny). Empty array for texts under 3 words. */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      array_distinct(transform(
        sequence(lit(0), size(ws) - 3),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, sh) exploded distinct shingle table for a documents DataFrame.
    * The word array is materialized in its own projection first — inlining
    * `split` into the shingle lambda would re-evaluate it per element
    * (Catalyst does not CSE inside Generate). */
  def shingleTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), explode(shingles3(col("ws"))).as("sh"))
}
