package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global-position assignment (the scale-safe core of the
  * POSITIONAL JOIN rewrite, SURVEY.md §2.4).
  *
  * `Window.orderBy(...)` with no `partitionBy` — the naive way to number
  * rows — collapses the whole relation into ONE partition (Spark emits a
  * `Exchange SinglePartition` + global sort on a single task): fine on a
  * 5-row dim, a scale-killer as *the* positional-join operator.
  *
  * This helper assigns the identical positions distributively:
  *   1. `df.orderBy(keys)` — Spark's built-in TOTAL sort: range-partitioned
  *      exchange + per-partition sort, fully parallel (`RangePartitioning`,
  *      never `SinglePartition`);
  *   2. `rdd.zipWithIndex` — Spark's canonical per-partition-count +
  *      offset-prefix-sum: one lightweight count job over partition sizes
  *      (driver holds one long per partition — bounded metadata, like AQE
  *      stats), then each task numbers its rows locally from its offset.
  *
  * The per-partition imperative step is exactly what `zipWithIndex` exists
  * for — this is the one sanctioned RDD drop-down in the repo.
  *
  * Positions are deterministic iff `keys` is a total order (unique);
  * callers own that contract, same as any ORDER BY determinism rule.
  */
object Positions {
  /** Returns `df` with an extra 1-based `posCol: BIGINT` column numbering
    * rows in the total order given by `keys`. LONG, not INT: at the 100 TB
    * posture row counts exceed 2^31-1, where an Int position would silently
    * wrap negative/duplicate. */
  def withGlobalPosition(df: DataFrame, keys: Seq[Column], posCol: String): DataFrame = {
    val sorted = df.orderBy(keys: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(posCol, LongType, nullable = false))
    val numbered = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(numbered, schema)
  }
}
