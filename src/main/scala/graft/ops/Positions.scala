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

  /** Returns `df` with an extra `outCol: BIGINT` column holding the INCLUSIVE
    * running total of `weightCol` (an existing BIGINT column) in the total
    * order given by `keys` — the distributed prefix sum.
    *
    * Same shape as [[withGlobalPosition]] generalized from count-weights to
    * arbitrary weights: total sort (range exchange, fully parallel), then one
    * lightweight job collecting a single per-partition subtotal (bounded
    * driver metadata — one long per partition), then each task scans its
    * partition locally from its exclusive offset. Equivalent to
    * `sum(w) OVER (ORDER BY keys)` WITHOUT the single-partition window that
    * formulation plans — this is what lets offset assignment (sequence
    * packing, byte layout, file splitting) run over an arbitrarily large
    * relation.
    */
  def withRunningTotal(df: DataFrame, keys: Seq[Column], weightCol: String,
                       outCol: String): DataFrame = {
    require(df.schema(weightCol).dataType == LongType,
      s"$weightCol must be BIGINT, got ${df.schema(weightCol).dataType.sql}")
    val sorted = df.orderBy(keys: _*)
    val wIdx = sorted.schema.fieldIndex(weightCol)
    val rdd = sorted.rdd
    // one subtotal per partition; the scan below re-runs the deterministic
    // sorted lineage (exactly zipWithIndex's two-job contract). collect()
    // returns results in partition-index order. NULL weights contribute
    // nothing, matching `sum(w) OVER (...)`'s null-skipping semantics.
    val partTotals = rdd
      .mapPartitionsWithIndex { (_, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(wIdx)) s += r.getLong(wIdx))
        Iterator(s)
      }
      .collect()
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val scanned = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        if (!r.isNullAt(wIdx)) acc += r.getLong(wIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    df.sparkSession.createDataFrame(scanned, schema)
  }
}
