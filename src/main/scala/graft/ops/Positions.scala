package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
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
  *   2. the canonical per-partition-subtotal + offset-prefix-sum pair of
  *      jobs (`zipWithIndex`'s contract, generalized to weights): one
  *      lightweight job collects a single long per partition — bounded
  *      driver metadata, like AQE stats — then each task numbers/sums its
  *      rows locally from its exclusive offset.
  *
  * The per-partition imperative step is the one sanctioned RDD drop-down in
  * the repo — and it stays on INTERNAL rows end to end
  * (`queryExecution.toRdd` in, `ColumnShim.ofInternalRows` out): the
  * external `.rdd`/`createDataFrame` round trip paid one Row-converter
  * allocation per row in each direction, a pure constant-factor tax on
  * every positioned row (r15 optimization round; guide §1.4's rdd-count
  * caveat is the same cost). Emitted rows follow Spark's operator
  * convention — reused mutable holders, copied by any buffering consumer
  * (the scan node immediately runs an UnsafeProjection over them).
  *
  * Positions are deterministic iff `keys` is a total order (unique);
  * callers own that contract, same as any ORDER BY determinism rule.
  */
object Positions {
  /** Returns `df` with an extra 1-based `posCol: BIGINT` column numbering
    * rows in the total order given by `keys`. LONG, not INT: at the 100 TB
    * posture row counts exceed 2^31-1, where an Int position would silently
    * wrap negative/duplicate. */
  def withGlobalPosition(df: DataFrame, keys: Seq[Column], posCol: String): DataFrame =
    appendPrefixScan(df, keys, None, posCol)

  /** Returns `df` with an extra `outCol: BIGINT` column holding the INCLUSIVE
    * running total of `weightCol` (an existing BIGINT column) in the total
    * order given by `keys` — the distributed prefix sum. Equivalent to
    * `sum(w) OVER (ORDER BY keys)` WITHOUT the single-partition window that
    * formulation plans — this is what lets offset assignment (sequence
    * packing, byte layout, file splitting) run over an arbitrarily large
    * relation. NULL weights contribute nothing, matching the window's
    * null-skipping semantics. */
  def withRunningTotal(df: DataFrame, keys: Seq[Column], weightCol: String,
                       outCol: String): DataFrame = {
    require(df.schema(weightCol).dataType == LongType,
      s"$weightCol must be BIGINT, got ${df.schema(weightCol).dataType.sql}")
    appendPrefixScan(df, keys, Some(weightCol), outCol)
  }

  /** Shared two-job prefix scan: weight = 1 per row (position) or the
    * `weightCol` value (running total). One RDD object backs both jobs, so
    * the sort's shuffle files are reused — the subtotal job's map stage is
    * not re-run by the final scan. */
  private def appendPrefixScan(df: DataFrame, keys: Seq[Column],
      weightCol: Option[String], outCol: String): DataFrame = {
    val sorted = df.orderBy(keys: _*)
    val wIdx = weightCol.map(sorted.schema.fieldIndex).getOrElse(-1)
    val rdd = sorted.queryExecution.toRdd
    // one subtotal per partition; collect() returns results in
    // partition-index order (bounded driver metadata — one long each)
    val partTotals = rdd
      .mapPartitionsWithIndex { (_, it) =>
        var s = 0L
        if (wIdx < 0) it.foreach(_ => s += 1L)
        else it.foreach(r => if (!r.isNullAt(wIdx)) s += r.getLong(wIdx))
        Iterator(s)
      }
      .collect()
    val offsets = partTotals.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val scanned = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      // reused holders (operator convention): the scan's UnsafeProjection
      // materializes each emitted row before the next element is produced
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      it.map { r =>
        if (wIdx < 0) acc += 1L
        else if (!r.isNullAt(wIdx)) acc += r.getLong(wIdx)
        extra.update(0, acc)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.graft.ColumnShim.ofInternalRows(
      df.sparkSession, schema, scanned)
  }
}
