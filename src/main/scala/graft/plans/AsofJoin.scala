package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnShim

/** ASOF join as a first-class Catalyst operator (SURVEY.md §2.4 — the one
  * reference-dialect operator with no Spark built-in; DuckDB 1.1 ships it
  * natively, in both directions: the inequality in `ASOF JOIN ... ON` may
  * be any of >=, >, <=, <).
  *
  * Semantics (= DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >=
  * r.ts`, or `l.ts <= r.ts` for the forward direction): for every left
  * row, attach the right row with the same key and
  *  - backward: the greatest right ts <= left ts;
  *  - forward:  the least   right ts >= left ts;
  * nulls when none exists. An optional tolerance bounds the match
  * distance (|left ts - right ts| <= tolerance, in the column's internal
  * long unit — micros for timestamps); a nearest match outside the bound
  * yields nulls, exactly the `CASE WHEN r.ts <= l.ts + tol THEN ...`
  * post-filter a SQL formulation applies.
  *
  * Physical strategy: both sides hash-clustered on key and sorted by
  * (key, ts) — then one streaming merge pass per partition, O(|L|+|R|)
  * with O(1) state (backward keeps the last matching right row; forward
  * only ever peeks the cursor head, since lefts arrive in ascending ts
  * order and a right row ahead of the current left stays ahead of later
  * lefts). Cost profile is exactly a sort-merge join: one shuffle per
  * side, no buffering of groups — this is the 100 TB-correct plan.
  *
  * Keys are compared as Long, timestamps as their internal long (micros) —
  * covering integral and timestamp key/ts types (cast in the API).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false, tolerance: Option[Long] = None) extends BinaryNode {
  // right side is nullable in the output (left outer semantics)
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean, tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    val fwd = forward
    val tol = tolerance.getOrElse(-1L) // -1 = unbounded

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered

      var matchKey = 0L
      var haveMatch = false
      var lastMatch: InternalRow = null
      var lastMatchTs = 0L

      lIter.map { lRow =>
        val lkBoxed = lKeyB.eval(lRow).asInstanceOf[java.lang.Long]
        val ltBoxed = lTsB.eval(lRow).asInstanceOf[java.lang.Long]
        if (lkBoxed == null || ltBoxed == null) {
          // SQL join semantics: NULL never equals anything → no match
          proj(joined(lRow, nullRight))
        } else {
          val lk = lkBoxed.longValue()
          val lt = ltBoxed.longValue()
          // advance the right cursor through every row no longer usable by
          // this (or, since lefts arrive in ascending (key, ts) order, any
          // later) left row. Backward additionally CONSUMES its candidate
          // matches, remembering the latest; forward stops AT the first
          // candidate and only peeks it, because the same right row may
          // also be the nearest follower of later left rows.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rkBoxed = rKeyB.eval(head).asInstanceOf[java.lang.Long]
            val rtBoxed = if (rkBoxed == null) null
              else rTsB.eval(head).asInstanceOf[java.lang.Long]
            if (rkBoxed == null || rtBoxed == null) { rBuf.next() } // unmatchable
            else if (rkBoxed.longValue() < lk) { rBuf.next() } // done for good
            else if (rkBoxed.longValue() == lk &&
                (if (fwd) rtBoxed.longValue() < lt else rtBoxed.longValue() <= lt)) {
              if (fwd) { rBuf.next() } // strictly before this left: dead
              else {
                lastMatch = rBuf.next().copy()
                matchKey = rkBoxed.longValue()
                lastMatchTs = rtBoxed.longValue()
                haveMatch = true
              }
            } else advancing = false
          }
          val r =
            if (fwd) {
              // candidate = cursor head, iff same key and within tolerance
              if (rBuf.hasNext) {
                val head = rBuf.head
                val rkBoxed = rKeyB.eval(head).asInstanceOf[java.lang.Long]
                if (rkBoxed != null && rkBoxed.longValue() == lk) {
                  val rt = rTsB.eval(head).asInstanceOf[java.lang.Long].longValue()
                  if (tol < 0 || rt - lt <= tol) head else nullRight
                } else nullRight
              } else nullRight
            } else if (haveMatch && matchKey == lk &&
                (tol < 0 || lt - lastMatchTs <= tol)) lastMatch
            else nullRight
          proj(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

object Asof {
  /** DataFrame API: ASOF LEFT JOIN `left` to `right` on equal `key` with
    * the nearest `right.ts` at-or-before `left.ts` (default backward) or
    * at-or-after (`forward = true`), optionally bounded by `tolerance`
    * (in the ts column's internal long unit — MICROSECONDS for timestamp
    * columns, plain units for integral columns). Key columns must be
    * integral, ts columns timestamp/integral; referenced by name against
    * each side. Registers the planner strategy on first use (idempotent). */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      forward: Boolean = false, tolerance: Option[Long] = None): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def resolve(name: String, plan: LogicalPlan): Expression = {
      val attr = plan.output.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
      attr.dataType match {
        // timestamps are long micros internally; widen other integrals so
        // the exec's long comparisons are type-safe for INT/SHORT keys
        case org.apache.spark.sql.types.LongType | _: org.apache.spark.sql.types.TimestampType => attr
        case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.DateType =>
          org.apache.spark.sql.catalyst.expressions.Cast(attr,
            org.apache.spark.sql.types.LongType)
        case other => throw new IllegalArgumentException(
          s"ASOF key/ts column $name must be integral or timestamp, got $other")
      }
    }
    require(tolerance.forall(_ >= 0), "ASOF tolerance must be >= 0")
    val node = AsofJoin(lPlan, rPlan,
      resolve(leftKey, lPlan), resolve(rightKey, rPlan),
      resolve(leftTs, lPlan), resolve(rightTs, rPlan), forward, tolerance)
    ColumnShim.ofRows(spark, node)
  }
}
