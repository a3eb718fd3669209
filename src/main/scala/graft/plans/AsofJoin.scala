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
  *  - backward: the greatest right ts <= left ts (ts <  left ts if strict);
  *  - forward:  the least   right ts >= left ts (ts >  left ts if strict);
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
  * Keys are compared as Long (integral, cast in the API); ts columns are
  * compared with the Catalyst interpreted ordering of their type —
  * timestamps as internal long micros, and DOUBLE/FLOAT/DECIMAL ts
  * columns natively, which is what makes strict (`>`/`<`) inequalities
  * exact for fractional ts (no one-unit-shift approximation).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false, tolerance: Option[Long] = None,
    strict: Boolean = false) extends BinaryNode {
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
    forward: Boolean, tolerance: Option[Long],
    strict: Boolean) extends BinaryExecNode {

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
    val isStrict = strict
    val tol = tolerance.getOrElse(-1L) // -1 = unbounded; long-backed ts only
    // keys and ts values compare through the Catalyst ordering of their
    // type — long-backed (integral/timestamp), fractional (double/
    // decimal), and struct (composite keys) all included
    import org.apache.spark.sql.catalyst.util.TypeUtils
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered

      var matchKey: Any = null
      var haveMatch = false
      var lastMatch: InternalRow = null
      var lastMatchTs: Any = null
      def asLong(a: Any): Long = a.asInstanceOf[java.lang.Long].longValue()

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) {
          // SQL join semantics: NULL never equals anything → no match
          proj(joined(lRow, nullRight))
        } else {
          // advance the right cursor through every row no longer usable by
          // this (or, since lefts arrive in ascending (key, ts) order, any
          // later) left row. Backward additionally CONSUMES its candidate
          // matches, remembering the latest; forward stops AT the first
          // candidate and only peeks it, because the same right row may
          // also be the nearest follower of later left rows.
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKeyB.eval(head)
            val rt = if (rk == null) null else rTsB.eval(head)
            if (rk == null || rt == null) { rBuf.next() } // unmatchable
            else {
              // a struct key evaluated off a buffered row is only a view —
              // copy the key when remembering it past rBuf.next()
              val kCmp = keyOrd.compare(rk, lk)
              if (kCmp < 0) { rBuf.next() } // done for good
              else if (kCmp == 0 && {
                  val c = tsOrd.compare(rt, lt)
                  // fwd: kill rows that can never be an at-or-after
                  // (strict: after) match; bwd: consume rows that ARE one
                  if (fwd) { if (isStrict) c <= 0 else c < 0 }
                  else { if (isStrict) c < 0 else c <= 0 } }) {
                if (fwd) { rBuf.next() } // behind every later left too: dead
                else {
                  lastMatch = rBuf.next().copy()
                  matchKey = rKeyB.eval(lastMatch)
                  lastMatchTs = rTsB.eval(lastMatch)
                  haveMatch = true
                }
              } else advancing = false
            }
          }
          val r =
            if (fwd) {
              // candidate = cursor head, iff same key and within tolerance
              if (rBuf.hasNext) {
                val head = rBuf.head
                val rk = rKeyB.eval(head)
                if (rk != null && keyOrd.compare(rk, lk) == 0) {
                  val rt = rTsB.eval(head)
                  if (tol < 0 || asLong(rt) - asLong(lt) <= tol) head
                  else nullRight
                } else nullRight
              } else nullRight
            } else if (haveMatch && keyOrd.compare(matchKey, lk) == 0 &&
                (tol < 0 || asLong(lt) - asLong(lastMatchTs) <= tol)) lastMatch
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
    case AsofJoin(l, r, lk, rk, lt, rt, fwd, tol, strict) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol,
        strict) :: Nil
    case _ => Nil
  }
}

object Asof {
  /** DataFrame API: ASOF LEFT JOIN `left` to `right` on equal `key` with
    * the nearest `right.ts` at-or-before `left.ts` (default backward) or
    * at-or-after (`forward = true`); `strict = true` makes the bound
    * exclusive (strictly-before / strictly-after — DuckDB's `>`/`<`
    * spellings). Optionally bounded by `tolerance` (in the ts column's
    * internal long unit — MICROSECONDS for timestamp columns, plain units
    * for integral columns; long-backed ts only). Key columns must be
    * integral; ts columns timestamp/integral/date or fractional
    * (double/float/decimal — both sides the same fractional type);
    * referenced by name against each side. Registers the planner strategy
    * on first use (idempotent). */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      forward: Boolean = false, tolerance: Option[Long] = None,
      strict: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    import org.apache.spark.sql.types._
    def resolve(name: String, plan: LogicalPlan, tsCol: Boolean): Expression = {
      val attr = plan.output.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
      attr.dataType match {
        // timestamps are long micros internally; widen other integrals so
        // the exec's long comparisons are type-safe for INT/SHORT keys
        case LongType | _: TimestampType => attr
        case IntegerType | ShortType | ByteType | DateType =>
          org.apache.spark.sql.catalyst.expressions.Cast(attr, LongType)
        // fractional ts compare through the type's interpreted ordering
        case DoubleType | FloatType | _: DecimalType if tsCol => attr
        // composite (struct) keys — fields must be identically typed on
        // both sides; the caller nulls the struct out when any field is
        // NULL so SQL's NULL-never-matches equality holds
        case s: StructType if !tsCol && s.fields.forall(f =>
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(f.dataType)) => attr
        case other => throw new IllegalArgumentException(
          s"ASOF ${if (tsCol) "ts" else "key"} column $name has " +
            s"unsupported type $other")
      }
    }
    require(tolerance.forall(_ >= 0), "ASOF tolerance must be >= 0")
    val ltE = resolve(leftTs, lPlan, tsCol = true)
    val rtE = resolve(rightTs, rPlan, tsCol = true)
    val lkE = resolve(leftKey, lPlan, tsCol = false)
    val rkE = resolve(rightKey, rPlan, tsCol = false)
    def longBacked(dt: DataType): Boolean =
      dt == LongType || dt.isInstanceOf[TimestampType]
    def comparable(a: DataType, b: DataType): Boolean =
      (longBacked(a) && longBacked(b)) || a == b
    require(comparable(ltE.dataType, rtE.dataType),
      s"ASOF ts types must be comparable: ${ltE.dataType} vs ${rtE.dataType}")
    require(comparable(lkE.dataType, rkE.dataType),
      s"ASOF key types must be comparable: ${lkE.dataType} vs ${rkE.dataType}")
    require(tolerance.isEmpty || longBacked(ltE.dataType),
      "ASOF tolerance requires an integral/timestamp ts column")
    val node = AsofJoin(lPlan, rPlan, lkE, rkE, ltE, rtE,
      forward, tolerance, strict)
    ColumnShim.ofRows(spark, node)
  }
}
