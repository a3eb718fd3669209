package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, CaseWhen,
  Cast, CreateArray, ElementAt, EqualTo, Expression, GetStructField,
  GreaterThan, Greatest, IsNull, Least, Length, Literal, MapKeys, Size,
  Slice, Substring, Subtract, Unevaluable, Add}
import org.apache.spark.sql.types._

/** DuckDB bracket-subscript `x[i]`, as a SELF-RESOLVING placeholder.
  *
  * The gateway swaps every `UnresolvedExtractValue` (the only node the
  * parser builds for bracket syntax) for this expression on the PARSED
  * plan; it resolves itself from the operand's analyzed type, so CHAINED
  * subscripts type-check through DuckDB's semantics — `m['k'][1]` sees
  * `m['k']` as a LIST (DuckDB wraps map values) where Spark's native
  * GetMapValue would yield the bare value and break the outer subscript.
  * After analysis the gateway replaces each node with `duckTree`, the
  * concrete Spark expression tree for its operand type (all probed on
  * DuckDB 1.0):
  *
  *   - list[i]: 1-based, negative from the end, 0/NULL/out-of-range →
  *     NULL; a VARCHAR index converts (ANSI cast — a non-numeric string
  *     errors loudly, as DuckDB's conversion does);
  *   - map[k]: `[v]` when the key exists (`[NULL]` for a NULL-valued
  *     key), `[]` when absent, the key is NULL, or the MAP itself is NULL;
  *   - struct['f']: field value, case-insensitive; an integer key refuses
  *     (DuckDB: "integer key can only be used on unnamed structs");
  *   - varchar[i]: 1-char pick, 1-based, negative from the end, 0 and
  *     out-of-range → EMPTY STRING (not NULL), NULL operand → NULL.
  *
  * Anything else (boolean/fractional index, subscript on a numeric
  * column, a missing struct field) stays unresolved and the statement
  * refuses in the analyzer — never a silent Spark-semantics answer.
  * Unevaluable: the gateway's swap runs on every path that can build one,
  * so a surviving node is a bug surfaced loudly, not a wrong value.
  */
case class DuckSubscript(child: Expression, key: Expression)
    extends Expression with Unevaluable {

  override def children: Seq[Expression] = Seq(child, key)
  override def nullable: Boolean = true

  private def intOk(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
        NullType => true
    case _ => false
  }

  /** Case-insensitive field lookup, first match (Spark resolver rule). */
  private lazy val structField: Option[(StructField, Int)] =
    (child.dataType, key) match {
      case (st: StructType, _) if key.foldable && key.dataType == StringType =>
        Option(key.eval()).map(_.toString).flatMap(name =>
          st.fields.zipWithIndex.find(_._1.name.equalsIgnoreCase(name)))
      case _ => None
    }

  private lazy val resolvedType: Option[DataType] =
    if (!childrenResolved) None
    else child.dataType match {
      case ArrayType(et, _) if intOk(key.dataType) => Some(et)
      case MapType(_, v, _) => Some(ArrayType(v, containsNull = true))
      case _: StructType => structField.map(_._1.dataType)
      case StringType if intOk(key.dataType) => Some(StringType)
      case _ => None
    }

  override lazy val resolved: Boolean =
    childrenResolved && resolvedType.isDefined
  override def dataType: DataType = resolvedType.get

  /** The concrete Spark expression for the operand's type. */
  def duckTree: Expression = child.dataType match {
    case ArrayType(_, _) =>
      val ord = Cast(key, IntegerType)
      CaseWhen(Seq((EqualTo(ord, Literal(0)), Literal.create(null, dataType))),
        ElementAt(child, ord, None, failOnError = false))
    case MapType(kt, _, _) =>
      val k = if (key.dataType == kt) key else Cast(key, kt)
      Slice(
        CreateArray(Seq(ElementAt(child, k, None, failOnError = false))),
        Literal(1),
        CaseWhen(Seq((EqualTo(ArrayContains(MapKeys(child), k), Literal(true)),
          Literal(1))), Literal(0)))
    case _: StructType =>
      val (f, i) = structField.get
      GetStructField(child, i, Some(f.name))
    case StringType =>
      val ord = Cast(key, IntegerType)
      // NULL operand wins over the index-0 '' rule (probed: NULL[0]→NULL)
      CaseWhen(Seq(
        (IsNull(child), Literal.create(null, StringType)),
        (EqualTo(ord, Literal(0)), Literal(""))),
        Substring(child, ord, Literal(1)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSubscript =
    copy(child = newChildren(0), key = newChildren(1))
}

/** DuckDB bracket-slice `x[lo:hi]` over a column or parenthesized
  * expression — same self-resolving-placeholder pattern as
  * [[DuckSubscript]]; the gateway's text pass emits
  * `graft_duck_slice(x, lo, hi, hasLo, hasHi)` (a registered native
  * builder) because `[lo:hi]` has no Spark spelling at all.
  *
  * Probed DuckDB 1.0 semantics, identical for LIST and VARCHAR operands:
  * 1-based INCLUSIVE bounds; a missing lower bound is 1 and a missing
  * upper bound is the length; lower 0 acts as 1; upper 0 empties;
  * negative bounds count from the end (lower clamps to 1, upper may fall
  * off the front); upper clamps to the length; inverted bounds → empty
  * ([] / ''); a NULL bound or NULL operand → NULL. Bounds are arbitrary
  * integral EXPRESSIONS (`l[i+1:j*2]` is valid DuckDB). Fractional or
  * boolean bounds stay unresolved → the statement refuses.
  */
case class DuckSlice(child: Expression, lo: Expression, hi: Expression,
    hasLo: Boolean, hasHi: Boolean) extends Expression with Unevaluable {

  override def children: Seq[Expression] = Seq(child, lo, hi)
  override def nullable: Boolean = true

  private def boundOk(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | NullType => true
    case _ => false
  }

  override lazy val resolved: Boolean = childrenResolved &&
    boundOk(lo) && boundOk(hi) && (child.dataType match {
      case _: ArrayType | StringType => true
      case _ => false
    })
  override def dataType: DataType = child.dataType

  def duckTree: Expression = {
    val size: Expression = child.dataType match {
      case _: ArrayType => Size(child)
      case StringType => Length(child)
    }
    def i32(e: Expression) = Cast(e, IntegerType)
    val one = Literal(1)
    val nullInt = Literal.create(null, IntegerType)
    val start: Expression =
      if (!hasLo) one
      else CaseWhen(Seq(
        (IsNull(lo), nullInt),
        (GreaterThan(i32(lo), Literal(0)), i32(lo)),
        (EqualTo(i32(lo), Literal(0)), one)),
        Greatest(Seq(Add(Add(size, i32(lo)), one), one)))
    val end: Expression =
      if (!hasHi) size
      else CaseWhen(Seq(
        (IsNull(hi), nullInt),
        (GreaterThan(i32(hi), Literal(0)), Least(Seq(i32(hi), size))),
        (EqualTo(i32(hi), Literal(0)), Literal(0))),
        Add(Add(size, i32(hi)), one))
    val len = Greatest(Seq(Add(Subtract(end, start), one), Literal(0)))
    child.dataType match {
      case _: ArrayType => Slice(child, start, len)
      case StringType => Substring(child, start, len)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSlice =
    copy(child = newChildren(0), lo = newChildren(1), hi = newChildren(2))
}

/** DuckDB step-slice `x[lo:hi:step]` / 4-arg `list_slice(l, b, e, s)` —
  * LIST operands only (DuckDB 1.0 errors "Slice with steps has not been
  * implemented for string types"; a string operand stays unresolved here,
  * so the statement refuses just as loudly).
  *
  * Probed semantics (all bracket spellings require `hi`; `lo` may be
  * omitted): NULL operand or any NULL bound/step → NULL; step 0 errors.
  *   - step > 0: bounds resolve like the plain slice (lo: 0→1, negative
  *     from the end clamped ≥1, default 1; hi: clamped ≤len, 0 empties,
  *     negative from the end UNclamped) and indices walk lo, lo+s, … ≤ hi.
  *   - step < 0: the FIRST bound is the walk's start (default len, clamped
  *     ≤len, negative from the end UNclamped — [-10:…] can empty) and the
  *     SECOND the stop (0→1, negative from the end clamped ≥1, positive
  *     UNclamped — [5:100:-2] is empty); indices walk b, b−|s|, … ≥ e.
  * Evaluated directly (CodegenFallback): never in a hot path, and the
  * branchy bound algebra stays readable next to its probe table. */
case class DuckSliceStep(child: Expression, lo: Expression, hi: Expression,
    step: Expression, hasLo: Boolean) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(child, lo, hi, step)
  override def nullable: Boolean = true

  private def boundOk(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType | NullType => true
    case _ => false
  }

  override lazy val resolved: Boolean = childrenResolved &&
    boundOk(lo) && boundOk(hi) && boundOk(step) &&
    child.dataType.isInstanceOf[ArrayType]
  override def dataType: DataType = child.dataType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = child.eval(input)
    if (arr == null) return null
    val loV = if (hasLo) lo.eval(input) else java.lang.Long.valueOf(0L)
    val hiV = hi.eval(input)
    val stV = step.eval(input)
    if ((hasLo && loV == null) || hiV == null || stV == null) return null
    val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements().toLong
    val s = stV.asInstanceOf[Number].longValue
    if (s == 0) throw new IllegalArgumentException("Slice step cannot be zero")
    def fromEnd(i: Long) = n + i + 1
    val idx = scala.collection.mutable.ArrayBuffer[Long]()
    // the walk uses an overflow-checked step: i + s past the int64 range
    // means the walk is over (an unchecked add would wrap sign and emit
    // out-of-range indices)
    def stepped(i: Long): Long =
      try Math.addExact(i, s)
      catch { case _: ArithmeticException =>
        if (s > 0) Long.MaxValue else Long.MinValue }
    if (s > 0) {
      val b0 = if (!hasLo) 1L else loV.asInstanceOf[Number].longValue
      val b = if (b0 > 0) b0 else if (b0 == 0) 1L else math.max(fromEnd(b0), 1L)
      val e0 = hiV.asInstanceOf[Number].longValue
      val e = if (e0 > 0) math.min(e0, n) else if (e0 == 0) 0L else fromEnd(e0)
      var i = b
      while (i <= e) { idx += i; i = stepped(i) }
    } else {
      val b0 = if (!hasLo) n else loV.asInstanceOf[Number].longValue
      val b = if (b0 > 0) math.min(b0, n) else if (b0 == 0) 0L else fromEnd(b0)
      val e0 = hiV.asInstanceOf[Number].longValue
      val e = if (e0 > 0) e0 else if (e0 == 0) 1L else math.max(fromEnd(e0), 1L)
      var i = b
      while (i >= e && i >= 1) { idx += i; i = stepped(i) }
    }
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      idx.toArray.map(i =>
        if (i < 1 || i > n) null else a.get((i - 1).toInt, et)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSliceStep =
    copy(child = newChildren(0), lo = newChildren(1), hi = newChildren(2),
      step = newChildren(3))
}
