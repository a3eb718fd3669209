package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `json_merge_patch` and `json_contains` (reachable through the
  * reference passthrough `db/db.go:70`), as native expressions over
  * jackson (already on Spark's classpath).
  *
  * json_merge_patch — RFC 7386 merge with DuckDB's probed deviations:
  *   - a non-object PATCH replaces the target verbatim;
  *   - at the TOP level, a non-object/SQL-NULL target returns the patch
  *     VERBATIM (nulls kept — probed: merge('5','{"a":null}') is
  *     '{"a":null}', and merge(NULL, p) is p);
  *   - NESTED, a non-object target merges into {} RFC-style (null keys
  *     scrubbed — probed: merge('{"x":1}','{"x":{"y":null}}') is
  *     '{"x":{}}');
  *   - object-object merges copy the target, remove keys the patch nulls,
  *     recurse on object values, replace otherwise;
  *   - a SQL NULL patch is NULL (null-strict on the right only).
  *
  * json_contains(haystack, needle) — recursive containment: true when any
  * node of the haystack STRUCTURALLY equals the needle (probed: object
  * and array needles match whole subtrees; 1 does not match 1.0).
  *
  * Both render minified, matching DuckDB's JSON output. */
object DuckJsonKernels {
  private val mapper = new ObjectMapper()

  private def mergeInto(target: JsonNode, patch: JsonNode): JsonNode = {
    if (!patch.isObject) return patch.deepCopy()
    val base: ObjectNode =
      if (target != null && target.isObject)
        target.deepCopy().asInstanceOf[ObjectNode]
      else mapper.createObjectNode()
    val it = patch.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isNull) base.remove(e.getKey)
      else if (e.getValue.isObject)
        base.set(e.getKey, mergeInto(base.get(e.getKey), e.getValue))
      else base.set(e.getKey, e.getValue.deepCopy())
    }
    base
  }

  /** target may be null (SQL NULL target — probed: patch verbatim). */
  def mergePatch(target: UTF8String, patch: UTF8String): UTF8String = {
    val p = mapper.readTree(patch.toString)
    val t = if (target == null) null else mapper.readTree(target.toString)
    val out =
      if (!p.isObject || t == null || !t.isObject) p // top level: verbatim
      else mergeInto(t, p)
    UTF8String.fromString(mapper.writeValueAsString(out))
  }

  /** Subset match (probed): an object needle requires each of its keys to
    * exist and match recursively; an array needle requires each element
    * to match SOME haystack element (set, not multiset — [1,2] contains
    * [2,2]); scalars are strict structural equality (1 != 1.0, strings
    * never substring-match). */
  private def matches(hay: JsonNode, needle: JsonNode): Boolean = {
    if (needle.isObject) {
      if (!hay.isObject) return false
      val it = needle.fields()
      while (it.hasNext) {
        val e = it.next()
        if (!hay.has(e.getKey) ||
            !matches(hay.get(e.getKey), e.getValue)) return false
      }
      true
    } else if (needle.isArray) {
      if (!hay.isArray) return false
      val it = needle.elements()
      while (it.hasNext) {
        val ne = it.next()
        var found = false
        val hit = hay.elements()
        while (hit.hasNext && !found) found = matches(hit.next(), ne)
        if (!found) return false
      }
      true
    } else hay.equals(needle)
  }

  /** Recursive descent: the needle subset-matches the haystack itself or
    * any descendant node (probed: [[1,2]] contains [2]). */
  private def containsNode(hay: JsonNode, needle: JsonNode): Boolean = {
    if (matches(hay, needle)) return true
    if (hay.isContainerNode) {
      val it = hay.elements()
      while (it.hasNext) if (containsNode(it.next(), needle)) return true
    }
    false
  }

  def jsonContains(hay: UTF8String, needle: UTF8String): Boolean =
    containsNode(mapper.readTree(hay.toString),
      mapper.readTree(needle.toString))

  // --- json_structure ----------------------------------------------------
  // DuckDB's type-inference rendering (every rule probed): non-negative
  // integers (up to uint64) are "UBIGINT", negative integers "BIGINT",
  // fractions/overflow "DOUBLE"; strings "VARCHAR", booleans "BOOLEAN",
  // nulls "NULL". Arrays merge their element structures — NULL yields to
  // anything, UBIGINT+BIGINT→BIGINT, numeric+DOUBLE→DOUBLE, objects merge
  // key-unions recursively, arrays merge elementwise, anything else
  // collapses to "JSON". An empty array is ["NULL"].
  private val UINT64_MAX = new java.math.BigInteger("18446744073709551615")

  private def classify(n: JsonNode): JsonNode = {
    if (n.isNull) return mapper.getNodeFactory.textNode("NULL")
    if (n.isTextual) return mapper.getNodeFactory.textNode("VARCHAR")
    if (n.isBoolean) return mapper.getNodeFactory.textNode("BOOLEAN")
    if (n.isNumber) {
      val name =
        if (!n.isIntegralNumber) "DOUBLE"
        else {
          val v = n.bigIntegerValue()
          if (v.signum() >= 0)
            if (v.compareTo(UINT64_MAX) <= 0) "UBIGINT" else "DOUBLE"
          else if (v.bitLength() < 64) "BIGINT" else "DOUBLE"
        }
      return mapper.getNodeFactory.textNode(name)
    }
    if (n.isArray) {
      var merged: JsonNode = mapper.getNodeFactory.textNode("NULL")
      val it = n.elements()
      while (it.hasNext) merged = mergeStructure(merged, classify(it.next()))
      val arr = mapper.createArrayNode(); arr.add(merged); return arr
    }
    // object
    val o = mapper.createObjectNode()
    val it = n.fields()
    while (it.hasNext) { val e = it.next(); o.set(e.getKey, classify(e.getValue)) }
    o
  }

  private def mergeStructure(a: JsonNode, b: JsonNode): JsonNode = {
    if (a.equals(b)) return a
    def txt(n: JsonNode): String = if (n.isTextual) n.asText else ""
    (txt(a), txt(b)) match {
      case ("NULL", _) => b
      case (_, "NULL") => a
      case ("UBIGINT", "BIGINT") | ("BIGINT", "UBIGINT") =>
        mapper.getNodeFactory.textNode("BIGINT")
      case ("UBIGINT", "DOUBLE") | ("DOUBLE", "UBIGINT") |
           ("BIGINT", "DOUBLE") | ("DOUBLE", "BIGINT") =>
        mapper.getNodeFactory.textNode("DOUBLE")
      case _ if a.isObject && b.isObject =>
        val o = a.deepCopy().asInstanceOf[ObjectNode]
        val it = b.fields()
        while (it.hasNext) {
          val e = it.next()
          if (o.has(e.getKey))
            o.set(e.getKey, mergeStructure(o.get(e.getKey), e.getValue))
          else o.set(e.getKey, e.getValue)
        }
        o
      case _ if a.isArray && b.isArray =>
        val arr = mapper.createArrayNode()
        arr.add(mergeStructure(a.get(0), b.get(0))); arr
      case _ => mapper.getNodeFactory.textNode("JSON")
    }
  }

  def jsonStructure(doc: UTF8String): UTF8String =
    UTF8String.fromString(
      mapper.writeValueAsString(classify(mapper.readTree(doc.toString))))
}

case class DuckJsonStructure(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(StringType, NullType).contains(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("json_structure expects JSON text")
  override def nullSafeEval(a: Any): Any =
    DuckJsonKernels.jsonStructure(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.DuckJsonKernels.jsonStructure($a)")
  override protected def withNewChildInternal(c: Expression): DuckJsonStructure =
    copy(child = c)
}

case class DuckJsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e =>
        Seq(StringType, NullType).contains(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("json_merge_patch expects JSON text arguments")
  // null-strict on the PATCH only: a NULL target still yields the patch
  // (probed), so the default BinaryExpression null gate can't be used —
  // eval is overridden and codegen falls back to it
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val p = right.eval(input)
    if (p == null) return null
    val t = left.eval(input)
    DuckJsonKernels.mergePatch(t.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String])
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckJsonMergePatch = copy(left = l, right = r)
}

case class DuckJsonContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e =>
        Seq(StringType, NullType).contains(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("json_contains expects JSON text arguments")
  override def nullSafeEval(a: Any, b: Any): Any =
    DuckJsonKernels.jsonContains(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DuckJsonKernels.jsonContains($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckJsonContains = copy(left = l, right = r)
}

/** DuckDB's cast-to-JSON (`x::JSON`, `CAST(x AS JSON)` — the gateway
  * rewrites both spellings onto this): VARCHAR input must be VALID json
  * and passes through VERBATIM (probed: '{"a":  1}' keeps its spaces;
  * 'hi' is a Conversion Error, NULL under TRY_CAST); any other input
  * renders as compact JSON text — numbers plain, booleans bare,
  * date/timestamp as quoted strings, structs/lists/maps recursively
  * with jackson's escaping (probed: {'a':1}::JSON = '{"a":1}').
  * The JSON type itself is VARCHAR-valued in DuckDB (data_type_id 25). */
case class DuckJsonCast(child: Expression, tryMode: Boolean)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  private lazy val mapper = {
    val m = new ObjectMapper()
    // a VARCHAR cast must reject trailing garbage like DuckDB (probed:
    // '{"a":1} xyz' is a Conversion Error)
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature
      .FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** DuckDB's double-in-JSON rendering (probed): NaN / Infinity /
    * -Infinity emit BARE (DuckDB writes them unquoted), finite doubles in
    * plain decimal with at least one fractional digit (1e20 →
    * '100000000000000000000.0', 2.0 → '2.0', 1.5 → '1.5'). */
  private def doubleNode(d: Double): JsonNode =
    if (d.isNaN || d.isInfinite)
      mapper.getNodeFactory.rawValueNode(
        new com.fasterxml.jackson.databind.util.RawValue(
          if (d.isNaN) "NaN" else if (d > 0) "Infinity" else "-Infinity"))
    else {
      val plain = java.math.BigDecimal.valueOf(d).toPlainString
      mapper.getNodeFactory.rawValueNode(
        new com.fasterxml.jackson.databind.util.RawValue(
          if (plain.contains('.')) plain else plain + ".0"))
    }

  private def node(v: Any, dt: DataType): JsonNode = {
    if (v == null) return mapper.nullNode()
    dt match {
      case _: StringType =>
        mapper.getNodeFactory.textNode(v.asInstanceOf[UTF8String].toString)
      case BooleanType => mapper.getNodeFactory.booleanNode(v.asInstanceOf[Boolean])
      case ByteType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Byte].toLong)
      case ShortType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Short].toLong)
      case IntegerType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Int].toLong)
      case LongType => mapper.getNodeFactory.numberNode(v.asInstanceOf[Long])
      case FloatType => doubleNode(v.asInstanceOf[Float].toDouble)
      case DoubleType => doubleNode(v.asInstanceOf[Double])
      case _: DecimalType => mapper.getNodeFactory.numberNode(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal)
      case _: DateType => mapper.getNodeFactory.textNode(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString)
      case _: TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ldt = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L), java.time.ZoneOffset.UTC)
        val t = ldt.toLocalTime
        // DuckDB renders seconds always and trims the fraction's trailing
        // zeros (probed: 10:20:30.5 stays '.5', not '.500')
        val frac = if (t.getNano == 0) ""
          else ("." + f"${t.getNano}%09d").reverse.dropWhile(_ == '0').reverse
        mapper.getNodeFactory.textNode(
          ldt.toLocalDate.toString +
            f" ${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d$frac")
      case at: ArrayType =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val out = mapper.createArrayNode()
        var i = 0
        while (i < arr.numElements()) {
          out.add(node(arr.get(i, at.elementType), at.elementType)); i += 1
        }
        out
      case st: StructType =>
        val row = v.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val out = mapper.createObjectNode()
        var i = 0
        while (i < st.fields.length) {
          val f = st.fields(i)
          out.set[JsonNode](f.name, node(row.get(i, f.dataType), f.dataType))
          i += 1
        }
        out
      case mt: MapType =>
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val out = mapper.createObjectNode()
        val keys = m.keyArray(); val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = keys.get(i, mt.keyType)
          val kText = if (k == null) "null" else k.toString
          out.set[JsonNode](kText, node(vals.get(i, mt.valueType), mt.valueType))
          i += 1
        }
        out
      case other => throw new IllegalArgumentException(
        s"cast ${other.catalogString} to JSON unsupported")
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    child.dataType match {
      case _: StringType =>
        val text = v.asInstanceOf[UTF8String].toString
        try {
          val tree = mapper.readTree(text)
          // jackson returns MissingNode for empty input without throwing;
          // DuckDB errors on it (probed: ''::JSON is a Conversion Error)
          if (tree == null || tree.isMissingNode)
            throw new IllegalArgumentException("empty input")
          v // verbatim when valid (probed: whitespace kept)
        } catch {
          case _: Throwable if tryMode => null
          case _: Throwable => throw new IllegalArgumentException(
            s"Malformed JSON in cast to JSON. Input: ${text.take(50)}")
        }
      case dt => UTF8String.fromString(mapper.writeValueAsString(node(v, dt)))
    }
  }
  override protected def withNewChildInternal(c: Expression): DuckJsonCast =
    copy(child = c)
}
