package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's string-similarity scalar functions Spark has no builtin for —
  * `jaccard`, `hamming`/`mismatches`, `damerau_levenshtein`,
  * `jaro_similarity`, `jaro_winkler_similarity` — plus integer `gcd`/`lcm`.
  * Registered under their DuckDB names by the gateway (no rewrite needed:
  * Spark 4 has no builtins with these names). Every corner probed against
  * DuckDB 1.0:
  *
  *   - jaccard = CHARACTER-set Jaccard, case-sensitive, loud error on an
  *     empty argument ("An argument too short!");
  *   - hamming/mismatches = positional mismatch count, loud error unless
  *     both strings have equal nonzero length;
  *   - damerau_levenshtein = FULL Damerau-Levenshtein (adjacent
  *     transposition with further edits allowed — 'ca'→'abc' is 2, not
  *     OSA's 3), alphabet-indexed DP;
  *   - jaro_winkler applies the standard 0.7 boost threshold (probed:
  *     jaro 0.5 with shared prefix stays 0.5);
  *   - gcd/lcm on |a|,|b| with gcd(0,0)=0, lcm(0,x)=0.
  *
  * All are allocation-bounded per-row scalar kernels dispatched via a
  * static call from generated code — they stay inside whole-stage codegen
  * like the engine's other text kernels (Bigram/Winnow/Cdc). */
abstract class DuckStringScalar extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  /** Companion static method name invoked from both eval and codegen. */
  def kernel: String
  override def nullSafeEval(a: Any, b: Any): Any =
    DuckTextDistance.dispatch(kernel, a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DuckTextDistance.$kernel($a.toString(), $b.toString())")
}

case class DuckJaccard(left: Expression, right: Expression)
    extends DuckStringScalar {
  override def dataType: DataType = DoubleType
  override def kernel: String = "jaccard"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckJaccard = copy(left = l, right = r)
}

case class DuckHamming(left: Expression, right: Expression)
    extends DuckStringScalar {
  override def dataType: DataType = LongType
  override def kernel: String = "hamming"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckHamming = copy(left = l, right = r)
}

case class DuckDamerauLevenshtein(left: Expression, right: Expression)
    extends DuckStringScalar {
  override def dataType: DataType = LongType
  override def kernel: String = "damerau"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckDamerauLevenshtein = copy(left = l, right = r)
}

case class DuckJaro(left: Expression, right: Expression)
    extends DuckStringScalar {
  override def dataType: DataType = DoubleType
  override def kernel: String = "jaro"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckJaro = copy(left = l, right = r)
}

case class DuckJaroWinkler(left: Expression, right: Expression)
    extends DuckStringScalar {
  override def dataType: DataType = DoubleType
  override def kernel: String = "jaroWinkler"
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckJaroWinkler = copy(left = l, right = r)
}

case class DuckGcd(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    DuckTextDistance.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DuckTextDistance.gcd($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckGcd = copy(left = l, right = r)
}

case class DuckLcm(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    DuckTextDistance.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DuckTextDistance.lcm($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): DuckLcm = copy(left = l, right = r)
}

object DuckTextDistance {
  def dispatch(kernel: String, a: String, b: String): Any = kernel match {
    case "jaccard" => jaccard(a, b)
    case "hamming" => hamming(a, b)
    case "damerau" => damerau(a, b)
    case "jaro" => jaro(a, b)
    case "jaroWinkler" => jaroWinkler(a, b)
  }

  def jaccard(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty)
      throw new IllegalArgumentException("Jaccard Function: An argument too short!")
    val sa = a.toSet; val sb = b.toSet
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  def hamming(a: String, b: String): Long = {
    if (a.isEmpty || b.isEmpty)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of length > 0!")
    if (a.length != b.length)
      throw new IllegalArgumentException(
        "Mismatch Function: Strings must be of equal length!")
    var n = 0L; var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) n += 1; i += 1 }
    n
  }

  /** Full Damerau-Levenshtein (alphabet-indexed DP, Lowrance-Wagner). */
  def damerau(a: String, b: String): Long = {
    if (a == b) return 0L
    val inf = a.length + b.length
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](a.length + 2, b.length + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= a.length) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= b.length) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= a.length) {
      var db = 0
      j = 1
      while (j <= b.length) {
        val i1 = Option(da.get(b.charAt(j - 1))).map(_.toInt).getOrElse(0)
        val j1 = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost,
            math.min(d(i + 1)(j) + 1, d(i)(j + 1) + 1)),
          d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(a.length + 1)(b.length + 1).toLong
  }

  def jaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(a.length, b.length) / 2 - 1
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window); val hi = math.min(b.length - 1, i + window)
      var j = lo; var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  /** Winkler modification with the standard 0.7 boost threshold (probed:
    * DuckDB leaves a 0.5 Jaro untouched despite a shared prefix). */
  def jaroWinkler(a: String, b: String): Double = {
    val base = jaro(a, b)
    if (base <= 0.7) return base
    var prefix = 0
    while (prefix < math.min(4, math.min(a.length, b.length)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    base + prefix * 0.1 * (1.0 - base)
  }

  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0
    val g = gcd(a, b)
    math.abs(a / g * b)
  }
}
