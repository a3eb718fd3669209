package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `regexp_replace(subject, pattern, replacement [, options])` —
  * exact semantics, which differ from Spark's same-named builtin in three
  * load-bearing ways (all probed against DuckDB 1.0, the oracle engine):
  *
  *   1. DuckDB replaces the FIRST match only unless the `'g'` option is
  *      given; Spark always replaces all. (`regexp_replace('aaa','a','b')`
  *      → `'baa'` in DuckDB, `'bbb'` in Spark.)
  *   2. DuckDB's replacement string uses RE2 rewrite syntax — `\1`…`\9`
  *      are group backrefs, `\0` the whole match, `$` is literal; Java
  *      (and Spark) use `$1` and `\` as the escape. The rewrite string is
  *      translated here, so `'[\1]'` means the same thing it means in
  *      DuckDB. (The old text-level `'g'`-flag rewrite to Spark's builtin
  *      silently mis-rendered backref replacements.)
  *   3. Options: `g` global, `i` case-insensitive, `s` dot-matches-newline,
  *      `l` literal (non-regex) pattern, `c` case-sensitive (the default).
  *      Any other option letter raises the same "Unrecognized Regex
  *      option" DuckDB raises — loud, never guessed (DuckDB's newline
  *      options `m`/`n`/`p` have no exact Java twin and stay refused).
  *
  * Registered as `duck_regexp_replace` (SqlGateway rewrites every
  * DuckDB-dialect `regexp_replace` call to it). Pattern + translated
  * rewrite are cached per thread keyed by (pattern, options, rewrite), so
  * the constant-pattern case compiles once, not per row.
  */
case class DuckRegexpReplace(subject: Expression, regexp: Expression,
    rep: Expression, flags: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep
  override def fourth: Expression = flags

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType, StringType)

  override protected def nullSafeEval(s: Any, p: Any, r: Any, f: Any): Any =
    DuckRegexpReplace.replace(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String],
      f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, r, f) =>
      s"graft.functions.DuckRegexpReplace.replace($s, $p, $r, $f)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): DuckRegexpReplace =
    copy(subject = newFirst, regexp = newSecond, rep = newThird,
      flags = newFourth)
}

object DuckRegexpReplace {
  /** (pattern text, options, rewrite text) → (compiled, translated). */
  private val cache =
    new ThreadLocal[(String, String, String, Pattern, String)]()

  def replace(s: UTF8String, p: UTF8String, r: UTF8String,
      f: UTF8String): UTF8String = {
    val ps = p.toString; val fs = f.toString; val rs = r.toString
    var c = cache.get()
    if (c == null || c._1 != ps || c._2 != fs || c._3 != rs) {
      var jflags = 0; var literal = false
      var i = 0
      while (i < fs.length) {
        fs.charAt(i) match {
          case 'g' => () // handled at replace time
          case 'i' => jflags |= Pattern.CASE_INSENSITIVE
          case 's' => jflags |= Pattern.DOTALL
          case 'l' => literal = true
          case 'c' => () // case-sensitive: already the default
          // DuckDB 1.0's newline options select newline-SENSITIVE matching
          // ('.' stops at \n, ^$ anchor the whole text) — probed to be
          // bit-identical to its default, which Java's default matches too
          case 'm' | 'n' | 'p' => ()
          case other => throw new IllegalArgumentException(
            s"Unrecognized Regex option $other")
        }
        i += 1
      }
      if (literal) jflags |= Pattern.LITERAL
      c = (ps, fs, rs, Pattern.compile(ps, jflags), translateRewrite(rs))
      cache.set(c)
    }
    val m = c._4.matcher(s.toString)
    UTF8String.fromString(
      if (fs.indexOf('g') >= 0) m.replaceAll(c._5) else m.replaceFirst(c._5))
  }

  /** RE2 rewrite syntax → Java replacement syntax: `\N` → `$N` (N = 0–9),
    * `\\` → literal backslash, bare `$` → literal dollar. */
  private def translateRewrite(r: String): String = {
    val sb = new StringBuilder(r.length + 8)
    var i = 0
    while (i < r.length) {
      val ch = r.charAt(i)
      if (ch == '\\' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (n.isDigit) { sb += '$' += n; i += 2 }
        else if (n == '\\') { sb ++= "\\\\"; i += 2 }
        else { sb += '\\' += n; i += 2 } // \x = literal x in Java too
      } else if (ch == '$') { sb ++= "\\$"; i += 1 }
      else { sb += ch; i += 1 }
    }
    sb.toString
  }
}
