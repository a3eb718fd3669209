package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** x28's most-frequent-bigram count as ONE native expression: the count of
  * the most frequent adjacent word pair in a word array, in a single pass
  * with a per-document hash map.
  *
  * Bit-identical to the explode → groupBy(doc, bigram) → groupBy(doc) max
  * composition it replaces (the bigram key is the same
  * `concat(w[i-1], ' ', w[i])` string), but with ZERO shuffle: per-document
  * state is bounded by document length, so the whole computation is
  * map-only and inherits the corpus partitioning — the same fusion
  * discipline as [[WinnowFingerprints]] and [[CdcChunks]]. The two-shuffle
  * composition moved |docs × distinct bigrams| rows twice at any corpus
  * size; this moves nothing.
  *
  * Returns 0 for arrays with fewer than 2 words (callers filter those rows
  * identically on both engines).
  */
case class TopBigramCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TopBigramCount.topBigram(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopBigramCount.topBigram($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

object TopBigramCount {
  def topBigram(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n < 2) return 0L
    val counts = new java.util.HashMap[String, java.lang.Long](Math.min(n * 2, 1 << 16))
    var best = 0L
    var prev = arr.getUTF8String(0).toString
    var i = 1
    while (i < n) {
      val cur = arr.getUTF8String(i).toString
      val key = prev + " " + cur // the exact concat(w[i-1],' ',w[i]) bigram key
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c > best) best = c
      prev = cur
      i += 1
    }
    best
  }

  /** Column API: max adjacent-bigram count of a word-array column. */
  def topBigramCount(c: Column): Column =
    ColumnShim.column(TopBigramCount(ColumnShim.expression(c)))
}
