package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for vector similarity (SURVEY.md §2.11:
  * "promote to a custom Catalyst Expression with codegen if bench demands").
  *
  * [[CosineSimilarity]] fuses dot product and both norms into ONE pass over
  * the two arrays, with full whole-stage-codegen support (`doGenCode`
  * emits a primitive double loop — no virtual calls, no boxing, no
  * intermediate zipped array like the `zip_with`+`aggregate` composition
  * allocates per row). Accumulation order is left-to-right, identical to
  * the higher-order-function formulation and DuckDB's `list_inner_product`,
  * so results stay bit-deterministic across engines.
  *
  * Null contract: null input array → null; mismatched lengths → null.
  * Element nulls are not expected (embeddings are dense); a null element
  * surfaces as an NPE-free 0.0 via ArrayData.getDouble semantics.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API: fused cosine similarity of two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))
}
