package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Transparent identity marker for a USER-written bracket subscript.
  *
  * The gateway wraps the operand of every `UnresolvedExtractValue` on the
  * PARSED plan (`x[i]` is the only syntax the parser turns into that node),
  * so that after analysis the DuckDB-semantics swap in
  * `SqlGateway.duckSubscripts` fires exactly on `GetArrayItem(DuckSubMark(
  * _), _)` / `GetMapValue(DuckSubMark(_), _)` — and NEVER on the same node
  * types the ANALYZER synthesizes itself (`ResolvePivot` emits 0-based
  * `GetArrayItem`s over its value array; re-semanticizing those corrupted
  * PIVOT results before this guard existed).
  *
  * The swap unwraps every mark it sees, so none survives to execution; the
  * identity eval/codegen below is defense-in-depth for any path that marks
  * but never swaps — the expression is semantically invisible.
  */
case class DuckSubMark(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = child.genCode(ctx)
    ev.copy(code = code.code, isNull = code.isNull, value = code.value)
  }
  override protected def withNewChildInternal(newChild: Expression): DuckSubMark =
    copy(child = newChild)
}
