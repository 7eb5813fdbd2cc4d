package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/z-order interleave as a NATIVE codegen'd kernel.
  *
  * The pure-Column shift/mask ladder is semantically identical but its
  * EXPRESSION TREE is exponential: every spread stage references its
  * input twice (`x' = (x | x << s) & m`), so five stages × two
  * coordinates yield ~64 copies of the leaf expression — and FilterExec
  * performs no subexpression elimination, so a bbox predicate
  * (OR-of-BETWEEN over the key) re-evaluates and re-compiles the whole
  * blown-up tree per comparison: measured 8.5 s for ONE `between` over
  * sf0.1 emissions vs 0.36 s for the same predicate on a plain column.
  * This expression is one static call per row (codegen) / one
  * `nullSafeEval` (interpreted), both delegating to
  * [[graft.ops.Layout.zorderKeyL]] — the single shared kernel the spec
  * pins against a naive bit interleave.
  */
case class ZorderKeyExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override def nullSafeEval(x: Any, y: Any): Any =
    graft.ops.Layout.zorderKeyL(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.ops.Layout.zorderKeyL($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderKeyExpr =
    copy(left = newLeft, right = newRight)
}
