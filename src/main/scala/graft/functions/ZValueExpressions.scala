package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Expression, Literal, ShiftLeft, ShiftRight}

/** Expression-level 16-bit Morton (Z-order) interleave — the SQL-surface
  * twin of [[graft.operators.Formats.zValue]]'s Column composition (bit i
  * of `x` → position 2i, bit i of `y` → 2i+1). Both build the same 16
  * shift/mask/or terms from built-in integer expressions, so the whole
  * thing stays inside whole-stage codegen with no custom eval; a spec
  * pins SQL-vs-Column equality so the two surfaces cannot drift.
  */
object ZValueExpressions {

  def zvalueExpr(x: Expression, y: Expression): Expression = {
    def bits(e: Expression, off: Int): Seq[Expression] =
      (0 until 16).map { i =>
        ShiftLeft(BitwiseAnd(ShiftRight(e, Literal(i)), Literal(1L)), Literal(2 * i + off))
      }
    (bits(x, 0) ++ bits(y, 1)).reduce[Expression]((a, b) => BitwiseOr(a, b))
  }
}
