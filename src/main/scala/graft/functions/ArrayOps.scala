package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}

/** Intersection cardinality of two SORTED DISTINCT `array<long>` columns —
  * the hot loop of Jaccard verification over hashed token sets.
  *
  * Why custom (SURVEY §4.3 escape hatch): builtin
  * `size(array_intersect(a, b))` builds a hash set of boxed values per row;
  * on millions of candidate pairs that allocation dominates. This is a
  * two-pointer merge over primitive longs — zero allocation — and
  * `doGenCode` emits a static call so it stays inside whole-stage codegen.
  * Inputs MUST be sorted distinct (use [[graft.functions.TextAnalysis.hashedTokenSet]]);
  * the count then equals the set-intersection cardinality.
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.functions.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Two-pointer merge; invoked from generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { cnt += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    cnt
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    graftshim.toColumn(SortedIntersectCount(graftshim.toExpression(a), graftshim.toExpression(b)))
}
