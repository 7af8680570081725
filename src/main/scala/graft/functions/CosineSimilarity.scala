package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * embedding columns.
  *
  * Why a custom Expression (SURVEY §4.3 / prompt preference order (b)): the
  * builtin composition (`zip_with` + `aggregate`, see
  * [[graft.operators.Similarity.cosineBuiltin]]) allocates an intermediate
  * array and evaluates three lambda closures per row; on an O(N·Q) top-k
  * scan that's the hot path. This expression is one tight primitive loop
  * over the two `ArrayData` (no allocation), and `doGenCode` emits a static
  * call so it stays INSIDE whole-stage codegen.
  *
  * Accumulation is sequential left-to-right in double precision — the same
  * order the DuckDB oracle's `list_sum(list_transform(...))` uses, so values
  * are bit-identical for the hash compare.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.functions.CosineSimilarity.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Invoked from generated code — must stay a simple static method. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-API entry point. */
  def cosine(a: Column, b: Column): Column =
    graftshim.toColumn(
      CosineSimilarity(graftshim.toExpression(a), graftshim.toExpression(b))
    )
}
