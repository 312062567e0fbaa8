package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Static kernel for [[ArrayPairs]]. */
object GraphKernels {
  /** all ordered pairs (i < j positions) of a long array as
    * struct<pa,pb> rows — callers pass a SORTED DISTINCT array so
    * pa < pb by value. */
  def arrayPairs(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(a, xs.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All unordered pairs of a long array, as array<struct<pa,pb>> — the
  * map-side pair expansion of co-occurrence graph building
  * ([[graft.ops.Graph.coOccurrenceEdges]]).
  *
  * The relational formulation (items self-join on the group key) costs a
  * SECOND full shuffle of the item table plus the join itself; grouping
  * once to a sorted per-group array and exploding this expression's
  * output instead makes the expansion pure map-side work after ONE
  * shuffle — the same shuffle-ellision the shingle builders use. Output
  * size is n(n−1)/2 per group: bounded by basket size, which is the
  * operator's documented scale contract (baskets, not corpora). One flat
  * codegen'd loop; no per-pair lambda dispatch.
  */
case class ArrayPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pa", LongType, nullable = false),
      StructField("pb", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    GraphKernels.arrayPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraphKernels.arrayPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
