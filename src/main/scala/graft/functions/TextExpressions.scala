package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram expression (tier-5 escape hatch, SURVEY.md §4).
  *
  * The composable form — transform(sequence(...), i -> concat_ws(...,
  * element_at(toks, i), …)) — is correct but interpreted per element
  * (higher-order functions are CodegenFallback) and costs ~3 µs per
  * shingle; at 100 TB of documents the shingle builder IS the dedup
  * pipeline's map-side budget. This expression emits all n-grams of the
  * token array in one flat loop over ArrayData.
  *
  * Output order and content are identical to the HOF form, so DuckDB
  * oracles (window-lead formulation) keep matching.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val sep = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val total = toks.numElements()
    val out = total - n + 1
    if (out <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val res = new Array[Any](out)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i < out) {
        var k = 0
        while (k < n) { window(k) = toks.getUTF8String(i + k); k += 1 }
        res(i) = UTF8String.concatWs(sep, window: _*)
        i += 1
      }
      new GenericArrayData(res)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
