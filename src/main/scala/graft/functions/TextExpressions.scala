package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

/** Portable polynomial string hash: h = fold((h·mult + char) mod `mod`).
  *
  * Open-vocabulary shingle/token id — replaces the dictionary built with
  * row_number over globally sorted distinct shingles, whose physical plan
  * is a single-partition window over the whole vocabulary (the one
  * global-ORDER window SCALE.md flagged). The hash needs no dictionary
  * state at all, so shingle→id is pure map-side at any vocabulary size.
  *
  * Cross-engine determinism: chars are UTF-16 code units, which equal
  * codepoints for ASCII/BMP text; DuckDB mirrors with
  * list_reduce over ord(substring(s,i,1)). With mod = 2³¹−1 the
  * accumulator stays < 2³¹·mult + 2¹⁶ ≪ 2⁶³ — no overflow either side.
  * Whole-stage-codegen'd (tight char loop, no HOF lambda dispatch).
  */
case class StringPolyHash(child: Expression, mult: Long = 31L,
    mod: Long = 2147483647L) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * mult + s.charAt(i)) % mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.String ${ev.value}_s = $c.toString();
         |long ${ev.value}_h = 0L;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_s.length(); ${ev.value}_i++) {
         |  ${ev.value}_h = (${ev.value}_h * ${mult}L + ${ev.value}_s.charAt(${ev.value}_i)) % ${mod}L;
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
