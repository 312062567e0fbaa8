package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tier-5 escape hatch (SURVEY.md §4/§7): a native Catalyst expression for
  * the dense dot product.
  *
  * The composable form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct
  * but interpreted (higher-order functions have no codegen) and allocates
  * an intermediate array per row — at 100 TB of embedding pairs that's the
  * entire similarity-kernel budget. This expression evaluates as a fused
  * multiply-add loop and participates in whole-stage codegen; summation
  * order is ascending index, identical to the HOF fold and to DuckDB's
  * list_dot_product, so results stay bit-identical.
  *
  * Exposed via FunctionRegistry as `graft_dot` (see [[VectorFunctions.register]]).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  // mismatched lengths → null, matching the HOF form it replaces
  // (zip_with pads the shorter side with null, null products null-poison
  // the aggregate fold); silently truncating to min length would fabricate
  // a plausible partial dot for ragged embeddings
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unit-normalize a float/double vector in one flat pass: cast each element
  * to double, accumulate Σx² in ASCENDING index order, divide by √Σx².
  *
  * Replaces the three-HOF chain transform(cast) → aggregate(zip_with) →
  * transform(divide), which is interpreted per element (~3 µs/lambda) and
  * sat on the map side of EVERY similarity query. Operation order is
  * identical to the HOF chain and to the DuckDB
  * list_transform/list_dot_product mirror, so doubles stay bit-identical.
  * Null input → null; a zero vector yields ±Infinity/NaN elements exactly
  * as the HOF form did (no silent re-interpretation).
  */
case class UnitVector(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // nullable even over a non-null child: a null ELEMENT nulls the vector
  override def nullable: Boolean = true

  private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val d = new Array[Double](n)
    var i = 0
    while (i < n) {
      // a null element means the vector is not well-defined — return null
      // for the WHOLE vector (the HOF chain produced null-poisoned
      // elements; reading the slot raw would fabricate a plausible value)
      if (arr.isNullAt(i)) return null
      d(i) = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) { s += d(i) * d(i); i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = d(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val get = if (childIsFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
      s"""
         |int $n = $c.numElements();
         |double[] $d = new double[$n];
         |boolean ${ev.value}_bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.value}_bad = true; break; }
         |  $d[$i] = $get;
         |}
         |if (${ev.value}_bad) {
         |  ${ev.isNull} = true;
         |  ${ev.value} = null;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $d[$i] * $d[$i]; }
         |  double $norm = java.lang.Math.sqrt($s);
         |  Object[] $out = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] = $d[$i] / $norm; }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Narrow an INTEGER-VALUED double array (the `q` column [[DotProduct]]
  * ranks on, |qᵢ| ≤ 127 by construction of the int8 scale) into a true
  * int8 payload: one signed byte per component. 8× smaller than
  * array<double> — at 100 TB of candidate vectors that factor is the
  * shuffle/cache/memory-bandwidth budget of the quantized ranking stage.
  * Rounding stays OUT of this expression on purpose: quantization
  * semantics live in one place (`round(v/s)` upstream), packing is a
  * pure exact narrowing, so the byte dot is bit-equal to the double dot
  * by construction. A component outside [-128, 127] or a null element →
  * null vector (never a silent wrap). */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    VectorKernels.packInt8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.VectorKernels.packInt8($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer dot product over two int8-packed vectors ([[PackInt8]] output):
  * one fused multiply-add loop over raw bytes, whole-stage-codegen'd.
  * |dot| ≤ 127²·dims ≪ 2⁶³, so the long accumulator is exact; mismatched
  * lengths → null (same policy as [[DotProduct]]). */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null
    else {
      var acc = 0L
      var i = 0
      while (i < x.length) { acc += x(i).toLong * y(i).toLong; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += (long) $a[$i] * (long) $b[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Quantized sparse dot product over two per-doc term vectors — r14, the
  * exact-verify stage of text_tfidf_cosine_pairs.
  *
  * HARD PRECONDITION (r15, from the r14 advisor — the kernel trusts, it
  * does not check): each input is array<struct<word string, wn double>>
  * SORTED ascending by word, with UNIQUE words and NO null elements or
  * null words. `sort_array(collect_list(struct(word, wn)))` over a
  * (doc, word)-grain relation — the termFreqs grain — produces exactly
  * this shape (collect_list drops nothing, struct() is non-null, the
  * grain makes words unique). An unsorted or duplicated input returns a
  * silently wrong dot (the merge-intersect skips matches); a null
  * element or null word NPEs in getStruct/getUTF8String. Callers not
  * building inputs through that recipe must sanitize first. One merge-intersect loop
  * accumulates Σ floor(wa·wb·10¹²) as an exact long over the words present
  * in BOTH vectors — term for term the same floor-quantized products the
  * old (candidate ⋈ postings ⋈ postings → groupBy pair) shape summed, so
  * cosines are bit-identical while the pair×term-grain exchanges disappear
  * (the dot is a map-side expression on pair-grain rows). Long addition is
  * order-free; the merge order is ascending word either way. */
case class SparseQDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sparseQDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.sparseQDot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {
  /** merge-intersect kernel for [[SparseQDot]]: both arrays sorted by the
    * struct's first (word) field, words unique per array. */
  def sparseQDot(x: ArrayData, y: ArrayData): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < nx && j < ny) {
      val rx = x.getStruct(i, 2)
      val ry = y.getStruct(j, 2)
      val c = rx.getUTF8String(0).compareTo(ry.getUTF8String(0))
      if (c == 0) {
        // exactly floor(wa * wb * 1e12) cast long — the Spark built-in's
        // double floor + truncating cast, reproduced bit for bit
        acc += math.floor(rx.getDouble(1) * ry.getDouble(1) * 1e12).toLong
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  /** shared eval/codegen kernel for [[PackInt8]]: null element or a value
    * outside int8 range (incl. non-integer doubles: the CAST truncates,
    * so a fractional input would silently change the dot) → null. */
  def packInt8(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = arr.getDouble(i)
      val b = d.toByte
      if (b.toDouble != d) return null // out of range or fractional
      out(i) = b
      i += 1
    }
    out
  }
}

object VectorFunctions {
  /** Idempotently register `graft_dot` with the session's function registry
    * so plans can use expr("graft_dot(a, b)"). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
