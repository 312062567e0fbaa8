package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Jaro-Winkler kernel shared by the interpreted and codegen paths.
  *
  * Semantics are pinned to the DuckDB `jaro_winkler_similarity` variant so
  * the oracle gate can compare raw doubles bit-for-bit (verified on 146k
  * part-name/document pairs before this landed):
  *   - either side empty → 0.0 (NOT the textbook 1.0 for empty==empty);
  *   - Jaro match window = max(len)/2 − 1, greedy left-to-right matching,
  *     transpositions counted over matched sequences;
  *   - the Winkler prefix bonus (common prefix capped at 4, p = 0.1)
  *     applies ONLY when jaro > 0.7 (the boost threshold) — below it the
  *     plain Jaro similarity is returned.
  *
  * All arithmetic is the fixed IEEE expression tree
  * (m/l1 + m/l2 + (m−t)/m)/3 then j + l·0.1·(1−j), identical in both
  * engines, so no rounding discipline is needed on the output.
  *
  * Comparison runs over UTF-16 code units (Java chars), which equal
  * codepoints for ASCII/BMP text — the same convention as
  * [[StringPolyHash]].
  */
object StringSimKernels {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    // Clamp to 0: when both strings are length 1 the textbook formula
    // gives −1 and the match window collapses to empty, which would make
    // jw("a","a") = 0.0 — DuckDB (and every JW implementation) returns
    // 1.0 there. Clamping only affects the max(l1,l2) == 1 case.
    val matchDist = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(i + matchDist + 1, l2)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Full (unrestricted) Damerau-Levenshtein distance — Lowrance-Wagner,
    * NOT the restricted optimal-string-alignment variant. Pinned to
    * DuckDB's `damerau_levenshtein`, which is also the full form:
    * DL("CA","ABC") = 2 (delete B after transposing, reusing the moved
    * block) where OSA gives 3 — probed directly against DuckDB before
    * landing, along with the ("ab","ba")=1, ("teh","the")=1,
    * ("xabx","xbax")=1 transposition family that plain levenshtein
    * scores 2.
    *
    * Output is integral, so no cross-engine float discipline applies.
    * O(l1·l2) time/space per pair over UTF-16 code units (same
    * convention as [[jaroWinkler]]); at scale the blocking key bounding
    * the PAIR count is the lever, not the per-pair kernel. */
  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val inf = l1 + l2
    // d is offset by +1: d(i+1)(j+1) covers prefixes s1[0,i) / s2[0,j),
    // with an extra -1 rank of `inf` sentinels for the transposition
    // lookback d(k)(l) when no prior occurrence exists (k = l = 0).
    val d = Array.ofDim[Int](l1 + 2, l2 + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= l1) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= l2) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // da: char -> last row index (1-based) where it appeared in s1
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0 // last column j' < j with s1(i-1) == s2(j'-1)
      j = 1
      while (j <= l2) {
        val kBoxed = da.get(s2.charAt(j - 1))
        val k = if (kBoxed == null) 0 else kBoxed.intValue()
        val l = db
        var cost = 1
        if (s1.charAt(i - 1) == s2.charAt(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, math.min(ins, del)), trans)
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d(l1 + 1)(l2 + 1)
  }
}

/** Native Jaro-Winkler similarity (tier-5 escape hatch, SURVEY.md §4).
  *
  * Spark ships `levenshtein` but no Jaro-Winkler, which is THE standard
  * fuzzy-key matcher for short identity-ish strings (names, addresses,
  * product titles) — edit distance over-penalizes transpositions exactly
  * where human typos concentrate. A Scala UDF would work but drops out of
  * whole-stage codegen and re-boxes both strings per call; this expression
  * emits one static [[StringSimKernels.jaroWinkler]] call per row inside
  * the generated loop, so a blocked O(block²) candidate pass stays
  * CPU-bound on the kernel itself. The kernel is O(len²) in the worst
  * case but len is a short key string; the SCALE lever for the operator
  * is the blocking key bounding the pair count, not the per-pair cost.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernels.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native full Damerau-Levenshtein distance (tier-5 escape hatch,
  * SURVEY.md §4). Spark ships `levenshtein` only; Damerau's adjacent
  * transposition is the single most common human typo class ("teh"),
  * which plain edit distance double-charges. Same codegen shape as
  * [[JaroWinkler]]: one static kernel call per row inside the generated
  * loop, no UDF boxing. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimKernels.damerauLevenshtein($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
