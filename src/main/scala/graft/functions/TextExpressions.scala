package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Native word-n-gram expression (tier-5 escape hatch, SURVEY.md §4).
  *
  * The composable form — transform(sequence(...), i -> concat_ws(...,
  * element_at(toks, i), …)) — is correct but interpreted per element
  * (higher-order functions are CodegenFallback) and costs ~3 µs per
  * shingle; at 100 TB of documents the shingle builder IS the dedup
  * pipeline's map-side budget. This expression emits all n-grams of the
  * token array in one flat loop over ArrayData ([[TextKernels.wordNgrams]])
  * and participates in whole-stage codegen: `doGenCode` emits ONE static
  * kernel call per row — no per-row `eval()` dispatch, no interpreted
  * child evaluation (round 5; previously CodegenFallback).
  *
  * Output order and content are identical to the HOF form, so DuckDB
  * oracles (window-lead formulation) keep matching.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.wordNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All character n-grams of a string in one codegen'd flat loop
  * ([[TextKernels.charNgrams]]) — replaces the interpreted
  * transform(sequence(1, len−n+1), i → substring(text, i, n)) HOF whose
  * per-gram lambda dispatch (plus substring's O(pos) re-scan) dominates
  * a corpus-wide character-statistics pass. Output is identical to the
  * HOF form (ExpressionsSpec pins it), so DuckDB substr oracles keep
  * matching. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"CharNgrams needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.charNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.charNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Consecutive `n`-word blocks of a token array (last may be partial),
  * each joined by single spaces — the map-side splitter of the
  * line-level dedup family ([[graft.llm.LineDedup]]). Replaces the
  * interpreted transform(sequence(…), i → array_join(slice(…))) HOF
  * chain (three lambdas per block) with one flat codegen'd loop
  * ([[TextKernels.wordBlocks]]); at 100 TB of documents the block
  * builder is the operator's entire map-side budget. Output is
  * byte-identical to the HOF form (Round8Spec pins it). */
case class WordBlocks(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"WordBlocks needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordBlocks(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.wordBlocks($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term frequencies in one pass: token array →
  * array<struct<word, cnt>> with first-occurrence order (deterministic).
  *
  * Token counting inside a document is doc-local work — it needs no
  * shuffle by definition. The explode → groupBy(doc_id, word) form still
  * ships every token OCCURRENCE through an exchange; exploding this
  * map-side result instead ships one row per DISTINCT (doc, word), which
  * is what every downstream consumer (tf-idf, df, lexicon join, language
  * profiles) actually keys on. At 100 TB that cuts the first text-stage
  * shuffle by the average within-doc repetition factor. Codegen'd via a
  * static [[TextKernels.tokenCounts]] call (round 5).
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("word", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.tokenCounts($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All k minhashes of a shingle ARRAY in one flat pass — map-side, per
  * document, no explode and no groupBy(doc) shuffle.
  *
  * mhᵢ = min over shingles s of hᵢ(polyhash(s)), hᵢ(x) = ((2i+3)x+5i+7) mod p
  * — exactly the exploded formulation the DuckDB oracle mirrors; min is
  * idempotent under duplicates, so the RAW (non-distinct) n-gram array
  * feeds it directly. Returns null for an empty/absent shingle array so
  * sub-n-token documents drop out, matching the exploded form where they
  * simply produce no rows.
  *
  * At 100 TB this moves the whole signature phase from a
  * (docs × shingles)-row explode + shuffle to a per-doc map — the only
  * remaining shuffle in MinHash-LSH is the tiny (band, sig) equi-join.
  * Codegen'd via a static [[TextKernels.minHashSig]] call (round 5);
  * the kernel may return null (empty array), so generated code updates
  * `isNull` after the call.
  */
case class MinHashSig(child: Expression, k: Int = 16, mult: Long = 31L,
    mod: Long = 2147483647L) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.minHashSig(input.asInstanceOf[ArrayData], k, mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TextKernels.minHashSig($c, $k, ${mult}L, ${mod}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The 32 tf-weighted SimHash component sums of a shingle ARRAY in one
  * flat pass: vⱼ = Σ over OCCURRENCES of (bitⱼ(thash)·2−1), where
  * thash = (737·polyhash(s)+97) mod p. Iterating the raw array (with
  * duplicates) IS the tf weighting — identical to the exploded
  * groupBy(doc,bg).count() formulation the DuckDB oracle mirrors.
  * Null for an empty array (doc shorter than the n-gram width).
  * Codegen'd via a static [[TextKernels.simHashVec]] call (round 5).
  */
case class SimHashVec(child: Expression, bits: Int = 32, mult: Long = 31L,
    mod: Long = 2147483647L) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.simHashVec(input.asInstanceOf[ArrayData], bits, mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TextKernels.simHashVec($c, $bits, ${mult}L, ${mod}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

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
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
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

/** Byte-level SimHash of a BINARY payload ("phash" stand-in for media
  * blobs — see [[TextKernels.simHashBytes]]): the 32-bit
  * locality-sensitive fingerprint behind `multimodal_phash_dedup`,
  * computed in one codegen'd pass over the unsigned byte `width`-grams.
  * The DuckDB oracle reproduces it arithmetically (ascii() per position
  * on the pure-ASCII corpus, identical 737·v + 97 mod p mixing).
  * Null for payloads shorter than `width`. */
case class SimHashBytes(child: Expression, width: Int = 4, bits: Int = 32,
    mod: Long = 2147483647L) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.simHashBytes(input.asInstanceOf[Array[Byte]], width, bits, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long ${ev.value}_r =
         |  graft.functions.TextKernels.simHashBytes($c, $width, $bits, ${mod}L);
         |${ev.isNull} = ${ev.value}_r == null;
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_r.longValue();
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk lengths of a BINARY payload
  * ([[TextKernels.cdcChunkLens]]): FastCDC-style boundaries from the
  * local `width`-gram Horner hash, codegen'd one pass per row. The
  * DuckDB oracle reproduces boundaries arithmetically (per-position
  * Horner over ascii on the pure-ASCII corpus). */
case class CdcChunkLens(child: Expression, width: Int = 8,
    divisor: Long = 64L, mod: Long = 2147483647L) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.cdcChunkLens(input.asInstanceOf[Array[Byte]], width, divisor,
      mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TextKernels.cdcChunkLens(
         |  $c, $width, ${divisor}L, ${mod}L);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-chunk content hashes aligned with [[CdcChunkLens]] boundaries
  * ([[TextKernels.cdcChunkHashes]]) — the chunk-level signature that
  * powers rsync/backup-style shared-content detection across binary
  * payloads. Codegen'd single pass. */
case class CdcChunkHashes(child: Expression, width: Int = 8,
    divisor: Long = 64L, mod: Long = 2147483647L) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.cdcChunkHashes(input.asInstanceOf[Array[Byte]], width,
      divisor, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.TextKernels.cdcChunkHashes(
         |  $c, $width, ${divisor}L, ${mod}L);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
