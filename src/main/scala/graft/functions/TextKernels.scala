package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The flat-loop kernels behind the native text/dedup expressions —
  * ONE definition serving BOTH execution modes: `nullSafeEval` calls
  * these directly (interpreted / fallback paths), and each expression's
  * `doGenCode` emits a single static call here (Scala top-level objects
  * expose static forwarders, so Janino-generated Java reaches them
  * without `$.MODULE$` plumbing). That keeps the expressions inside
  * whole-stage codegen — no per-row `eval()` dispatch, no interpreted
  * child evaluation — while the loop logic stays in ordinary JIT-friendly
  * Scala instead of string-templated Java. Semantics are byte-identical
  * to the pre-codegen forms (ExpressionsSpec pins them).
  */
object TextKernels {

  private val sep = UTF8String.fromString(" ")

  /** all word n-grams of a token array; a window containing a null token
    * yields NO shingle (the lead()-based formulation null-poisons and
    * drops it; concatWs would silently emit a SHORTENED n-gram). */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val out = total - n + 1
    if (out <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val res = new scala.collection.mutable.ArrayBuffer[Any](out)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i < out) {
        var k = 0
        var ok = true
        while (k < n) {
          if (toks.isNullAt(i + k)) ok = false
          else window(k) = toks.getUTF8String(i + k)
          k += 1
        }
        if (ok) res += UTF8String.concatWs(sep, window.toIndexedSeq: _*)
        i += 1
      }
      new GenericArrayData(res.toArray)
    }
  }

  /** all character n-grams of a string, code-point indexed exactly like
    * SQL substring(text, i, n) / DuckDB substr — ONE pass precomputes
    * the char→byte offset table, so the whole gram set is O(bytes)
    * instead of substring's O(pos) re-scan per gram. Empty array (not
    * an error) when the string is shorter than n. */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val nChars = s.numChars()
    val out = nChars - n + 1
    if (out <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val bytes = s.getBytes
      val offs = new Array[Int](nChars + 1)
      var i = 0
      var c = 0
      while (i < bytes.length && c < nChars) {
        offs(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      offs(nChars) = bytes.length
      val res = new Array[Any](out)
      var g = 0
      while (g < out) {
        res(g) = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, offs(g), offs(g + n)))
        g += 1
      }
      new GenericArrayData(res)
    }
  }

  /** consecutive `n`-word blocks of a token array (last block may be
    * partial), each joined by single spaces — the line-dedup block
    * splitter ([[graft.llm.LineDedup]]). Null tokens are skipped within
    * their block, mirroring `array_join`'s null-skip in the HOF form
    * this replaces (tokens from `split()` are never null in practice). */
  def wordBlocks(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val nb = (total + n - 1) / n
    val res = new Array[Any](nb)
    val window = new Array[UTF8String](n)
    var b = 0
    while (b < nb) {
      val start = b * n
      val len = math.min(n, total - start)
      var k = 0
      var kept = 0
      while (k < len) {
        if (!toks.isNullAt(start + k)) {
          window(kept) = toks.getUTF8String(start + k)
          kept += 1
        }
        k += 1
      }
      res(b) = UTF8String.concatWs(sep, scala.collection.immutable.ArraySeq
        .unsafeWrapArray(java.util.Arrays.copyOfRange(window, 0, kept)): _*)
      b += 1
    }
    new GenericArrayData(res)
  }

  /** per-document term frequencies, first-occurrence order; null tokens
    * are absent (matching the exploded form's null-drop). */
  def tokenCounts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        val prev = m.get(w)
        if (prev == null) m.put(w.clone(), java.lang.Long.valueOf(1L))
        else m.put(w, java.lang.Long.valueOf(prev.longValue() + 1L))
      }
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue.longValue()))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** k minhashes of a shingle array; null for empty/all-null input (the
    * exploded formulation produced no rows for such documents). */
  def minHashSig(arr: ArrayData, k: Int, mult: Long, mod: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) null
    else {
      val mins = Array.fill(k)(Long.MaxValue)
      var any = false
      var s = 0
      while (s < n) {
        if (!arr.isNullAt(s)) {
          any = true
          val str = arr.getUTF8String(s).toString
          var h = 0L
          var c = 0
          while (c < str.length) { h = (h * mult + str.charAt(c)) % mod; c += 1 }
          var i = 0
          while (i < k) {
            val v = ((2 * i + 3) * h + (5 * i + 7)) % mod
            if (v < mins(i)) mins(i) = v
            i += 1
          }
        }
        s += 1
      }
      if (!any) null else new GenericArrayData(mins.map(x => x: Any))
    }
  }

  /** the `bits` tf-weighted SimHash component sums of a shingle array
    * (iterating duplicates IS the tf weighting); null for empty input. */
  def simHashVec(arr: ArrayData, bits: Int, mult: Long, mod: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) null
    else {
      val v = new Array[Long](bits)
      var any = false
      var s = 0
      while (s < n) {
        if (!arr.isNullAt(s)) {
          any = true
          val str = arr.getUTF8String(s).toString
          var h = 0L
          var c = 0
          while (c < str.length) { h = (h * mult + str.charAt(c)) % mod; c += 1 }
          val t = (h * 737L + 97L) % mod
          var j = 0
          while (j < bits) {
            v(j) += (((t >> j) & 1L) * 2L - 1L)
            j += 1
          }
        }
        s += 1
      }
      if (!any) null else new GenericArrayData(v.map(x => x: Any))
    }
  }

  /** Byte-level SimHash ("phash" stand-in for binary media payloads):
    * one pass over the UNSIGNED byte `width`-grams of a binary payload.
    * Gram id via the base-256 Horner fold v = (v·256 + b) mod `mod`
    * (the [[StringPolyHash]] recurrence on bytes — keeps every
    * intermediate < 2³⁹ so the DuckDB mirror's int64 arithmetic can
    * reproduce it verbatim; a raw big-endian window overflows at
    * width ≥ 8), thash = (737·v + 97) mod `mod` (the [[simHashVec]]
    * mixing step), component j accumulates bitⱼ(thash)·2 − 1 over
    * every occurrence (duplicates ARE the tf weighting), and the
    * returned long has bit j set iff the component sum is positive.
    * Locality-sensitive on byte streams: a small payload edit perturbs
    * only the grams that overlap it, so near-identical encodings land
    * at small hamming distance; width 16 makes grams doc-specific
    * enough that unrelated same-vocabulary docs sit near the random
    * midpoint (measured: cross-pair mean 15.4/32 vs variant mean 0.8).
    * Null when the payload is shorter than `width`. */
  /** Content-defined chunk lengths (FastCDC-style, unbounded variant):
    * a chunk boundary falls AFTER position i when the mixed Horner hash
    * of the `width`-gram ending at i satisfies hash % `divisor` == 0 —
    * the same (v·737 + 97) mod p mixing as [[simHashBytes]], so the
    * boundary decision depends only on the local byte window and
    * re-synchronizes after edits (the property that makes CDC chunks
    * dedup-friendly where fixed-size chunks shift). Returns the chunk
    * lengths in order (sum == payload length); a payload shorter than
    * `width` is one chunk. Expected chunk length ≈ `divisor` bytes. */
  def cdcChunkLens(b: Array[Byte], width: Int, divisor: Long,
      mod: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var i = width - 1
    while (i < b.length) {
      var v = 0L
      var k = i - width + 1
      while (k <= i) { v = (v * 256L + (b(k) & 0xffL)) % mod; k += 1 }
      if ((v * 737L + 97L) % mod % divisor == 0L) {
        lens += (i + 1 - start).toLong
        start = i + 1
      }
      i += 1
    }
    if (start < b.length || b.isEmpty) lens += (b.length - start).toLong
    new GenericArrayData(lens.toArray.map(x => x: Any))
  }

  /** Per-chunk content hashes for the [[cdcChunkLens]] boundaries: the
    * i-th element is the (·31 + b) mod `mod` Horner hash (the
    * [[StringPolyHash]] fold, on bytes) of the i-th content-defined
    * chunk. Identical boundary rule — one shared pass computes both
    * the boundary decision and the running chunk hash. */
  def cdcChunkHashes(b: Array[Byte], width: Int, divisor: Long,
      mod: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val hs = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var i = width - 1
    while (i < b.length) {
      var v = 0L
      var k = i - width + 1
      while (k <= i) { v = (v * 256L + (b(k) & 0xffL)) % mod; k += 1 }
      if ((v * 737L + 97L) % mod % divisor == 0L) {
        var h = 0L
        var j = start
        while (j <= i) { h = (h * 31L + (b(j) & 0xffL)) % mod; j += 1 }
        hs += h
        start = i + 1
      }
      i += 1
    }
    if (start < b.length || b.isEmpty) {
      var h = 0L
      var j = start
      while (j < b.length) { h = (h * 31L + (b(j) & 0xffL)) % mod; j += 1 }
      hs += h
    }
    new GenericArrayData(hs.toArray.map(x => x: Any))
  }

  def simHashBytes(b: Array[Byte], width: Int, bits: Int,
      mod: Long): java.lang.Long = {
    val n = b.length - width + 1
    if (n <= 0) return null
    val acc = new Array[Long](bits)
    var i = 0
    while (i < n) {
      var v = 0L
      var k = 0
      while (k < width) { v = (v * 256L + (b(i + k) & 0xffL)) % mod; k += 1 }
      val t = (v * 737L + 97L) % mod
      var j = 0
      while (j < bits) { acc(j) += ((t >> j) & 1L) * 2L - 1L; j += 1 }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < bits) { if (acc(j) > 0) h |= 1L << j; j += 1 }
    java.lang.Long.valueOf(h)
  }
}
