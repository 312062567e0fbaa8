package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Native Bloom-filter pair for runtime semi-join reduction — the
  * "sideways information passing" pattern a 100 TB join lives on: build a
  * compact bit-set summary of the (already filtered, still too large to
  * broadcast as an exact set) dim-side join keys, broadcast THAT, and
  * drop fact rows map-side BEFORE they pay the join shuffle. The real
  * join afterwards restores exactness — a Bloom filter has no false
  * negatives, so the prefilter can only remove rows the join would have
  * dropped anyway; false positives merely ride through to the join.
  *
  * Spark's own adaptive runtime filters (InjectRuntimeFilter) do this
  * opportunistically and only under conf-gated heuristics; the declared
  * `join_bloom_reduced` query pins the shape explicitly so it survives
  * conf drift and is PlanSpec-assertable.
  *
  * Determinism: the filter's bit layout depends only on (numBits,
  * numHashes) and the KEY SET — bit-OR merging is commutative and
  * associative, so partitioning cannot change the final bit array, and
  * `BloomMightContain` is a pure function of (filter, key). Query
  * results stay deterministic regardless of partition order — and the
  * oracle is simply the SAME query without the prefilter.
  *
  * Sizing is the caller's contract (bits/key ≈ 10 → ~1% false positives
  * with k = 7); both parameters are embedded in the serialized filter so
  * the probe side cannot silently disagree with the build side.
  */
object BloomKernels {
  /** SplitMix64 finalizer — a full-avalanche 64-bit mixer (public-domain
    * constant set from the SplitMix64 PRNG). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Kirsch–Mitzenmacher double hashing: bit_j = (h1 + j·h2) mod numBits. */
  private def bitIndex(h1: Long, h2: Long, j: Int, numBits: Int): Int =
    (((h1 + j.toLong * h2) & Long.MaxValue) % numBits).toInt

  def setBits(words: Array[Long], numHashes: Int, numBits: Int, key: Long): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L // odd → full-period stride
    var j = 0
    while (j < numHashes) {
      val b = bitIndex(h1, h2, j, numBits)
      words(b >>> 6) |= (1L << (b & 63))
      j += 1
    }
  }

  /** Probe a serialized filter (layout: [int numHashes][long words…], big
    * endian). Shared by interpreted eval and generated code — runs once
    * per FACT ROW inside the codegen'd scan filter, so it reads the raw
    * byte array directly (no ByteBuffer view, zero allocations): for bit
    * p of word w, the big-endian byte is `7 − p/8` within w's 8 bytes
    * and the in-byte mask is `1 << (p % 8)` — one byte load per hash. */
  def mightContain(bloom: Array[Byte], key: Long): Boolean = {
    val numHashes = ((bloom(0) & 0xFF) << 24) | ((bloom(1) & 0xFF) << 16) |
      ((bloom(2) & 0xFF) << 8) | (bloom(3) & 0xFF)
    val numBits = (bloom.length - 4) * 8
    val h1 = mix(key)
    val h2 = mix(key ^ 0xC2B2AE3D27D4EB4FL) | 1L
    var j = 0
    while (j < numHashes) {
      val b = bitIndex(h1, h2, j, numBits)
      val p = b & 63
      val byteAt = 4 + (b >>> 6) * 8 + (7 - (p >>> 3))
      if ((bloom(byteAt) & (1 << (p & 7))) == 0) return false
      j += 1
    }
    true
  }

  def toBytes(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + words.length * 8).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

/** Bloom-build aggregate over a LONG key column: fixed `numBits`-bit
  * buffer per partition (a plain long array — update is two shifts and
  * an OR per hash), bit-OR merge, BINARY result with the probe
  * parameters in the header. Nulls are skipped: a null key never joins,
  * so it has nothing to contribute to a join prefilter. */
case class BloomBuild(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 32,
    s"numHashes must be in [1, 32], got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a bigint key column, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.setBits(buf, numHashes, numBits, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomKernels.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomKernels.toBytes(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.getInt() // numHashes — fixed by this instance's parameters
    val words = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** Probe: does the filter (left, BINARY from [[BloomBuild]]) possibly
  * contain the key (right, LONG)? False ⇒ definitely absent. Stays in
  * whole-stage codegen — the fact-side scan keeps its single fused stage
  * with the probe inlined as a static call. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires (binary, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true // null filter or null key → null
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(bloom: Any, key: Any): Any =
    BloomKernels.mightContain(bloom.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, k) =>
      s"${ev.value} = graft.functions.BloomKernels.mightContain($b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points.
  *
  * PROBE-SHAPE TRAP: feeding [[bloomMightContain]] a bloom column from
  * `crossJoin(broadcast(1-row agg))` makes the probe a filter that
  * references BOTH cross-join sides — the optimizer pushes it into the
  * join and the plan becomes a CONDITIONED BroadcastNestedLoopJoin,
  * whose condition is evaluated interpreted row-at-a-time (the
  * outlier_remove lesson, ~10×). The scale-correct shape is Spark's own
  * runtime-filter one: the filter value arrives as a SCALAR SUBQUERY
  * (one tiny job, result inlined as a literal), so the probe stays a
  * codegen'd `Filter` fused into the fact scan — [[register]] exposes
  * both expressions to SQL for exactly that form (see the declared
  * `join_bloom_reduced` query). */
object BloomFunctions {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate a long key column into a serialized Bloom filter.
    * `numBits` ≈ 10 × expected keys and `numHashes` = 7 give ~1% false
    * positives; the parameters ride inside the binary so probes always
    * agree with the build. */
  def bloomBuild(key: Column, numBits: Int, numHashes: Int = 7): Column =
    ColumnBridge.column(
      BloomBuild(ColumnBridge.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a [[bloomBuild]] filter column (see the
    * probe-shape note above: hand it a scalar-subquery/literal bloom,
    * not a cross-joined column). */
  def bloomMightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(key)))

  /** Idempotently register the SQL forms `graft_bloom_build(key, numBits,
    * numHashes)` / `graft_bloom_might_contain(bloom, key)` — the analyzer
    * wraps the bare aggregate in an AggregateExpression on resolution,
    * and a scalar subquery over `graft_bloom_build` is the codegen-safe
    * probe feed. Sizing arguments must be integer literals. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_build", exprs => BloomBuild(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
  }
}
