package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitters sketch: approximate top values of a
  * string column with at most `capacity` counters of state, as a
  * distributive Catalyst aggregate.
  *
  * Why it exists: exact `profile_topk_values` shuffles one row per
  * DISTINCT (group, value) — correct, but a skewed 100 TB categorical
  * column (URLs, user agents, raw tokens) can hold billions of distinct
  * values per group, and the full-width shuffle becomes the job. This
  * aggregate keeps a bounded `capacity`-entry summary per PARTITION
  * (classic Misra–Gries update), merges summaries per group (the
  * mergeable-summaries reduction: add counts, then subtract the
  * (capacity+1)-th largest and drop non-positive), so the shuffle carries
  * at most `capacity` rows per (partition, group) no matter the value
  * cardinality — the same partial-aggregate shape as a native sum.
  *
  * Guarantee (Misra–Gries 1982; merge bound per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with n non-null rows in the group,
  * every counter reports `true_count − n/(capacity+1) ≤ est ≤ true_count`,
  * and every value with `true_count > n/(capacity+1)` is PRESENT in the
  * summary. Which low-frequency values also appear — and their exact
  * `est` — depends on encounter order, so the raw sketch is
  * nondeterministic under re-partitioning; deterministic CONSUMPTION
  * means thresholding against the guarantee (see the
  * `profile_topk_approx` declared query) or treating est as a bounded
  * estimate, never hash-comparing raw sketches.
  *
  * Output: `array<struct<item string, est long>>` sorted by (est desc,
  * item asc); at most `capacity` entries; empty array for an all-null
  * group (never null).
  */
case class MisraGriesTopK(child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, "MisraGriesTopK needs capacity >= 1")

  // counters key on strings — fail at ANALYSIS for anything else (the
  // SketchFunctions entry point casts, so non-string categoricals still
  // work there; a raw non-string child would otherwise die with a
  // ClassCastException deep inside executor-side aggregation)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries_topk requires a string column, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries_topk"

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long](capacity * 2)

  override def update(buf: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  /** MG add: bump an existing counter, open one if below capacity,
    * otherwise insert and run the (capacity+1)-th-largest reduction
    * (for weight 1 that is the classic "decrement all by 1"). */
  private def add(buf: java.util.HashMap[UTF8String, Long],
      key: UTF8String, w: Long): Unit = {
    val cur = buf.get(key)
    if (cur != 0L || buf.containsKey(key)) buf.put(key, cur + w)
    else {
      // clone: the UTF8String handed to eval may point into a reused
      // UnsafeRow buffer; storing it un-copied corrupts the summary
      buf.put(key.clone(), w)
      if (buf.size() > capacity) reduce(buf)
    }
  }

  /** subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive ones — leaves ≤ capacity entries. */
  private def reduce(buf: java.util.HashMap[UTF8String, Long]): Unit = {
    val counts = new Array[Long](buf.size())
    val it0 = buf.values().iterator()
    var i = 0
    while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(counts)
    // (capacity+1)-th largest = index size-(capacity+1) ascending
    val t = counts(counts.length - (capacity + 1))
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - t
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def merge(buf: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (cur != 0L || buf.containsKey(e.getKey)) buf.put(e.getKey, cur + e.getValue)
      else buf.put(e.getKey, e.getValue) // already owned copies (deserialized/cloned)
    }
    if (buf.size() > capacity) reduce(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(item, est)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[UTF8String, Long](capacity * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

/** Column-level entry points for the sketch aggregates. */
object SketchFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Misra–Gries heavy-hitters aggregate: at most `capacity` (item, est)
    * counters of state per group; see [[MisraGriesTopK]] for the
    * estimate/presence guarantees and the order-dependence caveat.
    * Non-string categoricals are cast to string here (the cast of a
    * string column is a no-op the optimizer removes). Use inside
    * `groupBy(...).agg(...)`. */
  def misraGries(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(c.cast("string")), capacity)
        .toAggregateExpression())
}
