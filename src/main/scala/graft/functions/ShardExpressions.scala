package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Expression, SortOrder, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, LazilyGeneratedOrdering}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** Map-side monotone shard assignment for the single-exchange distributed
  * prefix-sum kernels (graft.llm.RangeShards / Chunking):
  * `shard(key) = values(#boundaries <= key)` — a binary search over a
  * driver-computed, broadcast-by-reference array of sorted splitter keys.
  *
  * This replaces the kernels' old `repartitionByRange + spark_partition_id()`
  * shard id, whose boundaries lived only inside a sampled physical exchange:
  * because the assignment here is a PURE FUNCTION of the row's key columns,
  * every plan branch (offsets aggregate, window pass) computes identical
  * shard ids by construction — no exchange-reuse invariant, no
  * localCheckpoint fallback for wide rows — and the range exchange itself
  * disappears from the plan (guide §2.4: one hash exchange on the
  * precomputed shard id is the only full-data shuffle left).
  *
  * Contract (enforced by the builder, [[graft.llm.RangeShards]]):
  * `searcher.boundaries` strictly increasing under the key struct's natural
  * (null-first ascending) ordering; `searcher.values` monotone increasing
  * with length = boundaries.length + 1. Monotone values keep
  * `orderBy(__shard)` order-faithful; the specific values are chosen so
  * `pmod(murmur3(v), nShards)` is a bijection — each shard owns exactly one
  * post-repartition partition, the 1:1 layout the range exchange used to
  * give (guide §2.5: never hash-partition on a synthetic key with as many
  * distinct values as partitions — collisions leave some partitions empty
  * and others doubled).
  *
  * Codegen stays whole-stage: the generated code calls the searcher kernel
  * through a reference object (the SparseQDot pattern); the per-row cost is
  * ~log2(shards) generated-ordering struct compares.
  */
case class BoundaryShard(child: Expression, searcher: ShardSearcher)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  // struct(cols) is never null (fields may be; the ordering handles them)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(key: Any): Any =
    searcher.shardOf(key.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardSearcher", searcher,
      classOf[ShardSearcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.shardOf($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Binary-search kernel behind [[BoundaryShard]] — serializable so the
  * boundary array ships to executors inside the expression (a few KB:
  * ≤ shards−1 slim key rows). The ordering is codegen-generated lazily on
  * each JVM (orderings are not serializable; the schema is). */
final class ShardSearcher(
    val keyType: StructType,
    val boundaries: Array[InternalRow],
    val values: Array[Int]) extends Serializable {
  require(values.length == boundaries.length + 1,
    s"values (${values.length}) must be boundaries (${boundaries.length}) + 1")

  @transient private lazy val ord: Ordering[InternalRow] =
    ShardSearcher.orderingFor(keyType)

  def ordering: Ordering[InternalRow] = ord

  /** values(first index j with key < boundaries(j); boundaries.length if
    * none) — i.e. the shard value of the run the key's rank falls in. */
  def shardOf(key: InternalRow): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(boundaries(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    values(lo)
  }
}

object ShardSearcher {
  /** codegen'd ascending-nulls-first row ordering over all fields of
    * `keyType` — the natural ordering repartitionByRange used. */
  def orderingFor(keyType: StructType): Ordering[InternalRow] =
    new LazilyGeneratedOrdering(keyType.fields.toSeq.zipWithIndex.map {
      case (f, i) => SortOrder(BoundReference(i, f.dataType, f.nullable), Ascending)
    })
}
