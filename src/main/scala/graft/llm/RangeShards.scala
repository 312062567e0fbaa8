package graft.llm

import graft.functions.{BoundaryShard, ShardSearcher}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StructType

/** Deterministic map-side range sharding — the builder behind the
  * single-exchange rework of the distributed prefix-sum kernels
  * ([[Chunking.distributedRunningSums]] and friends).
  *
  * The old kernels split the global (part, order) order with
  * `repartitionByRange` and read the shard id off `spark_partition_id()`.
  * That shape pays TWO full-data exchanges — the range exchange, then the
  * window's hash exchange on (part, __shard), which Catalyst cannot elide
  * because it can't know partition ids are stable — and its correctness
  * leaned on exchange reuse (both plan branches had to observe the SAME
  * sampled boundaries; wide rows forced a localCheckpoint).
  *
  * Here the boundaries are computed ONCE, deterministically, on the driver,
  * and the shard id becomes a pure map-side function of the key columns
  * ([[graft.functions.BoundaryShard]]):
  *
  *  1. SAMPLE: the `shards × SamplesPerShard` keys with the smallest
  *     `xxhash64(key)` — a TakeOrdered over the slim key projection, no
  *     exchange. Hashing VALUES (not positions or `rand()`) makes the
  *     sample a pure function of the data: independent of partitioning,
  *     parallelism, and retries (guide §2.5's determinism rule), so every
  *     branch, run, and re-run sees identical boundaries.
  *  2. SPLIT: sort + dedup the sample under the key's natural null-first
  *     ascending ordering, take `shards − 1` evenly spaced splitters
  *     (strictly increasing; fewer when the key space is small — shards
  *     only gate parallelism, never the result, which is
  *     shard-count-invariant by the kernels' offset+local algebra).
  *  3. VALUES: shard k gets the k-th smallest int whose
  *     `pmod(murmur3(int), shards)` is fresh — increasing (so
  *     `orderBy(__shard)` still orders by rank) AND hash-bijective, so the
  *     kernels' `repartition(shards, __shard)` lands each shard in its own
  *     partition: the exact 1:1 shard→partition layout the range exchange
  *     used to give, without the collision skew a plain 0..n-1 id would
  *     have (guide §2.5).
  *
  * Cost model vs the old shape: one bounded sample job (the range
  * exchange's RangePartitioner ran a comparable sketch job over the same
  * input) and ONE full-data exchange instead of two. The sample is
  * value-uniform rather than row-uniform — a single pathologically hot key
  * can still fatten one shard, exactly as it did under RangePartitioner
  * (neither can split one key value).
  */
private[graft] object RangeShards {

  /** Conf: minimum estimated input bytes for the single-exchange
    * (boundary-sampled) path; below it the kernels keep the r14 range
    * path. The boundary sample is a separate Spark ACTION with ~0.2–0.3 s
    * of fixed planning/scheduling cost on this class of machine
    * (measured at sf0.1, any input size) — worth paying only when the
    * exchange it removes moves more bytes than that. 32 MB is the local
    * breakeven ballpark (two exchanges of ≤ 32 MB are page-cache memory
    * copies, cheaper than an extra job); every fact relation at
    * production scale clears it by orders of magnitude, so the
    * single-exchange form engages exactly where exchanges dominate
    * (guide §2.2). Override per session for experiments/clusters. */
  val SampleMinBytesConf = "spark.graft.shards.sampleMinBytes"
  val DefaultSampleMinBytes: Long = 32L * 1024 * 1024

  /** Is `df` cheap to traverse twice? TRUE for scan-chain plans
    * (project/filter over a leaf) — there the boundary-sample pass reads
    * only the pruned KEY columns and the single-exchange form wins
    * outright (it removes a FACT-sized exchange). FALSE for derived
    * inputs (aggregates, joins, windows, unions): those are usually
    * already shrunk far below the fact — the exchanges the new form
    * would remove are census-sized — while the separate sample action
    * would RECOMPUTE the whole derivation (scan + fact exchange), which
    * the r15 interleaved A/B measured at up to 1.6× the query
    * (analytics_abc_classification). Such inputs keep the r14 range
    * path, whose RangePartitioner sketch reads an already-materialized
    * AQE stage nearly for free. */
  def cheapSampleInput(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def ok(p: LogicalPlan): Boolean = p match {
      case _: Project | _: Filter | _: SubqueryAlias => p.children.forall(ok)
      case _: LeafNode => true
      case _ => false
    }
    ok(df.queryExecution.analyzed)
  }

  /** Full routing decision for the kernels: scan-chain shape AND a
    * size estimate that amortizes the sample action's fixed cost.
    * Unknown statistics (spark.sql.defaultSizeInBytes ≈ Long.Max — e.g.
    * a checkpointed LogicalRDD) route to the range path: at bench scale
    * those intermediates are small and the fixed cost dominates, while
    * file relations — the inputs that are actually fact-sized at
    * production scale — always carry real size estimates. */
  def singleExchangePath(df: DataFrame): Boolean =
    cheapSampleInput(df) && {
      val minBytes = df.sparkSession.conf
        .getOption(SampleMinBytesConf).map(_.toLong)
        .getOrElse(DefaultSampleMinBytes)
      val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
      sz >= minBytes && sz < BigInt(Long.MaxValue) / 2
    }

  /** sample keys per target shard: splitter rank error is ~rows/√samples;
    * 128/shard keeps shard-size spread under ~10% while the whole sample
    * stays a few thousand slim rows on the driver at any data scale. */
  val SamplesPerShard = 128

  /** The n smallest non-negative ints with pairwise-distinct
    * `pmod(murmur3hash(int), n)` — increasing by construction; coupon
    * collector terminates in ~n·ln(n) candidates. Evaluates Spark's OWN
    * partition-id expression (Murmur3Hash seed 42, the exact expression
    * HashPartitioning uses), so the bijection can't drift from the engine. */
  def bijectiveShardValues(n: Int): Array[Int] = {
    require(n >= 1, s"need n >= 1 shards, got $n")
    val out = new Array[Int](n)
    val seen = new Array[Boolean](n)
    var found = 0
    var s = 0
    while (found < n) {
      val h = new Murmur3Hash(Seq(Literal(s))).eval(InternalRow.empty)
        .asInstanceOf[Int]
      val pid = ((h % n) + n) % n
      if (!seen(pid)) { seen(pid) = true; out(found) = s; found += 1 }
      s += 1
    }
    out
  }

  /** Build the deterministic monotone shard column for `df` over `keyCols`
    * (ascending, nulls first — repartitionByRange's default order). Runs
    * the bounded sample job EAGERLY (one TakeOrdered action over the key
    * projection); the returned column is a pure function of the key
    * columns, valid on any DataFrame carrying them. */
  def shardColumn(df: DataFrame, keyCols: Seq[Column], nShards: Int): Column = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val key = struct(keyCols: _*)
    val keyed = df.select(key.as("__bkey"))
    val keyType = keyed.schema.head.dataType.asInstanceOf[StructType]
    val values = bijectiveShardValues(nShards)
    val searcher =
      if (nShards == 1) new ShardSearcher(keyType, Array.empty, values.take(1))
      else {
        val sampleK = nShards * SamplesPerShard
        // ties in xxhash64 (hash collisions, duplicate keys) are broken by
        // the key itself, so the first-K key SET is deterministic
        val rows = keyed
          .orderBy(xxhash64(col("__bkey")), col("__bkey"))
          .limit(sampleK)
          .collect()
        val conv = CatalystTypeConverters.createToCatalystConverter(keyType)
        val ord: Ordering[InternalRow] = ShardSearcher.orderingFor(keyType)
        val sorted = rows.iterator
          .map(r => conv(r.getStruct(0)).asInstanceOf[InternalRow])
          .toArray.sorted(ord)
        // dedup under the SEMANTIC ordering (object equality is unreliable
        // across InternalRow implementations)
        val distinctKeys = new scala.collection.mutable.ArrayBuffer[InternalRow]()
        sorted.foreach { r =>
          if (distinctKeys.isEmpty || ord.compare(distinctKeys.last, r) != 0)
            distinctKeys += r
        }
        val m = distinctKeys.length
        val splitters = new scala.collection.mutable.ArrayBuffer[InternalRow]()
        var i = 1
        while (i < nShards) {
          val idx = (i.toLong * m / nShards).toInt
          if (idx >= 1 && idx < m &&
              (splitters.isEmpty || ord.compare(splitters.last, distinctKeys(idx)) != 0))
            splitters += distinctKeys(idx)
          i += 1
        }
        new ShardSearcher(keyType, splitters.toArray, values.take(splitters.length + 1))
      }
    ColumnBridge.column(BoundaryShard(ColumnBridge.expression(key), searcher))
  }
}
