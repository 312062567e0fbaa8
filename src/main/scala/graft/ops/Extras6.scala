package graft.ops

import java.util.concurrent.atomic.AtomicLong

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-8 join additions: explicit Bloom-filter runtime reduction.
  *
  * `join_bloom_reduced` pins the sideways-information-passing shape a
  * 100 TB fact⋈dim join wants when the (filtered) dim side is too large
  * to broadcast as an exact build but its KEY SET compresses into a few
  * MB of bits: aggregate the dim keys into a native Bloom filter
  * ([[graft.functions.BloomBuild]] — bit-OR mergeable, so the build is
  * one map-side-combined pass), and drop fact rows in the scan stage via
  * the codegen'd [[graft.functions.BloomMightContain]] probe BEFORE the
  * fact pays the join shuffle. The real equi-join afterwards restores
  * exactness (no false negatives; false positives just ride through),
  * which is why the oracle is simply the same query WITHOUT the
  * prefilter.
  *
  * The filter value reaches the probe as a SCALAR SUBQUERY — Spark's own
  * InjectRuntimeFilter shape: the subquery runs as one tiny job, its
  * result is inlined, and the probe stays a codegen'd `Filter` fused
  * into the fact scan. The tempting DataFrame form —
  * `crossJoin(broadcast(1-row agg)).where(probe)` — is the scalar-
  * broadcast trap: the probe references both cross-join sides, pushes
  * into the join, and becomes a CONDITIONED BroadcastNestedLoopJoin
  * evaluated interpreted row-at-a-time (the outlier_remove 10× lesson;
  * the full-suite PlanSpec guard rejects it).
  *
  * Spark's InjectRuntimeFilter does all this opportunistically under
  * conf heuristics; declaring it explicitly makes the reduction a
  * stable, PlanSpec-assertable part of the plan. Sizing: numBits ≈ 10×
  * the expected dim keys (~1% false positives at 7 hashes) — 2¹⁷ bits =
  * 16 KB covers the filtered customer segment at every test SF; at
  * 100 TB the filter grows with |dim keys|/8 bytes, still broadcastable
  * orders of magnitude past where an exact set stops being.
  */
object Extras6 {

  private val bloomSeq = new AtomicLong(0)

  /** PUBLIC API: SCD Type-2 history build — turn a change stream
    * (`keyCol`, `tsCol`, attributes) into versioned validity intervals:
    * each change row becomes a version valid from its own timestamp
    * until the key's NEXT change (`valid_to` null = current version).
    * The complement of `upsertLatestWins` (which keeps only the final
    * state): SCD2 keeps every state with its interval, the shape a
    * warehouse dimension keeps history in. One shuffle on the key; the
    * lead() window partitions by key (bounded by a key's change count,
    * never a global partition); `tieCols` break same-timestamp ties
    * deterministically. */
  def scd2History(changes: org.apache.spark.sql.DataFrame, keyCol: String,
      tsCol: String, tieCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val reserved = Seq("valid_from", "valid_to", "is_current")
    // case-insensitive: withColumn resolves case-insensitively under the
    // default spark.sql.caseSensitive=false, so "Valid_To" would slip the
    // exact-match guard and then be silently overwritten
    require(!changes.columns.map(_.toLowerCase).exists(reserved.contains),
      s"scd2History reserves the column names ${reserved.mkString(", ")}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  val queries: Map[String, Q] = Map(
    // view names carry a per-invocation unique suffix and are dropped
    // once the plan is analyzed (the join_lateral_topn concurrency
    // discipline: two builders sharing one JVM never race the views)
    "join_bloom_reduced" -> { (s, dir) =>
      graft.functions.BloomFunctions.register(s)
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_") +
        "_" + bloomSeq.incrementAndGet()
      val (ov, cv) = (s"graft_bloom_orders_$tag", s"graft_bloom_dim_$tag")
      Tables(s, dir, "orders").createOrReplaceTempView(ov)
      Tables(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
        .select("c_custkey")
        .createOrReplaceTempView(cv)
      try s.sql(s"""
        SELECT o.o_orderpriority, count(*) AS n_orders,
          cast(sum(cast(o.o_totalprice as decimal(18,4))) as double) AS total_price
        FROM (SELECT o_custkey, o_orderpriority, o_totalprice FROM $ov
              WHERE graft_bloom_might_contain(
                (SELECT graft_bloom_build(c_custkey, ${1 << 17}, 7) FROM $cv),
                o_custkey)) o
        JOIN $cv c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority""")
      finally {
        s.catalog.dropTempView(ov)
        s.catalog.dropTempView(cv)
      }
    },

    // SCD2 over the events stream as a per-user attribute-change feed:
    // every event versions the user's `value`, intervals in epoch
    // seconds (the cross-engine timestamp convention), is_current marks
    // each user's last version. Ordering ties break on event_id — and
    // BOTH engines order by the µs-truncated timestamp (events.ts is
    // stored at ns; ns-order could disagree with µs-order on sub-µs
    // neighbors).
    "upsert_scd2_history" -> { (s, dir) =>
      scd2History(
        Tables(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        "user_id", "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id"),
          epochS(col("valid_from")).as("valid_from_s"),
          epochS(col("valid_to")).as("valid_to_s"),
          col("value"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from_s"), col("event_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    // the filter-free join IS the specification: the Bloom stage may only
    // remove rows the join drops anyway
    "join_bloom_reduced" ->
      s"""SELECT o.o_orderpriority, count(*) AS n_orders,
         |  ${sqlDsum("o.o_totalprice")} AS total_price
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 5000
         |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "upsert_scd2_history" ->
      """WITH e AS (
        |  SELECT user_id, event_id, cast(ts as timestamp) AS tsu, value
        |  FROM events)
        |SELECT user_id, event_id,
        |  cast(epoch(date_trunc('second', tsu)) as bigint) AS valid_from_s,
        |  cast(epoch(date_trunc('second', lead(tsu, 1) OVER w)) as bigint)
        |    AS valid_to_s,
        |  value,
        |  lead(tsu, 1) OVER w IS NULL AS is_current
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        |ORDER BY user_id, valid_from_s, event_id""".stripMargin
  )
}
