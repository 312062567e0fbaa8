package graft.ops

import graft._
import graft.Tables._
import graft.functions.BloomFunctions.{bloomBuild, bloomMightContain}
import org.apache.spark.sql.functions._

/** Round-8 join additions: explicit Bloom-filter runtime reduction.
  *
  * `join_bloom_reduced` pins the sideways-information-passing shape a
  * 100 TB fact⋈dim join wants when the (filtered) dim side is too large
  * to broadcast as an exact build but its KEY SET compresses into a few
  * MB of bits: aggregate the dim keys into a native Bloom filter
  * ([[graft.functions.BloomBuild]] — bit-OR mergeable, so the build is
  * one map-side-combined pass), broadcast the single filter row, and
  * drop fact rows in the scan stage via the codegen'd
  * [[graft.functions.BloomMightContain]] probe BEFORE the fact pays the
  * join shuffle. The real equi-join afterwards restores exactness (no
  * false negatives; false positives just ride through), which is why the
  * oracle is simply the same query WITHOUT the prefilter.
  *
  * Spark's InjectRuntimeFilter does this opportunistically under conf
  * heuristics; declaring it explicitly makes the reduction a stable,
  * PlanSpec-assertable part of the plan. Sizing: numBits ≈ 10× the
  * expected dim keys (~1% false positives at 7 hashes) — 2¹⁷ bits =
  * 16 KB covers the filtered customer segment at every test SF; at
  * 100 TB the filter grows with |dim keys|/8 bytes, still broadcastable
  * orders of magnitude past where an exact set stops being.
  */
object Extras6 {

  val queries: Map[String, Q] = Map(
    "join_bloom_reduced" -> { (s, dir) =>
      val dim = Tables(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
        .select("c_custkey")
      val bloom = dim.agg(bloomBuild(col("c_custkey"), 1 << 17).as("bf"))
      Tables(s, dir, "orders")
        .select("o_custkey", "o_orderpriority", "o_totalprice")
        .crossJoin(broadcast(bloom))
        .where(bloomMightContain(col("bf"), col("o_custkey")))
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderpriority"))
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
         |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin
  )
}
