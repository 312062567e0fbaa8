package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** §2.1 scans + §2.4 flagship aggregation (tier 0).
  *
  * Replicates the reference's whole-table profiling pass style
  * (SURVEY.md §2.1/§2.4) as lazy Catalyst plans: the checksum scan reads
  * only the referenced columns (parquet column pruning) and the Q1-style
  * aggregation runs as partial+final hash aggregate — no driver-side
  * iteration anywhere.
  */
object Scans {

  val queries: Map[String, Q] = Map(
    // Full-scan checksum of lineitem: count + exact decimal sums.
    "scan_parquet" -> { (s, dir) =>
      Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        sum(col("l_orderkey")).as("sum_okey"))
    },

    // Column-pruned, predicate-pushed scan: 3 columns, shipdate range.
    // .explain shows PushedFilters + 3-column ReadSchema (SURVEY.md §4).
    "scan_prune_filter" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_shipdate"))
        .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy()
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"),
          sum(col("l_orderkey") * col("l_linenumber")).as("sum_keyprod"))
    },

    // TPC-H-Q1-style: group by returnflag/linestatus, exact decimal math.
    "agg_groupby_q1" -> { (s, dir) =>
      // Tight decimal scales keep every product exact (≤38 digits) in BOTH
      // engines: price has 2 decimals, discount/tax have 2 decimals.
      val one = lit(1).cast("decimal(3,2)")
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(3,2)")
      val tax = col("l_tax").cast("decimal(3,2)")
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // Floor the exact decimal sum to whole cents BEFORE the double
          // cast: a direct decimal→double cast double-rounds vs Java's
          // correctly-rounded conversion once the unscaled value passes
          // 2^53 (the sf1 gate caught sum_charge, scale 6, off by 1 ulp
          // at ~5.2e16). Cents keep the double exact to ~9e13 currency
          // units — far past sf1000 — and floor on exact decimals is
          // engine-independent.
          (floor(sum(price * (one - disc)) * 100).cast("double") / 100)
            .as("sum_disc_price"),
          (floor(sum(price * (one - disc) * (one + tax)) * 100).cast("double") / 100)
            .as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  val oracle: Map[String, String] = Map(
    "scan_parquet" ->
      s"""SELECT count(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty,
         |${sqlDsum("l_extendedprice")} AS sum_price,
         |cast(sum(l_orderkey) as bigint) AS sum_okey FROM lineitem""".stripMargin,
    "scan_prune_filter" ->
      s"""SELECT count(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty,
         |cast(sum(l_orderkey * l_linenumber) as bigint) AS sum_keyprod
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'""".stripMargin,
    "agg_groupby_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${sqlDsum("l_quantity")} AS sum_qty,
         |${sqlDsum("l_extendedprice")} AS sum_base_price,
         |cast(floor(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(3,2)))) * 100) as double) / 100 AS sum_disc_price,
         |cast(floor(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(3,2))) * (cast(1 as decimal(3,2)) + cast(l_tax as decimal(3,2)))) * 100) as double) / 100 AS sum_charge,
         |${sqlDavg("l_quantity")} AS avg_qty,
         |${sqlDavg("l_extendedprice")} AS avg_price,
         |${sqlDavg("l_discount")} AS avg_disc,
         |count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
