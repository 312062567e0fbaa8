package graft.ops

import graft._
import graft.Tables.dec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-8 fifth-session batch 18: A/B conversion testing, growth
  * leaders, whitespace artifact auditing, and the imputation-strategy
  * report.
  *
  * Scale discipline: A/B assignment is pure map-side key arithmetic
  * (the experiment framework shape — no assignment table); growth
  * leaders reduce to a part-grain conditional aggregate against the
  * broadcast horizon and finish with TakeOrdered (never a global
  * sort); the audits are one map-side flag pass each.
  *
  * Float discipline: conversion counts and artifact flags are pure
  * integers; rates and the two-proportion z are fixed IEEE trees over
  * identical integer inputs, round-6; growth is exact cents.
  */
object Extras21 {

  val queries: Map[String, Q] = Map(

    // A/B conversion report: users hash-assigned to variants, converted
    // = strictly-above-mean purchase count (integer cross-multiplied —
    // "at least one purchase" degenerates to 100% conversion on this
    // corpus and zeroes the pooled variance, probed), two-proportion
    // pooled z with a null guard for degenerate variance.
    "stats_ab_conversion" -> { (s, dir) =>
      val counts = Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pc"))
      val tot = counts.agg(sum(col("pc")).as("total_pc"),
        count(lit(1)).as("n_users"))
      val users = counts.crossJoin(broadcast(tot))
        .select(col("user_id"),
          when(col("pc") * col("n_users") > col("total_pc"), 1L)
            .otherwise(0L).as("converted"))
        .withColumn("variant",
          when((col("user_id") * 2654435761L) % 1000L < 500L, "A")
            .otherwise("B"))
      val agg = users.agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "A", col("converted")).otherwise(0L))
          .as("conv_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === "B", col("converted")).otherwise(0L))
          .as("conv_b"))
      val pa = col("conv_a").cast(DoubleType) / col("n_a").cast(DoubleType)
      val pb = col("conv_b").cast(DoubleType) / col("n_b").cast(DoubleType)
      val pp = (col("conv_a") + col("conv_b")).cast(DoubleType) /
        (col("n_a") + col("n_b")).cast(DoubleType)
      agg.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
        when(col("conv_a") + col("conv_b") > 0L &&
          col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
          // + 0.0 normalizes IEEE -0.0 on a near-zero z (rates ~equal)
          round((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a").cast(DoubleType) +
              lit(1.0) / col("n_b").cast(DoubleType))), 6) + lit(0.0))
          .as("z"))
    },

    // month-over-month growth leaders: top 20 parts by revenue delta
    // between the corpus' last two ship months — one conditional
    // aggregate against the broadcast horizon, TakeOrdered finish.
    "analytics_top_growth_parts" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(col("l_partkey"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).as("m"),
        col("l_extendedprice"))
      val horizon = li.agg(max(col("m")).as("last_m"))
      // no month filter: a where over (m, last_m) would push INTO the
      // broadcast crossJoin as a conditioned BNLJ (PlanSpec guard); the
      // conditional sums already select the two months, other months
      // contribute nulls that the aggregate ignores
      li.crossJoin(broadcast(horizon))
        .groupBy("l_partkey")
        .agg(
          (sum(when(col("m") === col("last_m") - 1, dec(col("l_extendedprice"))))
            * 100).cast("long").as("prev_cents"),
          (sum(when(col("m") === col("last_m"), dec(col("l_extendedprice"))))
            * 100).cast("long").as("curr_cents"))
        .select(col("l_partkey"),
          coalesce(col("prev_cents"), lit(0L)).as("prev_cents"),
          coalesce(col("curr_cents"), lit(0L)).as("curr_cents"))
        .withColumn("growth_cents", col("curr_cents") - col("prev_cents"))
        .orderBy(col("growth_cents").desc, col("l_partkey"))
        .limit(20)
    },

    // whitespace artifact audit per source — the string-hygiene census
    // a cleaning recipe starts from (which sources need trim/collapse).
    "clean_whitespace_audit" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"),
          when(col("text") =!= ltrim(col("text")), 1L).otherwise(0L)
            .as("lead_ws"),
          when(col("text") =!= rtrim(col("text")), 1L).otherwise(0L)
            .as("trail_ws"),
          when(instr(col("text"), "  ") > 0, 1L).otherwise(0L)
            .as("dbl_space"),
          when(instr(col("text"), "\t") > 0, 1L).otherwise(0L).as("tab"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("lead_ws")).as("n_leading"),
          sum(col("trail_ws")).as("n_trailing"),
          sum(col("dbl_space")).as("n_double_space"),
          sum(col("tab")).as("n_tab"))
        .orderBy("source")
    },

    // imputation-strategy report over the standard dirt recipe: the
    // meta-decision (mode vs median vs model) every fillna_* operator
    // here implements, derived from observed null rate and cardinality.
    "fillna_strategy_report" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      def report(name: String, dirty: org.apache.spark.sql.Column,
          numeric: Boolean): DataFrame = {
        val base = o.select(dirty.as("v"))
        base.agg(
          (sum(when(col("v").isNull, 1L).otherwise(0L)).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("nr"),
          countDistinct(col("v")).as("n_distinct"))
          .select(lit(name).as("column_name"),
            round(col("nr"), 6).as("null_rate"), col("n_distinct"),
            when(col("n_distinct") <= 10, "mode")
              .when(lit(numeric), "median")
              .otherwise("model_or_drop").as("recommended"))
      }
      report("cust",
          when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")), numeric = false)
        .unionByName(report("price",
          when(col("o_orderkey") % 83 === 0, lit(null).cast("double"))
            .otherwise(col("o_totalprice")), numeric = true))
        .unionByName(report("status",
          when(col("o_orderkey") % 89 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")), numeric = false))
        .orderBy("column_name")
    }
  )

  val oracle: Map[String, String] = Map(
    "stats_ab_conversion" ->
      """WITH c AS (SELECT user_id,
        |    cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS bigint) AS pc
        |  FROM events GROUP BY user_id),
        |t AS (SELECT cast(sum(pc) AS bigint) AS total_pc,
        |    cast(count(*) AS bigint) AS n_users FROM c),
        |u AS (SELECT user_id,
        |    CASE WHEN pc * n_users > total_pc THEN 1 ELSE 0 END
        |      AS converted,
        |    CASE WHEN (user_id * 2654435761) % 1000 < 500
        |      THEN 'A' ELSE 'B' END AS variant
        |  FROM c CROSS JOIN t),
        |a AS (SELECT
        |    cast(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS bigint)
        |      AS n_a,
        |    cast(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
        |      AS bigint) AS conv_a,
        |    cast(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS bigint)
        |      AS n_b,
        |    cast(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
        |      AS bigint) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(cast(conv_a AS double) / cast(n_a AS double), 6) AS rate_a,
        |  round(cast(conv_b AS double) / cast(n_b AS double), 6) AS rate_b,
        |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
        |  THEN round((cast(conv_a AS double) / cast(n_a AS double)
        |      - cast(conv_b AS double) / cast(n_b AS double))
        |    / sqrt((cast(conv_a + conv_b AS double)
        |        / cast(n_a + n_b AS double))
        |      * (1.0 - cast(conv_a + conv_b AS double)
        |        / cast(n_a + n_b AS double))
        |      * (1.0 / cast(n_a AS double) + 1.0 / cast(n_b AS double))),
        |    6) + 0.0 END AS z
        |FROM a""".stripMargin,
    "analytics_top_growth_parts" ->
      """WITH li AS (SELECT l_partkey,
        |    year(l_shipdate) * 12 + month(l_shipdate) AS m,
        |    l_extendedprice
        |  FROM lineitem),
        |h AS (SELECT max(m) AS last_m FROM li),
        |g AS (SELECT l_partkey,
        |    coalesce(cast(sum(CASE WHEN m = last_m - 1
        |      THEN cast(l_extendedprice AS decimal(18,4)) END) * 100
        |      AS bigint), 0) AS prev_cents,
        |    coalesce(cast(sum(CASE WHEN m = last_m
        |      THEN cast(l_extendedprice AS decimal(18,4)) END) * 100
        |      AS bigint), 0) AS curr_cents
        |  FROM li CROSS JOIN h
        |  GROUP BY l_partkey)
        |SELECT l_partkey, prev_cents, curr_cents,
        |  curr_cents - prev_cents AS growth_cents
        |FROM g ORDER BY growth_cents DESC, l_partkey LIMIT 20""".stripMargin,
    "clean_whitespace_audit" ->
      """SELECT source, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(CASE WHEN text <> ltrim(text) THEN 1 ELSE 0 END)
        |    AS bigint) AS n_leading,
        |  cast(sum(CASE WHEN text <> rtrim(text) THEN 1 ELSE 0 END)
        |    AS bigint) AS n_trailing,
        |  cast(sum(CASE WHEN strpos(text, '  ') > 0 THEN 1 ELSE 0 END)
        |    AS bigint) AS n_double_space,
        |  cast(sum(CASE WHEN strpos(text, chr(9)) > 0 THEN 1 ELSE 0 END)
        |    AS bigint) AS n_tab
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "fillna_strategy_report" ->
      """WITH cust AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |    ELSE o_custkey END AS v FROM orders),
        |price AS (SELECT CASE WHEN o_orderkey % 83 = 0 THEN NULL
        |    ELSE o_totalprice END AS v FROM orders),
        |status AS (SELECT CASE WHEN o_orderkey % 89 = 0 THEN NULL
        |    ELSE o_orderstatus END AS v FROM orders)
        |SELECT 'cust' AS column_name,
        |  round(cast(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS double)
        |    / cast(count(*) AS double), 6) AS null_rate,
        |  cast(count(DISTINCT v) AS bigint) AS n_distinct,
        |  CASE WHEN count(DISTINCT v) <= 10 THEN 'mode'
        |       ELSE 'model_or_drop' END AS recommended
        |FROM cust
        |UNION ALL
        |SELECT 'price',
        |  round(cast(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS double)
        |    / cast(count(*) AS double), 6),
        |  cast(count(DISTINCT v) AS bigint),
        |  CASE WHEN count(DISTINCT v) <= 10 THEN 'mode' ELSE 'median' END
        |FROM price
        |UNION ALL
        |SELECT 'status',
        |  round(cast(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS double)
        |    / cast(count(*) AS double), 6),
        |  cast(count(DISTINCT v) AS bigint),
        |  CASE WHEN count(DISTINCT v) <= 10 THEN 'mode'
        |       ELSE 'model_or_drop' END
        |FROM status
        |ORDER BY column_name""".stripMargin
  )
}
