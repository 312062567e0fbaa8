package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 13 batch 2: rank-correlation trend testing (Kendall's τ),
  * shrinkage target encoding (James-Stein), product-analytics
  * stickiness (DAU/MAU), and a power-law fit of the co-purchase degree
  * distribution. Same float discipline as Extras41: order-dependent
  * float sums are quantized to exact integers per element (the
  * power-law ln terms); everything else is a fixed expression tree
  * over exact counts/decimal sums.
  */
object Extras42 {

  val queries: Map[String, Q] = Map(

    // Kendall tau-a trend test per nation: concordant minus discordant
    // month pairs over monthly revenue. Like stats_theil_sen_by_group
    // the fact reduces to (nation, month) grain FIRST, so the pair
    // expansion is calendar-bounded at any SF; the statistic is pure
    // integer counting (value ties count as neither), one IEEE division
    // at the end. τ near ±1 = monotone trend, near 0 = none.
    "stats_kendall_tau_by_group" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val m = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"),
          ((year(col("o_orderdate")) - 1990) * 12 + month(col("o_orderdate")))
            .as("mi"))
        .agg(dsum(col("o_totalprice")).as("v"))
      val pairs = m.select(col("c_nationkey"), col("mi").as("m1"), col("v").as("v1"))
        .join(m.select(col("c_nationkey"), col("mi").as("m2"), col("v").as("v2")),
          Seq("c_nationkey"))
        .where(col("m1") < col("m2"))
      pairs.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("v2") > col("v1"), 1L).otherwise(0L)).as("concordant"),
          sum(when(col("v2") < col("v1"), 1L).otherwise(0L)).as("discordant"))
        .select(col("c_nationkey"), col("n_pairs"), col("concordant"),
          col("discordant"),
          (round((col("concordant") - col("discordant")).cast(DoubleType) /
            col("n_pairs").cast(DoubleType), 6) + lit(0.0)).as("kendall_tau"))
        .orderBy("c_nationkey")
    },

    // James-Stein / empirical-Bayes smoothed target encoding: the
    // encoder TABLE (one row per category) with code = (n_g·m_g +
    // k·m_global)/(n_g + k) — rare categories shrink toward the global
    // mean instead of memorizing noise (the companion to
    // encode_target_mean (no smoothing) and encode_target_loo
    // (leakage-safe)). Exact decimal sums; the blend is written as
    // (Σ_g + k·(Σ_tot/N)) / (n_g + k) with the SAME operation order in
    // both engines.
    "encode_target_james_stein" -> { (s, dir) =>
      val k = 20
      val c = Tables(s, dir, "customer")
      val g = c.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_g"), sum(dec(col("c_acctbal"))).as("sum_g"))
      val tot = c.agg(count(lit(1)).as("n_tot"),
        sum(dec(col("c_acctbal"))).as("sum_tot"))
      val mg = col("sum_g").cast(DoubleType) / col("n_g").cast(DoubleType)
      val mGlobal = col("sum_tot").cast(DoubleType) / col("n_tot").cast(DoubleType)
      g.crossJoin(broadcast(tot))
        .select(col("c_mktsegment"), col("n_g"),
          (round(mg, 6) + lit(0.0)).as("mean_g"),
          (round((col("n_g").cast(DoubleType) * mg + lit(k.toDouble) * mGlobal) /
            (col("n_g") + lit(k)).cast(DoubleType), 6) + lit(0.0))
            .as("js_code"))
        .orderBy("c_mktsegment")
    },

    // DAU/MAU stickiness per month: how much of the monthly audience
    // shows up on an average day. Two fact aggregates (per-day distinct
    // users, per-month distinct users) — both map-side-combined distinct
    // shapes — joined at month grain; all divisions are exact-integer
    // inputs. The canonical product-analytics engagement report.
    "events_dau_mau_stickiness" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        (year(col("ts")) * 100 + month(col("ts"))).as("ym"),
        (year(col("ts")) * 10000 + month(col("ts")) * 100 +
          dayofmonth(col("ts"))).as("ymd"),
        col("user_id"))
      val dau = e.groupBy("ym", "ymd")
        .agg(countDistinct(col("user_id")).as("dau"))
        .groupBy("ym")
        .agg(count(lit(1)).as("n_days"), sum("dau").as("dau_sum"))
      val mau = e.groupBy("ym").agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, "ym")
        .select(col("ym"), col("n_days"), col("mau"),
          (round(col("dau_sum").cast(DoubleType) /
            col("n_days").cast(DoubleType), 6) + lit(0.0)).as("avg_dau"),
          (round(col("dau_sum").cast(DoubleType) /
            (col("n_days") * col("mau")).cast(DoubleType), 6) + lit(0.0))
            .as("stickiness"))
        .orderBy("ym")
    },

    // Power-law exponent of the co-purchase degree distribution —
    // continuous-MLE alpha = 1 + n/Σ ln(d/(dmin−0.5)) (Clauset-Shalizi-
    // Newman 2009) over the d ≥ dmin tail. The graph reduces to the
    // DEGREE CENSUS first (one row per distinct degree — bounded by
    // max basket co-occurrence, a dimension), and the order-dependent
    // float sum Σ cnt·ln(...) is quantized per degree to ⌊10⁶·ln⌋
    // before an exact integer dot product with the counts.
    "graph_degree_powerlaw_fit" -> { (s, dir) =>
      val dmin = 2
      val edges = Graph.strongEdgesCached(s, dir).select("pa", "pb")
      val deg = edges.select(col("pa").as("u"))
        .unionAll(edges.select(col("pb").as("u")))
        .groupBy("u").agg(count(lit(1)).as("d"))
      val census = deg.groupBy("d").agg(count(lit(1)).as("cnt"))
        .where(col("d") >= dmin)
        .withColumn("lnq",
          floor(log(col("d").cast(DoubleType) / lit(dmin - 0.5)) * lit(1e6))
            .cast(LongType))
      census.agg(sum("cnt").as("n_tail"), max("d").as("max_degree"),
          sum(col("cnt") * col("lnq")).as("lnsum_q"))
        .select(col("n_tail"), lit(dmin).as("dmin"), col("max_degree"),
          (round(lit(1.0) + col("n_tail").cast(DoubleType) /
            (col("lnsum_q").cast(DoubleType) / lit(1e6)), 6) + lit(0.0))
            .as("alpha"))
    }
  )

  val oracle: Map[String, String] = Map(
    "stats_kendall_tau_by_group" ->
      s"""WITH m AS (SELECT c_nationkey,
         |    (year(o_orderdate) - 1990) * 12 + month(o_orderdate) AS mi,
         |    ${sqlDsum("o_totalprice")} AS v
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |p AS (SELECT a.c_nationkey,
         |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS conc,
         |    CASE WHEN b.v < a.v THEN 1 ELSE 0 END AS disc
         |  FROM m a JOIN m b ON a.c_nationkey = b.c_nationkey
         |    AND a.mi < b.mi)
         |SELECT c_nationkey, cast(count(*) AS bigint) AS n_pairs,
         |  cast(sum(conc) AS bigint) AS concordant,
         |  cast(sum(disc) AS bigint) AS discordant,
         |  round(cast(sum(conc) - sum(disc) AS double) /
         |    cast(count(*) AS double), 6) + 0.0 AS kendall_tau
         |FROM p GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "encode_target_james_stein" ->
      """WITH g AS (SELECT c_mktsegment, cast(count(*) AS bigint) AS n_g,
        |    sum(cast(c_acctbal AS decimal(18,4))) AS sum_g
        |  FROM customer GROUP BY 1),
        |t AS (SELECT cast(count(*) AS bigint) AS n_tot,
        |    sum(cast(c_acctbal AS decimal(18,4))) AS sum_tot
        |  FROM customer)
        |SELECT c_mktsegment, n_g,
        |  round(cast(sum_g AS double) / cast(n_g AS double), 6) + 0.0
        |    AS mean_g,
        |  round((cast(n_g AS double) *
        |      (cast(sum_g AS double) / cast(n_g AS double)) +
        |      20.0 * (cast(sum_tot AS double) / cast(n_tot AS double))) /
        |    cast(n_g + 20 AS double), 6) + 0.0 AS js_code
        |FROM g CROSS JOIN t ORDER BY c_mktsegment""".stripMargin,
    "events_dau_mau_stickiness" ->
      """WITH e AS (SELECT year(ts) * 100 + month(ts) AS ym,
        |    year(ts) * 10000 + month(ts) * 100 + day(ts) AS ymd, user_id
        |  FROM events),
        |d AS (SELECT ym, cast(count(*) AS bigint) AS n_days,
        |    cast(sum(dau) AS bigint) AS dau_sum
        |  FROM (SELECT ym, ymd, count(DISTINCT user_id) AS dau
        |        FROM e GROUP BY 1, 2)
        |  GROUP BY 1),
        |m AS (SELECT ym, count(DISTINCT user_id) AS mau FROM e GROUP BY 1)
        |SELECT d.ym, n_days, cast(mau AS bigint) AS mau,
        |  round(cast(dau_sum AS double) / cast(n_days AS double), 6) + 0.0
        |    AS avg_dau,
        |  round(cast(dau_sum AS double) / cast(n_days * mau AS double), 6)
        |    + 0.0 AS stickiness
        |FROM d JOIN m USING (ym) ORDER BY ym""".stripMargin,
    "graph_degree_powerlaw_fit" ->
      """WITH items AS MATERIALIZED (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT l_orderkey, l_partkey,
        |      count(*) OVER (PARTITION BY l_orderkey) AS bsz
        |    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
        |  WHERE bsz <= 64),
        |p0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |edges AS MATERIALIZED (SELECT pa, pb FROM (
        |  SELECT pa, pb, count(*) AS w FROM p0 GROUP BY pa, pb)
        |  WHERE w >= 2),
        |deg AS (SELECT u, cast(count(*) AS bigint) AS d FROM (
        |  SELECT pa AS u FROM edges UNION ALL SELECT pb FROM edges)
        |  GROUP BY u),
        |census AS (SELECT d, cast(count(*) AS bigint) AS cnt,
        |    cast(floor(ln(cast(d AS double) / 1.5) * 1e6) AS bigint) AS lnq
        |  FROM deg WHERE d >= 2 GROUP BY d)
        |SELECT cast(sum(cnt) AS bigint) AS n_tail, 2 AS dmin,
        |  cast(max(d) AS bigint) AS max_degree,
        |  round(1.0 + cast(sum(cnt) AS double) /
        |    (cast(sum(cnt * lnq) AS double) / 1e6), 6) + 0.0 AS alpha
        |FROM census""".stripMargin
  )
}
