package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 14 batch: feature-engineering transforms (winsorize, robust
  * scale, percentile-rank encode), distribution drift per group (PSI),
  * rolling/realized time-series statistics, transition entropy rate
  * (second consumer of the round-14 distributedLag kernel), a bipartite
  * co-supply projection, and two order-book composites.
  *
  * Float discipline as Extras41/42: every order-dependent float term is
  * floor-quantized to an exact integer per element BEFORE any sum, so
  * cross-engine aggregation order cannot matter; percentile calls mirror
  * the proven profile_quantiles_by_group pattern (round-4 on identical
  * sorted inputs); final ratios are single fixed IEEE trees rounded to 6.
  * Every output grain is dimension- or calendar-bounded (never fact
  * grain), so row counts stay flat under 100x fact growth.
  */
object Extras43 {

  val queries: Map[String, Q] = Map(

    // 7-day rolling Pearson correlation between a nation's daily revenue
    // and daily line count. Fact reduces to (nation, day) FIRST (grain
    // bounded by calendar x 25 nations at any SF); the rolling frame is
    // a fixed 7-row window over that reduced grain; revenue enters as
    // exact whole-unit longs so every rolling sum/product is exact
    // integer math, and the final corr is one IEEE tree per row.
    "timeseries_rolling_corr" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val daily = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"),
          (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
            dayofmonth(col("o_orderdate"))).as("ymd"))
        // hundreds of currency units: corr is scale-invariant, and the
        // smaller x keeps x² and 7-row moment sums inside exact int64
        // far past sf1000 (x ~3.7e7 there → n·sxx ~1e16 « 2^63)
        .agg(floor(sum(dec(col("o_totalprice"))) / 100).cast(LongType).as("x"),
          count(lit(1)).as("y"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey").orderBy("ymd").rowsBetween(-6, 0)
      val r = daily.select(col("c_nationkey"), col("ymd"), col("x"), col("y"),
        count(lit(1)).over(w).as("n"),
        sum(col("x")).over(w).as("sx"), sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"),
        sum(col("x") * col("y")).over(w).as("sxy"))
        .where(col("n") === 7)
      val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
      val d1 = (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
      val d2 = (col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType)
      r.select(col("c_nationkey"), col("ymd"),
          when(d1 > 0 && d2 > 0,
            round(num / sqrt(d1 * d2), 6) + lit(0.0)).as("roll_corr"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("roll_corr") > 0.5, 1L).otherwise(0L)).as("n_strong_pos"),
          sum(when(col("roll_corr") < -0.5, 1L).otherwise(0L)).as("n_strong_neg"),
          (round(avg(floor(col("roll_corr") * 1e6).cast(LongType)) / 1e6, 6)
            + lit(0.0)).as("mean_corr_q"))
        .orderBy("c_nationkey")
    },

    // Realized volatility per (nation, month): sqrt of the sum of squared
    // day-over-day log-revenue changes. The log of each day's exact
    // whole-unit revenue is floor-quantized to 1e-6 BEFORE differencing,
    // so the squared deltas are exact longs and their sum is
    // order-independent; one sqrt at the end. Lag runs inside a
    // (nation, month) partition — ≤31 rows, never a skew surface.
    "timeseries_realized_volatility" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val daily = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"),
          dayofmonth(col("o_orderdate")).as("dd"))
        .agg(floor(sum(dec(col("o_totalprice")))).cast(LongType).as("rev"))
        .withColumn("lnq",
          floor(log(col("rev").cast(DoubleType)) * lit(1e6)).cast(LongType))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey", "ym").orderBy("dd")
      daily.withColumn("dlq", col("lnq") - lag(col("lnq"), 1).over(w))
        .where(col("dlq").isNotNull)
        .groupBy("c_nationkey", "ym")
        .agg(count(lit(1)).as("n_deltas"),
          sum(col("dlq") * col("dlq")).as("ssq_q"))
        .select(col("c_nationkey"), col("ym"), col("n_deltas"),
          (round(sqrt(col("ssq_q").cast(DoubleType)) / 1e6, 6) + lit(0.0))
            .as("realized_vol"))
        .orderBy("c_nationkey", "ym")
    },

    // Order-book fill rate + backorder aging per ship month: on-time =
    // shipped within a 90-day SLA of the order date (this corpus carries
    // no commit date); late lines bucketed 1-7 / 8-30 / >30 days past
    // SLA. One fact equi-join + calendar-grain conditional aggregate.
    "analytics_order_fill_rate" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(Tables(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"),
          (datediff(col("l_shipdate"), col("o_orderdate")) - 90).as("slip"))
      li.groupBy("ym")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("slip") <= 0, 1L).otherwise(0L)).as("on_time"),
          sum(when(col("slip").between(1, 7), 1L).otherwise(0L)).as("late_1_7"),
          sum(when(col("slip").between(8, 30), 1L).otherwise(0L)).as("late_8_30"),
          sum(when(col("slip") > 30, 1L).otherwise(0L)).as("late_over_30"))
        .select(col("ym"), col("n_lines"), col("on_time"), col("late_1_7"),
          col("late_8_30"), col("late_over_30"),
          (round(col("on_time").cast(DoubleType) /
            col("n_lines").cast(DoubleType), 6) + lit(0.0)).as("fill_rate"))
        .orderBy("ym")
    },

    // Winsorized-mean repair report per market segment: p05/p95 fences
    // (the proven percentile discipline), raw vs winsorized mean over
    // the CLIPPED exact decimal, and how many rows each tail clipped.
    // The clip bounds join back as a 5-row broadcast.
    "clean_winsorize" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_mktsegment"),
        col("c_acctbal").cast(DoubleType).as("x"))
      val fences = c.groupBy("c_mktsegment").agg(
        round(expr("percentile(x, 0.05)"), 4).as("p05"),
        round(expr("percentile(x, 0.95)"), 4).as("p95"))
      c.join(broadcast(fences), "c_mktsegment")
        .select(col("c_mktsegment"), col("p05"), col("p95"), col("x"),
          when(col("x") < col("p05"), col("p05"))
            .when(col("x") > col("p95"), col("p95"))
            .otherwise(col("x")).as("xw"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), max(col("p05")).as("lo"),
          max(col("p95")).as("hi"),
          sum(when(col("x") < col("p05"), 1L).otherwise(0L)).as("clipped_lo"),
          sum(when(col("x") > col("p95"), 1L).otherwise(0L)).as("clipped_hi"),
          (round(sum(floor(col("x") * 100).cast(LongType)).cast(DoubleType) /
            (count(lit(1)) * 100).cast(DoubleType), 6) + lit(0.0)).as("mean_raw"),
          (round(sum(floor(col("xw") * 100).cast(LongType)).cast(DoubleType) /
            (count(lit(1)) * 100).cast(DoubleType), 6) + lit(0.0)).as("mean_wins"))
        .orderBy("c_mktsegment")
    },

    // Robust (median/IQR) scaling parameter table per segment + a
    // checksum of the scaled column: each row's (x − median)/IQR is
    // floor-quantized to 1e-6 so the per-segment sum is exact integer
    // math — the encoder-table twin of scale_standardize (mean/stddev).
    "scale_robust_median_iqr" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_mktsegment"),
        col("c_acctbal").cast(DoubleType).as("x"))
      val prm = c.groupBy("c_mktsegment").agg(
        round(expr("percentile(x, 0.5)"), 4).as("med"),
        round(expr("percentile(x, 0.75)") - expr("percentile(x, 0.25)"), 4)
          .as("iqr"))
      c.join(broadcast(prm), "c_mktsegment")
        // iqr = 0 (degenerate constant segment) would floor(±Inf): emit
        // no rows for such segments in both engines rather than diverge
        .where(col("iqr") > 0)
        .select(col("c_mktsegment"), col("med"), col("iqr"),
          floor((col("x") - col("med")) / col("iqr") * lit(1e6))
            .cast(LongType).as("zq"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), max(col("med")).as("median"),
          max(col("iqr")).as("iqr"),
          sum(when(abs(col("zq")) > 2000000L, 1L).otherwise(0L)).as("n_beyond_2"),
          sum(col("zq")).as("z_checksum_q"))
        .orderBy("c_mktsegment")
    },

    // Percentile-rank encoder at VALUE-BAND grain: acctbal bands (width
    // 100) with the percent-rank of each band's lower edge inside its
    // segment — (strictly-below count)/(n−1) over a ~110-row-per-segment
    // band census, so the window input is dimension-bounded at any SF.
    "encode_percentile_rank" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_mktsegment"),
        floor(col("c_acctbal").cast(DoubleType) / 100).cast(LongType).as("band"))
      val census = c.groupBy("c_mktsegment", "band").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment").orderBy("band")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)
      val tot = c.groupBy("c_mktsegment").agg(count(lit(1)).as("n_seg"))
      census
        .withColumn("below", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .join(broadcast(tot), "c_mktsegment")
        .select(col("c_mktsegment"), col("band"), col("cnt"),
          (round(col("below").cast(DoubleType) /
            (col("n_seg") - 1).cast(DoubleType), 6) + lit(0.0)).as("pct_rank"))
        .orderBy("c_mktsegment", "band")
    },

    // Population-stability index of each nation's order-price
    // distribution vs the global one, over 10 fixed price bands. Every
    // band term (p_g − p_all)·ln(p_g/p_all) is floor-quantized per band
    // BEFORE the per-nation sum (≤10 exact longs), the power-law/PSI
    // house pattern; drift_psi's per-group companion.
    "stats_psi_by_group" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val b = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_nationkey"),
          least(floor(col("o_totalprice").cast(DoubleType) / 60000)
            .cast(LongType), lit(9L)).as("band"))
      val gb = b.groupBy("c_nationkey", "band").agg(count(lit(1)).as("n_gb"))
      val g = b.groupBy("c_nationkey").agg(count(lit(1)).as("n_g"))
      val ab = b.groupBy("band").agg(count(lit(1)).as("n_ab"))
      val a = b.agg(count(lit(1)).as("n_a"))
      val pg = col("n_gb").cast(DoubleType) / col("n_g").cast(DoubleType)
      val pa = col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType)
      gb.join(g, "c_nationkey").join(broadcast(ab), "band")
        .crossJoin(broadcast(a))
        .select(col("c_nationkey"),
          floor((pg - pa) * log(pg / pa) * lit(1e9)).cast(LongType).as("tq"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_bands"),
          (round(sum(col("tq")).cast(DoubleType) / 1e9, 6) + lit(0.0)).as("psi"))
        .orderBy("c_nationkey")
    },

    // Bipartite part–supplier graph projected onto suppliers: co-supply
    // edge weight = #parts two suppliers both ship. Parts with more than
    // 32 suppliers are dropped BEFORE the pair expansion (the MaxBasket
    // guard: the quadratic term is capped at C(32,2) per part at any
    // SF; lines-per-part is SF-invariant ~30 in this corpus, so the cap
    // keeps coverage while bounding the hot part), then the top-50 pairs by weight with a full unique tie-break.
    "graph_bipartite_projection" -> { (s, dir) =>
      // r14 note: a collect_set + native ArrayPairs form (the strongEdges
      // basket pattern) was tried and REVERTED — direct A/B measured it
      // SLOWER (2.41 s vs 1.83 s median): the ObjectHashAggregate array
      // state costs more here than the window whose exchange the
      // self-join below reuses (both sides share one hashpartitioning
      // on l_partkey — the join adds no exchange).
      val ps = Tables(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
      val capped = ps
        .withColumn("nsup", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
        .where(col("nsup") <= 32)
        .select("l_partkey", "l_suppkey")
      capped.select(col("l_partkey"), col("l_suppkey").as("sa"))
        .join(capped.select(col("l_partkey"), col("l_suppkey").as("sb")),
          Seq("l_partkey"))
        .where(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("shared_parts"))
        .orderBy(col("shared_parts").desc, col("sa"), col("sb"))
        .limit(50)
    },

    // First-order Markov transition entropy per source event type:
    // H(T|S=s) = −Σ_t P(t|s)·ln P(t|s) from the observed lag-1 chain.
    // The per-user predecessor comes from the round-14 distributedLag
    // kernel (its second consumer) — no single-task hot-user window —
    // and each p·ln p term is floor-quantized per (s,t) cell before the
    // ≤|types| exact integer sum.
    "events_transition_entropy_rate" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
      val lagged = GraftOps.distributedLag(
        e, "user_id", Seq("us", "event_id"), "event_type", "prev_type")
      val st = lagged.where(col("prev_type").isNotNull)
        .groupBy(col("prev_type").as("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("n_st"))
      val sTot = st.groupBy("src").agg(sum(col("n_st")).as("n_s"))
      val p = col("n_st").cast(DoubleType) / col("n_s").cast(DoubleType)
      st.join(broadcast(sTot), "src")
        .select(col("src"), col("n_s"),
          floor(-p * log(p) * lit(1e9)).cast(LongType).as("hq"))
        .groupBy("src")
        .agg(max(col("n_s")).as("n_transitions"),
          count(lit(1)).as("n_dst_types"),
          (round(sum(col("hq")).cast(DoubleType) / 1e9, 6) + lit(0.0))
            .as("entropy_nats"))
        .orderBy("src")
    },

    // Seasonal index per (nation, month-of-year): the month's mean
    // monthly revenue over the nation's all-month mean (index 1 = no
    // seasonality), from exact decimal sums at (nation, ym) grain; plus
    // each nation's peak month. 300-row output at any SF.
    "analytics_seasonal_index" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val monthly = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
        .withColumn("moy", col("ym") % 100)
      val byMoy = monthly.groupBy("c_nationkey", "moy")
        .agg(count(lit(1)).as("n_months"), sum(col("rev")).as("rev_moy"))
      val byNation = monthly.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_all"), sum(col("rev")).as("rev_all"))
      byMoy.join(byNation, "c_nationkey")
        .select(col("c_nationkey"), col("moy"), col("n_months"),
          (round((col("rev_moy").cast(DoubleType) /
              col("n_months").cast(DoubleType)) /
            (col("rev_all").cast(DoubleType) / col("n_all").cast(DoubleType)),
            6) + lit(0.0)).as("seasonal_index"))
        .orderBy("c_nationkey", "moy")
    }
  )

  val oracle: Map[String, String] = Map(
    "timeseries_rolling_corr" ->
      """WITH daily AS (
        |  SELECT c_nationkey,
        |    year(o_orderdate) * 10000 + month(o_orderdate) * 100 +
        |      day(o_orderdate) AS ymd,
        |    cast(floor(sum(cast(o_totalprice AS decimal(18,4))) / 100) AS bigint)
        |      AS x,
        |    cast(count(*) AS bigint) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT c_nationkey, ymd, x, y,
        |    cast(count(*) OVER w AS bigint) AS n,
        |    cast(sum(x) OVER w AS bigint) AS sx,
        |    cast(sum(y) OVER w AS bigint) AS sy,
        |    cast(sum(x * x) OVER w AS bigint) AS sxx,
        |    cast(sum(y * y) OVER w AS bigint) AS syy,
        |    cast(sum(x * y) OVER w AS bigint) AS sxy
        |  FROM daily
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY ymd
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
        |cq AS (
        |  SELECT c_nationkey,
        |    CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
        |      round(cast(n*sxy - sx*sy AS double) /
        |        sqrt(cast(n*sxx - sx*sx AS double) *
        |             cast(n*syy - sy*sy AS double)), 6) + 0.0
        |    END AS roll_corr
        |  FROM r WHERE n = 7)
        |SELECT c_nationkey, cast(count(*) AS bigint) AS n_windows,
        |  cast(sum(CASE WHEN roll_corr > 0.5 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_strong_pos,
        |  cast(sum(CASE WHEN roll_corr < -0.5 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_strong_neg,
        |  round(avg(cast(floor(roll_corr * 1e6) AS bigint)) / 1e6, 6) + 0.0
        |    AS mean_corr_q
        |FROM cq GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "timeseries_realized_volatility" ->
      """WITH daily AS (
        |  SELECT c_nationkey,
        |    year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |    day(o_orderdate) AS dd,
        |    cast(floor(ln(cast(floor(sum(cast(o_totalprice AS decimal(18,4))))
        |      AS double)) * 1e6) AS bigint) AS lnq
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3),
        |d AS (
        |  SELECT c_nationkey, ym,
        |    lnq - lag(lnq) OVER (PARTITION BY c_nationkey, ym ORDER BY dd)
        |      AS dlq
        |  FROM daily)
        |SELECT c_nationkey, ym, cast(count(*) AS bigint) AS n_deltas,
        |  round(sqrt(cast(sum(dlq * dlq) AS double)) / 1e6, 6) + 0.0
        |    AS realized_vol
        |FROM d WHERE dlq IS NOT NULL
        |GROUP BY 1, 2 ORDER BY c_nationkey, ym""".stripMargin,
    "analytics_order_fill_rate" ->
      """WITH li AS (
        |  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
        |    datediff('day', o_orderdate, cast(l_shipdate AS date)) - 90 AS slip
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT ym, cast(count(*) AS bigint) AS n_lines,
        |  cast(sum(CASE WHEN slip <= 0 THEN 1 ELSE 0 END) AS bigint) AS on_time,
        |  cast(sum(CASE WHEN slip BETWEEN 1 AND 7 THEN 1 ELSE 0 END) AS bigint)
        |    AS late_1_7,
        |  cast(sum(CASE WHEN slip BETWEEN 8 AND 30 THEN 1 ELSE 0 END) AS bigint)
        |    AS late_8_30,
        |  cast(sum(CASE WHEN slip > 30 THEN 1 ELSE 0 END) AS bigint)
        |    AS late_over_30,
        |  round(cast(sum(CASE WHEN slip <= 0 THEN 1 ELSE 0 END) AS double) /
        |    cast(count(*) AS double), 6) + 0.0 AS fill_rate
        |FROM li GROUP BY ym ORDER BY ym""".stripMargin,
    "clean_winsorize" ->
      """WITH c AS (SELECT c_mktsegment, cast(c_acctbal AS double) AS x
        |  FROM customer),
        |f AS (SELECT c_mktsegment,
        |    round(quantile_cont(x, 0.05), 4) AS p05,
        |    round(quantile_cont(x, 0.95), 4) AS p95
        |  FROM c GROUP BY 1),
        |j AS (SELECT c.c_mktsegment, p05, p95, x,
        |    CASE WHEN x < p05 THEN p05 WHEN x > p95 THEN p95 ELSE x END AS xw
        |  FROM c JOIN f ON c.c_mktsegment = f.c_mktsegment)
        |SELECT c_mktsegment, cast(count(*) AS bigint) AS n,
        |  max(p05) AS lo, max(p95) AS hi,
        |  cast(sum(CASE WHEN x < p05 THEN 1 ELSE 0 END) AS bigint) AS clipped_lo,
        |  cast(sum(CASE WHEN x > p95 THEN 1 ELSE 0 END) AS bigint) AS clipped_hi,
        |  round(cast(sum(cast(floor(x * 100) AS bigint)) AS double) /
        |    cast(count(*) * 100 AS double), 6) + 0.0 AS mean_raw,
        |  round(cast(sum(cast(floor(xw * 100) AS bigint)) AS double) /
        |    cast(count(*) * 100 AS double), 6) + 0.0 AS mean_wins
        |FROM j GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "scale_robust_median_iqr" ->
      """WITH c AS (SELECT c_mktsegment, cast(c_acctbal AS double) AS x
        |  FROM customer),
        |p AS (SELECT c_mktsegment,
        |    round(quantile_cont(x, 0.5), 4) AS med,
        |    round(quantile_cont(x, 0.75) - quantile_cont(x, 0.25), 4) AS iqr
        |  FROM c GROUP BY 1),
        |z AS (SELECT c.c_mktsegment, med, iqr,
        |    cast(floor((x - med) / iqr * 1e6) AS bigint) AS zq
        |  FROM c JOIN p ON c.c_mktsegment = p.c_mktsegment
        |  WHERE iqr > 0)
        |SELECT c_mktsegment, cast(count(*) AS bigint) AS n,
        |  max(med) AS median, max(iqr) AS iqr,
        |  cast(sum(CASE WHEN abs(zq) > 2000000 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_beyond_2,
        |  cast(sum(zq) AS bigint) AS z_checksum_q
        |FROM z GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "encode_percentile_rank" ->
      """WITH c AS (SELECT c_mktsegment,
        |    cast(floor(cast(c_acctbal AS double) / 100) AS bigint) AS band
        |  FROM customer),
        |census AS (SELECT c_mktsegment, band, cast(count(*) AS bigint) AS cnt
        |  FROM c GROUP BY 1, 2),
        |tot AS (SELECT c_mktsegment, cast(count(*) AS bigint) AS n_seg
        |  FROM c GROUP BY 1)
        |SELECT census.c_mktsegment, band, cnt,
        |  round(cast(coalesce(sum(cnt) OVER (PARTITION BY census.c_mktsegment
        |      ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS double) / cast(n_seg - 1 AS double), 6) + 0.0 AS pct_rank
        |FROM census JOIN tot ON census.c_mktsegment = tot.c_mktsegment
        |ORDER BY 1, 2""".stripMargin,
    "stats_psi_by_group" ->
      """WITH b AS (
        |  SELECT c_nationkey,
        |    least(cast(floor(cast(o_totalprice AS double) / 60000) AS bigint),
        |      9) AS band
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |gb AS (SELECT c_nationkey, band, cast(count(*) AS bigint) AS n_gb
        |  FROM b GROUP BY 1, 2),
        |g AS (SELECT c_nationkey, cast(count(*) AS bigint) AS n_g
        |  FROM b GROUP BY 1),
        |ab AS (SELECT band, cast(count(*) AS bigint) AS n_ab FROM b GROUP BY 1),
        |a AS (SELECT cast(count(*) AS bigint) AS n_a FROM b),
        |t AS (SELECT gb.c_nationkey,
        |    cast(floor((cast(n_gb AS double) / cast(n_g AS double) -
        |        cast(n_ab AS double) / cast(n_a AS double)) *
        |      ln((cast(n_gb AS double) / cast(n_g AS double)) /
        |         (cast(n_ab AS double) / cast(n_a AS double))) * 1e9) AS bigint)
        |      AS tq
        |  FROM gb JOIN g ON gb.c_nationkey = g.c_nationkey
        |    JOIN ab ON gb.band = ab.band CROSS JOIN a)
        |SELECT c_nationkey, cast(count(*) AS bigint) AS n_bands,
        |  round(cast(sum(tq) AS double) / 1e9, 6) + 0.0 AS psi
        |FROM t GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    "graph_bipartite_projection" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |capped AS (SELECT l_partkey, l_suppkey FROM (
        |    SELECT l_partkey, l_suppkey,
        |      count(*) OVER (PARTITION BY l_partkey) AS nsup FROM ps)
        |  WHERE nsup <= 32)
        |SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
        |  cast(count(*) AS bigint) AS shared_parts
        |FROM capped a JOIN capped b ON a.l_partkey = b.l_partkey
        |  AND a.l_suppkey < b.l_suppkey
        |GROUP BY 1, 2
        |ORDER BY shared_parts DESC, sa, sb LIMIT 50""".stripMargin,
    "events_transition_entropy_rate" ->
      """WITH lagged AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events),
        |st AS (SELECT prev_type AS src, event_type AS dst,
        |    cast(count(*) AS bigint) AS n_st
        |  FROM lagged WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT src, cast(sum(n_st) AS bigint) AS n_s
        |  FROM st GROUP BY 1),
        |h AS (SELECT st.src, n_s,
        |    cast(floor(-(cast(n_st AS double) / cast(n_s AS double)) *
        |      ln(cast(n_st AS double) / cast(n_s AS double)) * 1e9) AS bigint)
        |      AS hq
        |  FROM st JOIN tot ON st.src = tot.src)
        |SELECT src, max(n_s) AS n_transitions,
        |  cast(count(*) AS bigint) AS n_dst_types,
        |  round(cast(sum(hq) AS double) / 1e9, 6) + 0.0 AS entropy_nats
        |FROM h GROUP BY src ORDER BY src""".stripMargin,
    "analytics_seasonal_index" ->
      """WITH monthly AS (
        |  SELECT c_nationkey,
        |    year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |    sum(cast(o_totalprice AS decimal(18,4))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |bym AS (SELECT c_nationkey, ym % 100 AS moy,
        |    cast(count(*) AS bigint) AS n_months, sum(rev) AS rev_moy
        |  FROM monthly GROUP BY 1, 2),
        |byn AS (SELECT c_nationkey, cast(count(*) AS bigint) AS n_all,
        |    sum(rev) AS rev_all
        |  FROM monthly GROUP BY 1)
        |SELECT bym.c_nationkey, moy, n_months,
        |  round((cast(rev_moy AS double) / cast(n_months AS double)) /
        |    (cast(rev_all AS double) / cast(n_all AS double)), 6) + 0.0
        |    AS seasonal_index
        |FROM bym JOIN byn ON bym.c_nationkey = byn.c_nationkey
        |ORDER BY 1, 2""".stripMargin
  )
}
