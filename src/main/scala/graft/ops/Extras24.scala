package graft.ops

import graft._
import graft.Tables.dec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 21: rolling z-score anomaly flags,
  * nation trade balance, degree assortativity, and signup→purchase
  * latency.
  *
  * Scale discipline: rolling statistics ride bounded per-user frames;
  * trade balance is two fact aggregates joined at the nation grain;
  * assortativity reduces the (already minWeight-reduced) edge table to
  * six integer sufficient sums; the latency funnel is two per-user
  * conditional aggregates.
  *
  * Float discipline: the rolling z is
  * (7q − Σq)/√(7Σq² − (Σq)²) over exact milli-quantized frame sums
  * (milli, not micro: (Σq)² of 7 micro-quantized terms overflows
  * int64 — sized, not guessed); its flags compare doubles both
  * engines computed identically. Assortativity runs the Spearman
  * wide-product template (Spark decimals / DuckDB HUGEINT). Money
  * stays decimal; latencies are integral seconds through the
  * percentile [T] bridge.
  */
object Extras24 {

  val queries: Map[String, Q] = Map(

    // rolling 7-point z-score anomaly flags per user (full frames
    // only): |z| > 2 events counted, plus the user's max |z|.
    "timeseries_rolling_zscore_flags" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(1000.0)).as("q"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val f = w.rowsBetween(-6, 0)
      val d = e
        .withColumn("i", row_number().over(w))
        .withColumn("fs", sum(col("q")).over(f))
        .withColumn("fs2", sum(col("q") * col("q")).over(f))
        .where(col("i") >= 7)
        .withColumn("den2", lit(7L) * col("fs2") - col("fs") * col("fs"))
        .withColumn("z",
          when(col("den2") > 0L,
            (lit(7L) * col("q") - col("fs")).cast(DoubleType) /
              sqrt(col("den2").cast(DoubleType))))
        .withColumn("absz", greatest(col("z"), -col("z")))
      d.groupBy("user_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("absz") > 2.0, 1L).otherwise(0L)).as("n_flags"),
          round(max(col("absz")), 6).as("max_abs_z"))
        .orderBy("user_id")
    },

    // nation trade balance over the supply chain: revenue supplied
    // (exports) vs revenue purchased (imports) per nation.
    "analytics_nation_trade_balance" -> { (s, dir) =>
      val sup = Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nk"))
        .agg(sum(dec(col("l_extendedprice"))).as("exp_dec"))
      val cus = Tables(s, dir, "orders")
        .join(broadcast(Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(dec(col("o_totalprice"))).as("imp_dec"))
      sup.join(cus, "nk")
        .join(broadcast(Tables(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("nk") === col("n_nationkey"))
        .select(col("n_name"),
          col("exp_dec").cast(DoubleType).as("exports"),
          col("imp_dec").cast(DoubleType).as("imports"),
          (col("exp_dec") - col("imp_dec")).cast(DoubleType).as("balance"))
        .orderBy("n_name")
    },

    // degree assortativity of the strong co-purchase graph: Pearson r
    // over edge endpoint degrees (both orientations) — do hubs link to
    // hubs? The Spearman wide-product template over six integer sums.
    "graph_assortativity" -> { (s, dir) =>
      // shared memoized edge build — the persisted edge table feeds the
      // degree aggregate and both union orientations without a rebuild
      val edges = Graph.strongEdgesCached(s, dir).select("pa", "pb")
      val deg = edges.select(col("pa").as("p"))
        .unionAll(edges.select(col("pb").as("p")))
        .groupBy("p").agg(count(lit(1)).as("d"))
        .localCheckpoint(false) // feeds the moment rollup AND two joins
      // r14 rework (guide §1.2 first-principles): over BOTH edge
      // orientations the marginal sums are degree-grain identities — node
      // p appears as an endpoint exactly d_p times, so n = Σd, sx = sy =
      // Σd², sxx = syy = Σd³ (exact integer equalities, same values the
      // 2|E|-row join-side aggregation produced). Only the cross moment
      // needs edge-level pairing: sxy = 2·Σ_edges d_pa·d_pb. This drops
      // the doubled-orientation union and one of the two wedge-scale
      // join passes.
      val dsums = deg.agg(sum(col("d")).as("n"),
        sum(col("d") * col("d")).as("s2"),
        sum(col("d") * col("d") * col("d")).as("s3"))
      val exy = edges
        .join(deg.select(col("p").as("pa"), col("d").as("dxa")), "pa")
        .join(deg.select(col("p").as("pb"), col("d").as("dyb")), "pb")
        .agg((lit(2L) * sum(col("dxa") * col("dyb"))).as("sxy"))
      val sums = exy.crossJoin(broadcast(dsums))
        .select(col("n"), col("s2").as("sx"), col("s2").as("sy"),
          col("s3").as("sxx"), col("s3").as("syy"), col("sxy"))
      val dn = DecimalType(12, 0)
      val ds = DecimalType(18, 0)
      val num = col("n").cast(dn) * col("sxy").cast(ds) -
        col("sx").cast(ds) * col("sy").cast(ds)
      val dx = col("n").cast(dn) * col("sxx").cast(ds) -
        col("sx").cast(ds) * col("sx").cast(ds)
      val dy = col("n").cast(dn) * col("syy").cast(ds) -
        col("sy").cast(ds) * col("sy").cast(ds)
      sums.select(expr("n DIV 2").as("n_edges"),
        // + 0.0 normalizes IEEE -0.0 on a near-zero assortativity
        (round(num.cast(DoubleType) /
          (sqrt(dx.cast(DoubleType)) * sqrt(dy.cast(DoubleType))), 6)
          + lit(0.0)).as("assortativity"))
    },

    // signup → first-purchase latency funnel: conversion share and the
    // latency quantiles of those who convert (integral seconds).
    "events_signup_to_purchase_latency" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val su = e.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("us")).as("signup_us"))
      val conv = e.where(col("event_type") === "purchase")
        .join(su, "user_id")
        .where(col("us") >= col("signup_us"))
        .groupBy("user_id")
        .agg(min(expr("(us - signup_us) DIV 1000000")).as("lat_s"))
      val nS = su.agg(count(lit(1)).as("n_signup_users"))
      val cStats = conv.agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat_s, 0.5)"), 4).as("p50_latency_s"),
        round(expr("percentile(lat_s, 0.9)"), 4).as("p90_latency_s"))
      nS.crossJoin(broadcast(cStats))
        .select(col("n_signup_users"), col("n_converted"),
          round(col("n_converted").cast(DoubleType) /
            col("n_signup_users").cast(DoubleType), 6).as("conversion"),
          col("p50_latency_s"), col("p90_latency_s"))
    }
  )

  val oracle: Map[String, String] = Map(
    "timeseries_rolling_zscore_flags" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    cast(floor(value * 1000.0) AS bigint) AS q
        |  FROM events),
        |d AS (SELECT user_id, q,
        |    row_number() OVER w AS i,
        |    cast(sum(q) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS bigint) AS fs,
        |    cast(sum(q * q) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS bigint) AS fs2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (SELECT user_id,
        |    CASE WHEN 7 * fs2 - fs * fs > 0
        |      THEN cast(7 * q - fs AS double)
        |        / sqrt(cast(7 * fs2 - fs * fs AS double)) END AS z
        |  FROM d WHERE i >= 7),
        |a AS (SELECT user_id, greatest(z, -z) AS absz FROM v)
        |SELECT user_id, cast(count(*) AS bigint) AS n_windows,
        |  cast(sum(CASE WHEN absz > 2.0 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_flags,
        |  round(max(absz), 6) AS max_abs_z
        |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,
    "analytics_nation_trade_balance" ->
      """WITH sup AS (SELECT s_nationkey AS nk,
        |    sum(cast(l_extendedprice AS decimal(18,4))) AS exp_dec
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |cus AS (SELECT c_nationkey AS nk,
        |    sum(cast(o_totalprice AS decimal(18,4))) AS imp_dec
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT n_name, cast(exp_dec AS double) AS exports,
        |  cast(imp_dec AS double) AS imports,
        |  cast(exp_dec - imp_dec AS double) AS balance
        |FROM sup JOIN cus USING (nk)
        |JOIN nation ON nk = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "graph_assortativity" ->
      """WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT l_orderkey, l_partkey, count(*) OVER (PARTITION BY l_orderkey) AS bsz FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)) WHERE bsz <= 64),
        |p0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |e AS (SELECT pa, pb FROM (SELECT pa, pb, count(*) AS w
        |  FROM p0 GROUP BY pa, pb) WHERE w >= 2),
        |deg AS (SELECT p, cast(count(*) AS bigint) AS d FROM (
        |  SELECT pa AS p FROM e UNION ALL SELECT pb FROM e) GROUP BY p),
        |b AS (SELECT pa AS x, pb AS y FROM e
        |      UNION ALL SELECT pb, pa FROM e),
        |s AS (SELECT cast(count(*) AS bigint) AS n,
        |    cast(sum(dx.d) AS bigint) AS sx, cast(sum(dy.d) AS bigint) AS sy,
        |    cast(sum(dx.d * dx.d) AS bigint) AS sxx,
        |    cast(sum(dy.d * dy.d) AS bigint) AS syy,
        |    cast(sum(dx.d * dy.d) AS bigint) AS sxy
        |  FROM b JOIN deg dx ON b.x = dx.p JOIN deg dy ON b.y = dy.p)
        |SELECT n // 2 AS n_edges,
        |  round(cast(cast(n AS hugeint) * cast(sxy AS hugeint)
        |      - cast(sx AS hugeint) * cast(sy AS hugeint) AS double)
        |    / (sqrt(cast(cast(n AS hugeint) * cast(sxx AS hugeint)
        |        - cast(sx AS hugeint) * cast(sx AS hugeint) AS double))
        |      * sqrt(cast(cast(n AS hugeint) * cast(syy AS hugeint)
        |        - cast(sy AS hugeint) * cast(sy AS hugeint) AS double))),
        |    6) + 0.0 AS assortativity
        |FROM s""".stripMargin,
    "events_signup_to_purchase_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |su AS (SELECT user_id, cast(min(us) AS bigint) AS signup_us
        |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (SELECT e.user_id,
        |    cast(min((us - signup_us) // 1000000) AS bigint) AS lat_s
        |  FROM e JOIN su ON e.user_id = su.user_id
        |  WHERE event_type = 'purchase' AND us >= signup_us
        |  GROUP BY e.user_id),
        |ns AS (SELECT cast(count(*) AS bigint) AS n_signup_users FROM su),
        |cs AS (SELECT cast(count(*) AS bigint) AS n_converted,
        |    round(quantile_cont(lat_s, 0.5), 4) AS p50_latency_s,
        |    round(quantile_cont(lat_s, 0.9), 4) AS p90_latency_s
        |  FROM conv)
        |SELECT n_signup_users, n_converted,
        |  round(cast(n_converted AS double) / cast(n_signup_users AS double),
        |    6) AS conversion,
        |  p50_latency_s, p90_latency_s
        |FROM ns CROSS JOIN cs""".stripMargin
  )
}
