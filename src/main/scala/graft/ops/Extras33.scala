package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-10 batch 5: forecast backtest (the eval that closes the Holt
  * loop) and Kaplan-Meier BY SEGMENT (the survival kernel in its
  * partitioned mode — one prefix-sum pass for every segment at once).
  */
object Extras33 {

  val queries: Map[String, Q] = Map(
    // backtest of the Holt forecast against the REALIZED month: the
    // h=1 forecast for 2001-07 vs the actual July revenue (the data runs
    // through 2001-08-01, so July is complete). Shares the exact fold
    // frame with forecast_holt_winters (Extras29.holtFrame — one wide
    // 1-row aggregate carries the actual too); error terms are fixed
    // IEEE trees over bit-equal inputs, only the pct error is rounded.
    "forecast_backtest_eval" -> { (s, dir) =>
      Extras29.holtFrame(s, dir)
        .select(lit(200107).as("ym"),
          (col("l6") + lit(1.0) * col("b6") + col("s7")).as("forecast"),
          col("m200107").as("actual"))
        .select(col("ym"), col("forecast"), col("actual"),
          (col("forecast") - col("actual")).as("error"),
          round(abs(col("forecast") - col("actual")) / col("actual"), 6)
            .as("abs_pct_error"))
    },

    // Kaplan-Meier churn curves PER MARKET SEGMENT — the comparison a
    // retention analyst actually draws (do BUILDING customers churn
    // faster than MACHINERY?). Exactly the survival_kaplan_meier
    // machinery with the segment as the prefix-sum kernel's PARTITION
    // key: one customer-grain agg (orders ⋈ broadcast customer-segment
    // dim), one (segment, t) grain agg, and BOTH cumulatives — at-risk
    // countdown and DECIMAL(18,12) log-survival — ride ONE partitioned
    // distributed-prefix-sum pass each, all segments in parallel. The
    // all-churn zero-factor guard is per segment.
    "survival_km_by_segment" -> { (s, dir) =>
      val seg = Tables(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val orders = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"))
      val cust = orders.groupBy("o_custkey")
        .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))
        .join(broadcast(seg), Seq("o_custkey"))
      val maxd = orders.agg(max(col("d")).as("maxd"))
      val life = cust.crossJoin(broadcast(maxd))
        .select(col("segment"),
          datediff(col("last_d"), col("first_d")).cast("long").as("t"),
          when(datediff(col("maxd"), col("last_d")) > 90, 1L).otherwise(0L)
            .as("event"))
      // r14 (guide §2.4): grain and ar each feed two consumers — without
      // checkpoints the (segment, t) pipeline (including the first
      // prefix-sum kernel) replayed per consumer: the committed plan held
      // 59 exchanges. Checkpoint both; n_total rolls up from grain
      // instead of a second life pass (sum of per-(segment, t) counts ≡
      // per-segment row count).
      val grain = life.groupBy("segment", "t").agg(
        sum(col("event")).as("d"),
        count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val tot = grain.groupBy("segment")
        .agg(sum(col("cnt")).as("n_total"))
      val cum1 = GraftOps.distributedRunningSum(
        grain.select(col("segment"), col("t"), col("cnt")),
        "segment", "t", "cnt", "cum_incl")
      val ar = grain.join(cum1.select("segment", "t", "cum_incl"),
          Seq("segment", "t"))
        .join(broadcast(tot), Seq("segment"))
        .select(col("segment"), col("t"), col("d"),
          (col("n_total") - col("cum_incl") + col("cnt")).as("n_at_risk"))
        .localCheckpoint(false)
      val terms = ar.select(col("segment"), col("t"),
        log(nullif(col("n_at_risk") - col("d"), lit(0L)).cast(DoubleType) /
          col("n_at_risk").cast(DoubleType)).cast(DecimalType(18, 12))
          .as("term"),
        when(col("d") === col("n_at_risk"), 1L).otherwise(0L).as("zflag"))
      val cum2 = GraftOps.distributedRunningSums(terms, "segment", "t",
        Seq("term" -> "ln_s", "zflag" -> "zsum"))
      ar.join(cum2.select("segment", "t", "ln_s", "zsum"), Seq("segment", "t"))
        .select(col("segment"), col("t"), col("n_at_risk"),
          col("d").as("n_events"),
          when(col("zsum") > 0L, lit(0.0))
            .otherwise(round(exp(col("ln_s").cast(DoubleType)), 6))
            .as("survival"))
        .orderBy("segment", "t")
    }
  )

  val oracle: Map[String, String] = Map(
    "forecast_backtest_eval" ->
      s"""WITH ${Extras29.sqlHoltCtes}
        |SELECT 200107 AS ym,
        |  l6 + 1.0 * b6 + s7 AS forecast,
        |  m200107 AS actual,
        |  (l6 + 1.0 * b6 + s7) - m200107 AS error,
        |  round(abs((l6 + 1.0 * b6 + s7) - m200107) / m200107, 6)
        |    AS abs_pct_error
        |FROM f6""".stripMargin,
    "survival_km_by_segment" ->
      """WITH seg AS (SELECT c_custkey, c_mktsegment AS segment FROM customer),
        |cust AS (SELECT o_custkey,
        |    min(o_orderdate::date) AS f, max(o_orderdate::date) AS l
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(o_orderdate::date) AS maxd FROM orders),
        |life AS (SELECT s.segment, date_diff('day', f, l) AS t,
        |    CASE WHEN date_diff('day', l, maxd) > 90 THEN 1 ELSE 0 END AS ev
        |  FROM cust c JOIN seg s ON c.o_custkey = s.c_custkey CROSS JOIN mx),
        |grain AS (SELECT segment, t, cast(sum(ev) AS bigint) AS d,
        |    cast(count(*) AS bigint) AS cnt
        |  FROM life GROUP BY 1, 2),
        |tot AS (SELECT segment, cast(count(*) AS bigint) AS n
        |  FROM life GROUP BY segment),
        |ar AS (SELECT g.segment, g.t, g.d, g.cnt,
        |    n - (sum(cnt) OVER (PARTITION BY g.segment ORDER BY g.t) - cnt)
        |      AS n_at_risk
        |  FROM grain g JOIN tot USING (segment)),
        |surv AS (SELECT segment, t, d, n_at_risk,
        |    sum(cast(ln(cast(nullif(n_at_risk - d, 0) AS double)
        |          / cast(n_at_risk AS double)) AS decimal(18,12)))
        |      OVER (PARTITION BY segment ORDER BY t) AS ln_s,
        |    sum(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY segment ORDER BY t) AS zsum
        |  FROM ar)
        |SELECT segment, t, cast(n_at_risk AS bigint) AS n_at_risk,
        |  d AS n_events,
        |  CASE WHEN zsum > 0 THEN 0.0
        |       ELSE round(exp(cast(ln_s AS double)), 6) END AS survival
        |FROM surv ORDER BY segment, t""".stripMargin
  )
}
