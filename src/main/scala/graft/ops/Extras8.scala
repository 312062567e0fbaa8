package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fourth-session batch 2: batch sessionization, the remaining
  * two-sample hypothesis tests (Welch's t, Mann-Whitney U — completing
  * the chi²/ANOVA/KS family), and the decile Lorenz curve next to
  * [[Stats]]' Gini.
  *
  * Scale discipline: sessionization's windows are all PARTITIONED BY
  * user (bounded state, never a global window); both hypothesis tests
  * reduce map-side to one sufficient-statistics row per side (t-test)
  * or per distinct value (U test, whose midranks come from the
  * exclusive distributed prefix sum); the Lorenz curve is dimension-
  * sized after the per-customer aggregate and cumulates DECIMAL spend
  * (associative — a double cumulative would be shard-order-dependent).
  *
  * Float discipline: timestamps cross as integral epoch MICROSECONDS
  * (never raw ts columns); variances carry the house round-4 (their
  * Σx² decimal exceeds 2⁵³ at sf0.1 — the profile_anova_groups
  * lesson) and every statistic built from them is a fixed IEEE tree
  * over identical inputs, rounded at 6; the U statistic and its tie
  * correction are pure integer arithmetic until the final division.
  */
object Extras8 {

  // 12-hour session gap: the corpus' median inter-event gap is ~7 h,
  // so this yields real multi-event sessions (30 min would make nearly
  // every event its own session here)
  private val gapUs = 43200000000L

  private val splitTs = "1998-01-01"

  val queries: Map[String, Q] = Map(

    // gap-based sessionization: per-user 12 h rule, one row per session.
    "events_sessionize" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      // windows can't nest — materialize the new-session flag, then sum
      val flagged = e.withColumn("ns",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      flagged
        .withColumn("sid", sum(col("ns")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .withColumn("duration_s",
          expr("(end_us - start_us) DIV 1000000"))
        .orderBy("user_id", "sid")
    },

    // Welch's t-test: AUTOMOBILE vs BUILDING account balances.
    "stats_ttest_welch" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .where(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .select(col("c_mktsegment").as("seg"),
          col("c_acctbal").cast(DecimalType(12, 2)).as("x"))
      val g = c.groupBy("seg").agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("x") * col("x")).cast(DoubleType).as("sxx"))
      val m = col("sx") / col("n")
      // round-4 variance: the Σx² decimal exceeds 2⁵³ at sf0.1, where
      // DuckDB's decimal→double cast can be off by an ulp and the
      // subtraction cancels into it
      val v = round((col("sxx") - col("sx") * col("sx") / col("n"))
        / (col("n") - 1), 4)
      val a = g.where(col("seg") === "AUTOMOBILE")
        .select(col("n").as("n1"), m.as("m1"), v.as("v1"))
      val b = g.where(col("seg") === "BUILDING")
        .select(col("n").as("n2"), m.as("m2"), v.as("v2"))
      val se2 = col("v1") / col("n1") + col("v2") / col("n2")
      val t = (col("m1") - col("m2")) / sqrt(se2)
      val dfW = se2 * se2 /
        ((col("v1") / col("n1")) * (col("v1") / col("n1")) / (col("n1") - 1) +
          (col("v2") / col("n2")) * (col("v2") / col("n2")) / (col("n2") - 1))
      a.crossJoin(broadcast(b))
        .select(col("n1"), col("n2"), col("m1"), col("m2"), col("v1"), col("v2"),
          round(t, 6).as("t"), round(dfW, 4).as("df"))
    },

    // Mann-Whitney U (tie-corrected normal approximation) on the
    // pre/post-1998 o_totalprice populations — the rank-based companion
    // to drift_ks over the same split.
    "stats_mannwhitney" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val sides = o.select(col("o_totalprice").as("v"),
        when(col("o_orderdate") < lit(splitTs).cast("timestamp"), 1L)
          .otherwise(0L).as("r"))
      val perV = sides.groupBy("v").agg(
        sum(col("r")).as("nr"), sum(lit(1L) - col("r")).as("nc"))
        .withColumn("cnt", col("nr") + col("nc"))
        .withColumn("g", lit(1))
      val cum = GraftOps.distributedRunningSum(
        perV, "g", "v", "cnt", "cb", exclusive = true)
      // 2×midrank keeps the tie-averaged rank integral: 2·cb + cnt + 1
      val agg = cum.agg(
        sum(col("nr")).as("n1"), sum(col("nc")).as("n2"),
        sum(col("nr") * (lit(2L) * col("cb") + col("cnt") + 1L)).as("r1x2"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
      val u = (col("r1x2") - col("n1") * (col("n1") + 1L))
        .cast(DoubleType) / 2.0
      val nn = col("n1") + col("n2")
      val mu = (col("n1") * col("n2")).cast(DoubleType) / 2.0
      val sig2 = (col("n1") * col("n2")).cast(DoubleType) / 12.0 *
        ((nn + 1L).cast(DoubleType) -
          col("ties").cast(DoubleType) / (nn * (nn - 1L)))
      agg.select(col("n1").as("n_ref"), col("n2").as("n_cur"),
        u.as("u"), round((u - mu) / sqrt(sig2), 6).as("z"))
    },

    // decile Lorenz curve of per-customer spend: the distributional
    // picture behind profile_gini's single number.
    "profile_lorenz_deciles" -> { (s, dir) =>
      val spend = Tables(s, dir, "orders").groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("x"))
        .localCheckpoint(false)
      val deciled = GraftOps.distributedNtile(
        spend, Seq("x", "o_custkey"), 10, "decile")
      val perD = deciled.groupBy("decile")
        .agg(count(lit(1)).as("n_customers"), sum(col("x")).as("spend_dec"))
        .withColumn("g", lit(1))
      // cumulate the DECIMAL spend (associative/exact) — a double
      // cumulative would be shard-order-dependent
      val cum = GraftOps.distributedRunningSum(
        perD, "g", "decile", "spend_dec", "cum_dec")
      val tot = perD.agg(sum(col("spend_dec")).cast(DoubleType).as("tot"))
      cum.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_customers"),
          col("spend_dec").cast(DoubleType).as("spend"),
          (col("spend_dec").cast(DoubleType) / col("tot")).as("share"),
          (col("cum_dec").cast(DoubleType) / col("tot")).as("cum_share"))
        .orderBy("decile")
    }
  )

  val oracle: Map[String, String] = Map(
    "events_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         |l AS (SELECT user_id, event_id, us,
         |        lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pus
         |      FROM e),
         |f AS (SELECT user_id, event_id, us,
         |        CASE WHEN pus IS NULL OR us - pus > $gapUs THEN 1 ELSE 0 END AS ns
         |      FROM l),
         |t AS (SELECT user_id, us,
         |        cast(sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
         |          ROWS UNBOUNDED PRECEDING) AS bigint) AS sid
         |      FROM f)
         |SELECT user_id, sid, cast(count(*) AS bigint) AS n_events,
         |       min(us) AS start_us, max(us) AS end_us,
         |       (max(us) - min(us)) // 1000000 AS duration_s
         |FROM t GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "stats_ttest_welch" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |             cast(c_acctbal AS decimal(12,2)) AS x
        |           FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
        |g AS (SELECT seg, cast(count(*) AS bigint) AS n,
        |             cast(sum(x) AS double) AS sx,
        |             cast(sum(x * x) AS double) AS sxx
        |      FROM c GROUP BY seg),
        |a AS (SELECT n AS n1, sx / n AS m1,
        |             round((sxx - sx * sx / n) / (n - 1), 4) AS v1
        |      FROM g WHERE seg = 'AUTOMOBILE'),
        |b AS (SELECT n AS n2, sx / n AS m2,
        |             round((sxx - sx * sx / n) / (n - 1), 4) AS v2
        |      FROM g WHERE seg = 'BUILDING')
        |SELECT n1, n2, m1, m2, v1, v2,
        |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
        |  round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
        |    / ((v1 / n1) * (v1 / n1) / (n1 - 1)
        |     + (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS df
        |FROM a CROSS JOIN b""".stripMargin,
    "stats_mannwhitney" ->
      s"""WITH b AS (
         |  SELECT o_totalprice AS v,
         |         CASE WHEN o_orderdate < TIMESTAMP '$splitTs' THEN 1 ELSE 0 END AS r
         |  FROM orders),
         |c AS (SELECT v, cast(sum(r) AS bigint) AS nr,
         |             cast(sum(1 - r) AS bigint) AS nc
         |      FROM b GROUP BY v),
         |w AS (SELECT v, nr, nc, nr + nc AS cnt,
         |        cast(coalesce(sum(nr + nc) OVER (ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS bigint) AS cb
         |      FROM c),
         |a AS (SELECT cast(sum(nr) AS bigint) AS n1,
         |             cast(sum(nc) AS bigint) AS n2,
         |             cast(sum(nr * (2 * cb + cnt + 1)) AS bigint) AS r1x2,
         |             cast(sum(cnt * cnt * cnt - cnt) AS bigint) AS ties
         |      FROM w)
         |SELECT n1 AS n_ref, n2 AS n_cur,
         |  cast(r1x2 - n1 * (n1 + 1) AS double) / 2.0 AS u,
         |  round((cast(r1x2 - n1 * (n1 + 1) AS double) / 2.0
         |      - cast(n1 * n2 AS double) / 2.0)
         |    / sqrt(cast(n1 * n2 AS double) / 12.0
         |      * (cast(n1 + n2 + 1 AS double)
         |        - cast(ties AS double) / ((n1 + n2) * (n1 + n2 - 1)))), 6) AS z
         |FROM a""".stripMargin,
    "profile_lorenz_deciles" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(cast(o_totalprice AS decimal(18,4))) AS x
        |  FROM orders GROUP BY o_custkey),
        |d AS (SELECT x, ntile(10) OVER (ORDER BY x, o_custkey) AS decile FROM spend),
        |p AS (SELECT decile, cast(count(*) AS bigint) AS n_customers,
        |             sum(x) AS spend_dec
        |      FROM d GROUP BY decile),
        |c AS (SELECT decile, n_customers, spend_dec,
        |        sum(spend_dec) OVER (ORDER BY decile
        |          ROWS UNBOUNDED PRECEDING) AS cum_dec,
        |        cast(sum(spend_dec) OVER () AS double) AS tot
        |      FROM p)
        |SELECT decile, n_customers, cast(spend_dec AS double) AS spend,
        |       cast(spend_dec AS double) / tot AS share,
        |       cast(cum_dec AS double) / tot AS cum_share
        |FROM c ORDER BY decile""".stripMargin
  )
}
