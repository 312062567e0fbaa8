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

    // OHLC resampling: one aggregate pass per day bucket — open/close
    // via lexicographic struct min/max (Spark struct ordering == DuckDB
    // struct_pack ordering, probed), so no per-bucket window and no
    // second shuffle. Day = integral epoch-day index (us DIV 86.4e9) —
    // no timezone/date_trunc surface at all.
    "timeseries_ohlc" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      e.groupBy(expr("us DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("us"), col("event_id"), col("value"))).as("fst"),
          max(struct(col("us"), col("event_id"), col("value"))).as("lst"),
          max(col("value")).as("high"), min(col("value")).as("low"))
        .select(col("day"), col("n"), col("fst.value").as("open"),
          col("high"), col("low"), col("lst.value").as("close"))
        .orderBy("day")
    },

    // cumulative distinct event types per user over time — the
    // "exploration breadth" curve. First-occurrence flag from a
    // per-(user, type) window, running sum from a per-user window: both
    // partitions are bounded (one user's history), never global.
    "window_running_distinct" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy("us", "event_id")
      val wRun = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("f",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
        .withColumn("k_types", sum(col("f")).over(wRun))
        .select(col("event_id"), col("user_id"), col("k_types"))
        .orderBy("event_id")
    },

    // exact per-group quartiles: the grouped twin of profile_quantiles.
    "profile_quantiles_by_group" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      c.groupBy("c_mktsegment").agg(
        count(lit(1)).as("n"),
        round(expr("percentile(c_acctbal, 0.25)"), 4).as("p25"),
        round(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
        round(expr("percentile(c_acctbal, 0.75)"), 4).as("p75"))
        .orderBy("c_mktsegment")
    },

    // Zipf log-log fit over the corpus vocabulary: ln(freq) ~ ln(rank)
    // OLS. Ranks from the distributed prefix sum (freq desc, word
    // tiebreak); each ln is round-6 (libm), the OLS sufficient sums are
    // DECIMAL(18,12)-exact, and the closed-form slope/intercept/r² are
    // fixed IEEE trees — the Heaps-law (text_vocab_growth) companion.
    "text_zipf_fit" -> { (s, dir) =>
      val tf = Tables(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .withColumn("nfreq", -col("freq"))
      val ranked = GraftOps.distributedRank(tf, Seq("nfreq", "word"), "rank")
      val pts = ranked.select(
        round(log(col("rank").cast(DoubleType)), 6).as("x"),
        round(log(col("freq").cast(DoubleType)), 6).as("y"))
      val g = pts.agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(18, 12))).cast(DoubleType).as("sx"),
        sum(col("y").cast(DecimalType(18, 12))).cast(DoubleType).as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("syy"),
        sum((col("x") * col("y")).cast(DecimalType(18, 12)))
          .cast(DoubleType).as("sxy"))
      val covN = col("n") * col("sxy") - col("sx") * col("sy")
      val varXN = col("n") * col("sxx") - col("sx") * col("sx")
      val varYN = col("n") * col("syy") - col("sy") * col("sy")
      g.select(col("n").as("vocab"),
        round(covN / varXN, 6).as("slope"),
        round((col("sy") - covN / varXN * col("sx")) / col("n"), 6).as("intercept"),
        round(covN * covN / (varXN * varYN), 6).as("r2"))
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
    "timeseries_ohlc" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_id, value FROM events),
        |g AS (SELECT us // 86400000000 AS day,
        |        cast(count(*) AS bigint) AS n,
        |        min(struct_pack(us := us, event_id := event_id,
        |                        value := value)) AS fst,
        |        max(struct_pack(us := us, event_id := event_id,
        |                        value := value)) AS lst,
        |        max(value) AS high, min(value) AS low
        |      FROM e GROUP BY 1)
        |SELECT day, n, fst.value AS open, high, low, lst.value AS close
        |FROM g ORDER BY day""".stripMargin,
    "window_running_distinct" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |f AS (SELECT user_id, event_id, us,
        |        CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |               ORDER BY us, event_id) = 1 THEN 1 ELSE 0 END AS fl
        |      FROM e)
        |SELECT event_id, user_id,
        |  cast(sum(fl) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS bigint) AS k_types
        |FROM f ORDER BY event_id""".stripMargin,
    "profile_quantiles_by_group" ->
      """SELECT c_mktsegment, cast(count(*) AS bigint) AS n,
        |  round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
        |  round(quantile_cont(c_acctbal, 0.75), 4) AS p75
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "text_zipf_fit" ->
      """WITH tf AS (SELECT word, cast(count(*) AS bigint) AS freq
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
        |        FROM documents) GROUP BY word),
        |r AS (SELECT freq, cast(row_number() OVER (ORDER BY -freq, word)
        |        AS bigint) AS rank FROM tf),
        |pts AS (SELECT round(ln(cast(rank AS double)), 6) AS x,
        |               round(ln(cast(freq AS double)), 6) AS y FROM r),
        |g AS (SELECT cast(count(*) AS bigint) AS n,
        |        cast(sum(cast(x AS decimal(18,12))) AS double) AS sx,
        |        cast(sum(cast(y AS decimal(18,12))) AS double) AS sy,
        |        cast(sum(cast(x * x AS decimal(18,12))) AS double) AS sxx,
        |        cast(sum(cast(y * y AS decimal(18,12))) AS double) AS syy,
        |        cast(sum(cast(x * y AS decimal(18,12))) AS double) AS sxy
        |      FROM pts)
        |SELECT n AS vocab,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |    AS intercept,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM g""".stripMargin,
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
