package graft.ops

import graft._
import graft.Tables.{davg, dec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 16: recency-decay scoring, tumbling
  * top-k, burst detection, and expectation-suite validation.
  *
  * Scale discipline: decay scores and burst flags reduce map-side to
  * per-user aggregates (the only broadcast is the one-row corpus
  * horizon); tumbling top-k is one aggregate to the (window, type)
  * grain plus a struct argmax per window; the expectation suite is six
  * independent one-row aggregates unioned.
  *
  * Float discipline: the decay weight is 2^(−age) — an EXACT power of
  * two for integral ages in both engines (the exact-binary-fraction
  * EWMA rule), so value·2^(−age) is one identical IEEE product per
  * row, folded through decimal(24,12); burst tests compare pure
  * integers (cnt·n_days > 2·total — never a mean); expectation
  * observations ride the established decimal/davg disciplines.
  */
object Extras19 {

  val queries: Map[String, Q] = Map(

    // recency-weighted activity score (λ = 1/2 per day): the recsys
    // feature that forgets exponentially. 2^(−age) is exact binary at
    // every integral age — no renormalization, no drift.
    "events_decay_score" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("value"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
      val horizon = e.agg(max(col("day")).as("max_day"))
      e.crossJoin(broadcast(horizon))
        .select(col("user_id"),
          (col("value") * pow(lit(2.0), -(col("max_day") - col("day"))
            .cast(DoubleType))).cast(DecimalType(24, 12)).as("term"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("term")).cast(DoubleType), 6).as("decay_score"))
        .orderBy("user_id")
    },

    // tumbling-window top-k (k = 1) event type per 5-minute window —
    // the batch twin of a streaming windowed top-k (same aggregate
    // shape Structured Streaming would run per watermark-closed
    // window); ties break to the lexicographically LARGER type.
    "stream_tumbling_topk" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        expr("unix_micros(ts) DIV 300000000").as("win"), col("event_type"))
      e.groupBy("win", "event_type").agg(count(lit(1)).as("cnt"))
        .groupBy("win")
        .agg(sum(col("cnt")).as("n_total"),
          max(struct(col("cnt"), col("event_type"))).as("m"))
        .select(col("win"), col("m.event_type").as("top_type"),
          col("m.cnt").as("n_top"), col("n_total"))
        .orderBy("win")
    },

    // burst detection: days where a user's activity exceeds twice
    // their own daily mean — compared in pure integers
    // (cnt·n_days > 2·total), never through a floating mean.
    "events_burst_days" -> { (s, dir) =>
      val perDay = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 86400000000").as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("cnt"))
      val perUser = perDay.groupBy("user_id")
        .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("total"),
          max(col("cnt")).as("max_day_cnt"))
      perUser.join(perDay, "user_id")
        .groupBy("user_id", "n_days", "total", "max_day_cnt")
        .agg(sum(when(col("cnt") * col("n_days") > col("total") * 2L, 1L)
          .otherwise(0L)).as("n_burst_days"))
        .select(col("user_id"), col("n_days"), col("n_burst_days"),
          col("max_day_cnt"))
        .orderBy("user_id")
    },

    // expectation-suite validation (the great-expectations pattern):
    // six declarative checks, each one observed statistic against
    // published bounds — the contract a data product ships with.
    "validate_expectations" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val c = Tables(s, dir, "customer")
      val e = Tables(s, dir, "events")
      def check(name: String, observed: org.apache.spark.sql.Column,
          df: DataFrame, lo: Double, hi: Double): DataFrame =
        df.agg(round(observed, 6).as("observed"))
          .select(lit(name).as("check"), col("observed"),
            lit(lo).as("lo"), lit(hi).as("hi"),
            (col("observed") >= lo && col("observed") <= hi).as("pass"))
      check("orders_mean_price", davg(col("o_totalprice")), o,
          150000.0, 350000.0)
        .unionByName(check("orders_custkey_null_rate",
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
            .cast(DoubleType) / count(lit(1)).cast(DoubleType),
          o, 0.0, 0.001))
        .unionByName(check("lineitem_max_discount",
          max(col("l_discount")), li, 0.0, 0.11))
        .unionByName(check("lineitem_lines_per_order",
          count(lit(1)).cast(DoubleType) /
            countDistinct(col("l_orderkey")).cast(DoubleType),
          li, 1.0, 10.0))
        .unionByName(check("customer_key_uniqueness",
          countDistinct(col("c_custkey")).cast(DoubleType) /
            count(lit(1)).cast(DoubleType), c, 1.0, 1.0))
        .unionByName(check("events_min_epoch_day",
          min(expr("unix_micros(ts) DIV 86400000000")).cast(DoubleType),
          e, 19000.0, 30000.0))
        .orderBy("check")
    }
  )

  val oracle: Map[String, String] = Map(
    "events_decay_score" ->
      """WITH e AS (SELECT user_id, value,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |h AS (SELECT max(day) AS max_day FROM e)
        |SELECT user_id, cast(count(*) AS bigint) AS n_events,
        |  round(cast(sum(cast(value * pow(2.0,
        |      -cast(max_day - day AS double)) AS decimal(24,12)))
        |    AS double), 6) AS decay_score
        |FROM e CROSS JOIN h GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_tumbling_topk" ->
      """WITH c AS (SELECT epoch_us(ts) // 300000000 AS win, event_type,
        |    cast(count(*) AS bigint) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT win,
        |  (max(struct_pack(cnt := cnt, event_type := event_type))).event_type
        |    AS top_type,
        |  (max(struct_pack(cnt := cnt, event_type := event_type))).cnt
        |    AS n_top,
        |  cast(sum(cnt) AS bigint) AS n_total
        |FROM c GROUP BY win ORDER BY win""".stripMargin,
    "events_burst_days" ->
      """WITH pd AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    cast(count(*) AS bigint) AS cnt
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, cast(count(*) AS bigint) AS n_days,
        |    cast(sum(cnt) AS bigint) AS total,
        |    cast(max(cnt) AS bigint) AS max_day_cnt
        |  FROM pd GROUP BY user_id)
        |SELECT u.user_id, n_days,
        |  cast(sum(CASE WHEN pd.cnt * n_days > total * 2
        |    THEN 1 ELSE 0 END) AS bigint) AS n_burst_days,
        |  max_day_cnt
        |FROM u JOIN pd ON u.user_id = pd.user_id
        |GROUP BY u.user_id, n_days, total, max_day_cnt
        |ORDER BY u.user_id""".stripMargin,
    "validate_expectations" ->
      """SELECT 'customer_key_uniqueness' AS check,
        |  round(cast(count(DISTINCT c_custkey) AS double)
        |    / cast(count(*) AS double), 6) AS observed,
        |  1.0 AS lo, 1.0 AS hi,
        |  round(cast(count(DISTINCT c_custkey) AS double)
        |    / cast(count(*) AS double), 6) BETWEEN 1.0 AND 1.0 AS pass
        |FROM customer
        |UNION ALL
        |SELECT 'events_min_epoch_day',
        |  round(cast(min(epoch_us(ts) // 86400000000) AS double), 6),
        |  19000.0, 30000.0,
        |  round(cast(min(epoch_us(ts) // 86400000000) AS double), 6)
        |    BETWEEN 19000.0 AND 30000.0
        |FROM events
        |UNION ALL
        |SELECT 'lineitem_lines_per_order',
        |  round(cast(count(*) AS double)
        |    / cast(count(DISTINCT l_orderkey) AS double), 6),
        |  1.0, 10.0,
        |  round(cast(count(*) AS double)
        |    / cast(count(DISTINCT l_orderkey) AS double), 6)
        |    BETWEEN 1.0 AND 10.0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_max_discount', round(max(l_discount), 6),
        |  0.0, 0.11, round(max(l_discount), 6) BETWEEN 0.0 AND 0.11
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_custkey_null_rate',
        |  round(cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS double) / cast(count(*) AS double), 6),
        |  0.0, 0.001,
        |  round(cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS double) / cast(count(*) AS double), 6)
        |    BETWEEN 0.0 AND 0.001
        |FROM orders
        |UNION ALL
        |SELECT 'orders_mean_price',
        |  round(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double)
        |    / count(*), 6),
        |  150000.0, 350000.0,
        |  round(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double)
        |    / count(*), 6) BETWEEN 150000.0 AND 350000.0
        |FROM orders
        |ORDER BY "check"""".stripMargin
  )
}
