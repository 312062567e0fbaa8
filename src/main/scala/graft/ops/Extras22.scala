package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-8 fifth-session batch 19 (with Text's text_langid_eval):
  * baseline-model evaluations for next-event prediction and
  * time-series forecasting.
  *
  * Scale discipline: both evals reduce map-side through bounded
  * per-user windows to integer sufficient statistics; nothing bigger
  * than a per-state or one-row aggregate ever shuffles.
  *
  * Float discipline: every error sum is an exact bigint over
  * floor(x·10⁶) integers (|Δ| and the drift residual are integer
  * algebra); accuracies and pooled MAEs are single divisions of those
  * integers; per-user winner counts compare CROSS-MULTIPLIED integer
  * error sums, never per-user float MAEs.
  */
object Extras22 {

  val queries: Map[String, Q] = Map(

    // next-event-type prediction baseline: predict the majority next
    // type given the current type (the transition-matrix argmax) and
    // score it on the same data — the accuracy floor any sequence
    // model must beat.
    "events_transition_baseline_eval" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val trans = e
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val agg = trans.groupBy("from_type")
        .agg(sum(col("n")).as("n_from"),
          max(struct(col("n"), col("to_type"))).as("m"))
      agg.agg(count(lit(1)).as("n_states"),
          sum(col("n_from")).as("n_transitions"),
          sum(col("m.n")).as("n_correct"))
        .select(col("n_states"), col("n_transitions"), col("n_correct"),
          round(col("n_correct").cast(DoubleType) /
            col("n_transitions").cast(DoubleType), 6).as("accuracy"))
    },

    // forecast baseline shootout: naive (ŷ_t = y_{t−1}) vs drift
    // (ŷ_t = 2y_{t−1} − y_{t−2}), pooled MAE each plus the per-user
    // winner census — integer error sums end-to-end, winners decided
    // by cross-multiplied sums.
    "timeseries_forecast_baseline_eval" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(1000000.0)).as("q"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val d = e
        .withColumn("q1", lag(col("q"), 1).over(w))
        .withColumn("q2", lag(col("q"), 2).over(w))
        .withColumn("e_naive", when(col("q1").isNotNull,
          greatest(col("q") - col("q1"), col("q1") - col("q"))))
        .withColumn("e_drift", when(col("q2").isNotNull,
          greatest(col("q") - lit(2L) * col("q1") + col("q2"),
            lit(2L) * col("q1") - col("q2") - col("q"))))
      val perUser = d.groupBy("user_id").agg(
        count(col("e_naive")).as("cn"), sum(col("e_naive")).as("sn"),
        count(col("e_drift")).as("cd"), sum(col("e_drift")).as("sd"))
      perUser.agg(count(lit(1)).as("n_users"),
          sum(col("cn")).as("n_obs_naive"), sum(col("sn")).as("sum_naive"),
          sum(col("cd")).as("n_obs_drift"), sum(col("sd")).as("sum_drift"),
          sum(when(col("sn") * col("cd") < col("sd") * col("cn"), 1L)
            .otherwise(0L)).as("n_users_naive_better"))
        .select(col("n_users"), col("n_obs_naive"), col("n_obs_drift"),
          round(col("sum_naive").cast(DoubleType) /
            (col("n_obs_naive") * 1000000L).cast(DoubleType), 6)
            .as("mae_naive"),
          round(col("sum_drift").cast(DoubleType) /
            (col("n_obs_drift") * 1000000L).cast(DoubleType), 6)
            .as("mae_drift"),
          col("n_users_naive_better"))
    }
  )

  val oracle: Map[String, String] = Map(
    "events_transition_baseline_eval" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |t AS (SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id) AS from_type
        |  FROM e),
        |tr AS (SELECT from_type, to_type, cast(count(*) AS bigint) AS n
        |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |a AS (SELECT from_type, cast(sum(n) AS bigint) AS n_from,
        |    (max(struct_pack(n := n, to_type := to_type))).n AS max_n
        |  FROM tr GROUP BY from_type)
        |SELECT cast(count(*) AS bigint) AS n_states,
        |  cast(sum(n_from) AS bigint) AS n_transitions,
        |  cast(sum(max_n) AS bigint) AS n_correct,
        |  round(cast(sum(max_n) AS double) / cast(sum(n_from) AS double), 6)
        |    AS accuracy
        |FROM a""".stripMargin,
    "timeseries_forecast_baseline_eval" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    cast(floor(value * 1000000.0) AS bigint) AS q
        |  FROM events),
        |d AS (SELECT user_id, q,
        |    lag(q, 1) OVER w AS q1, lag(q, 2) OVER w AS q2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (SELECT user_id,
        |    CASE WHEN q1 IS NOT NULL
        |      THEN greatest(q - q1, q1 - q) END AS e_naive,
        |    CASE WHEN q2 IS NOT NULL
        |      THEN greatest(q - 2 * q1 + q2, 2 * q1 - q2 - q) END AS e_drift
        |  FROM d),
        |pu AS (SELECT user_id,
        |    cast(count(e_naive) AS bigint) AS cn,
        |    cast(sum(e_naive) AS bigint) AS sn,
        |    cast(count(e_drift) AS bigint) AS cd,
        |    cast(sum(e_drift) AS bigint) AS sd
        |  FROM v GROUP BY user_id)
        |SELECT cast(count(*) AS bigint) AS n_users,
        |  cast(sum(cn) AS bigint) AS n_obs_naive,
        |  cast(sum(cd) AS bigint) AS n_obs_drift,
        |  round(cast(sum(sn) AS double)
        |    / cast(sum(cn) * 1000000 AS double), 6) AS mae_naive,
        |  round(cast(sum(sd) AS double)
        |    / cast(sum(cd) * 1000000 AS double), 6) AS mae_drift,
        |  cast(sum(CASE WHEN sn * cd < sd * cn THEN 1 ELSE 0 END)
        |    AS bigint) AS n_users_naive_better
        |FROM pu""".stripMargin
  )
}
