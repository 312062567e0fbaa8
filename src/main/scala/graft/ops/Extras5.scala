package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Round-5 analytics additions.
  *
  * - `timeseries_resample_gapfill`: regularize an event stream to a fixed
  *   calendar grid — per user, one row per DAY between that user's first
  *   and last event, zero-filled where no events landed. The spine is
  *   generated per key from its own (min, max) aggregate via
  *   `sequence(...)` + explode — NO driver-side date loop, no global
  *   calendar table, and the spine join is an equi-join on (user, day).
  *   At 100 TB the spine is |users| × |days| rows built map-side from a
  *   user-sized aggregate, and the daily aggregate it joins is already
  *   grouped — both sides shuffle once on the composite key.
  * - `events_retention`: day-over-day retention — for each day, how many
  *   distinct users were also active the previous day. Distinct user-days
  *   once (one shuffle), then a self equi-join on (user, day+1) — the
  *   classic cohort primitive without any window or cross join.
  */
object Extras5 {

  val queries: Map[String, Q] = Map(
    "timeseries_resample_gapfill" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      val daily = e.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
      val spine = e.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("value_sum"), lit(0.0)).as("value_sum"))
        .orderBy(col("user_id"), col("day"))
    },

    "events_retention" -> { (s, dir) =>
      val ud = Tables(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val prev = ud.select(col("user_id").as("puser"), col("day").as("pday"))
      ud.join(prev,
          col("user_id") === col("puser") && col("day") === date_add(col("pday"), 1))
        .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("retained_users"))
        .orderBy(col("day"))
    }
  )

  val oracle: Map[String, String] = Map(
    "timeseries_resample_gapfill" ->
      s"""WITH e AS (SELECT user_id, cast(cast(ts as timestamp) as date) AS day, value FROM events),
         |daily AS (SELECT user_id, day, count(*) AS n_events,
         |    ${sqlDsum("value")} AS value_sum
         |  FROM e GROUP BY 1, 2),
         |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
         |spine AS (SELECT user_id,
         |    cast(unnest(generate_series(cast(d0 as timestamp), cast(d1 as timestamp),
         |                                INTERVAL 1 DAY)) as date) AS day
         |  FROM bounds)
         |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
         |  coalesce(d.n_events, 0) AS n_events,
         |  coalesce(d.value_sum, 0.0) AS value_sum
         |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
         |ORDER BY s.user_id, day""".stripMargin,
    "events_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, cast(cast(ts as timestamp) as date) AS day FROM events)
        |SELECT strftime(a.day, '%Y-%m-%d') AS day, count(*) AS retained_users
        |FROM ud a JOIN ud b ON a.user_id = b.user_id AND a.day = b.day + 1
        |GROUP BY 1 ORDER BY day""".stripMargin
  )
}
