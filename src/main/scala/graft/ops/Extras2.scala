package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Grouped exact medians and event-time interval range frames. */
object Extras2 {

  val queries: Map[String, Q] = Map(
    // exact median + p90 per group (per-group percentile aggregation)
    "agg_median_by_group" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.5)").as("med_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("med_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
        .orderBy(col("l_returnflag"))
    },

    // trailing 1-hour per-user sum over event time — a RANGE frame on epoch
    // seconds (the batch analogue of a sliding stream aggregation)
    "window_time_range" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-3600, 0)
      Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("es"), dec(col("value")).as("dv"))
        .withColumn("hour_sum", sum(col("dv")).over(w).cast("double"))
        .withColumn("hour_n", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("hour_sum"), col("hour_n"))
        .orderBy(col("event_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "agg_median_by_group" ->
      """SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.5) AS med_qty,
        |round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price,
        |round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "window_time_range" ->
      """WITH e AS (SELECT event_id, user_id,
        |  cast(epoch(date_trunc('second', cast(ts as timestamp))) as bigint) AS es,
        |  cast(value as decimal(18,4)) AS dv FROM events)
        |SELECT event_id, user_id,
        |cast(sum(dv) OVER w as double) AS hour_sum,
        |count(*) OVER w AS hour_n
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )
}
