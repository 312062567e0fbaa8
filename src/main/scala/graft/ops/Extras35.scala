package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-10 batch 7: categorical mix-shift drift (the categorical
  * companion of drift_psi/drift_js over time) and the weekly
  * new-vs-returning user split (the growth-accounting census).
  */
object Extras35 {

  val queries: Map[String, Q] = Map(
    // order-priority MIX SHIFT year over year: the categorical drift
    // monitor (psi/ks watch numeric columns; a category mix that moves
    // between adjacent periods is how upstream process changes announce
    // themselves). Yearly priority shares on a zero-filled grid,
    // Jensen-Shannon divergence between consecutive years — per-term
    // DECIMAL(18,12) quantization (the ln parity discipline), one
    // round(6)+0.0 at emit. The grid is (years × 5 priorities) — tiny at
    // any scale; the only fact-scale stage is the first groupBy.
    "analytics_priority_mix_shift" -> { (s, dir) =>
      val counts = Tables(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"), col("o_orderpriority"))
        .groupBy("yr", "o_orderpriority").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("yr").agg(sum(col("c")).as("n"))
      val cats = counts.select("o_orderpriority").distinct()
      val grid = totals.crossJoin(broadcast(cats))
        .join(counts, Seq("yr", "o_orderpriority"), "left")
        .select(col("yr"), col("o_orderpriority"),
          (coalesce(col("c"), lit(0L)).cast(DoubleType) /
            col("n").cast(DoubleType)).as("p"))
      def term(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
        when(p === 0.0, lit(0.0))
          .otherwise(p * log(lit(2.0) * p / (p + q)))
      val a = grid.select(col("yr").as("year_a"), col("o_orderpriority"),
        col("p").as("pa"))
      val b = grid.select(col("yr").as("year_b"), col("o_orderpriority"),
        col("p").as("pb"))
      a.join(b, Seq("o_orderpriority"))
        .where(col("year_b") === col("year_a") + 1)
        .select(col("year_a"), col("year_b"),
          ((term(col("pa"), col("pb")) + term(col("pb"), col("pa"))) / 2.0)
            .cast(DecimalType(18, 12)).as("t"))
        .groupBy("year_a", "year_b")
        .agg((round(sum(col("t")).cast(DoubleType), 6) + lit(0.0)).as("js"))
        .orderBy("year_a")
    },

    // weekly new-vs-returning active users — growth accounting's first
    // census (is activity expansion or retention?). Distinct (user,
    // week) pairs, each user's first week via one hash aggregate, the
    // split is an integer compare; all map-side-combinable shuffles on
    // user_id / week.
    "events_returning_user_rate" -> { (s, dir) =>
      val uw = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 604800000000").as("week"))
        .distinct()
      val fw = uw.groupBy("user_id").agg(min(col("week")).as("first_week"))
      uw.join(fw, Seq("user_id"))
        .groupBy("week")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("week") === col("first_week"), 1L).otherwise(0L))
            .as("n_new"))
        .select(col("week"), col("n_active"), col("n_new"),
          (col("n_active") - col("n_new")).as("n_returning"),
          round((col("n_active") - col("n_new")).cast(DoubleType) /
            col("n_active").cast(DoubleType), 6).as("returning_rate"))
        .orderBy("week")
    }
  )

  val oracle: Map[String, String] = Map(
    "analytics_priority_mix_shift" ->
      """WITH counts AS (SELECT year(o_orderdate) AS yr, o_orderpriority,
        |    cast(count(*) AS bigint) AS c
        |  FROM orders GROUP BY 1, 2),
        |totals AS (SELECT yr, cast(sum(c) AS bigint) AS n
        |  FROM counts GROUP BY yr),
        |cats AS (SELECT DISTINCT o_orderpriority FROM counts),
        |grid AS (SELECT t.yr, cats.o_orderpriority,
        |    cast(coalesce(c.c, 0) AS double) / cast(t.n AS double) AS p
        |  FROM totals t CROSS JOIN cats
        |  LEFT JOIN counts c ON c.yr = t.yr
        |    AND c.o_orderpriority = cats.o_orderpriority),
        |pairs AS (SELECT a.yr AS year_a, b.yr AS year_b,
        |    cast((CASE WHEN a.p = 0.0 THEN 0.0
        |          ELSE a.p * ln(2.0 * a.p / (a.p + b.p)) END +
        |          CASE WHEN b.p = 0.0 THEN 0.0
        |          ELSE b.p * ln(2.0 * b.p / (a.p + b.p)) END) / 2.0
        |      AS decimal(18,12)) AS t
        |  FROM grid a JOIN grid b
        |    ON a.o_orderpriority = b.o_orderpriority AND b.yr = a.yr + 1)
        |SELECT year_a, year_b,
        |  round(cast(sum(t) AS double), 6) + 0.0 AS js
        |FROM pairs GROUP BY year_a, year_b ORDER BY year_a""".stripMargin,
    "events_returning_user_rate" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS week FROM events),
        |fw AS (SELECT user_id, min(week) AS first_week
        |  FROM uw GROUP BY user_id)
        |SELECT week, cast(count(*) AS bigint) AS n_active,
        |  cast(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END) AS bigint)
        |    AS n_new,
        |  cast(count(*) - sum(CASE WHEN week = first_week THEN 1 ELSE 0 END)
        |    AS bigint) AS n_returning,
        |  round(cast(count(*) - sum(CASE WHEN week = first_week THEN 1 ELSE 0
        |    END) AS double) / cast(count(*) AS double), 6) AS returning_rate
        |FROM uw JOIN fw USING (user_id)
        |GROUP BY week ORDER BY week""".stripMargin
  )
}
