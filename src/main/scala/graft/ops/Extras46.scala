package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 14 batch 4: the 2D Pareto-frontier skyline (an operator class
  * Spark has no built-in for, on the new distributedRunningMax kernel)
  * and a Poisson rate-change test (completing the count-based test
  * family).
  */
object Extras46 {

  val queries: Map[String, Q] = Map(

    // 2D skyline on (earlier order date, higher order value): the
    // record-progression frontier — orders no other order dominates
    // (placed no later AND worth no less, strict in one), i.e. the
    // sequence of all-time order-value records. The fact reduces to the
    // (day, whole-unit value) GRID census first (per-day max value —
    // calendar-bounded), then a point survives iff its value strictly
    // exceeds the running max over all strictly-earlier days: ONE
    // exclusive distributedRunningMax pass (the new kernel — never a
    // single-partition window, never the O(n²) dominance anti-join).
    // A (time, value) skyline stays non-degenerate at every SF because
    // records keep falling as the corpus grows, unlike bounded-domain
    // attribute pairs whose frontier collapses to one point.
    "analytics_pareto_frontier" -> { (s, dir) =>
      val grid = Tables(s, dir, "orders")
        .select(datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
            .cast(LongType).as("di"),
          floor(col("o_totalprice")).cast(LongType).as("v"))
        .groupBy("di", "v").agg(count(lit(1)).as("n_orders"))
      val perDay = grid.groupBy("di").agg(max(col("v")).as("mv"))
        .withColumn("g", lit(1))
      val ranked = GraftOps.distributedRunningMax(
        perDay.select("g", "di", "mv"), "g", "di", "mv", "rmax",
        exclusive = true)
      ranked.where(col("rmax").isNull || col("mv") > col("rmax"))
        .select(col("di"), col("mv").as("v"))
        .join(grid, Seq("di", "v"))
        .select(col("di").as("day_index"), col("v").as("value_floor"),
          col("n_orders"))
        .orderBy("day_index")
    },

    // Poisson rate-change test per event type: first half of the
    // observed window vs the second (split at the integral epoch-day
    // midpoint). Under H₀ (constant rate) the count difference is
    // ±√(n₁+n₂): z = (n₂ − n₁)/√(n₁+n₂) — the standard two-sample
    // Poisson e-test normal form. Pure integer counts, one IEEE tree;
    // one scan, one dimension-grain aggregate.
    "events_poisson_rate_test" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("di"))
      val mid = e.agg(((min(col("di")) + max(col("di")) + 1) / 2)
        .cast(LongType).as("mid"))
      e.crossJoin(broadcast(mid))
        .groupBy("event_type")
        .agg(sum(when(col("di") < col("mid"), 1L).otherwise(0L)).as("n_first"),
          sum(when(col("di") >= col("mid"), 1L).otherwise(0L)).as("n_second"))
        .select(col("event_type"), col("n_first"), col("n_second"),
          (round((col("n_second") - col("n_first")).cast(DoubleType) /
            sqrt((col("n_first") + col("n_second")).cast(DoubleType)), 6)
            + lit(0.0)).as("z"))
        .orderBy("event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "analytics_pareto_frontier" ->
      """WITH grid AS (SELECT
        |    datediff('day', DATE '1990-01-01', cast(o_orderdate AS date))
        |      AS di,
        |    cast(floor(o_totalprice) AS bigint) AS v,
        |    cast(count(*) AS bigint) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |pd AS (SELECT di, max(v) AS mv FROM grid GROUP BY di),
        |r AS (SELECT di, mv,
        |    max(mv) OVER (ORDER BY di
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rmax
        |  FROM pd)
        |SELECT r.di AS day_index, r.mv AS value_floor, g.n_orders
        |FROM r JOIN grid g ON r.di = g.di AND r.mv = g.v
        |WHERE r.rmax IS NULL OR r.mv > r.rmax
        |ORDER BY day_index""".stripMargin,
    "events_poisson_rate_test" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(cast(ts AS timestamp)) // 86400000000 AS di
        |  FROM events),
        |m AS (SELECT cast((min(di) + max(di) + 1) // 2 AS bigint) AS mid
        |  FROM e)
        |SELECT event_type,
        |  cast(sum(CASE WHEN di < mid THEN 1 ELSE 0 END) AS bigint)
        |    AS n_first,
        |  cast(sum(CASE WHEN di >= mid THEN 1 ELSE 0 END) AS bigint)
        |    AS n_second,
        |  round(cast(sum(CASE WHEN di >= mid THEN 1 ELSE 0 END) -
        |      sum(CASE WHEN di < mid THEN 1 ELSE 0 END) AS double) /
        |    sqrt(cast(count(*) AS double)), 6) + 0.0 AS z
        |FROM e CROSS JOIN m GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
