package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-8 fifth-session batch 14: k-core decomposition, local peak
  * detection, transition timing, and cyclical time features.
  *
  * Scale discipline: k-core peels by round — each round is one degree
  * aggregate + two semi-joins on the (already minWeight-reduced) edge
  * table, lineage truncated per round with localCheckpoint (the
  * connectedComponents discipline: an unbounded plan tree is a driver
  * OOM, not an executor problem); peaks and transition timing are
  * bounded per-user windows; cyclical encoding is a 24-row dimension
  * aggregate.
  *
  * Float discipline: degrees, gaps and counts are integers; mean gaps
  * divide exact bigint sums; sin/cos run on 24 distinct identical
  * doubles (shared explicit π literal — `pi()` vs a Scala constant
  * would be the 1−λ trap) and land behind round-6.
  */
object Extras17 {

  private val kcoreK = 3
  private val kcoreRounds = 5

  val queries: Map[String, Q] = Map(

    // k-core decomposition (k = 3, 5 peel rounds unrolled — the output
    // min_degree certifies convergence: min_degree >= k iff the peel
    // reached the fixed point): the subgraph where every node keeps >= k
    // strong co-purchase partners — the dense catalog backbone. An
    // empty core (larger SFs spread baskets over more parts) reports
    // (0, 0, null, null) — the certified answer, not an error.
    "graph_kcore" -> { (s, dir) =>
      // shared memoized edge build (Graph.strongEdgesCached) — the peel
      // rounds below still localCheckpoint per round to truncate lineage
      var edges = Graph.strongEdgesCached(s, dir)
        .select("pa", "pb").localCheckpoint(false)
      for (_ <- 1 to kcoreRounds) {
        val deg = edges.select(col("pa").as("p"))
          .unionAll(edges.select(col("pb").as("p")))
          .groupBy("p").agg(count(lit(1)).as("d"))
        val keep = deg.where(col("d") >= kcoreK).select("p")
        edges = edges
          .join(keep.withColumnRenamed("p", "pa"), Seq("pa"), "left_semi")
          .join(keep.withColumnRenamed("p", "pb"), Seq("pb"), "left_semi")
          .select("pa", "pb").localCheckpoint(false)
      }
      val deg = edges.select(col("pa").as("p"))
        .unionAll(edges.select(col("pb").as("p")))
        .groupBy("p").agg(count(lit(1)).as("d"))
      val nE = edges.agg(count(lit(1)).as("n_edges"))
      deg.agg(count(lit(1)).as("n_nodes"), min(col("d")).as("min_degree"),
          max(col("d")).as("max_degree"))
        .crossJoin(broadcast(nE))
        .select(col("n_nodes"), col("n_edges"), col("min_degree"),
          col("max_degree"))
    },

    // local peak detection per user (strictly above both neighbours —
    // series boundaries are never peaks): the alert-worthy local maxima
    // a monitoring pipeline flags.
    "timeseries_peaks" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      e.withColumn("is_peak",
          when(col("value") > lag(col("value"), 1).over(w) &&
            col("value") > lead(col("value"), 1).over(w), 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("is_peak")).as("n_peaks"),
          max(when(col("is_peak") === 1L, col("value"))).as("max_peak_value"))
        .orderBy("user_id")
    },

    // state-transition timing: expected dwell between consecutive event
    // types (the edge weights a process-mining model consumes) —
    // extends events_transition_matrix with WHEN, not just how often.
    "events_transition_timing" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      e.withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("gap_us")).cast(DoubleType) /
            (count(lit(1)) * 1000000L).cast(DoubleType)).as("mean_gap_s"),
          round(expr("percentile(gap_us, 0.5)") / 1000000.0, 4)
            .as("p50_gap_s"))
        .orderBy("from_type", "to_type")
    },

    // cyclical time encoding: hour-of-day → (sin, cos) — the feature
    // pair that keeps 23:00 adjacent to 00:00 where a raw hour feature
    // tears the circle. 24-row dimension output with traffic counts.
    "encode_cyclical_time" -> { (s, dir) =>
      val twoPi = lit(6.283185307179586) // 2π as an explicit shared literal
      Tables(s, dir, "events")
        .select(expr("(unix_micros(ts) DIV 3600000000) % 24").as("hour"))
        .groupBy("hour").agg(count(lit(1)).as("n_events"))
        .select(col("hour"), col("n_events"),
          // + 0.0 normalizes IEEE signed zero: DuckDB's round keeps the
          // sign of cos(2π·18/24) = -1.8e-16 and emits -0.0 where Spark's
          // BigDecimal round emits +0.0 — one sign bit, hash split.
          (round(sin(twoPi * col("hour").cast(DoubleType) / 24.0), 6)
            + lit(0.0)).as("hour_sin"),
          (round(cos(twoPi * col("hour").cast(DoubleType) / 24.0), 6)
            + lit(0.0)).as("hour_cos"))
        .orderBy("hour")
    }
  )

  /** unrolled k-core peel CTE chain (round r reads e{r-1}). Every
    * round CTE is MATERIALIZED: DuckDB re-inlines plain CTEs at each
    * reference, and e_r references e_{r-1} three times — un-hinted the
    * chain re-evaluates the base pair expansion 3^rounds times
    * (observed as a multi-minute hang at sf0.001). */
  private def kcoreSql: String = {
    val rounds = (1 to kcoreRounds).map { r =>
      s"""deg$r AS MATERIALIZED (SELECT p, cast(count(*) AS bigint) AS d
         |  FROM (
         |    SELECT pa AS p FROM e${r - 1}
         |    UNION ALL SELECT pb FROM e${r - 1}) GROUP BY p),
         |keep$r AS MATERIALIZED (SELECT p FROM deg$r WHERE d >= $kcoreK),
         |e$r AS MATERIALIZED (SELECT pa, pb FROM e${r - 1}
         |  WHERE pa IN (SELECT p FROM keep$r)
         |    AND pb IN (SELECT p FROM keep$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS MATERIALIZED (
       |  SELECT l_orderkey, l_partkey FROM (SELECT l_orderkey, l_partkey, count(*) OVER (PARTITION BY l_orderkey) AS bsz FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)) WHERE bsz <= 64),
       |p0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey),
       |e0 AS MATERIALIZED (SELECT pa, pb FROM (SELECT pa, pb, count(*) AS w
       |  FROM p0 GROUP BY pa, pb) WHERE w >= 2),
       |$rounds,
       |degF AS MATERIALIZED (SELECT p, cast(count(*) AS bigint) AS d
       |  FROM (
       |    SELECT pa AS p FROM e$kcoreRounds
       |    UNION ALL SELECT pb FROM e$kcoreRounds) GROUP BY p)
       |SELECT (SELECT cast(count(*) AS bigint) FROM degF) AS n_nodes,
       |  (SELECT cast(count(*) AS bigint) FROM e$kcoreRounds) AS n_edges,
       |  (SELECT min(d) FROM degF) AS min_degree,
       |  (SELECT max(d) FROM degF) AS max_degree""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "graph_kcore" -> kcoreSql,
    "timeseries_peaks" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us
        |           FROM events),
        |f AS (SELECT user_id, value,
        |    CASE WHEN value > lag(value) OVER w
        |          AND value > lead(value) OVER w THEN 1 ELSE 0 END AS is_peak
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, cast(count(*) AS bigint) AS n,
        |  cast(sum(is_peak) AS bigint) AS n_peaks,
        |  max(CASE WHEN is_peak = 1 THEN value END) AS max_peak_value
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_transition_timing" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |t AS (SELECT user_id, event_type AS to_type,
        |    lag(event_type) OVER w AS from_type,
        |    us - lag(us) OVER w AS gap_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT from_type, to_type, cast(count(*) AS bigint) AS n,
        |  cast(sum(gap_us) AS double) / cast(count(*) * 1000000 AS double)
        |    AS mean_gap_s,
        |  round(quantile_cont(gap_us, 0.5) / 1000000.0, 4) AS p50_gap_s
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    "encode_cyclical_time" ->
      """WITH h AS (SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
        |    cast(count(*) AS bigint) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT hour, n_events,
        |  round(sin(6.283185307179586 * cast(hour AS double) / 24.0), 6)
        |    + 0.0 AS hour_sin,
        |  round(cos(6.283185307179586 * cast(hour AS double) / 24.0), 6)
        |    + 0.0 AS hour_cos
        |FROM h ORDER BY hour""".stripMargin
  )
}
