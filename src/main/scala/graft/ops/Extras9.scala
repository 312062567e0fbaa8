package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch: gaps-and-islands run detection, CUSUM
  * change detection, rolling-median smoothing, and Spearman rank
  * correlation — the remaining classical sequence/robust-stat surface.
  *
  * Scale discipline: every window is PARTITIONED BY user (bounded by one
  * user's history — never a global window); Spearman's global ranks come
  * from the Mann-Whitney midrank template (per-distinct-value counts →
  * exclusive distributed prefix sum → join back on the value), so rank
  * parallelism is the shard count and the rank table is
  * distinct-value-sized, not row-sized.
  *
  * Float discipline: islands and CUSUM are INTEGER end-to-end (values
  * enter as floor(x·10⁶) bigints — the sim_label_centroids lesson: a
  * double→decimal cast quantizes different representations across
  * engines, an IEEE multiply + floor doesn't); the CUSUM deviation
  * n·cum_i − i·total is exact bigint algebra at any partitioning, cast
  * to double only for the final normalization (bigint→double is
  * correctly rounded in both engines). The rolling median selects a
  * stored element (full 7-row frames only — odd count, no
  * interpolation ever), so it's bit-equal by construction. Spearman's
  * sufficient statistics are bigint sums; the Pearson products run in
  * exact wide integers on both sides — Spark DECIMAL(12,0)·(18,0)
  * (precision 31, exact), DuckDB HUGEINT (int128 — its decimal
  * multiply coerces to a common DECIMAL(18) and overflows int64) —
  * and the ρ quotient is rounded at 6.
  */
object Extras9 {

  val queries: Map[String, Q] = Map(

    // gaps-and-islands: maximal runs of consecutive identical event
    // types per user (lag-change flag → running sum = island id),
    // rolled up to per-user run statistics. Pure integer outputs.
    "window_gaps_islands" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val runs = e
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w) === col("event_type"), 0L)
            .otherwise(1L))
        .withColumn("island",
          sum(col("chg")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"))
      runs.groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_run"),
          sum(col("len")).as("n_events"))
        .orderBy("user_id")
    },

    // CUSUM change detection: cumulative deviation from the user's own
    // mean, peak and trough with their positions. Scale-free integer
    // form: with q = floor(value·10⁶), dev_i = n·Σ_{j≤i} q_j − i·Σq is
    // n·10⁶ times the classical CUSUM — exact bigint at any
    // partitioning; one final IEEE division normalizes. Position
    // tie-breaks via lexicographic struct min/max (== DuckDB
    // struct_pack ordering, probed for timeseries_ohlc).
    "timeseries_cusum" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        floor(col("value") * lit(1000000.0)).as("q"))
      val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wAll = Window.partitionBy("user_id")
      val d = e
        .withColumn("i", row_number().over(wOrd).cast("long"))
        .withColumn("cum", sum(col("q")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum(col("q")).over(wAll))
        .withColumn("dev", col("n") * col("cum") - col("i") * col("tot"))
      d.groupBy("user_id")
        .agg(max(col("n")).as("n"),
          max(struct(col("dev"), col("i"))).as("pk"),
          min(struct(col("dev"), col("i"))).as("tr"))
        .select(col("user_id"), col("n"),
          (col("pk.dev").cast(DoubleType) /
            (col("n") * lit(1000000L)).cast(DoubleType)).as("cusum_max"),
          col("pk.i").as("peak_i"),
          (col("tr.dev").cast(DoubleType) /
            (col("n") * lit(1000000L)).cast(DoubleType)).as("cusum_min"),
          col("tr.i").as("trough_i"))
        .orderBy("user_id")
    },

    // rolling median (robust smoother): exact median of the trailing
    // 7-row frame per user, FULL frames only — odd count, so the median
    // is always a stored element (sort + pick 4th), never an
    // interpolation; bit-equal across engines by construction. The 7
    // lags share one window spec (single window exec, codegen sort).
    "timeseries_rolling_median" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      e.withColumn("i", row_number().over(w))
        .withColumn("win",
          array((0 to 6).map(k => lag(col("value"), k).over(w)): _*))
        .where(col("i") >= 7)
        .select(col("user_id"), col("event_id"), col("us"), col("value"),
          sort_array(col("win"))(3).as("rolling_med"))
        .orderBy("user_id", "us", "event_id")
    },

    // Spearman rank correlation (quantity vs line revenue
    // quantity·extendedprice — the generator draws the raw columns
    // independently, so the revenue product is the monotone-in-quantity
    // relation a rank statistic should detect): Pearson over
    // tie-averaged ranks. Midranks via the
    // Mann-Whitney integer template — per-distinct-value counts, one
    // exclusive distributed prefix sum per column (never a row-sized
    // global window), join back on the value; 2·midrank = 2·cb + cnt + 1
    // stays integral. Sufficient statistics are exact bigint sums
    // (|Σ r²| ≤ 4n³ ≈ 9·10¹⁷ at sf0.1 — fits; larger SFs must widen to
    // DECIMAL sums), promoted to tight decimals for the Pearson
    // products so neither engine overflows width 38.
    "profile_spearman_corr" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_quantity").as("x"),
          (col("l_quantity") * col("l_extendedprice")).as("y"))
      // r14 note: a tagged single-kernel merge of the two midrank passes
      // was tried and REVERTED — x (l_quantity) has a ~50-value domain, so
      // its kernel is trivial and its join-back broadcasts; merging it
      // into the fact-sized y pass only added a checkpoint materialization
      // and degraded the x join-back to a sort-merge (isolated median
      // 3.08 s vs 1.48 s baseline). Kernel merging pays only when the
      // merged passes are comparable in size (see analytics_rfm_segments).
      def rank2(valCol: String, out: String): DataFrame = {
        val per = li.groupBy(valCol).agg(count(lit(1)).as("cnt"))
          .withColumn("g", lit(1))
        GraftOps.distributedRunningSum(per, "g", valCol, "cnt", "cb",
            exclusive = true)
          .select(col(valCol),
            (lit(2L) * col("cb") + col("cnt") + lit(1L)).as(out))
      }
      val ranked = li.join(rank2("x", "rx2"), "x").join(rank2("y", "ry2"), "y")
      // rank-product sums in DECIMAL(38,0): at sf1 (6M fact rows) the
      // doubled ranks reach ~1.2e7, their squares ~1.4e14, and the sum
      // ~8.6e20 — past Long.Max (the sf1 gate caught the ANSI overflow).
      // Decimal sums are exact and associative; DuckDB's bigint sum is
      // already HUGEINT, so widening Spark keeps the engines identical.
      val d38 = DecimalType(38, 0)
      val sums = ranked.agg(count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2").cast(d38) * col("rx2")).as("sxx"),
        sum(col("ry2").cast(d38) * col("ry2")).as("syy"),
        sum(col("rx2").cast(d38) * col("ry2")).as("sxy"))
      val dn = DecimalType(12, 0)
      val ds = DecimalType(20, 0)
      val num = col("n").cast(dn) * col("sxy") -
        col("sx").cast(ds) * col("sy").cast(ds)
      val dx = col("n").cast(dn) * col("sxx") -
        col("sx").cast(ds) * col("sx").cast(ds)
      val dy = col("n").cast(dn) * col("syy") -
        col("sy").cast(ds) * col("sy").cast(ds)
      sums.select(col("n"),
        // + 0.0 normalizes IEEE -0.0 on a near-zero rho
        (round(num.cast(DoubleType) /
          (sqrt(dx.cast(DoubleType)) * sqrt(dy.cast(DoubleType))), 6)
          + lit(0.0)).as("rho"))
    }
  )

  val oracle: Map[String, String] = Map(
    "window_gaps_islands" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |f AS (SELECT user_id, event_type,
        |        CASE WHEN lag(event_type) OVER
        |            (PARTITION BY user_id ORDER BY us, event_id) = event_type
        |          THEN 0 ELSE 1 END AS chg, us, event_id
        |      FROM e),
        |r AS (SELECT user_id,
        |        sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS island
        |      FROM f),
        |runs AS (SELECT user_id, island, cast(count(*) AS bigint) AS len
        |         FROM r GROUP BY user_id, island)
        |SELECT user_id, cast(count(*) AS bigint) AS n_islands,
        |       max(len) AS max_run, cast(sum(len) AS bigint) AS n_events
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    "timeseries_cusum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |             cast(floor(value * 1000000.0) AS bigint) AS q
        |           FROM events),
        |d AS (SELECT user_id,
        |        cast(row_number() OVER w AS bigint) AS i,
        |        cast(sum(q) OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS bigint) AS cum,
        |        cast(count(*) OVER (PARTITION BY user_id) AS bigint) AS n,
        |        cast(sum(q) OVER (PARTITION BY user_id) AS bigint) AS tot
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |v AS (SELECT user_id, n, i, n * cum - i * tot AS dev FROM d)
        |SELECT user_id, max(n) AS n,
        |  cast((max(struct_pack(dev := dev, i := i)).dev) AS double)
        |    / cast(max(n) * 1000000 AS double) AS cusum_max,
        |  (max(struct_pack(dev := dev, i := i)).i) AS peak_i,
        |  cast((min(struct_pack(dev := dev, i := i)).dev) AS double)
        |    / cast(max(n) * 1000000 AS double) AS cusum_min,
        |  (min(struct_pack(dev := dev, i := i)).i) AS trough_i
        |FROM v GROUP BY user_id ORDER BY user_id""".stripMargin,
    "timeseries_rolling_median" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value
        |           FROM events),
        |l AS (SELECT user_id, event_id, us, value,
        |        row_number() OVER w AS i,
        |        [value, lag(value, 1) OVER w, lag(value, 2) OVER w,
        |         lag(value, 3) OVER w, lag(value, 4) OVER w,
        |         lag(value, 5) OVER w, lag(value, 6) OVER w] AS win
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT user_id, event_id, us, value,
        |       list_sort(win)[4] AS rolling_med
        |FROM l WHERE i >= 7 ORDER BY user_id, us, event_id""".stripMargin,
    "profile_spearman_corr" ->
      """WITH li AS (SELECT l_quantity AS x,
        |             l_quantity * l_extendedprice AS y FROM lineitem),
        |cx AS (SELECT x, cast(count(*) AS bigint) AS cnt FROM li GROUP BY x),
        |wx AS (SELECT x, 2 * cast(coalesce(sum(cnt) OVER (ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS bigint) + cnt + 1 AS rx2
        |       FROM cx),
        |cy AS (SELECT y, cast(count(*) AS bigint) AS cnt FROM li GROUP BY y),
        |wy AS (SELECT y, 2 * cast(coalesce(sum(cnt) OVER (ORDER BY y
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS bigint) + cnt + 1 AS ry2
        |       FROM cy),
        |j AS (SELECT rx2, ry2 FROM li JOIN wx USING (x) JOIN wy USING (y)),
        |s AS (SELECT cast(count(*) AS bigint) AS n,
        |        cast(sum(rx2) AS bigint) AS sx, cast(sum(ry2) AS bigint) AS sy,
        |        sum(rx2 * rx2) AS sxx,
        |        sum(ry2 * ry2) AS syy,
        |        sum(rx2 * ry2) AS sxy
        |      FROM j)
        |SELECT n,
        |  round(cast(cast(n AS hugeint) * cast(sxy AS hugeint)
        |        - cast(sx AS hugeint) * cast(sy AS hugeint)
        |        AS double)
        |    / (sqrt(cast(cast(n AS hugeint) * cast(sxx AS hugeint)
        |         - cast(sx AS hugeint) * cast(sx AS hugeint)
        |         AS double))
        |     * sqrt(cast(cast(n AS hugeint) * cast(syy AS hugeint)
        |         - cast(sy AS hugeint) * cast(sy AS hugeint)
        |         AS double))), 6) + 0.0 AS rho
        |FROM s""".stripMargin
  )
}
