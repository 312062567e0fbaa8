package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 8: weight-of-evidence encoding, inter-
  * event gap quantiles, the hashing-trick encoder, and level-1 binary
  * changepoint segmentation.
  *
  * Scale discipline: WoE and feature hashing are dimension-sized after
  * one category-grain aggregate (the encoder table broadcasts); the
  * hashing trick is explicitly the STATELESS path — no dictionary, no
  * global fit, any category cardinality maps to a fixed bucket space
  * map-side. Gap computation and changepoint segmentation keep every
  * window bounded by one user's history.
  *
  * Float discipline: WoE/IV inputs are pure integer counts so every
  * engine computes identical doubles before the (round-6) ln — the
  * profile_entropy discipline; gap quantiles ride the established
  * percentile == quantile_cont [T] bridge over integral microsecond
  * gaps, round-4; changepoint segment means divide exact bigint
  * cumulative sums (the timeseries_cusum integers) in one final IEEE
  * division each.
  */
object Extras11 {

  /** DuckDB mirror of [[graft.functions.StringPolyHash]] (mult 31,
    * mod 2³¹−1) — the llm.Dedup shingle-id fold, inlined here for the
    * hashing-trick oracle. */
  private def sqlPolyHash(c: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series(1, length($c)),
       |                 i -> ord(substring($c, i, 1))::BIGINT)),
       |  (a, b) -> (a * 31 + b) % 2147483647)""".stripMargin

  val queries: Map[String, Q] = Map(

    // weight-of-evidence encoding of order priority against the
    // "finished" target + the information value of the whole feature:
    // the risk-scoring encoder that, unlike one-hot, yields one
    // monotone-in-evidence number per category. 0.5-smoothing keeps
    // empty cells finite; every WoE input is an integer count, so both
    // engines build identical doubles before the round-6 ln.
    "encode_woe" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        col("o_orderpriority").as("category"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val per = o.groupBy("category").agg(
        count(lit(1)).as("n"), sum(col("y")).as("pos"))
        .withColumn("neg", col("n") - col("pos"))
      val tot = o.agg(sum(col("y")).as("pos_tot"),
        (count(lit(1)) - sum(col("y"))).as("neg_tot"))
      val woe = log(
        ((col("pos").cast(DoubleType) + 0.5) * col("neg_tot").cast(DoubleType)) /
          ((col("neg").cast(DoubleType) + 0.5) * col("pos_tot").cast(DoubleType)))
      val enc = per.crossJoin(broadcast(tot))
        .withColumn("woe_raw", woe)
        .withColumn("iv_term",
          ((col("pos").cast(DoubleType) / col("pos_tot").cast(DoubleType)) -
            (col("neg").cast(DoubleType) / col("neg_tot").cast(DoubleType))) *
            col("woe_raw"))
      // + 0.0 normalizes IEEE -0.0 (near-zero WoE / IV round to -0.0 in
      // DuckDB but +0.0 in Spark's BigDecimal round)
      val iv = enc.agg((round(sum(col("iv_term").cast(DecimalType(18, 12)))
        .cast(DoubleType), 6) + lit(0.0)).as("iv_total"))
      enc.select(col("category"), col("n"), col("pos"),
        (round(col("woe_raw"), 6) + lit(0.0)).as("woe"))
        .crossJoin(broadcast(iv))
        .orderBy("category")
    },

    // inter-event gap quantiles per event type (the latency/cadence
    // profile): gap to the user's PREVIOUS event (any type), grouped
    // by the current event's type. Integral microsecond gaps through
    // the percentile == quantile_cont [T] bridge, round-4.
    "timeseries_gap_quantiles" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      e.withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .where(col("gap_us").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile(gap_us, 0.5)"), 4).as("p50_us"),
          round(expr("percentile(gap_us, 0.9)"), 4).as("p90_us"),
          round(expr("percentile(gap_us, 0.99)"), 4).as("p99_us"),
          max(col("gap_us")).as("max_us"))
        .orderBy("event_type")
    },

    // hashing-trick encoder census over part names (high-cardinality:
    // one name per part): category → polyhash mod 64 buckets, reporting
    // per-bucket load and collision count. The STATELESS encoder — no
    // dictionary, no global fit, any cardinality maps to a fixed
    // feature space purely map-side (the open-vocabulary answer to
    // encode_onehot's width explosion).
    "encode_feature_hashing" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val h = ColumnBridge.column(graft.functions.StringPolyHash(
        ColumnBridge.expression(col("p_name"))))
      Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), (h % 64L).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("p_name")).as("n_categories"))
        .orderBy("bucket")
    },

    // level-1 binary changepoint segmentation: split each user's
    // series at the position of max |CUSUM deviation| (the
    // timeseries_cusum integers), report both segment means and the
    // shift. mean_before = cum_{i*}/i* and mean_after =
    // (Σq − cum_{i*})/(n − i*) are exact-bigint ratios — one IEEE
    // division each; argmax ties break lexicographically on (|dev|,
    // i, cum) (struct ordering == struct_pack ordering, probed).
    // i* = n (flat series) leaves no after-segment → nulls.
    "timeseries_changepoint_segments" -> { (s, dir) =>
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
        .withColumn("absdev", greatest(col("dev"), -col("dev")))
      d.groupBy("user_id")
        .agg(max(col("n")).as("n"), max(col("tot")).as("tot"),
          max(struct(col("absdev"), col("i"), col("cum"))).as("cp"))
        .select(col("user_id"), col("n"), col("cp.i").as("cp_i"),
          (col("cp.cum").cast(DoubleType) /
            (col("cp.i") * lit(1000000L)).cast(DoubleType))
            .as("mean_before"),
          when(col("cp.i") < col("n"),
            ((col("tot") - col("cp.cum")).cast(DoubleType) /
              ((col("n") - col("cp.i")) * lit(1000000L)).cast(DoubleType)))
            .as("mean_after"),
          when(col("cp.i") < col("n"),
            ((col("tot") - col("cp.cum")).cast(DoubleType) /
              ((col("n") - col("cp.i")) * lit(1000000L)).cast(DoubleType)) -
              (col("cp.cum").cast(DoubleType) /
                (col("cp.i") * lit(1000000L)).cast(DoubleType)))
            .as("shift"))
        .orderBy("user_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "encode_woe" ->
      """WITH o AS (SELECT o_orderpriority AS category,
        |             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |           FROM orders),
        |per AS (SELECT category, cast(count(*) AS bigint) AS n,
        |          cast(sum(y) AS bigint) AS pos,
        |          cast(count(*) - sum(y) AS bigint) AS neg
        |        FROM o GROUP BY category),
        |tot AS (SELECT cast(sum(y) AS bigint) AS pos_tot,
        |          cast(count(*) - sum(y) AS bigint) AS neg_tot FROM o),
        |enc AS (SELECT category, n, pos,
        |    ln(((cast(pos AS double) + 0.5) * cast(neg_tot AS double))
        |      / ((cast(neg AS double) + 0.5) * cast(pos_tot AS double)))
        |      AS woe_raw,
        |    (cast(pos AS double) / cast(pos_tot AS double)
        |      - cast(neg AS double) / cast(neg_tot AS double)) AS diff
        |  FROM per CROSS JOIN tot),
        |iv AS (SELECT round(cast(sum(cast(diff * woe_raw AS decimal(18,12)))
        |         AS double), 6) + 0.0 AS iv_total FROM enc)
        |SELECT category, n, pos, round(woe_raw, 6) + 0.0 AS woe, iv_total
        |FROM enc CROSS JOIN iv ORDER BY category""".stripMargin,
    "timeseries_gap_quantiles" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |g AS (SELECT event_type,
        |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |          AS gap_us
        |      FROM e)
        |SELECT event_type, cast(count(*) AS bigint) AS n_gaps,
        |  round(quantile_cont(gap_us, 0.5), 4) AS p50_us,
        |  round(quantile_cont(gap_us, 0.9), 4) AS p90_us,
        |  round(quantile_cont(gap_us, 0.99), 4) AS p99_us,
        |  max(gap_us) AS max_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "encode_feature_hashing" ->
      s"""SELECT ${sqlPolyHash("p_name")} % 64 AS bucket,
        |  cast(count(*) AS bigint) AS n_rows,
        |  cast(count(DISTINCT p_name) AS bigint) AS n_categories
        |FROM part GROUP BY 1 ORDER BY bucket""".stripMargin,
    "timeseries_changepoint_segments" ->
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
        |v AS (SELECT user_id, n, tot, i, cum,
        |        n * cum - i * tot AS dev,
        |        greatest(n * cum - i * tot, -(n * cum - i * tot)) AS absdev
        |      FROM d),
        |agg AS (SELECT user_id, max(n) AS n, max(tot) AS tot,
        |          max(struct_pack(absdev := absdev, i := i, cum := cum)) AS cp
        |        FROM v GROUP BY user_id)
        |SELECT user_id, n, (cp.i) AS cp_i,
        |  cast((cp.cum) AS double) / cast((cp.i) * 1000000 AS double)
        |    AS mean_before,
        |  CASE WHEN (cp.i) < n THEN
        |    cast(tot - (cp.cum) AS double)
        |      / cast((n - (cp.i)) * 1000000 AS double) END AS mean_after,
        |  CASE WHEN (cp.i) < n THEN
        |    cast(tot - (cp.cum) AS double)
        |      / cast((n - (cp.i)) * 1000000 AS double)
        |    - cast((cp.cum) AS double) / cast((cp.i) * 1000000 AS double)
        |  END AS shift
        |FROM agg ORDER BY user_id""".stripMargin
  )
}
