package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 12 (with Similarity's
  * sim_ann_recall_eval): seasonal decomposition and content-defined
  * chunking.
  *
  * Scale discipline: the decomposition aggregates to the DAY grain
  * first and computes the centered moving-average trend via an OFFSET
  * SELF-JOIN over the dimension-sized daily table — a global ORDER BY
  * window over the series would plan the single-partition window the
  * suite bans, and the join form costs a 7-way explode of ~30 rows
  * instead. CDC chunking is one codegen'd native-expression pass per
  * payload ([[graft.functions.CdcChunkLens]]).
  *
  * Float discipline: daily totals are floor(x·10⁶) bigint sums (exact
  * at any partitioning); trend/detrended are fixed IEEE trees over
  * those exact integers; per-phase seasonal means fold decimal(24,12)
  * terms (detrended daily totals reach ~10⁷ — the bootstrap lesson);
  * chunk statistics are pure integers.
  */
object Extras15 {

  val queries: Map[String, Q] = Map(

    // additive seasonal decomposition of daily event volume: centered
    // 7-day MA trend (full frames only), per-phase (day mod 7) mean of
    // the detrended series — the weekly-seasonality fingerprint.
    "timeseries_seasonal_decompose" -> { (s, dir) =>
      val daily = Tables(s, dir, "events")
        .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
          floor(col("value") * lit(1000000.0)).as("q"))
        .groupBy("day").agg(sum(col("q")).as("dq"))
      val trend = daily
        .select(col("day"), col("dq"),
          explode(sequence(lit(-3L), lit(3L))).as("delta"))
        .select((col("day") + col("delta")).as("t_day"), col("dq"))
        .groupBy("t_day")
        .agg(count(lit(1)).as("nw"), sum(col("dq")).as("wsum"))
        .where(col("nw") === 7)
      daily.join(trend, daily("day") === trend("t_day"))
        .select(col("day"), col("dq"),
          ((col("dq").cast(DoubleType) / 1000000.0) -
            (col("wsum").cast(DoubleType) / 7000000.0)).as("detrended"))
        .groupBy((col("day") % 7).as("phase"))
        .agg(count(lit(1)).as("n_days"),
          (sum(col("dq")).cast(DoubleType) /
            (count(lit(1)) * 1000000L).cast(DoubleType)).as("mean_daily"),
          // + 0.0: seasonal components sum to ~0 by construction, so a
          // tiny-negative round lands on DuckDB's -0.0 vs Spark's +0.0
          (round(sum(col("detrended").cast(DecimalType(24, 12)))
            .cast(DoubleType) / count(lit(1)).cast(DoubleType), 6)
            + lit(0.0)).as("seasonal"))
        .orderBy("phase")
    },

    // content-defined chunking census: FastCDC-style boundaries from
    // the local 8-byte Horner hash (divisor 64 → ~64-byte chunks),
    // re-synchronizing after edits where fixed-size chunks shift — the
    // chunking that makes downstream dedup robust. One codegen pass
    // per payload; per-doc chunk statistics.
    "text_cdc_chunking" -> { (s, dir) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val lens = ColumnBridge.column(graft.functions.CdcChunkLens(
        ColumnBridge.expression(encode(col("text"), "UTF-8"))))
      Tables(s, dir, "documents")
        .select(col("doc_id"), lens.as("lens"))
        .select(col("doc_id"), size(col("lens")).cast("long").as("n_chunks"),
          array_min(col("lens")).as("min_len"),
          array_max(col("lens")).as("max_len"),
          aggregate(col("lens"), lit(0L), (a, x) => a + x).as("total_len"))
        .orderBy("doc_id")
    }
  )

  /** DuckDB Horner over the 8 ascii positions starting at i (the
    * Extras10 phash fold at width 8). */
  private def horner8: String =
    (1 until 8).foldLeft("cast(ascii(substr(payload, i, 1)) AS bigint)") {
      (acc, k) =>
        s"(($acc) * 256 + ascii(substr(payload, i + $k, 1))) % 2147483647"
    }

  val oracle: Map[String, String] = Map(
    "timeseries_seasonal_decompose" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    cast(sum(cast(floor(value * 1000000.0) AS bigint)) AS bigint)
        |      AS dq
        |  FROM events GROUP BY 1),
        |trend AS (SELECT day + delta AS t_day,
        |    cast(count(*) AS bigint) AS nw, cast(sum(dq) AS bigint) AS wsum
        |  FROM daily CROSS JOIN (SELECT unnest([-3,-2,-1,0,1,2,3]) AS delta)
        |  GROUP BY 1 HAVING count(*) = 7),
        |d AS (SELECT day, dq,
        |    (cast(dq AS double) / 1000000.0)
        |      - (cast(wsum AS double) / 7000000.0) AS detrended
        |  FROM daily JOIN trend ON day = t_day)
        |SELECT day % 7 AS phase, cast(count(*) AS bigint) AS n_days,
        |  cast(sum(dq) AS double) / cast(count(*) * 1000000 AS double)
        |    AS mean_daily,
        |  round(cast(sum(cast(detrended AS decimal(24,12))) AS double)
        |    / cast(count(*) AS double), 6) + 0.0 AS seasonal
        |FROM d GROUP BY 1 ORDER BY phase""".stripMargin,
    "text_cdc_chunking" ->
      s"""WITH pos AS (SELECT doc_id, text AS payload,
        |    generate_subscripts(string_split(text, ''), 1) AS i
        |  FROM documents),
        |boundaries AS (SELECT doc_id, i + 7 AS p
        |  FROM pos
        |  WHERE i <= length(payload) - 7
        |    AND (($horner8) * 737 + 97) % 2147483647 % 64 = 0),
        |mid AS (SELECT doc_id, p,
        |    p - coalesce(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0)
        |      AS clen
        |  FROM boundaries),
        |tails AS (SELECT d.doc_id, length(d.text) - coalesce(max(b.p), 0)
        |      AS clen
        |  FROM documents d LEFT JOIN boundaries b USING (doc_id)
        |  GROUP BY d.doc_id, length(d.text)
        |  HAVING length(d.text) > coalesce(max(b.p), 0)),
        |lens AS (SELECT doc_id, clen FROM mid
        |         UNION ALL SELECT doc_id, clen FROM tails)
        |SELECT doc_id, cast(count(*) AS bigint) AS n_chunks,
        |  cast(min(clen) AS bigint) AS min_len,
        |  cast(max(clen) AS bigint) AS max_len,
        |  cast(sum(clen) AS bigint) AS total_len
        |FROM lens GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
