package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 12 batch: privacy-governance profiling (k-anonymity /
  * l-diversity — the release-gate audit a training-data pipeline runs
  * before shipping a corpus containing user-derived records), frequency
  * encoding (the count-statistics feature encoder), and multi-lag ACF
  * (the seasonality screen behind lag selection for forecasting).
  *
  * Scale shapes: the profiling/encoding/ACF queries reduce the fact
  * table with ONE hash aggregate keyed on the quasi-identifier /
  * category / day and keep everything downstream dimension-sized
  * (joined back map-side by broadcast where a fact-grain output is
  * required). The one exception is burstiness, whose per-USER lag
  * window is shard-parallel (partitions = users, fact-cardinality
  * keys) — measured bounded under the hot-user skew probe.
  */
object Extras39 {

  val queries: Map[String, Q] = Map(

    // k-anonymity audit: group customers by a quasi-identifier tuple
    // (nation, market segment, account-balance band) and report, per
    // privacy threshold k ∈ {2,5,10}, how many equivalence classes and
    // rows fall below k — the re-identification exposure measure
    // (Sweeney). ONE shuffle on the QI tuple; the per-k readout explodes
    // a 1-row aggregate, so the report side is constant-sized at any
    // customer cardinality.
    "profile_k_anonymity" -> { (s, dir) =>
      val ks = Seq(2, 5, 10)
      val sizes = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 100).as("bal_bucket"))
        .agg(count(lit(1)).as("cnt"))
      val kAggs = ks.flatMap { k =>
        Seq(sum(when(col("cnt") < k, col("cnt")).otherwise(0L))
              .as(s"rows_$k"),
            sum(when(col("cnt") < k, 1L).otherwise(0L)).as(s"groups_$k"))
      }
      val base = Seq(count(lit(1)).as("n_groups"), sum(col("cnt")).as("n_rows"),
        min(col("cnt")).as("min_group_size"))
      val rep = sizes.agg((base ++ kAggs).head, (base ++ kAggs).tail: _*)
      val rows = ks.map { k =>
        struct(lit(k).as("k"), col(s"groups_$k").as("groups_below"),
          col(s"rows_$k").as("rows_below"))
      }
      rep.select(col("n_groups"), col("n_rows"), col("min_group_size"),
          explode(array(rows: _*)).as("r"))
        .select(col("r.k").as("k"), col("n_groups"), col("n_rows"),
          col("min_group_size"),
          col("r.groups_below").as("groups_below"),
          col("r.rows_below").as("rows_below"),
          // one IEEE division per row — bit-identical cross-engine
          (round(col("r.rows_below").cast(DoubleType) /
            col("n_rows").cast(DoubleType), 6) + lit(0.0))
            .as("at_risk_share"))
        .orderBy("k")
    },

    // l-diversity audit: coarser QI blocks (nation, wide balance band),
    // sensitive attribute = market segment; l = distinct sensitive values
    // inside a block. Histogram over l — the l=1 row counts HOMOGENEOUS
    // blocks (attribute disclosure even when k-anonymous). The distinct
    // count rides the same single QI shuffle (partial aggregation on
    // (QI, segment) first); the histogram re-agg is block-cardinality.
    "profile_l_diversity" -> { (s, dir) =>
      val blocks = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 500).as("bal_band"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("c_mktsegment")).as("l"))
      blocks.groupBy("l")
        .agg(count(lit(1)).as("n_groups"), sum(col("cnt")).as("n_rows"))
        .orderBy("l")
    },

    // frequency encoding: replace a categorical (p_brand) by its count
    // statistics — the standard high-cardinality encoder next to target
    // mean / WOE / hashing in the encode family. The category census is
    // ONE map-side-combined aggregate to a ~25-row table; the fact-grain
    // output joins it back by BROADCAST, so the parts relation is never
    // shuffled. freq is one IEEE division on exact integers.
    "encode_frequency" -> { (s, dir) =>
      val parts = Tables(s, dir, "part")
      val census = parts.groupBy("p_brand").agg(count(lit(1)).as("brand_cnt"))
      // total from the ~25-row census, not a second fact scan
      val total = census.agg(sum(col("brand_cnt")).as("n_total"))
      parts.select("p_partkey", "p_brand")
        .join(broadcast(census), "p_brand")
        .join(broadcast(total))
        .select(col("p_partkey"), col("p_brand"), col("brand_cnt"),
          (round(col("brand_cnt").cast(DoubleType) /
            col("n_total").cast(DoubleType), 6) + lit(0.0)).as("brand_freq"))
        .orderBy("p_partkey")
    },

    // multi-lag autocorrelation of daily order revenue (lags 1..7 — the
    // weekly-seasonality screen). Daily totals are exact DECIMAL(18,4)
    // sums promoted to integer ten-thousandths (Pearson is scale-
    // invariant, and integer values let BOTH engines form the cross
    // products exactly: Spark multiplies in DECIMAL(38,0), DuckDB in
    // HUGEINT — a raw decimal(18,4)² multiply overflows DuckDB's common-
    // DECIMAL(18) coercion, the Spearman lesson). The lag pairing is a
    // 7-way explode of the ~day-count-sized daily frame joined back to
    // ITSELF by broadcast — the fact table is scanned once, and no
    // global-order window exists anywhere. Doubles only in the final
    // closed-form expression (single IEEE ops on identical exact
    // integers cross-engine).
    "timeseries_acf_lags" -> { (s, dir) =>
      val daily = Tables(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(dec(col("o_totalprice"))) * 10000).cast(LongType).as("rev"))
      val lagged = daily
        .select(col("day"), col("rev").as("x"),
          explode(array((1 to 7).map(lit(_)): _*)).as("lag"))
        .withColumn("pday", date_sub(col("day"), col("lag")))
      val pairs = lagged.join(
        broadcast(daily.select(col("day").as("pday"), col("rev").as("y"))),
        "pday")
      // cast BEFORE multiplying: long×long c² wraps at ~3e9 per the
      // round-11 advisor finding; DECIMAL(38,0) keeps products exact
      val (x, y) = (col("x").cast(DecimalType(38, 0)),
        col("y").cast(DecimalType(38, 0)))
      pairs.groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(x).cast(DoubleType).as("sx"), sum(y).cast(DoubleType).as("sy"),
          sum(x * col("y")).cast(DoubleType).as("sxy"),
          sum(x * col("x")).cast(DoubleType).as("sx2"),
          sum(y * col("y")).cast(DoubleType).as("sy2"))
        .where(col("n_pairs") >= 3)
        .select(col("lag"), col("n_pairs"),
          (round((col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n_pairs") * col("sx2") - col("sx") * col("sx")) *
              sqrt(col("n_pairs") * col("sy2") - col("sy") * col("sy"))), 6)
            + lit(0.0)).as("acf"))
        .orderBy("lag")
    },

    // inter-arrival burstiness per user (Goh–Barabási B = (σ−μ)/(σ+μ)
    // over the gap distribution): B→−1 for metronome traffic, 0 for
    // Poisson, →1 for bursty — the behavioral signature behind bot
    // detection and rate-limit sizing. Gaps are exact integer seconds
    // from a per-user window (partitions are users — shard-parallel);
    // sufficient statistics Σg and Σg² in DECIMAL(38,0) (long g² wraps at
    // ~3e9 s — the round-11 advisor lesson); doubles only in the final
    // closed-form (single IEEE ops on identical exact integers
    // cross-engine). Tie order within an equal timestamp cannot change
    // the gap MULTISET (sorted values are identical), so the stats are
    // deterministic without a tiebreaker column.
    "events_inter_arrival_burstiness" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("t"))
      val w = Window.partitionBy("user_id").orderBy("t")
      val gaps = ev.withColumn("g", col("t") - lag(col("t"), 1).over(w))
        .where(col("g").isNotNull)
      val gd = col("g").cast(DecimalType(38, 0))
      val stats = gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(gd).cast(DoubleType).as("s1"),
          sum(gd * col("g")).cast(DoubleType).as("s2"))
        .where(col("n_gaps") >= 5)
      val n = col("n_gaps").cast(DoubleType)
      val mean = col("s1") / n
      val std = sqrt((n * col("s2") - col("s1") * col("s1")) /
        (n * (n - lit(1.0))))
      stats.select(col("user_id"), col("n_gaps"),
          (round(mean, 6) + lit(0.0)).as("mean_gap_s"),
          (round(std, 6) + lit(0.0)).as("std_gap_s"),
          (round((std - mean) / (std + mean), 6) + lit(0.0)).as("burstiness"))
        .orderBy("user_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "profile_k_anonymity" -> {
      val ks = Seq(2, 5, 10)
      val perK = ks.map { k =>
        s"""SELECT $k AS k, n_groups, n_rows, min_group_size,
           |  groups_$k AS groups_below, rows_$k AS rows_below,
           |  round(cast(rows_$k AS double) / cast(n_rows AS double), 6)
           |    + 0.0 AS at_risk_share
           |FROM rep""".stripMargin
      }.mkString("\nUNION ALL\n")
      val kCols = ks.map { k =>
        s"""cast(sum(CASE WHEN cnt < $k THEN cnt ELSE 0 END) AS bigint)
           |    AS rows_$k,
           |  cast(sum(CASE WHEN cnt < $k THEN 1 ELSE 0 END) AS bigint)
           |    AS groups_$k""".stripMargin
      }.mkString(",\n  ")
      s"""WITH sizes AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    cast(floor(c_acctbal / 100) AS bigint) AS bal_bucket,
         |    count(*) AS cnt
         |  FROM customer GROUP BY 1, 2, 3),
         |rep AS (
         |  SELECT cast(count(*) AS bigint) AS n_groups,
         |    cast(sum(cnt) AS bigint) AS n_rows,
         |    cast(min(cnt) AS bigint) AS min_group_size,
         |  $kCols
         |  FROM sizes)
         |$perK
         |ORDER BY k""".stripMargin
    },
    "profile_l_diversity" ->
      """WITH blocks AS (
        |  SELECT c_nationkey,
        |    cast(floor(c_acctbal / 500) AS bigint) AS bal_band,
        |    cast(count(*) AS bigint) AS cnt,
        |    cast(count(DISTINCT c_mktsegment) AS bigint) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT l, cast(count(*) AS bigint) AS n_groups,
        |  cast(sum(cnt) AS bigint) AS n_rows
        |FROM blocks GROUP BY l ORDER BY l""".stripMargin,
    "encode_frequency" ->
      """WITH census AS (
        |  SELECT p_brand, cast(count(*) AS bigint) AS brand_cnt
        |  FROM part GROUP BY 1),
        |tot AS (SELECT cast(count(*) AS bigint) AS n_total FROM part)
        |SELECT p_partkey, p.p_brand, brand_cnt,
        |  round(cast(brand_cnt AS double) / cast(n_total AS double), 6)
        |    + 0.0 AS brand_freq
        |FROM part p JOIN census c ON p.p_brand = c.p_brand CROSS JOIN tot
        |ORDER BY p_partkey""".stripMargin,
    "timeseries_acf_lags" ->
      """WITH daily AS (
        |  SELECT cast(o_orderdate AS date) AS day,
        |    cast(sum(cast(o_totalprice AS decimal(18,4))) * 10000 AS bigint)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT d.day, d.rev AS x, cast(l.lag AS int) AS lag,
        |    d.day - cast(l.lag AS int) AS pday
        |  FROM daily d CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l),
        |pairs AS (
        |  SELECT lg.lag, lg.x, p.rev AS y
        |  FROM lagged lg JOIN daily p ON lg.pday = p.day),
        |s AS (
        |  SELECT lag, count(*) AS n_pairs,
        |    cast(sum(cast(x AS hugeint)) AS double) AS sx,
        |    cast(sum(cast(y AS hugeint)) AS double) AS sy,
        |    cast(sum(cast(x AS hugeint) * y) AS double) AS sxy,
        |    cast(sum(cast(x AS hugeint) * x) AS double) AS sx2,
        |    cast(sum(cast(y AS hugeint) * y) AS double) AS sy2
        |  FROM pairs GROUP BY 1)
        |SELECT lag, n_pairs,
        |  round((n_pairs * sxy - sx * sy) /
        |    (sqrt(n_pairs * sx2 - sx * sx) * sqrt(n_pairs * sy2 - sy * sy)),
        |    6) + 0.0 AS acf
        |FROM s WHERE n_pairs >= 3 ORDER BY lag""".stripMargin,
    "events_inter_arrival_burstiness" ->
      """WITH t AS (
        |  SELECT user_id,
        |    cast(epoch(date_trunc('second', cast(ts AS timestamp)))
        |      AS bigint) AS t
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    t - lag(t, 1) OVER (PARTITION BY user_id ORDER BY t) AS g
        |  FROM t),
        |s AS (
        |  SELECT user_id, count(*) AS n_gaps,
        |    cast(sum(cast(g AS hugeint)) AS double) AS s1,
        |    cast(sum(cast(g AS hugeint) * g) AS double) AS s2
        |  FROM g WHERE g IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps,
        |  round(s1 / n_gaps, 6) + 0.0 AS mean_gap_s,
        |  round(sqrt((n_gaps * s2 - s1 * s1) / (n_gaps * (n_gaps - 1.0))), 6)
        |    + 0.0 AS std_gap_s,
        |  round((sqrt((n_gaps * s2 - s1 * s1) / (n_gaps * (n_gaps - 1.0)))
        |      - s1 / n_gaps) /
        |    (sqrt((n_gaps * s2 - s1 * s1) / (n_gaps * (n_gaps - 1.0)))
        |      + s1 / n_gaps), 6) + 0.0 AS burstiness
        |FROM s WHERE n_gaps >= 5 ORDER BY user_id""".stripMargin
  )
}
