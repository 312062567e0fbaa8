package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 12 batch 3/4: t-closeness (completing the k-anonymity /
  * l-diversity privacy-audit trio), event-type affinity, interpolated
  * per-group percentiles, and Neyman sample allocation. The t-closeness
  * / affinity / Neyman queries are one-fact-shuffle reports with
  * dimension-sized downstream frames; percentile_cont rides the
  * distributed prefix-sum kernel for its per-group positions (a plain
  * per-type window would funnel ~1/|types| of the fact through one
  * task).
  */
object Extras40 {

  val queries: Map[String, Q] = Map(

    // t-closeness audit: for each quasi-identifier block, the distance
    // between its sensitive-attribute (market segment) distribution and
    // the global one. For a NOMINAL sensitive attribute the earth-mover
    // distance reduces to total variation: t_b = ½·Σ_s |p_{b,s} − p_s| =
    // Σ_s |n_bs·N − n_s·n_b| / (2·n_b·N) — the numerator stays an exact
    // DECIMAL(38,0) integer (missing (block, segment) cells count as
    // n_bs = 0 via the dimension-sized block×segment grid), so the only
    // IEEE arithmetic is the final division and threshold compares are
    // engine-deterministic. Readout mirrors profile_k_anonymity: one row
    // per t threshold from a 1-row-aggregate explode.
    "profile_t_closeness" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer").select(col("c_nationkey"),
        floor(col("c_acctbal") / 500).as("band"),
        col("c_mktsegment").as("seg"))
      val bs = cust.groupBy("c_nationkey", "band", "seg")
        .agg(count(lit(1)).as("n_bs"))
      val blocks = bs.groupBy("c_nationkey", "band").agg(sum("n_bs").as("n_b"))
      val segs = cust.groupBy("seg").agg(count(lit(1)).as("n_s"))
      val tot = cust.agg(count(lit(1)).as("n_tot"))
      val grid = blocks.crossJoin(broadcast(segs))
        .join(bs, Seq("c_nationkey", "band", "seg"), "left")
        .withColumn("n_bs", coalesce(col("n_bs"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("num",
          abs(col("n_bs").cast(DecimalType(38, 0)) * col("n_tot") -
            col("n_s").cast(DecimalType(38, 0)) * col("n_b")))
      val tb = grid.groupBy("c_nationkey", "band")
        .agg(sum(col("num")).as("num"), min(col("n_b")).as("n_b"),
          min(col("n_tot")).as("n_tot"))
        .withColumn("t", col("num").cast(DoubleType) /
          (lit(2.0) * col("n_b").cast(DoubleType) *
            col("n_tot").cast(DoubleType)))
      val ts = Seq(0.2, 0.35, 0.5)
      val thAggs = ts.zipWithIndex.flatMap { case (th, i) =>
        Seq(sum(when(col("t") > th, 1L).otherwise(0L)).as(s"blocks_$i"),
          sum(when(col("t") > th, col("n_b")).otherwise(0L)).as(s"rows_$i"))
      }
      val base = Seq(count(lit(1)).as("n_blocks"),
        (round(max(col("t")), 6) + lit(0.0)).as("max_t"))
      val rep = tb.agg((base ++ thAggs).head, (base ++ thAggs).tail: _*)
      val rows = ts.zipWithIndex.map { case (th, i) =>
        struct(lit(th).as("threshold"), col(s"blocks_$i").as("blocks_above"),
          col(s"rows_$i").as("rows_above"))
      }
      rep.select(col("n_blocks"), col("max_t"),
          explode(array(rows: _*)).as("r"))
        .select(col("r.threshold").as("threshold"), col("n_blocks"),
          col("max_t"), col("r.blocks_above").as("blocks_above"),
          col("r.rows_above").as("rows_above"))
        .orderBy("threshold")
    },

    // event-type affinity: Jaccard overlap of the USER SETS behind every
    // type pair — which behaviors co-occur in the same accounts (the
    // cross-sell / feature-bundling signal). The fact table reduces to
    // distinct (type, user) ONCE; the self-join keys on user with
    // fan-out bounded by the type cardinality squared (a dimension, not
    // data volume); totals join back broadcast.
    "events_type_affinity_jaccard" -> { (s, dir) =>
      val tu = Tables(s, dir, "events")
        .select(col("event_type").as("type_a"), col("user_id")).distinct()
      val co = tu
        .join(tu.select(col("type_a").as("type_b"), col("user_id")), "user_id")
        .where(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
      val totals = tu.groupBy("type_a").agg(count(lit(1)).as("n_a"))
      co.join(broadcast(totals), "type_a")
        .join(broadcast(totals.select(col("type_a").as("type_b"),
          col("n_a").as("n_b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_both"),
          (round(col("n_both").cast(DoubleType) /
            (col("n_a") + col("n_b") - col("n_both")).cast(DoubleType), 6)
            + lit(0.0)).as("jaccard"))
        .orderBy("type_a", "type_b")
    },

    // interpolated (SQL percentile_cont) per-group quantiles — the whole
    // existing quantile family is DISCrete (always a stored element);
    // the interpolated form is the one numeric consumers (SLA dashboards,
    // z-binning) usually mean. Positions ride the distributed prefix-sum
    // kernel (running count partitioned by event_type) — a plain
    // row_number window partitioned by a HANDFUL of event types would
    // sort ~1/|types| of the whole fact in one task, the exact shape
    // window_ntile_percent was reworked off this round (review-caught).
    // The lerp x_lo + frac·(x_hi − x_lo) is written IDENTICALLY in both
    // engines (built-in quantile_cont is deliberately NOT used in the
    // oracle — its interpolation form is an engine detail; the manual
    // mirror is the contract). Ties in x don't need a tiebreaker: the
    // value at a sorted position is multiset-deterministic, and the
    // kernel's per-row cumulative count IS row_number semantics.
    "agg_percentile_cont_by_group" -> { (s, dir) =>
      val qs = Seq(0.25, 0.5, 0.75, 0.9)
      // null-proof: Spark sorts NULLS FIRST ascending, DuckDB NULLS LAST —
      // excluding them keeps the rank positions engine-identical on any
      // future testdata generation (none exist today)
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("value"))
        .where(col("value").isNotNull)
      // exactly (part, order, value): the kernel's single-exchange
      // structural-reuse contract (see distributedRunningSum)
      val ranked = graft.llm.Chunking.distributedRunningSum(
        ev.withColumn("__one", lit(1L)), "event_type", "value", "__one", "rn")
        .drop("__one")
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val j = ranked.join(broadcast(n), "event_type")
      val aggs = qs.zipWithIndex.flatMap { case (q, i) =>
        val pos = (col("n") - 1).cast(DoubleType) * q
        val k = floor(pos)
        Seq(min(when(col("rn") === k + 1, col("value"))).as(s"lo$i"),
          min(when(col("rn") === least(k + 2, col("n").cast(DoubleType)),
            col("value"))).as(s"hi$i"),
          min(pos - k).as(s"frac$i"))
      }
      val rows = qs.zipWithIndex.map { case (q, i) =>
        struct(lit(q).as("q"),
          (round(col(s"lo$i") + col(s"frac$i") * (col(s"hi$i") - col(s"lo$i")),
            6) + lit(0.0)).as("p_cont"))
      }
      val allAggs = min(col("n")).as("n") +: aggs
      j.groupBy("event_type")
        .agg(allAggs.head, allAggs.tail: _*)
        .select(col("event_type"), col("n"), explode(array(rows: _*)).as("r"))
        .select(col("event_type"), col("r.q").as("q"), col("n"),
          col("r.p_cont").as("p_cont"))
        .orderBy("event_type", "q")
    },

    // Neyman-allocation stratified sampling design: allocate a fixed
    // sample budget across strata ∝ N_h·S_h (minimum-variance allocation
    // for a fixed total n — the survey-sampling optimum). Strata stats
    // come from ONE fact aggregate over exact integer cents (Σv and Σv²
    // in DECIMAL(38,0) — the overflow-proof discipline); the allocation
    // arithmetic runs on the strata-count-sized frame. Report per
    // stratum: population, std, Neyman share, allocated n, achieved
    // sampling fraction — the design table a sampling job executes with
    // the quota kernel.
    "sample_stratified_neyman" -> { (s, dir) =>
      val nTarget = 1000
      // integer ten-thousandths: DECIMAL(18,4)·10⁴ is exact (no rounding
      // at the scale-0 cast — cents via ·100 would ROUND the residual
      // two decimals, and Spark HALF_UP vs DuckDB's cast need not agree)
      val o = Tables(s, dir, "orders").select(col("o_orderpriority"),
        (dec(col("o_totalprice")) * 10000).cast(DecimalType(38, 0)).as("v"))
      val st = o.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_pop"),
          sum(col("v")).cast(DoubleType).as("s1"),
          sum(col("v") * col("v")).cast(DoubleType).as("s2"))
      val nD = col("n_pop").cast(DoubleType)
      val stdH = sqrt((nD * col("s2") - col("s1") * col("s1")) /
        (nD * (nD - lit(1.0)))) / lit(10000.0)
      val w = st.withColumn("std_h", stdH)
        .withColumn("w_h", col("n_pop").cast(DoubleType) * col("std_h"))
      val tot = w.agg(sum(col("w_h")).as("w_tot"))
      w.crossJoin(broadcast(tot))
        .select(col("o_orderpriority"), col("n_pop"),
          (round(col("std_h"), 6) + lit(0.0)).as("std_h"),
          (round(col("w_h") / col("w_tot"), 6) + lit(0.0)).as("neyman_share"),
          floor(lit(nTarget.toDouble) * col("w_h") / col("w_tot"))
            .cast(LongType).as("alloc_n"),
          (round(floor(lit(nTarget.toDouble) * col("w_h") / col("w_tot")) /
            col("n_pop").cast(DoubleType), 6) + lit(0.0))
            .as("sampling_fraction"))
        .orderBy("o_orderpriority")
    }
  )

  val oracle: Map[String, String] = Map(
    "profile_t_closeness" -> {
      val ts = Seq(0.2, 0.35, 0.5)
      val thCols = ts.zipWithIndex.map { case (th, i) =>
        s"""cast(sum(CASE WHEN t > $th THEN 1 ELSE 0 END) AS bigint)
           |    AS blocks_$i,
           |  cast(sum(CASE WHEN t > $th THEN n_b ELSE 0 END) AS bigint)
           |    AS rows_$i""".stripMargin
      }.mkString(",\n  ")
      val perTh = ts.zipWithIndex.map { case (th, i) =>
        s"""SELECT cast($th AS double) AS threshold, n_blocks, max_t,
           |  blocks_$i AS blocks_above, rows_$i AS rows_above FROM rep"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH cust AS (SELECT c_nationkey,
         |    cast(floor(c_acctbal / 500) AS bigint) AS band,
         |    c_mktsegment AS seg FROM customer),
         |bs AS (SELECT c_nationkey, band, seg, cast(count(*) AS bigint)
         |    AS n_bs FROM cust GROUP BY 1, 2, 3),
         |blocks AS (SELECT c_nationkey, band, cast(sum(n_bs) AS bigint)
         |    AS n_b FROM bs GROUP BY 1, 2),
         |segs AS (SELECT seg, cast(count(*) AS bigint) AS n_s
         |  FROM cust GROUP BY 1),
         |tot AS (SELECT cast(count(*) AS bigint) AS n_tot FROM cust),
         |grid AS (SELECT b.c_nationkey, b.band, b.n_b, s.seg, s.n_s, n_tot,
         |    coalesce(bs.n_bs, 0) AS n_bs
         |  FROM blocks b CROSS JOIN segs s CROSS JOIN tot
         |  LEFT JOIN bs ON b.c_nationkey = bs.c_nationkey
         |    AND b.band = bs.band AND s.seg = bs.seg),
         |tb AS (SELECT c_nationkey, band,
         |    cast(sum(abs(cast(n_bs AS hugeint) * n_tot
         |      - cast(n_s AS hugeint) * n_b)) AS double) /
         |      (2.0 * cast(min(n_b) AS double) * cast(min(n_tot) AS double))
         |      AS t,
         |    min(n_b) AS n_b
         |  FROM grid GROUP BY 1, 2),
         |rep AS (SELECT cast(count(*) AS bigint) AS n_blocks,
         |    round(max(t), 6) + 0.0 AS max_t,
         |  $thCols
         |  FROM tb)
         |$perTh
         |ORDER BY threshold""".stripMargin
    },
    "events_type_affinity_jaccard" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |co AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    cast(count(*) AS bigint) AS n_both
        |  FROM tu a JOIN tu b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |tt AS (SELECT event_type, cast(count(*) AS bigint) AS n
        |  FROM tu GROUP BY 1)
        |SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_both,
        |  round(cast(n_both AS double) /
        |    cast(ta.n + tb.n - n_both AS double), 6) + 0.0 AS jaccard
        |FROM co JOIN tt ta ON co.type_a = ta.event_type
        |  JOIN tt tb ON co.type_b = tb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "agg_percentile_cont_by_group" -> {
      val qs = Seq(0.25, 0.5, 0.75, 0.9)
      val aggs = qs.zipWithIndex.map { case (q, i) =>
        s"""min(CASE WHEN rn = floor((n - 1.0) * $q) + 1 THEN value END)
           |    AS lo$i,
           |  min(CASE WHEN rn = least(floor((n - 1.0) * $q) + 2,
           |    cast(n AS double)) THEN value END) AS hi$i,
           |  min((n - 1.0) * $q - floor((n - 1.0) * $q)) AS frac$i"""
          .stripMargin
      }.mkString(",\n  ")
      val perQ = qs.zipWithIndex.map { case (q, i) =>
        s"""SELECT event_type, cast($q AS double) AS q, n,
           |  round(lo$i + frac$i * (hi$i - lo$i), 6) + 0.0 AS p_cont
           |FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH r AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value)
         |      AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM events WHERE value IS NOT NULL),
         |a AS (SELECT event_type, cast(min(n) AS bigint) AS n,
         |  $aggs
         |  FROM r GROUP BY event_type)
         |$perQ
         |ORDER BY event_type, q""".stripMargin
    },
    "sample_stratified_neyman" ->
      """WITH o AS (SELECT o_orderpriority,
        |    cast(cast(o_totalprice AS decimal(18,4)) * 10000 AS hugeint)
        |      AS v
        |  FROM orders),
        |st AS (SELECT o_orderpriority, cast(count(*) AS bigint) AS n_pop,
        |    cast(sum(v) AS double) AS s1,
        |    cast(sum(v * v) AS double) AS s2
        |  FROM o GROUP BY 1),
        |w AS (SELECT *,
        |    sqrt((n_pop * s2 - s1 * s1) / (n_pop * (n_pop - 1.0))) / 10000.0
        |      AS std_h
        |  FROM st),
        |w2 AS (SELECT *, cast(n_pop AS double) * std_h AS w_h FROM w),
        |tot AS (SELECT sum(w_h) AS w_tot FROM w2)
        |SELECT o_orderpriority, n_pop,
        |  round(std_h, 6) + 0.0 AS std_h,
        |  round(w_h / w_tot, 6) + 0.0 AS neyman_share,
        |  cast(floor(1000.0 * w_h / w_tot) AS bigint) AS alloc_n,
        |  round(floor(1000.0 * w_h / w_tot) / cast(n_pop AS double), 6)
        |    + 0.0 AS sampling_fraction
        |FROM w2 CROSS JOIN tot ORDER BY o_orderpriority""".stripMargin
  )
}
