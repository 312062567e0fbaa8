package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-10 batch 6: STL-style trend/seasonal strength (the "is this
  * series worth decomposing" diagnostic), the SplitColumn CleanOp's
  * declared validation query, and order-vs-lineitem total consistency —
  * the cross-table referential audit.
  */
object Extras34 {

  val queries: Map[String, Q] = Map(
    // trend / seasonal STRENGTH of the daily value series (Hyndman's
    // F_T = max(0, 1 − Var(R)/Var(T+R)), F_S = max(0, 1 − Var(R)/Var(S+R))):
    // the one-row diagnostic that says whether the series HAS structure
    // worth modeling. Reuses the seasonal_decompose construction — 7-day
    // centered MA trend (explode-join, never a window sort over the
    // fact), weekday-phase means as the seasonal component — then all
    // three variances come from MILLI-QUANTIZED integer sufficient
    // statistics over the SAME joined day set (floor(x·1000) of doubles
    // computed identically in both engines → identical longs; n·Σx²−(Σx)²
    // in double is one fixed IEEE tree over exact integers).
    "timeseries_stl_strength" -> { (s, dir) =>
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
      val det = daily.join(trend, daily("day") === trend("t_day"))
        .select(col("day"), (col("dq").cast(DoubleType) / 1000000.0).as("y"),
          ((col("dq").cast(DoubleType) / 1000000.0) -
            (col("wsum").cast(DoubleType) / 7000000.0)).as("detrended"))
      val seas = det.groupBy((col("day") % 7).as("phase"))
        .agg((sum(col("detrended").cast(DecimalType(24, 12)))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType)).as("s"))
      val withS = det.select(col("day"), col("y"), col("detrended"),
          (col("day") % 7).as("phase"))
        .join(broadcast(seas), Seq("phase"))
        .select(
          floor((col("detrended") - col("s")) * 1000.0).as("rq"),
          floor(col("detrended") * 1000.0).as("sq"),
          floor((col("y") - col("s")) * 1000.0).as("tq"))
      // squares summed in DECIMAL(38,0): at sf1 the quantized daily
      // residuals reach ~5e8, squares ~2.5e17, and the year-long sum
      // passes Long.Max (the sf1 gate caught the ANSI overflow). The
      // decimal sum is exact; DuckDB's bigint sum is already HUGEINT,
      // so both engines cast the SAME exact integer to double.
      def varNum(c: String) =
        count(lit(1)).cast(DoubleType) *
          sum(col(c).cast(DecimalType(38, 0)) * col(c)).cast(DoubleType) -
          sum(col(c)).cast(DoubleType) * sum(col(c)).cast(DoubleType)
      withS.agg(count(lit(1)).as("n_days"),
          varNum("rq").as("vr"), varNum("sq").as("vs"), varNum("tq").as("vt"))
        .select(col("n_days"),
          round(greatest(lit(0.0), lit(1.0) - col("vr") / col("vt")), 6)
            .as("f_trend"),
          round(greatest(lit(0.0), lit(1.0) - col("vr") / col("vs")), 6)
            .as("f_seasonal"))
    },

    // the SplitColumn CleanOp as a declared VALIDATION query: split
    // c_name 'Customer#000000001' into prefix + number by regex capture
    // groups, then cross-check the embedded number against c_custkey —
    // the classic "is the denormalized id consistent" audit. One
    // map-side pass + a 1-row aggregate.
    "clean_split_column" -> { (s, dir) =>
      val split0 = graft.clean.SplitColumn("c_name", "^(.*)#([0-9]+)$",
        Seq("name_prefix", "name_num"))(
        Tables(s, dir, "customer").select(col("c_custkey"), col("c_name")))
      split0.agg(count(lit(1)).as("n_customers"),
        sum(when(col("name_num") =!= "", 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("name_num") =!= "" &&
          col("name_num").cast("long") === col("c_custkey"), 1L)
          .otherwise(0L)).as("n_id_consistent"),
        countDistinct(col("name_prefix")).as("n_prefixes"))
    },

    // order-header vs line-item total consistency — the cross-table
    // referential audit (a header total that drifts from its lines means
    // partial loads or currency bugs): per order, the ratio of
    // o_totalprice to the exact-decimal gross line sum, histogrammed in
    // 0.1-wide buckets (floor of an identically-computed double — exact
    // both engines); orders with NO lines surface as bucket -999, never
    // silently dropped.
    "validate_order_totals" -> { (s, dir) =>
      val lines = Tables(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(dsum(col("l_extendedprice")).as("gross"))
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
        .select(when(col("gross").isNull, lit(-999L))
          .otherwise(floor(col("o_totalprice") / col("gross") * 10.0))
          .as("ratio_bucket"))
        .groupBy("ratio_bucket")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("ratio_bucket")
    }
  )

  val oracle: Map[String, String] = Map(
    "timeseries_stl_strength" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    cast(sum(cast(floor(value * 1000000.0) AS bigint)) AS bigint)
        |      AS dq
        |  FROM events GROUP BY 1),
        |trend AS (SELECT day + delta AS t_day, dq
        |  FROM daily CROSS JOIN range(-3, 4) r(delta)),
        |tr AS (SELECT t_day, count(*) AS nw, sum(dq) AS wsum
        |  FROM trend GROUP BY t_day HAVING count(*) = 7),
        |det AS (SELECT day,
        |    cast(dq AS double) / 1000000.0 AS y,
        |    cast(dq AS double) / 1000000.0 - cast(wsum AS double) / 7000000.0
        |      AS detrended
        |  FROM daily JOIN tr ON daily.day = tr.t_day),
        |seas AS (SELECT day % 7 AS phase,
        |    cast(sum(cast(detrended AS decimal(24,12))) AS double) / count(*)
        |      AS s
        |  FROM det GROUP BY 1),
        |q AS (SELECT
        |    cast(floor((detrended - s) * 1000.0) AS bigint) AS rq,
        |    cast(floor(detrended * 1000.0) AS bigint) AS sq,
        |    cast(floor((y - s) * 1000.0) AS bigint) AS tq
        |  FROM det JOIN seas ON det.day % 7 = seas.phase),
        |sums AS (SELECT cast(count(*) AS bigint) AS n,
        |    sum(rq*rq) AS r2, cast(sum(rq) AS bigint) AS r1,
        |    sum(sq*sq) AS s2, cast(sum(sq) AS bigint) AS s1,
        |    sum(tq*tq) AS t2, cast(sum(tq) AS bigint) AS t1
        |  FROM q)
        |SELECT n AS n_days,
        |  round(greatest(0.0, 1.0 -
        |    (cast(n AS double) * cast(r2 AS double)
        |      - cast(r1 AS double) * cast(r1 AS double)) /
        |    (cast(n AS double) * cast(t2 AS double)
        |      - cast(t1 AS double) * cast(t1 AS double))), 6) AS f_trend,
        |  round(greatest(0.0, 1.0 -
        |    (cast(n AS double) * cast(r2 AS double)
        |      - cast(r1 AS double) * cast(r1 AS double)) /
        |    (cast(n AS double) * cast(s2 AS double)
        |      - cast(s1 AS double) * cast(s1 AS double))), 6) AS f_seasonal
        |FROM sums""".stripMargin,
    "clean_split_column" ->
      """WITH sp AS (SELECT c_custkey,
        |    regexp_extract(c_name, '^(.*)#([0-9]+)$', 1) AS name_prefix,
        |    regexp_extract(c_name, '^(.*)#([0-9]+)$', 2) AS name_num
        |  FROM customer)
        |SELECT cast(count(*) AS bigint) AS n_customers,
        |  cast(sum(CASE WHEN name_num <> '' THEN 1 ELSE 0 END) AS bigint)
        |    AS n_matched,
        |  cast(sum(CASE WHEN name_num <> ''
        |    AND cast(name_num AS bigint) = c_custkey THEN 1 ELSE 0 END)
        |    AS bigint) AS n_id_consistent,
        |  cast(count(DISTINCT name_prefix) AS bigint) AS n_prefixes
        |FROM sp""".stripMargin,
    "validate_order_totals" ->
      """WITH lines AS (SELECT l_orderkey,
        |    cast(sum(cast(l_extendedprice AS decimal(18,4))) AS double)
        |      AS gross
        |  FROM lineitem GROUP BY 1),
        |b AS (SELECT CASE WHEN gross IS NULL THEN -999
        |    ELSE cast(floor(o_totalprice / gross * 10.0) AS bigint) END
        |    AS ratio_bucket
        |  FROM orders LEFT JOIN lines ON o_orderkey = l_orderkey)
        |SELECT cast(ratio_bucket AS bigint) AS ratio_bucket,
        |  cast(count(*) AS bigint) AS n_orders
        |FROM b GROUP BY 1 ORDER BY ratio_bucket""".stripMargin
  )
}
