package graft.clean

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Data-quality validation + feature scaling (cleaning-engine surface).
  *
  * - `validate_constraints`: declarative rule checks — uniqueness,
  *   not-null, domain, range, referential integrity — each reported as a
  *   violation count. The synthetic tables are clean, so violations are
  *   INJECTED deterministically (keyed on orderkey modulo, the
  *   cast_safe_numeric pattern) and the oracle mirrors the injection:
  *   the gate proves the validator COUNTS, not that clean data is clean.
  *   Scale: the four single-table rules are conditional columns of ONE
  *   aggregate (one pass, map-side partials); the referential rule is a
  *   broadcast anti-join against the dimension — no rule costs its own
  *   scan of the fact beyond these two.
  * - `scale_standardize`: z-score + min-max scaled copies of a column.
  *   Stats (mean/std from exact decimal sums, min/max) are ONE tiny agg
  *   broadcast back over the rows — the agg→crossJoin(broadcast) pattern
  *   (clean/Outliers.scala), never an empty-partitionBy window.
  * - `outlier_mad_flag`: robust outliers via median absolute deviation,
  *   |x − med| > 3·1.4826·MAD. Two percentile passes (med, then MAD),
  *   each broadcast back; bounds rounded to 4 decimals so a last-bit
  *   interpolation difference between engines can't flip a boundary row
  *   (same rule as the IQR fences).
  */
object Validate {

  val queries: Map[String, Q] = Map(
    "validate_constraints" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      // deterministic dirt: dup keys, null custkeys, bad status, negative
      // price, dangling foreign keys
      val dirty = o.select(
        when(col("o_orderkey") % 101 === 0, col("o_orderkey") + 1L)
          .otherwise(col("o_orderkey")).as("key"),
        when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
          .when(col("o_orderkey") % 79 === 0, col("o_custkey") + 10000000L)
          .otherwise(col("o_custkey")).as("cust"),
        when(col("o_orderkey") % 89 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("o_orderkey") % 83 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("price"))
      val single = dirty.agg(
        (count(lit(1)) - countDistinct(col("key"))).as("key_dup"),
        sum(when(col("cust").isNull, 1L).otherwise(0L)).as("cust_null"),
        sum(when(col("price") < 0, 1L).otherwise(0L)).as("price_neg"),
        sum(when(!col("status").isin("O", "F", "P"), 1L).otherwise(0L)).as("status_bad"))
      val rules = single.select(expr(
        """stack(4,
          |  'key_unique', key_dup,
          |  'cust_not_null', cust_null,
          |  'price_nonneg', price_neg,
          |  'status_domain', status_bad) as (rule, n_violations)""".stripMargin))
      val c = Tables(s, dir, "customer").select(col("c_custkey"))
      val ref = dirty.where(col("cust").isNotNull)
        .join(broadcast(c), col("cust") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("cust_ref_customer").as("rule"), col("n_violations"))
      rules.unionByName(ref).orderBy(col("rule"))
    },

    "scale_standardize" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val d = col("value").cast("decimal(18,4)")
      val stats = ev.agg(
        sum(d).cast("double").as("sx"),
        sum(d * d).cast("double").as("sx2"),
        count(col("value")).as("n"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))
        .select((col("sx") / col("n")).as("mean"),
          sqrt((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            .as("std"),
          col("vmin"), col("vmax"))
      // nullif guards: a constant column (std = 0, vmax = vmin) must yield
      // NULL in both engines, not Spark-NULL-vs-DuckDB-inf
      ev.crossJoin(broadcast(stats))
        .select(col("event_id"),
          round((col("value") - col("mean")) / nullif(col("std"), lit(0.0)), 6)
            .as("z"),
          round((col("value") - col("vmin")) /
            nullif(col("vmax") - col("vmin"), lit(0.0)), 6).as("minmax"))
        .orderBy(col("event_id"))
    },

    "outlier_mad_flag" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val med = ev.agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val mad = ev.crossJoin(broadcast(med))
        .agg(round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"),
          min(col("med")).as("med"))
      ev.crossJoin(broadcast(mad))
        .agg(count(col("value")).as("n_vals"),
          sum(when(abs(col("value") - col("med")) > lit(3.0) * lit(1.4826) * col("mad"),
            1L).otherwise(0L)).as("n_out"),
          min(col("med")).as("med"), min(col("mad")).as("mad"))
    }
  )

  // the dirty view, mirrored expression-for-expression
  private val sqlDirty =
    """dirty AS (SELECT
      |  CASE WHEN o_orderkey % 101 = 0 THEN o_orderkey + 1 ELSE o_orderkey END AS key,
      |  CASE WHEN o_orderkey % 97 = 0 THEN NULL
      |       WHEN o_orderkey % 79 = 0 THEN o_custkey + 10000000
      |       ELSE o_custkey END AS cust,
      |  CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END AS status,
      |  CASE WHEN o_orderkey % 83 = 0 THEN -o_totalprice ELSE o_totalprice END AS price
      |FROM orders)""".stripMargin

  val oracle: Map[String, String] = Map(
    "validate_constraints" ->
      s"""WITH $sqlDirty,
         |s AS (SELECT
         |  count(*) - count(DISTINCT key) AS key_dup,
         |  sum(CASE WHEN cust IS NULL THEN 1 ELSE 0 END) AS cust_null,
         |  sum(CASE WHEN price < 0 THEN 1 ELSE 0 END) AS price_neg,
         |  sum(CASE WHEN status NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS status_bad
         |FROM dirty),
         |r AS (SELECT count(*) AS n FROM dirty d
         |  LEFT JOIN customer c ON d.cust = c.c_custkey
         |  WHERE d.cust IS NOT NULL AND c.c_custkey IS NULL)
         |SELECT rule, cast(n_violations AS bigint) AS n_violations FROM (
         |  SELECT 'key_unique' AS rule, key_dup AS n_violations FROM s
         |  UNION ALL SELECT 'cust_not_null', cust_null FROM s
         |  UNION ALL SELECT 'price_nonneg', price_neg FROM s
         |  UNION ALL SELECT 'status_domain', status_bad FROM s
         |  UNION ALL SELECT 'cust_ref_customer', n FROM r)
         |ORDER BY rule""".stripMargin,
    "scale_standardize" ->
      """WITH st AS (
        |  SELECT cast(sum(cast(value as decimal(18,4))) as double) AS sx,
        |    cast(sum(cast(value as decimal(18,4)) * cast(value as decimal(18,4))) as double) AS sx2,
        |    count(value) AS n, min(value) AS vmin, max(value) AS vmax FROM events),
        |ms AS (SELECT sx / n AS mean,
        |  sqrt((sx2 - sx * sx / n) / (n - 1)) AS std, vmin, vmax FROM st)
        |SELECT event_id,
        |  round((value - mean) / nullif(std, 0), 6) AS z,
        |  round((value - vmin) / nullif(vmax - vmin, 0), 6) AS minmax
        |FROM events CROSS JOIN ms ORDER BY event_id""".stripMargin,
    "outlier_mad_flag" ->
      """WITH m AS (SELECT round(quantile_cont(value, 0.5), 4) AS med FROM events),
        |md AS (SELECT round(quantile_cont(abs(value - med), 0.5), 4) AS mad,
        |  min(med) AS med FROM events CROSS JOIN m)
        |SELECT count(value) AS n_vals,
        |cast(sum(CASE WHEN abs(value - med) > 3.0 * 1.4826 * mad
        |  THEN 1 ELSE 0 END) as bigint) AS n_out,
        |min(med) AS med, min(mad) AS mad
        |FROM events CROSS JOIN md""".stripMargin
  )
}
