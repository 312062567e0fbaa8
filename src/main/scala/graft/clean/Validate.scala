package graft.clean

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality rules (the reference's "detect" surface as a
  * library): each rule reports a violation COUNT. ALL rules ride ONE
  * aggregate pass over the table — row-predicate rules as conditional sum
  * columns, referential rules as broadcast left joins of the distinct dim
  * keys whose unmatched-marker rows feed the same sums. */
sealed trait Rule { def name: String }
object Rule {
  /** duplicate rows on the key column(s): count − count(distinct). */
  case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique_${cols.mkString("_")}"
  }
  case class NotNull(col: String) extends Rule { val name = s"not_null_$col" }
  /** value outside the allowed set (NULLs don't count — add NotNull). */
  case class InSet(col: String, allowed: Seq[String]) extends Rule {
    val name = s"in_set_$col"
  }
  /** numeric bounds, either side optional (NULLs don't count). */
  case class Bounds(col: String, lo: Option[Double], hi: Option[Double]) extends Rule {
    val name = s"bounds_$col"
  }
  /** value (non-NULL) has no match in the dimension column. */
  case class RefIntegrity(col: String, dim: DataFrame, dimCol: String) extends Rule {
    val name = s"ref_${col}_$dimCol"
  }
}

/** Data-quality validation + feature scaling (cleaning-engine surface).
  *
  * - `validate_constraints`: declarative rule checks — uniqueness,
  *   not-null, domain, range, referential integrity — each reported as a
  *   violation count. The synthetic tables are clean, so violations are
  *   INJECTED deterministically (keyed on orderkey modulo, the
  *   cast_safe_numeric pattern) and the oracle mirrors the injection:
  *   the gate proves the validator COUNTS, not that clean data is clean.
  *   Scale: ALL five rules are conditional columns of ONE aggregate over
  *   the fact (one pass, map-side partials); the referential rule only
  *   adds a broadcast left join of the distinct dim keys before it.
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

  /** PUBLIC API: evaluate [[Rule]]s against a table → (rule, n_violations),
    * one output row per rule, sorted by rule name.
    *
    * ONE pass over the fact regardless of the rule mix: every row-predicate
    * rule is a conditional sum of a single aggregate, and each referential
    * rule rides the SAME aggregate via a broadcast left join of the
    * DISTINCT dim keys (a dangling row is one whose marker stayed null).
    * The pre-join distinct is load-bearing twice over — a duplicate-keyed
    * dim must not fan out the fact rows the other rules are counting, and
    * it shrinks the broadcast to the key set. The old shape ran the
    * row-predicate aggregate and a separate anti-join aggregate per ref
    * rule: two full fact scans where one suffices (PlanSpec pins the
    * 2-scan total for the declared query: fact once + dim once). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    // ref ordinal threaded by GLOBAL rule position (not indexOf): equal
    // duplicate rules each keep their own marker join, so no rule ever
    // reads another's marker and no join is left dead
    val refOrdinal: Map[Int, Int] = rules.zipWithIndex
      .collect { case (_: Rule.RefIntegrity, i) => i }
      .zipWithIndex.toMap
    refOrdinal.values.foreach { j =>
      require(!df.columns.contains(s"__dim_key_$j"),
        s"validate reserves column name __dim_key_$j")
    }
    val joined = rules.zipWithIndex.foldLeft(df) {
      case (acc, (Rule.RefIntegrity(c, dim, dimCol), i)) =>
        // frame-qualified key rename: an unqualified col(dimCol) is
        // ambiguous whenever df carries a column of the same name
        // (same-name FKs, self-referential dims)
        val j = refOrdinal(i)
        val d = dim.select(col(dimCol).as(s"__dim_key_$j")).distinct()
        acc.join(broadcast(d), acc(c) === d(s"__dim_key_$j"), "left_outer")
      case (acc, _) => acc
    }
    val aggCols = rules.zipWithIndex.map {
      case (Rule.Unique(cs), i) =>
        // distinct over a STRUCT of the key columns: a struct with NULL
        // fields is itself non-NULL, so NULL-keyed rows count as values
        // instead of being dropped (bare countDistinct would report
        // every NULL-keyed row as a duplicate). ORACLE MIRROR CAVEAT:
        // the textbook count(*) - count(DISTINCT key) DROPS NULL keys,
        // so on a nullable key it undercounts vs this rule — a DuckDB
        // mirror must write count(DISTINCT ROW(key...)) (or coalesce
        // the key) to agree; the declared validate_constraints query
        // only matches the plain pattern because its injected dirt
        // never nulls the unique key.
        (count(lit(1)) - countDistinct(struct(cs.map(col): _*))).as(s"r$i")
      case (Rule.NotNull(c), i) =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"r$i")
      case (Rule.InSet(c, allowed), i) =>
        sum(when(!col(c).isin(allowed: _*), 1L).otherwise(0L)).as(s"r$i")
      case (Rule.Bounds(c, lo, hi), i) =>
        val bad = lo.map(col(c) < _).getOrElse(lit(false)) ||
          hi.map(col(c) > _).getOrElse(lit(false))
        sum(when(bad, 1L).otherwise(0L)).as(s"r$i")
      case (r: Rule.RefIntegrity, i) =>
        sum(when(col(r.col).isNotNull &&
          col(s"__dim_key_${refOrdinal(i)}").isNull, 1L)
          .otherwise(0L)).as(s"r$i")
    }
    // coalesce: sum() over ZERO rows is NULL — an empty-but-clean table
    // must report 0 violations, not null (the old per-rule anti-join's
    // count() gave 0; a n_violations === 0 gate would flip on null)
    val kvs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"),
        coalesce(col(s"r$i").cast("long"), lit(0L)).as("n_violations"))
    }
    joined.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(kvs: _*)).as("kv"))
      .select(col("kv.rule").as("rule"), col("kv.n_violations").as("n_violations"))
      .orderBy(col("rule"))
  }

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
      validate(dirty, Seq(
        Rule.Unique(Seq("key")),
        Rule.NotNull("cust"),
        Rule.Bounds("price", lo = Some(0.0), hi = None),
        Rule.InSet("status", Seq("O", "F", "P")),
        Rule.RefIntegrity("cust", Tables(s, dir, "customer"), "c_custkey")))
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
          // + 0.0 normalizes IEEE -0.0 when value sits within 5e-7·std
          // of the mean (DuckDB round keeps the sign, Spark's does not)
          (round((col("value") - col("mean")) / nullif(col("std"), lit(0.0)), 6)
            + lit(0.0)).as("z"),
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
         |  SELECT 'unique_key' AS rule, key_dup AS n_violations FROM s
         |  UNION ALL SELECT 'not_null_cust', cust_null FROM s
         |  UNION ALL SELECT 'bounds_price', price_neg FROM s
         |  UNION ALL SELECT 'in_set_status', status_bad FROM s
         |  UNION ALL SELECT 'ref_cust_c_custkey', n FROM r)
         |ORDER BY rule""".stripMargin,
    "scale_standardize" ->
      """WITH st AS (
        |  SELECT cast(sum(cast(value as decimal(18,4))) as double) AS sx,
        |    cast(sum(cast(value as decimal(18,4)) * cast(value as decimal(18,4))) as double) AS sx2,
        |    count(value) AS n, min(value) AS vmin, max(value) AS vmax FROM events),
        |ms AS (SELECT sx / n AS mean,
        |  sqrt((sx2 - sx * sx / n) / (n - 1)) AS std, vmin, vmax FROM st)
        |SELECT event_id,
        |  round((value - mean) / nullif(std, 0), 6) + 0.0 AS z,
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
