package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Inequality/association statistics over exact-decimal sufficient
  * statistics — the "is this distribution healthy?" layer next to
  * [[Drift]]'s "did it move?".
  *
  *   - Gini coefficient of per-customer spend concentration (the Lorenz
  *     form Gini = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over ascending-sorted x);
  *   - per-group closed-form OLS (slope/intercept/r²) of extendedprice
  *     on quantity — regression from one aggregate pass of sufficient
  *     statistics (n, Σx, Σy, Σx², Σy², Σxy), the only regression shape
  *     that works at 100 TB (no iteration, no driver-side solve).
  *
  * Scale: both queries reduce map-side to dimension-sized frames (one
  * row per customer / three returnflag rows). The Gini rank comes from
  * the two-level distributed prefix sum ([[graft.GraftOps
  * .distributedRank]]), never a single-partition window.
  *
  * Float discipline: every sum is DECIMAL (4-scale inputs, 8-scale
  * products — width ≤ 38, exact and associative in both engines; probed
  * that DuckDB's sum(DECIMAL(38,x)) stays decimal). Final statistics are
  * fixed IEEE trees over the decimal→double casts; because Σx² / Σxy
  * unscaled values exceed 2⁵³ (where DuckDB's decimal→double cast can be
  * off by an ulp — the profile_anova_groups lesson), every emitted
  * statistic is rounded: slope/r²/gini at 6 (abs error ≤ 1e-11 there),
  * intercept at 3 (its Σy − slope·Σx cancellation leaves ~1e-5 abs
  * error — rounding must sit safely above it).
  */
object Stats {

  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  val queries: Map[String, Q] = Map(

    // Gini of per-customer total spend, single-row output.
    "profile_gini" -> { (s, dir) =>
      // dimension-sized (one row per customer) and consumed by both
      // prefix-sum branches inside distributedRank plus the final
      // aggregate — checkpoint so the orders fact is scanned once
      val spend = Tables(s, dir, "orders").groupBy("o_custkey")
        .agg(sum(dec4(col("o_totalprice"))).as("x"))
        .localCheckpoint(false)
      val ranked = GraftOps.distributedRank(spend, Seq("x", "o_custkey"), "i")
      val a = ranked.agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DoubleType).as("s0"),
        sum(col("i") * col("x")).cast(DoubleType).as("s1"))
      a.select(col("n").as("n_customers"), col("s0").as("total_spend"),
        // + 0.0 normalizes IEEE -0.0 on a near-zero gini (uniform spend)
        (round(lit(2.0) * col("s1") / (col("n") * col("s0"))
          - (col("n") + lit(1.0)) / col("n"), 6) + lit(0.0)).as("gini"))
    },

    // closed-form OLS per returnflag: extendedprice ~ quantity.
    "stats_regression_group" -> { (s, dir) =>
      // scale-2 casts (quantity is integral, extendedprice is 2-decimal
      // money): the squared products stay width 25, inside DuckDB's
      // int128 multiply — symmetric (18,4)² overflows its
      // statistics-narrowed physical type
      val l = Tables(s, dir, "lineitem").select(
        col("l_returnflag"),
        col("l_quantity").cast(DecimalType(12, 2)).as("x"),
        col("l_extendedprice").cast(DecimalType(12, 2)).as("y"))
      val g = l.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("y")).cast(DoubleType).as("sy"),
        sum(col("x") * col("x")).cast(DoubleType).as("sxx"),
        sum(col("y") * col("y")).cast(DoubleType).as("syy"),
        sum(col("x") * col("y")).cast(DoubleType).as("sxy"))
      val covN = col("n") * col("sxy") - col("sx") * col("sy")
      val varXN = col("n") * col("sxx") - col("sx") * col("sx")
      val varYN = col("n") * col("syy") - col("sy") * col("sy")
      val slope = covN / varXN
      g.select(col("l_returnflag"), col("n"),
        // + 0.0 normalizes IEEE -0.0 on near-zero slope/intercept
        (round(slope, 6) + lit(0.0)).as("slope"),
        (round((col("sy") - slope * col("sx")) / col("n"), 3) + lit(0.0))
          .as("intercept"),
        round(covN * covN / (varXN * varYN), 6).as("r2"))
        .orderBy("l_returnflag")
    }
  )

  val oracle: Map[String, String] = Map(
    "profile_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(cast(o_totalprice AS decimal(18,4))) AS x
        |  FROM orders GROUP BY o_custkey),
        |r AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM spend),
        |a AS (SELECT cast(count(*) AS bigint) AS n,
        |             cast(sum(x) AS double) AS s0,
        |             cast(sum(i * x) AS double) AS s1 FROM r)
        |SELECT n AS n_customers, s0 AS total_spend,
        |       round(2.0 * s1 / (n * s0) - (n + 1.0) / n, 6) + 0.0 AS gini
        |FROM a""".stripMargin,
    "stats_regression_group" ->
      """WITH l AS (
        |  SELECT l_returnflag,
        |         cast(l_quantity AS decimal(12,2)) AS x,
        |         cast(l_extendedprice AS decimal(12,2)) AS y
        |  FROM lineitem),
        |g AS (SELECT l_returnflag, cast(count(*) AS bigint) AS n,
        |             cast(sum(x) AS double) AS sx,
        |             cast(sum(y) AS double) AS sy,
        |             cast(sum(x * x) AS double) AS sxx,
        |             cast(sum(y * y) AS double) AS syy,
        |             cast(sum(x * y) AS double) AS sxy
        |      FROM l GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 3)
        |    + 0.0 AS intercept,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM g ORDER BY l_returnflag""".stripMargin
  )
}
