package graft.clean

import graft._
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.9 missing-value repair — each declared query applies the matching
  * [[CleanOp]] (the queries ARE recorded recipe steps, SURVEY.md §3.3).
  *
  * The synthetic events table has no nulls, so nulls are injected
  * deterministically (event_id % 7 → value, % 13 → event_type) identically
  * in both engines.
  */
object Missing {

  /** events + deterministic injected nulls: v (numeric), et (categorical). */
  def eventsWithNulls(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("v",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("et",
        when(col("event_id") % 13 === 0, lit(null)).otherwise(col("event_type")))

  /** The DuckDB mirror of [[eventsWithNulls]] (shared CTE body). */
  val sqlEv: String =
    """SELECT event_id, user_id, value, event_type,
      |CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
      |CASE WHEN event_id % 13 = 0 THEN NULL ELSE event_type END AS et
      |FROM events""".stripMargin

  val queries: Map[String, Q] = Map(
    "fillna_constant" -> { (s, dir) =>
      FillConstant("v", 0.0)(eventsWithNulls(s, dir))
        .select(col("event_id"), col("v")).orderBy(col("event_id"))
    },

    "fillna_mean" -> { (s, dir) =>
      FillMean("v")(eventsWithNulls(s, dir))
        .select(col("event_id"), col("v")).orderBy(col("event_id"))
    },

    "fillna_mean_by_group" -> { (s, dir) =>
      FillMeanByGroup("v", Seq("user_id"))(eventsWithNulls(s, dir))
        .select(col("event_id"), col("v")).orderBy(col("event_id"))
    },

    "fillna_median" -> { (s, dir) =>
      FillMedian("v")(eventsWithNulls(s, dir))
        .select(col("event_id"), col("v")).orderBy(col("event_id"))
    },

    "fillna_mode" -> { (s, dir) =>
      FillMode("et")(eventsWithNulls(s, dir))
        .select(col("event_id"), col("et")).orderBy(col("event_id"))
    },

    "fillna_ffill" -> { (s, dir) =>
      ForwardFill("v", Seq("event_id"), Seq("user_id"))(eventsWithNulls(s, dir))
        .select(col("event_id"), col("user_id"), col("v")).orderBy(col("event_id"))
    },

    "fillna_bfill" -> { (s, dir) =>
      BackwardFill("v", Seq("event_id"), Seq("user_id"))(eventsWithNulls(s, dir))
        .select(col("event_id"), col("user_id"), col("v")).orderBy(col("event_id"))
    },

    "fillna_interpolate" -> { (s, dir) =>
      Interpolate("v", Seq("event_id"), Seq("user_id"))(eventsWithNulls(s, dir))
        .select(col("event_id"), col("user_id"), col("v")).orderBy(col("event_id"))
    },

    "dropna_rows" -> { (s, dir) =>
      DropNaAny(Seq("v", "et"))(eventsWithNulls(s, dir))
        .select(col("event_id"), col("v"), col("et")).orderBy(col("event_id"))
    },

    // keep-first dedup by (l_orderkey, l_linenumber) with a total tiebreak
    "dedup_exact" -> { (s, dir) =>
      DedupByKey(
        keys = Seq("l_orderkey", "l_linenumber"),
        order = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate", "l_partkey", "l_suppkey")
      )(Tables(s, dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
  )

  private def q(body: String): String = s"WITH ev AS ($sqlEv)\n$body"

  val oracle: Map[String, String] = Map(
    "fillna_constant" -> q(
      "SELECT event_id, coalesce(v, 0.0) AS v FROM ev ORDER BY event_id"),
    "fillna_mean" -> q(
      """SELECT event_id,
        |coalesce(v, cast(sum(cast(v as decimal(18,4))) OVER () as double) / count(v) OVER ()) AS v
        |FROM ev ORDER BY event_id""".stripMargin),
    "fillna_mean_by_group" -> q(
      """SELECT event_id,
        |coalesce(v, cast(sum(cast(v as decimal(18,4))) OVER (PARTITION BY user_id) as double)
        |  / count(v) OVER (PARTITION BY user_id)) AS v
        |FROM ev ORDER BY event_id""".stripMargin),
    "fillna_median" -> q(
      """SELECT event_id,
        |CASE WHEN v IS NOT NULL THEN v
        |     ELSE round((SELECT quantile_cont(v, 0.5) FROM ev), 6) END AS v
        |FROM ev ORDER BY event_id""".stripMargin),
    "fillna_mode" -> q(
      """SELECT event_id,
        |coalesce(et, (SELECT et FROM (SELECT et, count(*) AS c FROM ev
        |  WHERE et IS NOT NULL GROUP BY et) ORDER BY c DESC, et LIMIT 1)) AS et
        |FROM ev ORDER BY event_id""".stripMargin),
    "fillna_ffill" -> q(
      """SELECT event_id, user_id,
        |last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM ev ORDER BY event_id""".stripMargin),
    "fillna_bfill" -> q(
      """SELECT event_id, user_id,
        |first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v
        |FROM ev ORDER BY event_id""".stripMargin),
    "fillna_interpolate" -> q(
      """SELECT event_id, user_id,
        |CASE WHEN v IS NOT NULL THEN v
        |     ELSE round(pv + (nv - pv) * (idx - pi) / (ni - pi), 6) END AS v
        |FROM (
        |  SELECT event_id, user_id, v,
        |    row_number() OVER w AS idx,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN rn0 END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pi,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN rn0 END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ni
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn0 FROM ev)
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |) ORDER BY event_id""".stripMargin),
    "dropna_rows" -> q(
      """SELECT event_id, v, et FROM ev
        |WHERE v IS NOT NULL AND et IS NOT NULL ORDER BY event_id""".stripMargin),
    // NULLS FIRST on every tiebreak: Spark's struct-min ordering puts
    // nulls first, DuckDB's ORDER BY defaults to nulls LAST — explicit
    // per the repo determinism rule (no nulls in these columns today,
    // but the oracle must not depend on that)
    "dedup_exact" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
        |    ORDER BY l_quantity NULLS FIRST, l_extendedprice NULLS FIRST,
        |      l_discount NULLS FIRST, l_tax NULLS FIRST,
        |      l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
        |      l_shipdate NULLS FIRST, l_partkey NULLS FIRST,
        |      l_suppkey NULLS FIRST) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
