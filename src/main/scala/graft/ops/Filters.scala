package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** §2.2 projection / filter / scalar predicates.
  *
  * All predicates are plain Column expressions so Catalyst pushes them into
  * the parquet scan (PushedFilters) — never UDFs (SURVEY.md §4).
  */
object Filters {

  val queries: Map[String, Q] = Map(
    // select + arithmetic derive + conjunctive/disjunctive predicates
    "project_filter" -> { (s, dir) =>
      val one = lit(1).cast("decimal(3,2)")
      Tables(s, dir, "lineitem")
        .where((col("l_quantity") > 30 && col("l_discount") <= 0.05) ||
          col("l_quantity") < 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice").cast("decimal(12,2)") *
            (one - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("revenue"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every output column so only identical rows can swap.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("revenue"))
    },

    // IN-list, BETWEEN, LIKE, rlike
    "filter_in_between_like" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM") &&
          col("o_totalprice").between(50000, 300000) &&
          col("o_orderpriority").like("%H%") &&
          col("o_orderpriority").rlike("^[0-9]-"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    },

    // null-safe equality (<=> ≡ IS NOT DISTINCT FROM): NULL <=> NULL is
    // TRUE, NULL <=> x is FALSE — the semantics dedup/upsert key compares
    // rely on, distinct from three-valued `=`
    "filter_null_safe_eq" -> { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("a", when(col("event_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")))
        .withColumn("b", when(col("event_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")))
        .select(col("event_id"), (col("a") <=> col("b")).as("nse"),
          (col("a") === col("b")).as("eq3v"))
        .orderBy(col("event_id"))
    },

    // conditional banding with when/otherwise
    "case_when_derive" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .withColumn("tier",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("tier"))
    }
  )

  val oracle: Map[String, String] = Map(
    "project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |cast(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(3,2)) - cast(l_discount as decimal(3,2))) as double) AS revenue
        |FROM lineitem
        |WHERE (l_quantity > 30 AND l_discount <= 0.05) OR l_quantity < 3
        |ORDER BY l_orderkey, l_linenumber, l_quantity, revenue""".stripMargin,
    "filter_in_between_like" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM')
        |  AND o_totalprice BETWEEN 50000 AND 300000
        |  AND o_orderpriority LIKE '%H%'
        |  AND regexp_matches(o_orderpriority, '^[0-9]-')
        |ORDER BY o_orderkey""".stripMargin,
    "case_when_derive" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
         |            WHEN o_totalprice < 200000 THEN 'medium'
         |            ELSE 'large' END AS tier,
         |count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY tier""".stripMargin,
    "filter_null_safe_eq" ->
      """WITH t AS (SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS a,
        |  CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS b
        |  FROM events)
        |SELECT event_id, a IS NOT DISTINCT FROM b AS nse, a = b AS eq3v
        |FROM t ORDER BY event_id""".stripMargin
  )
}
