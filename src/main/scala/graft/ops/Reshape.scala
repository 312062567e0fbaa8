package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Reshape family + conditional scalar coverage beyond SURVEY §2:
  * pivot (wide), unpivot/melt (long), deterministic arithmetic sampling
  * (reproducible cluster-side sampling — TABLESAMPLE is seed/partition
  * dependent, key-mod is not), and the conditional function suite.
  */
object Reshape {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  val queries: Map[String, Q] = Map(
    // wide: order counts per year × priority (explicit pivot values keep
    // the schema deterministic — never let pivot scan for values at scale)
    "reshape_pivot" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .pivot("o_orderpriority", priorities)
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("y"))
    },

    // long: melt part's numeric attributes into (key, attr, val)
    "reshape_unpivot" -> { (s, dir) =>
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          expr("stack(2, 'retailprice', p_retailprice, 'size', cast(p_size as double)) as (attr, val)"))
        .orderBy(col("p_partkey"), col("attr"))
    },

    // reproducible 5% sample by key arithmetic (portable, partition-stable)
    "sample_deterministic" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .where(col("o_orderkey") % 20 === 0)
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_orderkey")).as("sum_key"))
    },

    // conditional scalars: coalesce/nullif/if/greatest/least
    "fn_conditional_suite" -> { (s, dir) =>
      Tables(s, dir, "customer").select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg_or"),
        when(col("c_acctbal") < 0, "neg").otherwise("nonneg").as("bal_sign"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(5000.0)).as("bal_cap"),
        isnull(nullif(col("c_nationkey"), lit(0))).as("is_nation0"))
        .orderBy(col("c_custkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "reshape_pivot" ->
      """SELECT cast(year(o_orderdate) as int) AS y,
        |cast(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END), 0) as bigint) AS "1-URGENT",
        |cast(coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END), 0) as bigint) AS "2-HIGH",
        |cast(coalesce(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END), 0) as bigint) AS "3-MEDIUM",
        |cast(coalesce(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END), 0) as bigint) AS "4-NOT SPECIFIED",
        |cast(coalesce(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END), 0) as bigint) AS "5-LOW"
        |FROM orders GROUP BY 1 ORDER BY y""".stripMargin,
    "reshape_unpivot" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size', cast(p_size as double) FROM part
        |) ORDER BY p_partkey, attr""".stripMargin,
    "sample_deterministic" ->
      s"""SELECT count(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price,
         |cast(sum(o_orderkey) as bigint) AS sum_key
         |FROM orders WHERE o_orderkey % 20 = 0""".stripMargin,
    "fn_conditional_suite" ->
      """SELECT c_custkey,
        |coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_or,
        |CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_sign,
        |greatest(c_acctbal, 0.0) AS bal_floor,
        |least(c_acctbal, 5000.0) AS bal_cap,
        |nullif(c_nationkey, 0) IS NULL AS is_nation0
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
