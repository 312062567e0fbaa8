package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** §2.4 aggregation family.
  *
  * groupBy/agg compiles to partial (map-side) + final hash aggregation —
  * the one shuffle per query carries pre-combined partials, which is the
  * plan that survives 100× scale-up. Nullable grouping columns (rollup /
  * cube / grouping sets) are ordered with explicit NULLS FIRST on both
  * engines (Spark default ≠ DuckDB default).
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    "agg_distinct" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy(col("c_mktsegment"))
    },

    // HLL sketch. DuckDB can't reproduce Spark's sketch value, so the
    // DECLARED result is the oracle-checkable contract: the exact count
    // plus a bounded-relative-error boolean; the oracle asserts the same
    // count and `true`. The bound is 3× the sketch's rsd (0.05 is a
    // 1-sigma figure, not a guarantee — a tight bound could fail honestly
    // on an unlucky cardinality); ScalaTest additionally checks the raw
    // value against the 1-sigma figure on the fixed test data.
    "agg_approx_distinct" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("approx") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.15).as("approx_ok"))
    },

    // PER-GROUP HLL — the 100 TB shape for "distinct users per segment"
    // dashboards: one pass, bounded per-group sketch state, map-side
    // partials (countDistinct shuffles every distinct pair; the sketch
    // shuffles |groups|×sketch_size). Same contract-oracle pattern as
    // agg_approx_distinct: exact count + bounded-error boolean per group.
    "agg_approx_distinct_by_group" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("exact_users"), col("n_events"),
          (abs(col("approx") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.15).as("approx_ok"))
        .orderBy(col("event_type"))
    },

    // MERGEABLE sketch rollup — the pattern behind every 100 TB distinct
    // dashboard: sketch ONCE at fine grain ((event_type, day) HLL of
    // user_id via DataSketches hll_sketch_agg), store the binary sketch
    // column, then RE-AGGREGATE to any coarser grain with hll_union_agg —
    // no return trip to the raw data. Distinct from
    // agg_approx_distinct_by_group (a direct one-shot HLL): this gate
    // proves the sketch SURVIVES an intermediate aggregate and unions
    // correctly. Contract oracle: exact count + bounded-error boolean
    // (HLL_4 lgK=12 rsd ≈ 1.6%; the 15% bound is the family's 3σ+
    // convention).
    "profile_distinct_sketch_mergeable" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      val daily = e.groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx"),
          // count(day), not count(*): a null-ts generation would form a
          // null-day group here, but the oracle's count(DISTINCT day)
          // skips nulls — keep the two sides symmetric
          count(col("day")).as("n_days"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      exact.join(merged, Seq("event_type"))
        .select(col("event_type"), col("exact_users"), col("n_days"),
          (abs(col("approx") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.15).as("approx_ok"))
        .orderBy(col("event_type"))
    },

    // sales by (nation), (nation, segment), () — Spark 4 native groupingSets
    "agg_grouping_sets" -> { (s, dir) =>
      val orders = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val nation = Tables(s, dir, "nation")
      orders
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("n_name"), col("c_mktsegment")), Seq()),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    },

    "agg_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    "agg_cube" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    "agg_having" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
        .where(col("sum_qty") > 15000.0)
        .orderBy(col("l_suppkey"))
    },

    // boolean aggregates (every_/some_ surface)
    "agg_bool_suite" -> { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(bool_and(col("value") > 0.0).as("all_pos"),
          bool_or(col("value") > 400.0).as("any_big"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // array aggregation made deterministic: collect_list has no order
    // guarantee, so the declared result sorts the array before rendering
    "agg_collect_sorted" -> { (s, dir) =>
      Tables(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "agg_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts, true AS approx_ok
        |FROM lineitem""".stripMargin,
    "agg_approx_distinct_by_group" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  count(*) AS n_events, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "profile_distinct_sketch_mergeable" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  count(DISTINCT cast(cast(ts as timestamp) as date)) AS n_days,
        |  true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT n_name, c_mktsegment, count(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY GROUPING SETS ((n_name), (n_name, c_mktsegment), ())
         |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_having" ->
      s"""SELECT l_suppkey, ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n_lines
         |FROM lineitem GROUP BY l_suppkey
         |HAVING ${sqlDsum("l_quantity")} > 15000.0
         |ORDER BY l_suppkey""".stripMargin,
    "agg_bool_suite" ->
      """SELECT event_type, bool_and(value > 0.0) AS all_pos,
        |bool_or(value > 400.0) AS any_big, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "agg_collect_sorted" ->
      """SELECT n_regionkey,
        |string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
  )
}
