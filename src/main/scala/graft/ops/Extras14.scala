package graft.ops

import graft._
import graft.Tables.dec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-8 fifth-session batch 11: event-time disorder audit (the
  * statistic that sizes a streaming watermark), quantile binning (the
  * missing discretizer in the encoder family), referential-integrity
  * validation, and the basket-size revenue profile.
  *
  * Scale discipline: the lateness audit's running max is bounded per
  * user (arrival order = ingest id); binning rides the existing
  * distributedNtile kernel (two-level prefix sum — never a
  * single-partition ntile window); RI checks are four LEFT ANTI
  * equi-joins (AQE broadcasts the small parents, degrades to shuffle
  * at scale); the basket profile is dimension-sized after the
  * per-order aggregate.
  *
  * Float discipline: lateness and basket sizes are pure integers;
  * binning edges are stored values (min/max per bin) and the bin mean
  * divides an exact decimal sum; ratios are fixed IEEE trees over
  * identical integer inputs, round-6.
  */
object Extras14 {

  val queries: Map[String, Q] = Map(

    // event-time disorder audit: how late do events arrive relative to
    // the running event-time high-water mark, in ARRIVAL order? The
    // bucketed histogram is exactly the evidence needed to size a
    // streaming watermark delay. The synthetic corpus is perfectly
    // ordered, so arrival is simulated with a deterministic per-event
    // ingest delay (0–2 h from key arithmetic) — the audit measures
    // EVENT-TIME disorder under that arrival order.
    "stream_lateness_audit" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("arr_us",
          col("us") + ((col("event_id") * 2654435761L) % 7200L) * 1000000L)
      val w = Window.partitionBy("user_id").orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("late_us", max(col("us")).over(w) - col("us"))
        .select(
          when(col("late_us") === 0, "a_on_time")
            .when(col("late_us") <= 1000000L, "b_within_1s")
            .when(col("late_us") <= 60000000L, "c_within_1min")
            .when(col("late_us") <= 3600000000L, "d_within_1h")
            .otherwise("e_over_1h").as("bucket"),
          col("late_us"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
        .orderBy("bucket")
    },

    // equal-frequency discretization (quantile binning) of line price
    // into deciles — the feature-prep encoder one-hot/WoE/hashing
    // can't serve for continuous columns. Bin edges are STORED values.
    "encode_quantile_binning" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem").select(
        col("l_extendedprice").as("v"), col("l_orderkey"),
        col("l_linenumber"))
      GraftOps.distributedNtile(li, Seq("v", "l_orderkey", "l_linenumber"),
          10, "bin")
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
          max(col("v")).as("hi"),
          (sum(dec(col("v"))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("bin_mean"))
        .orderBy("bin")
    },

    // referential-integrity audit across the star schema's four FK
    // edges: orphan = child key with no parent row. One LEFT ANTI join
    // per relation, one summary row each — the data-quality gate that
    // runs before every warehouse load.
    "validate_referential_integrity" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      def audit(rel: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String): DataFrame = {
        val n = child.agg(count(lit(1)).as("n_child"))
        val orphans = child
          .join(parent, child(childKey) === parent(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        n.crossJoin(broadcast(orphans))
          .select(lit(rel).as("relation"), col("n_child"), col("n_orphans"),
            round(col("n_orphans").cast(DoubleType) /
              col("n_child").cast(DoubleType), 6).as("orphan_ratio"))
      }
      audit("lineitem_orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("lineitem_part", li, "l_partkey",
          Tables(s, dir, "part"), "p_partkey"))
        .unionByName(audit("lineitem_supplier", li, "l_suppkey",
          Tables(s, dir, "supplier"), "s_suppkey"))
        .unionByName(audit("orders_customer", o, "o_custkey",
          Tables(s, dir, "customer"), "c_custkey"))
        .orderBy("relation")
    },

    // basket-size revenue profile: how much revenue rides on small vs
    // large orders? Dimension-sized after the per-order aggregate;
    // shares are identical integer/decimal-derived doubles.
    "analytics_basket_profile" -> { (s, dir) =>
      val per = Tables(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          sum(dec(col("l_extendedprice"))).as("rev_dec"))
      val bucketed = per.select(
        when(col("n_lines") >= 7, lit(7L)).otherwise(col("n_lines"))
          .as("size_bucket"), col("rev_dec"))
        .groupBy("size_bucket")
        .agg(count(lit(1)).as("n_orders"), sum(col("rev_dec")).as("bucket_dec"))
      bucketed
        .crossJoin(broadcast(bucketed.agg(sum(col("bucket_dec")).as("tot_dec"))))
        .select(col("size_bucket"), col("n_orders"),
          col("bucket_dec").cast(DoubleType).as("revenue"),
          round(col("bucket_dec").cast(DoubleType) /
            col("tot_dec").cast(DoubleType), 6).as("rev_share"))
        .orderBy("size_bucket")
    }
  )

  val oracle: Map[String, String] = Map(
    "stream_lateness_audit" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) + ((event_id * 2654435761) % 7200) * 1000000
        |      AS arr_us
        |  FROM events),
        |l AS (SELECT
        |    cast(max(us) OVER (PARTITION BY user_id ORDER BY arr_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS bigint) - us AS late_us
        |  FROM e)
        |SELECT CASE WHEN late_us = 0 THEN 'a_on_time'
        |            WHEN late_us <= 1000000 THEN 'b_within_1s'
        |            WHEN late_us <= 60000000 THEN 'c_within_1min'
        |            WHEN late_us <= 3600000000 THEN 'd_within_1h'
        |            ELSE 'e_over_1h' END AS bucket,
        |  cast(count(*) AS bigint) AS n_events,
        |  cast(max(late_us) AS bigint) AS max_late_us
        |FROM l GROUP BY 1 ORDER BY bucket""".stripMargin,
    "encode_quantile_binning" ->
      """WITH r AS (SELECT l_extendedprice AS v,
        |    cast(ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS int) AS bin
        |  FROM lineitem)
        |SELECT bin, cast(count(*) AS bigint) AS n, min(v) AS lo,
        |  max(v) AS hi,
        |  cast(sum(cast(v AS decimal(18,4))) AS double)
        |    / cast(count(*) AS double) AS bin_mean
        |FROM r GROUP BY bin ORDER BY bin""".stripMargin,
    "validate_referential_integrity" ->
      """SELECT 'lineitem_orders' AS relation,
        |  (SELECT cast(count(*) AS bigint) FROM lineitem) AS n_child,
        |  (SELECT cast(count(*) AS bigint) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |    AS n_orphans,
        |  round(cast((SELECT count(*) FROM lineitem
        |      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |    AS double) / cast((SELECT count(*) FROM lineitem) AS double), 6)
        |    AS orphan_ratio
        |UNION ALL
        |SELECT 'lineitem_part',
        |  (SELECT cast(count(*) AS bigint) FROM lineitem),
        |  (SELECT cast(count(*) AS bigint) FROM lineitem
        |   WHERE l_partkey NOT IN (SELECT p_partkey FROM part)),
        |  round(cast((SELECT count(*) FROM lineitem
        |      WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
        |    AS double) / cast((SELECT count(*) FROM lineitem) AS double), 6)
        |UNION ALL
        |SELECT 'lineitem_supplier',
        |  (SELECT cast(count(*) AS bigint) FROM lineitem),
        |  (SELECT cast(count(*) AS bigint) FROM lineitem
        |   WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)),
        |  round(cast((SELECT count(*) FROM lineitem
        |      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        |    AS double) / cast((SELECT count(*) FROM lineitem) AS double), 6)
        |UNION ALL
        |SELECT 'orders_customer',
        |  (SELECT cast(count(*) AS bigint) FROM orders),
        |  (SELECT cast(count(*) AS bigint) FROM orders
        |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
        |  round(cast((SELECT count(*) FROM orders
        |      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |    AS double) / cast((SELECT count(*) FROM orders) AS double), 6)
        |ORDER BY relation""".stripMargin,
    "analytics_basket_profile" ->
      """WITH per AS (SELECT l_orderkey, cast(count(*) AS bigint) AS n_lines,
        |    sum(cast(l_extendedprice AS decimal(18,4))) AS rev_dec
        |  FROM lineitem GROUP BY l_orderkey),
        |b AS (SELECT CASE WHEN n_lines >= 7 THEN 7 ELSE n_lines END
        |        AS size_bucket,
        |    cast(count(*) AS bigint) AS n_orders,
        |    sum(rev_dec) AS bucket_dec
        |  FROM per GROUP BY 1),
        |t AS (SELECT sum(bucket_dec) AS tot_dec FROM b)
        |SELECT size_bucket, n_orders, cast(bucket_dec AS double) AS revenue,
        |  round(cast(bucket_dec AS double) / cast(tot_dec AS double), 6)
        |    AS rev_share
        |FROM b CROSS JOIN t ORDER BY size_bucket""".stripMargin
  )
}
