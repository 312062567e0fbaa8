package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._

/** Composite analytics queries — full multi-join/agg report shapes
  * (TPC-H-derived Q3/Q5/Q6/Q10/Q15, adapted to the testdata columns).
  *
  * The single-operator inventory (§2.3/§2.4) proves each join/agg
  * primitive in isolation; these queries prove the ORCHESTRATION: a
  * 4-6 table join graph where the optimizer must pick build sides,
  * push filters below joins, and prune columns per branch — the shape a
  * BI layer actually emits against a 100 TB warehouse.
  *
  * Scale notes (verified in PLANS.md):
  *  - Filters are declared on the base tables BEFORE the joins, so the
  *    parquet scans show PushedFilters and each branch reads only its
  *    referenced columns.
  *  - Fixed-cardinality dims (region 5 rows, nation 25) are broadcast
  *    EXPLICITLY — they stay tiny at any scale factor. Fact-fact joins
  *    (lineitem⋈orders⋈customer/supplier) are left unhinted: AQE
  *    broadcasts them at test SF and degrades to shuffle joins at
  *    100 TB, where they co-partition on the join key.
  *  - Top-N reports (`Q3`/`Q10`) end in orderBy+limit, which Spark
  *    plans as TakeOrderedAndProject: per-partition heaps + a driver
  *    merge of N rows — no global sort shuffle at any scale
  *    (PlanSpec-pinned).
  *  - Ties under the revenue sort break on the group key, so top-N is
  *    a total order and the oracle matches row-for-row.
  *  - Revenue terms follow the q1 exact-decimal discipline
  *    (decimal(12,2)·decimal(3,2) products, ≤38 digits, cast to double
  *    only at the end) so partition order can't change a single bit.
  */
object Analytics {

  // shared exact-decimal revenue term: price·(1−discount) — ONE copy of
  // the decimal-discipline recipe (decimal(12,2)·decimal(3,2), ≤38
  // digits); every consumer sums this term so the bit-parity contract
  // has a single point of truth (shared with Analytics2's composites)
  private[ops] def revTerm: org.apache.spark.sql.Column = {
    val one = lit(1).cast("decimal(3,2)")
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(3,2)")
    price * (one - disc)
  }
  private[ops] def revenue: org.apache.spark.sql.Column =
    sum(revTerm).cast("double")
  private[ops] val sqlRevenue =
    "cast(sum(cast(l_extendedprice as decimal(12,2)) * " +
      "(cast(1 as decimal(3,2)) - cast(l_discount as decimal(3,2)))) as double)"

  private[ops] def ts(lit0: String) = lit(lit0 + " 00:00:00").cast("timestamp")

  val queries: Map[String, Q] = Map(
    // Q3: unshipped-order value by segment — 3-way join, grouped revenue,
    // top 10. The limit rides TakeOrderedAndProject, never a full sort.
    "analytics_shipping_priority" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables(s, dir, "orders")
        .where(col("o_orderdate") < ts("1998-07-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") > ts("1998-07-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenue.as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    },

    // Q5: revenue where the LOCAL supplier served the order (customer and
    // supplier share a nation), one region, one year. region→nation is
    // broadcast-reduced FIRST so only ~1/5 of suppliers survive into the
    // fact join; the customer-nation equality rides the supplier join.
    "analytics_local_supplier_volume" -> { (s, dir) =>
      val asiaNations = Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region").where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = Tables(s, dir, "supplier")
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
        .select("o_orderkey", "o_custkey")
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name")).agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q6: would-be revenue from discount changes — pure scan+filter+agg;
    // every predicate reaches the parquet scan as a pushed filter.
    "analytics_discount_revenue" -> { (s, dir) =>
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(3,2)")
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
          col("l_quantity") < 24)
        .agg(sum(price * disc).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // Q10: returned-item losses by customer, one year, top 20 — the
    // customer-ranking report; nation is the only broadcast-hinted dim.
    "analytics_returned_items" -> { (s, dir) =>
      val ord = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1997-07-01"))
        .select("o_orderkey", "o_custkey")
      val li = Tables(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, dir, "nation")
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // Q4: orders where at least one item shipped >90 days after ordering —
    // EXISTS realized as a LEFT SEMI join whose condition mixes the equi
    // key with a cross-table range predicate (the semi-join dedups
    // multi-late-item orders for free; no count-distinct needed).
    "analytics_order_priority_check" -> { (s, dir) =>
      val ord = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1996-07-01"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // Q18: large-volume orders — HAVING over a fact aggregate, joined BACK
    // to the fact's parents. The quantity aggregate runs FIRST (one
    // map-side-combined pass), so only the ~0.2% qualifying orderkeys
    // reach the orders/customer joins.
    "analytics_large_orders" -> { (s, dir) =>
      val big = Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 200)
      big.join(Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey")).limit(20)
    },

    // Q13: how many customers placed 0, 1, 2… orders — LEFT OUTER join
    // preserving order-less customers, per-customer count (count(col)
    // ignores the outer join's nulls), then the tiny histogram aggregate.
    // The outer join and the first aggregate share c_custkey
    // partitioning, so the count piggybacks on the join shuffle; the
    // histogram input is |customers| narrow rows and its output ≤
    // max-order-count rows.
    "analytics_customer_distribution" -> { (s, dir) =>
      val perCust = Tables(s, dir, "customer").select("c_custkey")
        .join(Tables(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15: supplier(s) with the quarter's MAX revenue — agg-of-agg. The
    // 1-row max joins back via crossJoin(broadcast(...)), the same
    // scalar-stat shape every profile query uses (never a partition-less
    // window). The per-supplier aggregate is computed twice (once under
    // max) because column pruning intentionally splits the two branches;
    // each is one column-pruned 3-month scan.
    "analytics_top_supplier" -> { (s, dir) =>
      val rev = Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey")).agg(revenue.as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_rev"))
      rev.crossJoin(broadcast(mx))
        .where(col("total_revenue") === col("max_rev"))
        .join(Tables(s, dir, "supplier").select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // Q14: promo revenue share in one month — conditional aggregation over
    // a fact⋈dim join. The promo indicator multiplies the exact-decimal
    // revenue term (CASE-as-0/1-factor keeps the sum in decimal; a
    // null-skipping conditional sum would go null on a promo-free slice).
    "analytics_promo_revenue" -> { (s, dir) =>
      val rev = revTerm
      val promo = when(col("p_type") === "PROMO", lit(1)).otherwise(lit(0))
        .cast("decimal(1,0)")
      Tables(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-03-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(Tables(s, dir, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(rev * promo).cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          round(col("promo_revenue") * 100d / col("total_revenue"), 6)
            .as("promo_pct"))
    },

    // Q17: revenue lost to small-quantity orders — a per-part aggregate
    // (half the part's average quantity) joined back against the SAME
    // fact as a filter threshold. The threshold side is |parts| rows;
    // at 100 TB both sides co-partition on partkey.
    "analytics_small_qty_revenue" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val brandParts = Tables(s, dir, "part")
        .where(col("p_brand") === "Brand#1").select("p_partkey")
      val branded = li.join(brandParts, col("l_partkey") === col("p_partkey"))
      val thr = branded.groupBy(col("l_partkey").as("t_partkey"))
        .agg((davg(col("l_quantity")) * 0.5).as("half_avg_qty"))
      branded.join(thr, col("l_partkey") === col("t_partkey"))
        .where(col("l_quantity") < col("half_avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    },

    // Q19: disjunctive brand/size/quantity eligibility — an OR of
    // conjunct groups that cannot fully push below the join; the
    // optimizer can still push the extracted common bounds and must
    // evaluate the residual OR post-join without degrading to a
    // nested loop (equi key stays conjunctive).
    "analytics_special_revenue" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = Tables(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val eligible =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .where(eligible)
        .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
    },

    // Q8: national market share — the deepest join graph in the suite
    // (lineitem, orders, customer, part, supplier, nation×2, region):
    // what share of AMERICA's STANDARD-part revenue was supplied by one
    // nation, per year. Dim reductions happen FIRST and broadcast
    // (region→customer-nations; nation names onto suppliers); the share
    // is a conditional-decimal numerator over the same exact-decimal
    // denominator (Q14's CASE-as-factor), so a nation-free year reads
    // 0.0, never null.
    "analytics_market_share" -> { (s, dir) =>
      val custNations = Tables(s, dir, "nation")
        .join(broadcast(Tables(s, dir, "region")
          .where(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val suppNation = Tables(s, dir, "supplier")
        .join(broadcast(Tables(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val isTarget = when(col("supp_nation") === "NATION_3", lit(1))
        .otherwise(lit(0)).cast("decimal(1,0)")
      // r14 note: a "selective dims first" inner-join reorder (part +
      // region-reduced customer pruning the fact before the orderkey
      // exchange) was tried and REVERTED — at bench scale the planner
      // auto-broadcasts the raw dims in THIS order (one fact shuffle
      // total), while the reorder's pre-reduced customer/part inputs
      // lost their size estimates and degraded to sort-merge joins
      // (sweep 0.89 s → 1.54 s). At 100 TB AQE's runtime stats make the
      // same call per actual sizes; the logical order below is the one
      // that keeps small-SF estimates broadcastable.
      Tables(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(Tables(s, dir, "orders")
          .where(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
        .join(Tables(s, dir, "part")
          .where(col("p_type") === "STANDARD").select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("mkt_year"))
        .agg(sum(revTerm * isTarget).cast("double").as("nation_revenue"),
          sum(revTerm).cast("double").as("total_revenue"))
        .select(col("mkt_year"), col("nation_revenue"), col("total_revenue"),
          round(col("nation_revenue") / col("total_revenue"), 6).as("mkt_share"))
        .orderBy(col("mkt_year"))
    },

    // Q22: lapsed high-balance customers — the no-recent-orders test is
    // a LEFT ANTI join against the date-filtered orders; the 1-row scalar
    // average returns via crossJoin(broadcast(…)) with the balance
    // comparison living in CONDITIONAL AGGREGATES, not a filter (a
    // filter referencing both cross-join sides would push into the join
    // and turn it into a conditioned BNLJ — the outlier_remove pattern;
    // the post-aggregate numcust > 0 restores the oracle's qualifying-
    // nations-only output). positive-balance avg over customers, like
    // the original's country-code shape adapted to available columns.
    "analytics_lapsed_customers" -> { (s, dir) =>
      val cust = Tables(s, dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val avgBal = cust.where(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val recent = Tables(s, dir, "orders")
        .where(col("o_orderdate") >= ts("2000-01-01"))
        .select(col("o_custkey"))
      val high = col("c_acctbal") > col("avg_bal")
      cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .groupBy(col("c_nationkey"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("numcust"),
          dsum(when(high, col("c_acctbal"))).as("totacctbal"))
        .where(col("numcust") > 0)
        .orderBy(col("c_nationkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "analytics_shipping_priority" ->
      s"""SELECT l.l_orderkey, $sqlRevenue AS revenue,
         |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, o.o_orderpriority
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
         |  AND l.l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
         |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
         |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "analytics_local_supplier_volume" ->
      s"""SELECT n.n_name, $sqlRevenue AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  AND c.c_nationkey = s.s_nationkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin,
    "analytics_discount_revenue" ->
      """SELECT cast(sum(cast(l_extendedprice as decimal(12,2)) *
        |    cast(l_discount as decimal(3,2))) as double) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.09
        |  AND l_quantity < 24""".stripMargin,
    "analytics_returned_items" ->
      s"""SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         |  $sqlRevenue AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
         |  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
         |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
         |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    "analytics_order_priority_check" ->
      """SELECT o.o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "analytics_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${sqlDsum("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${sqlDsum("l_quantity")} > 200)
         |SELECT c.c_custkey, c.c_name, o.o_orderkey,
         |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |  o.o_totalprice, b.total_qty
         |FROM big b
         |JOIN orders o ON b.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |ORDER BY b.total_qty DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "analytics_promo_revenue" ->
      """WITH j AS (
        |  SELECT cast(l_extendedprice as decimal(12,2)) *
        |      (cast(1 as decimal(3,2)) - cast(l_discount as decimal(3,2))) *
        |      (CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS promo_rev,
        |    cast(l_extendedprice as decimal(12,2)) *
        |      (cast(1 as decimal(3,2)) - cast(l_discount as decimal(3,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00')
        |SELECT cast(sum(promo_rev) as double) AS promo_revenue,
        |  cast(sum(rev) as double) AS total_revenue,
        |  round(cast(sum(promo_rev) as double) * 100 /
        |    cast(sum(rev) as double), 6) AS promo_pct
        |FROM j""".stripMargin,
    "analytics_small_qty_revenue" ->
      s"""WITH branded AS (
         |  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  WHERE p.p_brand = 'Brand#1'),
         |thr AS (
         |  SELECT l_partkey, ${sqlDavg("l_quantity")} * 0.5 AS half_avg_qty
         |  FROM branded GROUP BY l_partkey)
         |SELECT ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
         |  count(*) AS n_small
         |FROM branded b JOIN thr t ON b.l_partkey = t.l_partkey
         |WHERE b.l_quantity < t.half_avg_qty""".stripMargin,
    "analytics_special_revenue" ->
      s"""SELECT $sqlRevenue AS revenue, count(*) AS n_lines
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 1 AND 20)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
         |       AND l.l_quantity BETWEEN 10 AND 40)""".stripMargin,
    "analytics_market_share" ->
      """WITH j AS (
        |  SELECT year(o.o_orderdate) AS mkt_year,
        |    cast(l.l_extendedprice as decimal(12,2)) *
        |      (cast(1 as decimal(3,2)) - cast(l.l_discount as decimal(3,2))) AS rev,
        |    CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END AS is_target
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN region r ON cn.n_regionkey = r.r_regionkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |SELECT mkt_year,
        |  cast(sum(rev * is_target) as double) AS nation_revenue,
        |  cast(sum(rev) as double) AS total_revenue,
        |  round(cast(sum(rev * is_target) as double) /
        |    cast(sum(rev) as double), 6) AS mkt_share
        |FROM j GROUP BY mkt_year ORDER BY mkt_year""".stripMargin,
    "analytics_lapsed_customers" ->
      s"""WITH avg_bal AS (
         |  SELECT ${sqlDavg("c_acctbal")} AS avg_bal
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c.c_nationkey, count(*) AS numcust,
         |  ${sqlDsum("c_acctbal")} AS totacctbal
         |FROM customer c, avg_bal a
         |WHERE c.c_acctbal > a.avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c.c_custkey
         |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin,
    "analytics_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "analytics_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, $sqlRevenue AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s.s_suppkey, s.s_name, r.total_revenue
         |FROM rev r
         |JOIN supplier s ON r.l_suppkey = s.s_suppkey
         |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s.s_suppkey""".stripMargin
  )
}
